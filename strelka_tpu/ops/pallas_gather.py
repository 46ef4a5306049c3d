"""MXU one-hot row gather: table[idx].T without the gather+transpose.

The integrator's hot epilogue does fat row-gathers ([N, F] rows from a
[T, F] table) followed by [N, F] -> [F, N] transposes into the
component-major layout. Measured on 1M rays: attr gather+transpose 13 ms,
material 5.9 ms, light 8.3 ms — all data movement. For tables that fit in
VMEM the same result is ONE matmul per ray tile: onehot(idx) [tile, T]
contracted with the table [T, F] on the MXU, emitting [F, tile] directly.
With Precision.HIGHEST the selection is bit-exact f32 (a one-hot dot has a
single non-zero term, 1.0 * v, and bf16x6 reconstructs f32 products
exactly; verified bit-equal in tests).

Replaces the gathers the reference does implicitly through CUDA SBT-indexed
loads (OptixRender_radiance_closest_hit.cu:365-454).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# above this row count the one-hot [tile, T] work/VMEM outgrows the saved
# transpose; callers fall back to XLA gather+transpose
ONEHOT_MAX_ROWS = 8192


def _gather_kernel(idx_ref, table_ref, out_ref, *, t_rows: int):
    idx = idx_ref[0, :]  # [tile] i32
    tile = idx.shape[0]
    # [tile, T] one-hot; compare AFTER broadcasting the 32-bit iota.
    # The one-hot operand is bf16-EXACT (0.0/1.0), and the table rides in as
    # a 3-term bf16 split (hi/mid/lo cover disjoint 8-bit mantissa windows,
    # so hi+mid+lo reconstructs the f32 value exactly for normal floats —
    # denormals flush, which scene tables never contain). Three single-pass
    # bf16 matmuls beat one Precision.HIGHEST (bf16x6) matmul 2x.
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, t_rows), 1)
    onehot = (row == idx[:, None]).astype(jnp.bfloat16)
    dot = lambda a: jax.lax.dot_general(
        a,
        onehot,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    out_ref[:, :] = dot(table_ref[0]) + dot(table_ref[1]) + dot(table_ref[2])


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_gather_rows_t(
    table: jnp.ndarray,  # [T, F] f32
    idx: jnp.ndarray,  # [N] i32 (values in [0, T))
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """table[idx].T -> [F, N] via per-tile MXU one-hot contraction."""
    t_rows, f = table.shape
    # sublane-pad F to a multiple of 8 and T to a lane multiple of 128
    f_pad = ((f + 7) // 8) * 8
    t_pad = ((t_rows + 127) // 128) * 128
    tableT = jnp.zeros((f_pad, t_pad), table.dtype)
    tableT = tableT.at[:f, :t_rows].set(table.T)
    # 3-term bf16 split by BIT TRUNCATION (not casts: XLA's excess-precision
    # rule folds f32->bf16->f32 round trips, zeroing the residuals). The
    # upper-16-bit mask is exactly a bf16 truncation, so each term holds a
    # disjoint 8-bit mantissa window and hi+mid+lo == x with NO rounding.
    bits = jax.lax.bitcast_convert_type(tableT, jnp.int32)
    hi_f = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    r1 = tableT - hi_f
    r1b = jax.lax.bitcast_convert_type(r1, jnp.int32)
    mid_f = jax.lax.bitcast_convert_type(r1b & jnp.int32(-65536), jnp.float32)
    lo_f = r1 - mid_f
    table3 = jnp.stack(
        [hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16), lo_f.astype(jnp.bfloat16)]
    )
    n = idx.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    idx2 = jnp.zeros((1, n_pad), jnp.int32)
    idx2 = idx2.at[0, :n].set(jnp.clip(idx.astype(jnp.int32), 0, t_rows - 1))
    kernel = functools.partial(_gather_kernel, t_rows=t_pad)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, f_pad, t_pad), lambda r: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f_pad, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * f_pad * t_pad * n_pad,
            bytes_accessed=4 * n_pad + 6 * f_pad * t_pad + 4 * f_pad * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx2, table3)
    return out[:f, :n]


def gather_rows_t_auto(table, idx, use_pallas: bool):
    """One-hot MXU path for VMEM-sized tables on TPU, else XLA
    gather+transpose (ops.vec.gather_rows_t)."""
    from strelka_tpu.ops.vec import gather_rows_t

    if use_pallas and table.shape[0] <= ONEHOT_MAX_ROWS:
        return pallas_gather_rows_t(table, idx)
    return gather_rows_t(table, idx)
