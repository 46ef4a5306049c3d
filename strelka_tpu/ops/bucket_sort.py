"""Stable bucket (counting) sort permutation for small-integer keys.

The per-bounce wavefront re-sort is a full `jnp.argsort` of a 27-bit spatial
key — measured ~25 ms per 0.5M rays on v5e (NOTES fact #13), the single
largest fixed cost of the sorted-wavefront scheduler, and the blocker for
per-ray block assignment (fact #24: grouping rounds need a sort much
cheaper than argsort). But the intersector only consumes the key's GROUP
structure (rays sharing a tile should share locality); total order within a
group is irrelevant — and a STABLE grouping inherits the previous bounce's
coherence within each group for free. So: counting sort on the top key bits.

Algorithm (classic blocked counting sort, shaped for the MXU):
  1. one scatter-add builds per-block histograms  hist[nb, B]
     (fact #13: ONE [N] scatter is fine; per-lane gathers are not),
  2. tiny XLA cumsums turn hist into global base offsets  base[nb, B],
  3. a Pallas kernel computes each lane's final slot:
        pos = base[block, key] + (# earlier lanes in this block with same key)
     The in-block exclusive rank is a one-hot [B, L] times a strictly-lower-
     triangular [C, C] matrix — an MXU matmul whose f32 accumulation of 0/1
     bf16 operands is EXACT for counts < 2^24. base[block, key] rides the
     same one-hot (multiply + sum over B), so the kernel does no gathers.
  4. one scatter inverts pos into the gather permutation.

Cost model at N=0.5M, B=640, L=2048, C=256: ~0.5 GFLOP of bf16 matmul plus
two [N] scatters — an order of magnitude under argsort.

Replaces: the reference gets ray scheduling for free from OptiX RT-core
hardware (reference src/render/optix/OptixRender.cpp:1010 optixLaunch);
on TPU the wavefront sort IS the scheduler, so its cost is first-class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _bases(bucket_pad: jnp.ndarray, nb: int, L: int, B: int):
    """Per-(block, bucket) exclusive global base offsets via ONE scatter-add
    histogram + tiny cumsums. bucket_pad: [nb*L] i32 in [0, B)."""
    blk = jax.lax.broadcasted_iota(jnp.int32, (nb, L), 0).reshape(-1)
    flat = blk * B + bucket_pad
    hist = jnp.zeros(nb * B, jnp.int32).at[flat].add(1).reshape(nb, B)
    totals = hist.sum(axis=0)  # [B]
    key_base = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(totals)[:-1]])
    block_base = jnp.concatenate(
        [jnp.zeros((1, B), jnp.int32), jnp.cumsum(hist, axis=0)[:-1]], axis=0
    )
    return key_base[None, :] + block_base  # [nb, B]


def _pos_reference(bucket_pad: jnp.ndarray, nb: int, L: int, B: int) -> jnp.ndarray:
    """jnp reference for the final slot of each padded lane (CPU / fallback)."""
    base = _bases(bucket_pad, nb, L, B)  # [nb, B]
    b2 = bucket_pad.reshape(nb, L)
    onehot = (b2[:, :, None] == jnp.arange(B, dtype=jnp.int32)[None, None, :])
    rank = jnp.cumsum(onehot.astype(jnp.int32), axis=1) - 1  # inclusive -> excl
    rank = jnp.take_along_axis(rank, b2[:, :, None], axis=2)[:, :, 0]
    gbase = jnp.take_along_axis(base, b2, axis=1)
    return (gbase + rank).reshape(-1)


def _pos_kernel(keys_ref, base_ref, pos_ref, *, B: int, L: int, C: int):
    """One ray block: pos[l] = base[key[l]] + exclusive in-block rank.

    keys_ref: [1, L] i32; base_ref: [B, 1] f32 (this block's base column);
    pos_ref: [1, L] f32. Chunked over L in steps of C so the strictly-lower
    triangular matmul operand stays [C, C].
    """
    key = keys_ref[0, :]  # [L]
    ids = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)
    onehot = (key[None, :] == ids).astype(jnp.bfloat16)  # [B, L]
    base = base_ref[0, :][:, None]  # [B, 1] f32 (block is a flat [1, B] row)
    # strictly-lower-triangular [C, C]: T[l', l] = 1 iff l' < l
    r = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    tri = (r < c).astype(jnp.bfloat16)
    running = jnp.zeros((B, 1), jnp.float32)  # bucket counts in earlier chunks
    for ci in range(L // C):
        oc = onehot[:, ci * C : (ci + 1) * C]  # [B, C]
        prefix = (
            jax.lax.dot_general(
                oc, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + running
        )  # [B, C] exclusive in-block rank per bucket
        slot = jnp.sum(oc.astype(jnp.float32) * (prefix + base), axis=0,
                       keepdims=True)  # [1, C] — exactly one nonzero per lane
        pos_ref[0, ci * C : (ci + 1) * C] = slot[0, :]
        running = running + jnp.sum(
            oc.astype(jnp.float32), axis=1, keepdims=True
        )


@functools.partial(jax.jit, static_argnames=("B", "L", "C", "interpret"))
def _pos_pallas(bucket_pad, base, *, B: int, L: int, C: int, interpret: bool):
    nb = bucket_pad.shape[0] // L
    # flat [1, nb*X] rows: TPU requires the SECOND-minor block dim divisible
    # by 8 or equal to the array dim — (1, L) blocks over an [nb, L] array
    # violate that (hardware lowering error; interpret mode never checked)
    keys2d = bucket_pad.reshape(1, nb * L)
    base_flat = base.astype(jnp.float32).reshape(1, nb * B)
    pos = pl.pallas_call(
        functools.partial(_pos_kernel, B=B, L=L, C=C),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, L), lambda b: (0, b)),
            pl.BlockSpec((1, B), lambda b: (0, b)),
        ],
        out_specs=pl.BlockSpec((1, L), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((1, nb * L), jnp.float32),
        interpret=interpret,
    )(keys2d, base_flat)
    return pos.reshape(-1).astype(jnp.int32)


def bucket_sort_perm(
    bucket: jnp.ndarray,
    n_buckets: int,
    *,
    block: int = 2048,
    chunk: int = 256,
    use_pallas: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stable counting-sort gather permutation.

    bucket: [N] i32/u32 values in [0, n_buckets). Returns perm [N] i32 with
    bucket[perm] ascending and original order preserved within each bucket
    (equal-key lanes keep their relative order — the property that lets a
    bounce wavefront inherit last bounce's spatial coherence inside groups).
    """
    n = bucket.shape[0]
    bucket = bucket.astype(jnp.int32)
    if not use_pallas:
        # CPU / fallback: jnp.argsort is stable and cheap off-TPU; the
        # one-hot reference (_pos_reference) exists for kernel equality
        # tests at small N, not as a production path.
        return jnp.argsort(bucket).astype(jnp.int32)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # pallas_call has no CPU lowering outside interpret
    if block % chunk:
        raise ValueError(f"block ({block}) must be a multiple of chunk ({chunk})")
    n_pad = _round_up(max(n, block), block)
    nb = n_pad // block
    # padding lanes get a dedicated bucket AFTER all real ones; they also sit
    # at indices >= n, so stability parks them at the very end of slot space
    # only if no real lane shares their bucket — hence the extra bucket.
    B = _round_up(n_buckets + 1, 128)
    pad = jnp.full(n_pad - n, n_buckets, jnp.int32)
    bp = jnp.concatenate([bucket, pad]) if n_pad > n else bucket
    base = _bases(bp, nb, block, B)
    pos = _pos_pallas(bp, base, B=B, L=block, C=chunk, interpret=interpret)
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    perm = jnp.zeros(n_pad, jnp.int32).at[pos].set(idx)
    return perm[:n]
