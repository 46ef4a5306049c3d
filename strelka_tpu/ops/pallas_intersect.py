"""Pallas TPU kernels for ray-scene intersection (dense wavefront x blocks).

The hot L0 kernel of the framework — the replacement for OptiX hardware
traversal on the TPU's terms. Measurement on v5e showed XLA gathers inside
lax loops run ~50x below peak, so per-ray pointer-chasing traversal is the
WRONG shape for this hardware. The right shape is dense: tile the ray
wavefront into VMEM-resident blocks ([8, TILE] component-major layout) and
stream triangle SUPERBLOCKS through the Pallas grid pipeline; each
(ray-tile, superblock) grid step culls and intersects its SUB-blocks with
pure elementwise VPU math (or small MXU matmuls) over [TBLK, TILE] tiles —
no gathers, no divergence, full lanes.

Why superblocks: grid-step overhead on v5e measured ~1.2us/step; at 256-tri
steps a 400k-tri scene costs 1600 steps/tile in bookkeeping alone. Each grid
step now streams SUPER x TBLK triangles (one DMA) and runs SUPER scalar-
predicated sub-block passes inside the body, so fine-grained culling is
retained at 1/SUPER the step count.

Sub-quadratic behaviour on large scenes comes from four mechanisms:
  1. Morton-sorted triangles => spatially tight fixed-size blocks; per-SUB-
     block AABBs (scalar-prefetched) skip each [TBLK, TILE] pass, and a
     per-SUPERBLOCK AABB skips the whole step.
  2. Near-to-far superblock ordering per ray tile (scalar-prefetched start
     offset into the Morton order) so closest-hit tmax pruning rejects far
     blocks once nearby hits land.
  3. Exclude-prim: each ray carries the primitive id it originated from and
     the kernel rejects it exactly — the self-intersection guard that lets
     the fast bf16x3 MXU path run artifact-free (offset_ray epsilons alone
     are defeated by bf16 t error; rejecting by id is exact and free).
  4. Any-hit early-out once every ray in the tile is occluded.

Layouts:
  rays:  [8, N]  rows = (ox, oy, oz, dx, dy, dz, tmin, tmax)
  excl:  [1, N]  i32 origin primitive id (-1 = none)
  tris:  [12, T] rows = (v0, e1, e2 xyz each) + (mask, pad, pad)
  out:   best_t [1, N] f32; best_prim [1, N] i32 (-1 = miss)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e16  # python float: jnp scalars become captured consts in pallas kernels

DEFAULT_TILE = 1024  # rays per grid cell (lanes; v5e scoped-VMEM bound with SUPER=8)
DEFAULT_TBLK = 256  # triangles per culled sub-block (sublanes)
DEFAULT_SUPER = 8  # sub-blocks per streamed superblock (one grid step)


def _mt_block(rays, tris, ray_mask: int, tmax_row=None):
    """Moller-Trumbore for a [TBLK] tri block x [TILE] ray tile.

    rays: [8, TILE]; tris: [12, TBLK]. Returns (t, valid): [TBLK, TILE].
    tmax_row overrides rays[7] (current best t for closest-hit pruning).
    """
    o = rays[0:3, :][:, None, :]  # [3, 1, TILE]
    d = rays[3:6, :][:, None, :]
    tmin = rays[6, :][None, :]  # [1, TILE]
    tmax = (rays[7, :] if tmax_row is None else tmax_row)[None, :]
    v0 = tris[0:3, :][:, :, None]  # [3, TBLK, 1]
    e1 = tris[3:6, :][:, :, None]
    e2 = tris[6:9, :][:, :, None]
    mask = tris[9, :][:, None]  # [TBLK, 1] float-encoded geom mask

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    d3 = (d[0], d[1], d[2])
    e13 = (e1[0], e1[1], e1[2])
    e23 = (e2[0], e2[1], e2[2])
    pvec = cross(d3, e23)  # [TBLK, TILE] each
    det = dot(e13, pvec)
    # det==0 lanes need no explicit guard: inv_det = +-inf, so u/v/t become
    # +-inf or NaN and the ordered compares below reject them (NaN compares
    # false; u=+inf fails u+v<=1, u=-inf fails u>=0). Saves an abs + compare
    # + select on the hot [TBLK, TILE] shape vs the eps-guarded form.
    inv_det = 1.0 / det
    tv = (o[0] - v0[0], o[1] - v0[1], o[2] - v0[2])
    u = dot(tv, pvec) * inv_det
    qvec = cross(tv, e13)
    v = dot(d3, qvec) * inv_det
    t = dot(e23, qvec) * inv_det
    mask_i = mask.astype(jnp.int32)
    valid = (
        (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < tmax)
        & ((mask_i & ray_mask) != 0)
    )
    return t, valid


def _prim_ids(blk, tblk: int, tile: int):
    """[TBLK, TILE] global primitive ids of sub-block blk's rows."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tblk, tile), 0)
    return blk * tblk + row


def _block_of(order_ref, r, k, nsb: int):
    """Per-tile superblock schedule: order_ref is a scalar-prefetched
    [n_tiles, nsb] i32 table, row r = tile r's superblocks sorted near-to-far
    from the tile's ray centroid, so closest-hit tmax pruning rejects the far
    tail after nearby hits land (the TPU stand-in for the RT-core's ordered
    BVH descent)."""
    return order_ref[r, k]


def _closest_kernel(
    sbounds_ref, bounds_ref, starts_ref, rays_ref, excl_ref, tris_ref, t_ref, prim_ref,
    *, ray_mask: int, tblk: int, super_: int,
):
    r = pl.program_id(0)
    k = pl.program_id(1)
    nsb = pl.num_programs(1)
    sb = _block_of(starts_ref, r, k, nsb)

    @pl.when(k == 0)
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        prim_ref[:, :] = jnp.full_like(prim_ref[:, :], -1)

    rays = rays_ref[:, :]
    super_hit = _tile_hits_block(rays, sbounds_ref, sb, tmax_row=t_ref[0, :])

    @pl.when(super_hit)
    def _super():
        tile = rays.shape[1]
        excl = excl_ref[0, :][None, :]
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=t_ref[0, :])

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                t, valid = _mt_block(
                    rays, tris_ref[:, j * tblk : (j + 1) * tblk], ray_mask,
                    tmax_row=t_ref[0, :],
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                t_masked = jnp.where(valid, t, _BIG)
                blk_best = jnp.min(t_masked, axis=0)  # [TILE]
                blk_arg = jnp.argmin(t_masked, axis=0).astype(jnp.int32)
                better = blk_best < t_ref[0, :]
                t_ref[0, :] = jnp.where(better, blk_best, t_ref[0, :])
                prim_ref[0, :] = jnp.where(better, blk * tblk + blk_arg, prim_ref[0, :])


def _any_kernel(
    sbounds_ref, bounds_ref, starts_ref, rays_ref, excl_ref, tris_ref, occ_ref,
    *, ray_mask: int, tblk: int, super_: int,
):
    r = pl.program_id(0)
    k = pl.program_id(1)
    nsb = pl.num_programs(1)
    sb = _block_of(starts_ref, r, k, nsb)

    @pl.when(k == 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    rays = rays_ref[:, :]
    # progressive pruning: occluded lanes drop out of the slab tests (their
    # effective tmax goes to 0), so a block is visited only while it can
    # still occlude a LIVE ray; fully-occluded tiles skip everything
    live_tmax = jnp.where(occ_ref[0, :], 0.0, rays[7, :])
    super_hit = _tile_hits_block(rays, sbounds_ref, sb, tmax_row=live_tmax)

    @pl.when(super_hit)
    def _super():
        tile = rays.shape[1]
        excl = excl_ref[0, :][None, :]
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=live_tmax)

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                _, valid = _mt_block(rays, tris_ref[:, j * tblk : (j + 1) * tblk], ray_mask)
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                occ_ref[0, :] = occ_ref[0, :] | jnp.any(valid, axis=0)


# ---------------------------------------------------------------------------
# Fused-K phase-1 kernels: ONE grid step per ray tile sweeps all K of the
# tile's nearest superblocks, passed as K scalar-prefetch-indexed inputs so
# the automatic pipeline prefetches them together (K * 2048 tris * 48 B =
# 1.5 MB at K=16 — VMEM-resident with double buffering). vs the rectangular
# (n_tiles, K) grid this removes the t_ref read->write serialization between
# the K steps AND the per-sub-block when-guards (phase-1 blocks are the NEAR
# ones — measured "nearly every sub-block guard passes" on bounce tiles, so
# the guards are pure matmul-pipeline serialization there; NOTES fact #24:
# rect phase 1 ran 438 ms against a ~129 ms flop floor). Accumulation stays
# in registers; results are written once. A tile-level live guard skips the
# dead tail tiles the wavefront sort clusters.
# ---------------------------------------------------------------------------


def _fused_open_epilogue(rays, bound, sb_ref, d2_ref, r2_ref, *, nsb_pad, chunk=128):
    """In-kernel residual open test (the _openw_kernel slab pass, bound =
    the phase-1 result): open lane = any UNSWEPT valid superblock whose slab
    entry precedes the lane's bound. Fusing it here saves a separate
    pallas_open_w launch + ray repack per sweep."""
    tile = rays.shape[1]
    tminv = rays[6, :][None, :]
    boundv = bound[None, :]
    r2 = r2_ref[0, 0, 0]
    inv = []
    for c in range(3):
        dirc = rays[3 + c, :][None, :]
        inv.append(1.0 / jnp.where(jnp.abs(dirc) > 1e-20, dirc, 1e-20))
    open_acc = jnp.zeros((1, tile), jnp.int32)
    for c0 in range(0, nsb_pad, chunk):
        c1 = min(c0 + chunk, nsb_pad)
        m = c1 - c0
        tnear = jnp.broadcast_to(tminv, (m, tile))
        tfar = jnp.broadcast_to(boundv, (m, tile))
        vb = None
        for c in range(3):
            o = rays[c, :][None, :]
            lo = sb_ref[c, c0:c1][:, None]
            hi = sb_ref[3 + c, c0:c1][:, None]
            t0 = (lo - o) * inv[c]
            t1 = (hi - o) * inv[c]
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
            v = lo <= hi
            vb = v if vb is None else (vb & v)
        pass_ = (tnear <= tfar) & (tnear < boundv) & vb
        unswept = d2_ref[0, 0, c0:c1][:, None] >= r2
        open_acc = open_acc | jnp.any(pass_ & unswept, axis=0)[None, :].astype(jnp.int32)
    return open_acc[0, :]


def _closest_kernel_fusedk(*refs, ray_mask: int, tblk: int, super_: int,
                           chunk: int, nsb_pad: int):
    # CHUNK superblocks per grid step (grid dim 1 walks the K schedule):
    # full-K register accumulation unrolled 128 MT blocks and blew the 16MB
    # scoped-VMEM stack on hardware (93.7MB at K=16/tile=1024) — same
    # chunked shape as the MXU variant, t/prim accumulated across steps.
    starts_ref, rays_ref, excl_ref, sb_ref, d2_ref, r2_ref = refs[0:6]
    tris_refs = refs[6 : 6 + chunk]
    t_ref, prim_ref, open_ref = refs[6 + chunk : 9 + chunk]
    r = pl.program_id(0)
    kc = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(kc == 0)
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        prim_ref[:, :] = jnp.full_like(prim_ref[:, :], -1)
        open_ref[:, :] = jnp.zeros_like(open_ref[:, :])

    rays = rays_ref[:, :]
    tile = rays.shape[1]

    @pl.when(jnp.any(rays[7, :] > rays[6, :]))
    def _live():
        excl = excl_ref[0, :][None, :]
        best_t = t_ref[0, :]
        best_p = prim_ref[0, :]
        for i in range(chunk):
            sb = starts_ref[kc * chunk + i, r]
            for j in range(super_):
                blk = sb * super_ + j
                t, valid = _mt_block(
                    rays, tris_refs[i][:, j * tblk : (j + 1) * tblk], ray_mask,
                    tmax_row=best_t,
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                t_masked = jnp.where(valid, t, _BIG)
                blk_best = jnp.min(t_masked, axis=0)
                blk_arg = jnp.argmin(t_masked, axis=0).astype(jnp.int32)
                better = blk_best < best_t
                best_t = jnp.where(better, blk_best, best_t)
                best_p = jnp.where(better, blk * tblk + blk_arg, best_p)
        t_ref[0, :] = best_t
        prim_ref[0, :] = best_p

        @pl.when(kc == last)
        def _open():
            open_ref[0, :] = _fused_open_epilogue(
                rays, best_t, sb_ref, d2_ref, r2_ref, nsb_pad=nsb_pad
            )


def _any_kernel_fusedk(*refs, ray_mask: int, tblk: int, super_: int,
                       chunk: int, nsb_pad: int):
    # chunked over the K schedule like _closest_kernel_fusedk (VMEM bound)
    starts_ref, rays_ref, excl_ref, sb_ref, d2_ref, r2_ref = refs[0:6]
    tris_refs = refs[6 : 6 + chunk]
    occ_ref, open_ref = refs[6 + chunk : 8 + chunk]
    r = pl.program_id(0)
    kc = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(kc == 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])
        open_ref[:, :] = jnp.zeros_like(open_ref[:, :])

    rays = rays_ref[:, :]
    tile = rays.shape[1]

    @pl.when(jnp.any(rays[7, :] > rays[6, :]))
    def _live():
        excl = excl_ref[0, :][None, :]
        occ = occ_ref[0, :]
        for i in range(chunk):
            sb = starts_ref[kc * chunk + i, r]
            for j in range(super_):
                blk = sb * super_ + j
                _, valid = _mt_block(
                    rays, tris_refs[i][:, j * tblk : (j + 1) * tblk], ray_mask
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                occ = occ | jnp.any(valid, axis=0)
        occ_ref[0, :] = occ

        @pl.when(kc == last)
        def _open():
            # occluded lanes: bound 0 -> closed; unoccluded: full segment
            bound = jnp.where(occ, 0.0, rays[7, :])
            open_ref[0, :] = _fused_open_epilogue(
                rays, bound, sb_ref, d2_ref, r2_ref, nsb_pad=nsb_pad
            )


def _closest_kernel_fusedk_mxu(
    *refs, ray_mask: int, tblk: int, super_: int, chunk: int, nsb_pad: int,
    precision=None, local: bool = False,
):
    bounds_ref, starts_ref, rays_ref, excl_ref, sb_ref, d2_ref, r2_ref = refs[0:7]
    feats_refs = refs[7 : 7 + chunk]
    mask_refs = refs[7 + chunk : 7 + 2 * chunk]
    t_ref, prim_ref, open_ref = refs[7 + 2 * chunk : 10 + 2 * chunk]
    r = pl.program_id(0)
    kc = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(kc == 0)
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        prim_ref[:, :] = jnp.full_like(prim_ref[:, :], -1)
        open_ref[:, :] = jnp.zeros_like(open_ref[:, :])

    rays = rays_ref[:, :]
    tile = rays.shape[1]

    @pl.when(jnp.any(rays[7, :] > rays[6, :]))
    def _live():
        excl = excl_ref[0, :][None, :]
        best_t = t_ref[0, :]
        best_p = prim_ref[0, :]
        for i in range(chunk):
            sb = starts_ref[kc * chunk + i, r]
            # local anchoring is per-SUPERBLOCK: recompute ray features
            # against each block's first-sub-block AABB center
            rt = (
                _ray_features_local(rays, bounds_ref, sb * super_)
                if local
                else _ray_features(rays)
            )
            for j in range(super_):
                blk = sb * super_ + j
                t, valid = _mt_block_mxu(
                    rt, rays, feats_refs[i][:, j * tblk : (j + 1) * tblk, :],
                    mask_refs[i][0, j * tblk : (j + 1) * tblk], ray_mask,
                    tmax_row=best_t, precision=precision,
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                best_t, best_p = _fold_closest_packed(t, valid, best_t, best_p, blk, tblk)
        t_ref[0, :] = best_t
        prim_ref[0, :] = best_p

        @pl.when(kc == last)
        def _open():
            open_ref[0, :] = _fused_open_epilogue(
                rays, best_t, sb_ref, d2_ref, r2_ref, nsb_pad=nsb_pad
            )


def _any_kernel_fusedk_mxu(
    *refs, ray_mask: int, tblk: int, super_: int, chunk: int, nsb_pad: int,
    precision=None, local: bool = False,
):
    bounds_ref, starts_ref, rays_ref, excl_ref, sb_ref, d2_ref, r2_ref = refs[0:7]
    feats_refs = refs[7 : 7 + chunk]
    mask_refs = refs[7 + chunk : 7 + 2 * chunk]
    occ_ref, open_ref = refs[7 + 2 * chunk : 9 + 2 * chunk]
    r = pl.program_id(0)
    kc = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(kc == 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])
        open_ref[:, :] = jnp.zeros_like(open_ref[:, :])

    rays = rays_ref[:, :]
    tile = rays.shape[1]

    @pl.when(jnp.any(rays[7, :] > rays[6, :]))
    def _live():
        excl = excl_ref[0, :][None, :]
        occ = occ_ref[0, :]
        for i in range(chunk):
            sb = starts_ref[kc * chunk + i, r]
            rt = (
                _ray_features_local(rays, bounds_ref, sb * super_)
                if local
                else _ray_features(rays)
            )
            for j in range(super_):
                blk = sb * super_ + j
                _, valid = _mt_block_mxu(
                    rt, rays, feats_refs[i][:, j * tblk : (j + 1) * tblk, :],
                    mask_refs[i][0, j * tblk : (j + 1) * tblk], ray_mask,
                    precision=precision,
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                occ = occ | jnp.any(valid, axis=0)
        occ_ref[0, :] = occ

        @pl.when(kc == last)
        def _open():
            bound = jnp.where(occ, 0.0, rays[7, :])
            open_ref[0, :] = _fused_open_epilogue(
                rays, bound, sb_ref, d2_ref, r2_ref, nsb_pad=nsb_pad
            )


def _fusedk_mxu_specs(tile, step, chunk, nsb_pad):
    specs = [
        pl.BlockSpec((8, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, nsb_pad), lambda r, kc, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nsb_pad), lambda r, kc, *_: (r, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda r, kc, *_: (r, 0, 0), memory_space=pltpu.VMEM),
    ]
    for i in range(chunk):
        specs.append(
            pl.BlockSpec(
                (4, step, _FDIM),
                (lambda i: lambda r, kc, b, starts: (0, starts[kc * chunk + i, r], 0))(i),
                memory_space=pltpu.VMEM,
            )
        )
    for i in range(chunk):
        specs.append(
            pl.BlockSpec(
                (1, step),
                (lambda i: lambda r, kc, b, starts: (0, starts[kc * chunk + i, r]))(i),
                memory_space=pltpu.VMEM,
            )
        )
    return specs


def _pad_order_chunk(order_k, chunk):
    """Pad the order table's K dim to a chunk multiple by repeating the last
    column (re-sweeping a block is idempotent for both min and OR folds)."""
    K = order_k.shape[1]
    pad = (-K) % chunk
    if pad:
        order_k = jnp.concatenate(
            [order_k, jnp.repeat(order_k[:, -1:], pad, axis=1)], axis=1
        )
    return order_k.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("ray_mask", "tile", "tblk", "super_", "chunk", "interpret", "precision", "local"),
)
def pallas_intersect_closest_fusedk_mxu(
    feats: jnp.ndarray,  # [4, T, 16] (pack_tris_mxu[_local])
    mask: jnp.ndarray,  # [1, T]
    bounds: jnp.ndarray,  # [8, n_blocks]
    order_k: jnp.ndarray,  # [n_tiles, K] i32
    sbounds: jnp.ndarray,  # [8, nsb] (open epilogue)
    d2: jnp.ndarray,  # [n_tiles, nsb]
    r2t: jnp.ndarray,  # [n_tiles]
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    chunk: int = 4,  # superblocks fused per grid step (VMEM-bounded: full
    # K=16 fusion of the 5.3x-fatter MXU feats would need 16 MB + buffers)
    interpret: bool = False,
    precision=None,
    local: bool = False,
):
    """MXU phase-1 closest sweep, CHUNK superblocks per grid step in
    registers, residual open test fused at the last step
    -> (t [N], prim [N], open [N])."""
    step = tblk * super_
    order_k = _pad_order_chunk(order_k, chunk)
    n_steps = order_k.shape[1] // chunk
    order_kt = order_k.T  # [K, n_tiles]: SMEM pads the MINOR dim to 128
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    n_tiles = n_pad // tile
    sbounds, d2r, nsb_pad = _pad_open_inputs(sbounds, d2, n_tiles)
    kernel = functools.partial(
        _closest_kernel_fusedk_mxu, ray_mask=ray_mask, tblk=tblk, super_=super_,
        chunk=chunk, nsb_pad=nsb_pad, precision=precision, local=local,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_steps),
        in_specs=_fusedk_mxu_specs(tile, step, chunk, nsb_pad),
        out_specs=[
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
        ],
    )
    t_out, prim_out, open_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * _FDIM * n_pad * order_k.shape[1] * step,
            bytes_accessed=4 * (8 * n_pad + 4 * _FDIM * order_k.shape[1] * step),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        bounds, order_kt, rays, excl, sbounds, d2r, r2t.reshape(-1, 1, 1),
        *([feats] * chunk), *([mask] * chunk),
    )
    t = t_out[0, :n]
    prim = prim_out[0, :n]
    return jnp.where(prim >= 0, t, _BIG), prim, open_out[0, :n] != 0


@functools.partial(
    jax.jit,
    static_argnames=("ray_mask", "tile", "tblk", "super_", "chunk", "interpret", "precision", "local"),
)
def pallas_intersect_any_fusedk_mxu(
    feats: jnp.ndarray,
    mask: jnp.ndarray,
    bounds: jnp.ndarray,
    order_k: jnp.ndarray,  # [n_tiles, K] i32
    sbounds: jnp.ndarray,  # [8, nsb]
    d2: jnp.ndarray,  # [n_tiles, nsb]
    r2t: jnp.ndarray,  # [n_tiles]
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    chunk: int = 4,
    interpret: bool = False,
    precision=None,
    local: bool = False,
):
    """MXU phase-1 any-hit sweep, CHUNK superblocks per grid step, open test
    fused at the last step -> (occ [N], open [N])."""
    step = tblk * super_
    order_k = _pad_order_chunk(order_k, chunk)
    n_steps = order_k.shape[1] // chunk
    order_kt = order_k.T  # [K, n_tiles]: SMEM pads the MINOR dim to 128
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    n_tiles = n_pad // tile
    sbounds, d2r, nsb_pad = _pad_open_inputs(sbounds, d2, n_tiles)
    kernel = functools.partial(
        _any_kernel_fusedk_mxu, ray_mask=ray_mask, tblk=tblk, super_=super_,
        chunk=chunk, nsb_pad=nsb_pad, precision=precision, local=local,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_steps),
        in_specs=_fusedk_mxu_specs(tile, step, chunk, nsb_pad),
        out_specs=[
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
        ],
    )
    occ, open_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * _FDIM * n_pad * order_k.shape[1] * step,
            bytes_accessed=4 * (8 * n_pad + 4 * _FDIM * order_k.shape[1] * step),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        bounds, order_kt, rays, excl, sbounds, d2r, r2t.reshape(-1, 1, 1),
        *([feats] * chunk), *([mask] * chunk),
    )
    return occ[0, :n], open_out[0, :n] != 0


def _pad_open_inputs(sbounds, d2, n_tiles):
    """Pad sbounds/d2 to a 128-multiple superblock count for the fused open
    epilogue (inverted pad boxes never pass; far pad d2 is harmless)."""
    nsb = sbounds.shape[1]
    nsb_pad = ((nsb + 127) // 128) * 128
    if nsb_pad != nsb:
        pad_sb = jnp.concatenate(
            [
                jnp.full((3, nsb_pad - nsb), 1e30, sbounds.dtype),
                jnp.full((3, nsb_pad - nsb), -1e30, sbounds.dtype),
                jnp.zeros((2, nsb_pad - nsb), sbounds.dtype),
            ]
        )
        sbounds = jnp.concatenate([sbounds[:8], pad_sb], axis=1)
        d2 = jnp.concatenate(
            [d2, jnp.full((d2.shape[0], nsb_pad - nsb), 1e30, d2.dtype)], axis=1
        )
    return sbounds, d2.reshape(n_tiles, 1, nsb_pad), nsb_pad


def _fusedk_specs(tile, step, chunk, nsb_pad):
    specs = [
        pl.BlockSpec((8, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, nsb_pad), lambda r, kc, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nsb_pad), lambda r, kc, *_: (r, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda r, kc, *_: (r, 0, 0), memory_space=pltpu.VMEM),
    ]
    for i in range(chunk):
        specs.append(
            pl.BlockSpec(
                (12, step),
                (lambda i: lambda r, kc, starts: (0, starts[kc * chunk + i, r]))(i),
                memory_space=pltpu.VMEM,
            )
        )
    return specs


@functools.partial(
    jax.jit, static_argnames=("ray_mask", "tile", "tblk", "super_", "chunk", "interpret")
)
def pallas_intersect_closest_fusedk(
    tris_packed: jnp.ndarray,  # [12, T] (pack_tris)
    order_k: jnp.ndarray,  # [n_tiles, K] i32 (tile_sweep_order_k)
    sbounds: jnp.ndarray,  # [8, nsb] superblock AABBs (open epilogue)
    d2: jnp.ndarray,  # [n_tiles, nsb] tile-box distances (open: swept mask)
    r2t: jnp.ndarray,  # [n_tiles] swept-ball radius^2
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    chunk: int = 1,  # superblocks per grid step: full-K register fusion
    # OOM'd the 16MB scoped-VMEM stack on hardware (~0.7MB/unrolled MT block)
    interpret: bool = False,
):
    """Phase-1 closest sweep of each tile's K nearest superblocks (CHUNK
    superblocks per grid step, K walked by grid dim 1), WITH the residual
    open test fused at the last step -> (t [N], prim [N], open [N] bool);
    t/prim bit-compatible with the rectangular sweep, open bit-compatible
    with pallas_open_w."""
    step = tblk * super_
    order_k = _pad_order_chunk(order_k, chunk)
    k_fused = int(order_k.shape[1])
    n_steps = k_fused // chunk
    order_kt = order_k.T  # [K, n_tiles] (SMEM minor-pad)
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    n_tiles = n_pad // tile
    sbounds, d2r, nsb_pad = _pad_open_inputs(sbounds, d2, n_tiles)
    kernel = functools.partial(
        _closest_kernel_fusedk, ray_mask=ray_mask, tblk=tblk, super_=super_,
        chunk=chunk, nsb_pad=nsb_pad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_steps),
        in_specs=_fusedk_specs(tile, step, chunk, nsb_pad),
        out_specs=[
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
        ],
    )
    t_out, prim_out, open_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * n_pad * k_fused * step,
            bytes_accessed=4 * (8 * n_pad + 12 * k_fused * step),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        order_kt, rays, excl, sbounds, d2r,
        r2t.reshape(-1, 1, 1), *([tris_packed] * chunk),
    )
    t = t_out[0, :n]
    prim = prim_out[0, :n]
    return jnp.where(prim >= 0, t, _BIG), prim, open_out[0, :n] != 0


@functools.partial(
    jax.jit, static_argnames=("ray_mask", "tile", "tblk", "super_", "chunk", "interpret")
)
def pallas_intersect_any_fusedk(
    tris_packed: jnp.ndarray,
    order_k: jnp.ndarray,  # [n_tiles, K] i32
    sbounds: jnp.ndarray,  # [8, nsb]
    d2: jnp.ndarray,  # [n_tiles, nsb]
    r2t: jnp.ndarray,  # [n_tiles]
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    chunk: int = 1,  # see pallas_intersect_closest_fusedk (VMEM bound)
    interpret: bool = False,
):
    """Phase-1 any-hit sweep of each tile's K nearest superblocks (CHUNK
    superblocks per grid step), with the residual open test fused at the
    last step -> (occ [N], open [N])."""
    step = tblk * super_
    order_k = _pad_order_chunk(order_k, chunk)
    k_fused = int(order_k.shape[1])
    n_steps = k_fused // chunk
    order_kt = order_k.T  # [K, n_tiles] (SMEM minor-pad)
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    n_tiles = n_pad // tile
    sbounds, d2r, nsb_pad = _pad_open_inputs(sbounds, d2, n_tiles)
    kernel = functools.partial(
        _any_kernel_fusedk, ray_mask=ray_mask, tblk=tblk, super_=super_,
        chunk=chunk, nsb_pad=nsb_pad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_steps),
        in_specs=_fusedk_specs(tile, step, chunk, nsb_pad),
        out_specs=[
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
        ],
    )
    occ, open_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * n_pad * k_fused * step,
            bytes_accessed=4 * (8 * n_pad + 12 * k_fused * step),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        order_kt, rays, excl, sbounds, d2r,
        r2t.reshape(-1, 1, 1), *([tris_packed] * chunk),
    )
    return occ[0, :n], open_out[0, :n] != 0


# ---------------------------------------------------------------------------
# Work-list kernels: a 1-D grid over scalar-prefetched (ray-tile, superblock)
# PAIRS instead of the rectangular (n_tiles x nsb) grid. The rectangular grid
# pays ~1.4us of bookkeeping per step even when fully culled (measured: an
# all-dead 256-tile x 201-superblock sweep still costs 76 ms); the pair list
# only visits cells where some ray's [tmin, bound) segment actually enters
# the superblock AABB (the XLA-side W matrix), which measured 11-16x sparser
# on both camera and residual-phase-2 wavefronts. Entries are sorted by tile
# (contiguous output-block runs) and near-to-far within a tile (tmax pruning).
# ---------------------------------------------------------------------------


def _closest_kernel_wl(
    wl_ref, bounds_ref, rays_ref, excl_ref, tris_ref, t_ref, prim_ref,
    *, ray_mask: int, tblk: int, super_: int,
):
    i = pl.program_id(0)
    e = wl_ref[0, i]
    flags = wl_flags(e)
    sb = wl_sb(e)

    @pl.when((flags & 1) != 0)  # first entry of this tile's run
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        prim_ref[:, :] = jnp.full_like(prim_ref[:, :], -1)

    rays = rays_ref[:, :]

    @pl.when((flags & 2) != 0)  # valid (non-pad) entry
    def _body():
        tile = rays.shape[1]
        excl = excl_ref[0, :][None, :]
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=t_ref[0, :])

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                t, valid = _mt_block(
                    rays, tris_ref[:, j * tblk : (j + 1) * tblk], ray_mask,
                    tmax_row=t_ref[0, :],
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                t_masked = jnp.where(valid, t, _BIG)
                blk_best = jnp.min(t_masked, axis=0)
                blk_arg = jnp.argmin(t_masked, axis=0).astype(jnp.int32)
                better = blk_best < t_ref[0, :]
                t_ref[0, :] = jnp.where(better, blk_best, t_ref[0, :])
                prim_ref[0, :] = jnp.where(better, blk * tblk + blk_arg, prim_ref[0, :])


def _any_kernel_wl(
    wl_ref, bounds_ref, rays_ref, excl_ref, tris_ref, occ_ref,
    *, ray_mask: int, tblk: int, super_: int,
):
    i = pl.program_id(0)
    e = wl_ref[0, i]
    flags = wl_flags(e)
    sb = wl_sb(e)

    @pl.when((flags & 1) != 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    rays = rays_ref[:, :]

    @pl.when((flags & 2) != 0)
    def _body():
        tile = rays.shape[1]
        excl = excl_ref[0, :][None, :]
        live_tmax = jnp.where(occ_ref[0, :], 0.0, rays[7, :])
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=live_tmax)

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                _, valid = _mt_block(rays, tris_ref[:, j * tblk : (j + 1) * tblk], ray_mask)
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                occ_ref[0, :] = occ_ref[0, :] | jnp.any(valid, axis=0)


def slab_matrix_any(origins, directions, tmin, bound, sbounds, tile: int, chunk: int = 64):
    """W [n_tiles, nsb] bool: does ANY ray in tile r (with per-ray segment
    [tmin, bound)) enter superblock sb's AABB? Same broadcast math as
    residual_open, reduced over the tile axis instead of the block axis."""
    n = tmin.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    pad = n_pad - n

    def tiles(c, fill=0.0):
        if pad:
            c = jnp.concatenate([c, jnp.full(pad, fill, c.dtype)])
        return c.reshape(-1, tile, 1)

    o = [tiles(origins.x), tiles(origins.y), tiles(origins.z)]
    d = [tiles(directions.x), tiles(directions.y), tiles(directions.z)]
    tmin_t = tiles(tmin)
    bound_t = tiles(bound)
    inv = [1.0 / jnp.where(jnp.abs(c) > 1e-20, c, 1e-20) for c in d]
    nsb = sbounds.shape[1]
    cols = []
    for c0 in range(0, nsb, chunk):
        c1 = min(c0 + chunk, nsb)
        tnear = jnp.broadcast_to(tmin_t, (n_pad // tile, tile, c1 - c0))
        tfar = jnp.broadcast_to(bound_t, (n_pad // tile, tile, c1 - c0))
        for c in range(3):
            lo = sbounds[c, c0:c1][None, None, :]
            hi = sbounds[3 + c, c0:c1][None, None, :]
            t0 = (lo - o[c]) * inv[c]
            t1 = (hi - o[c]) * inv[c]
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
        vb = (
            (sbounds[0, c0:c1] <= sbounds[3, c0:c1])
            & (sbounds[1, c0:c1] <= sbounds[4, c0:c1])
            & (sbounds[2, c0:c1] <= sbounds[5, c0:c1])
        )[None, None, :]
        cols.append(((tnear <= tfar) & (tnear < bound_t) & vb).any(1))
    return jnp.concatenate(cols, axis=-1)


def _openw_kernel(rays_ref, sb_ref, d2_ref, r2_ref, open_ref, w_ref, tn_ref, *, nsb_pad, chunk):
    """Fused per-tile slab pass: per-ray OPEN flag + per-(tile, superblock)
    W row + per-(tile, superblock) MIN entry distance, in one pass over the
    rays (the XLA formulation materialized [n_tiles, tile, nsb] broadcast
    intermediates in HBM — ~14 ms/sweep; this kernel keeps it in VMEM).

    The min-tnear matrix orders a tile's blocks ALONG THE RAYS' PATHS
    (BVH-style near-to-far), which beats origin-box-distance ordering for
    beams (camera, shadow) and mixed bounce tiles alike."""
    rays = rays_ref[:, :]
    tile = rays.shape[1]
    # dead-tile skip: in phase-2 prep the wavefront arrives open-first
    # partitioned, so most tail tiles carry bound <= tmin everywhere and the
    # whole chunk loop is skippable after writing the trivial outputs
    open_ref[0, :] = jnp.zeros((tile,), jnp.int32)
    w_ref[0, 0, :] = jnp.zeros((nsb_pad,), jnp.int32)
    tn_ref[0, 0, :] = jnp.full((nsb_pad,), _BIG, jnp.float32)

    @pl.when(jnp.any(rays[7, :] > rays[6, :]))
    def _live():
        tminv = rays[6, :][None, :]
        bound = rays[7, :][None, :]
        open_acc = jnp.zeros((1, tile), jnp.int32)
        r2 = r2_ref[0, 0, 0]
        inv = []
        for c in range(3):
            dirc = rays[3 + c, :][None, :]
            inv.append(1.0 / jnp.where(jnp.abs(dirc) > 1e-20, dirc, 1e-20))
        for c0 in range(0, nsb_pad, chunk):
            c1 = min(c0 + chunk, nsb_pad)
            m = c1 - c0
            tnear = jnp.broadcast_to(tminv, (m, tile))
            tfar = jnp.broadcast_to(bound, (m, tile))
            vb = None
            for c in range(3):
                o = rays[c, :][None, :]
                # minor-dim insertion on the f32 rows (Mosaic: only 32-bit
                # types may insert a minor dim), bool compares AFTER insertion
                lo = sb_ref[c, c0:c1][:, None]
                hi = sb_ref[3 + c, c0:c1][:, None]
                t0 = (lo - o) * inv[c]
                t1 = (hi - o) * inv[c]
                tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
                tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
                v = lo <= hi  # inverted (empty/pad) boxes never pass
                vb = v if vb is None else (vb & v)
            pass_ = (tnear <= tfar) & (tnear < bound) & vb
            w_ref[0, 0, c0:c1] = jnp.any(pass_, axis=1).astype(jnp.int32)
            tn_ref[0, 0, c0:c1] = jnp.min(jnp.where(pass_, tnear, _BIG), axis=1)
            unswept = d2_ref[0, 0, c0:c1][:, None] >= r2
            open_acc = open_acc | jnp.any(pass_ & unswept, axis=0)[None, :].astype(jnp.int32)
        open_ref[0, :] = open_acc[0, :]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_open_w(
    origins,
    directions,
    tmin: jnp.ndarray,
    bound: jnp.ndarray,
    sbounds: jnp.ndarray,  # [8, nsb]
    d2: jnp.ndarray,  # [n_tiles, nsb]
    r2t: jnp.ndarray,  # [n_tiles]
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """(open [N] bool, W [n_tiles, nsb] bool, min_tn [n_tiles, nsb] f32)
    in one Pallas pass.

    open: could any superblock with d2 >= r2t still beat the per-ray bound?
    W: does any ray in the tile enter the superblock at all (work list)?
    min_tn: per-tile minimum slab entry distance (1e16 where no ray passes)
    — the along-path near-to-far sweep metric.
    Pass r2t = +inf to make open all-False (W/min_tn-only use)."""
    n = tmin.shape[0]
    rays, n_pad = _pack_rays(origins, directions, tmin, bound, tile)
    n_tiles = n_pad // tile
    nsb = sbounds.shape[1]
    nsb_pad = ((nsb + 127) // 128) * 128
    if nsb_pad != nsb:
        # pad with inverted boxes (never pass) and far d2 (unswept, harmless)
        pad_sb = jnp.concatenate(
            [
                jnp.full((3, nsb_pad - nsb), 1e30, sbounds.dtype),
                jnp.full((3, nsb_pad - nsb), -1e30, sbounds.dtype),
                jnp.zeros((2, nsb_pad - nsb), sbounds.dtype),
            ]
        )
        sbounds = jnp.concatenate([sbounds[:8], pad_sb], axis=1)
        d2 = jnp.concatenate(
            [d2, jnp.full((d2.shape[0], nsb_pad - nsb), 1e30, d2.dtype)], axis=1
        )
    kernel = functools.partial(_openw_kernel, nsb_pad=nsb_pad, chunk=128)
    # per-tile rows ride as [n_tiles, 1, lanes] 3-D blocks: a (1, lanes) 2-D
    # block on a [n_tiles, lanes] array violates the (8, 128)-divisible rule
    open_out, w_out, tn_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nsb_pad), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nsb_pad), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nsb_pad), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nsb_pad), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1, nsb_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1, nsb_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(rays, sbounds, d2.reshape(n_tiles, 1, nsb_pad), r2t.reshape(-1, 1, 1))
    return open_out[0, :n] != 0, w_out[:, 0, :nsb] != 0, tn_out[:, 0, :nsb]


# Packed work-list entry layout: tile_row << 14 | superblock << 2 | flags.
# One i32 per (tile, superblock) pair in SMEM — see build_worklist.
_WL_SB_SHIFT = 2
_WL_TILE_SHIFT = 14
_WL_SB_MAX = 1 << (_WL_TILE_SHIFT - _WL_SB_SHIFT)


def wl_flags(e):
    return e & 3


def wl_sb(e):
    return (e >> _WL_SB_SHIFT) & (_WL_SB_MAX - 1)


def wl_tile(e):
    return e >> _WL_TILE_SHIFT


def _partition_perm_flat(flag):
    """Stable true-first partition permutation of a flat bool vector.
    Returns (perm, count)."""
    n = flag.shape[0]
    r = jnp.cumsum(flag.astype(jnp.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.where(flag, r - 1, r[n - 1] + idx - r)
    return jnp.zeros(n, jnp.int32).at[pos].set(idx), r[n - 1]


def build_worklist(W, d2, capacity: int):
    """Flatten the W matrix into a PACKED [1, C] i32 pair list, grouped by
    tile and near-to-far within each tile. Each entry packs
    ``tile_row << 14 | superblock << 2 | flags`` — one SMEM word per pair
    instead of the old [4, C] rows, so the same 1MB SMEM budget holds 4x
    the entries (the p2_tile=256 hardware OOM of fact #32 was this limit).
    Decode with wl_tile/wl_sb/wl_flags (kernels and index_maps share them).

    flags: bit0 = first entry of its tile run, bit1 = valid. Pad entries
    repeat the last valid tile (no spurious output-block switches).
    Returns (wl, count, visited_tiles [n_tiles] bool). If count > capacity
    the list is TRUNCATED — callers must check and fall back.

    Selection rides lax.top_k at the per-row capacity (ceil(capacity /
    n_tiles)) instead of a full [n_tiles, nsb] argsort — W rows average
    far under nsb entries. A row DENSER than the per-row cap would be
    silently truncated (missing blocks = wrong hits), so such rows force
    the reported count past capacity and the caller's rectangular
    fallback takes over."""
    n_tiles, nsb = W.shape
    # packed-field limits (static shapes, checked at trace time): 12-bit
    # superblock id = 8.4M tris at 2048/superblock, 18-bit tile row
    assert nsb <= _WL_SB_MAX, f"worklist nsb {nsb} > {_WL_SB_MAX}"
    assert n_tiles < (1 << 18), f"worklist n_tiles {n_tiles} >= 2^18"
    capacity = min(capacity, n_tiles * nsb)
    kr = min(-(-capacity // n_tiles), nsb)
    # W entries first (near-to-far), non-entries pushed to +inf
    key = jnp.where(W, d2, jnp.inf)
    _, order = jax.lax.top_k(-key, kr)
    order = order.astype(jnp.int32)
    Ws = jnp.take_along_axis(W, order, axis=1)
    flat = Ws.reshape(-1)
    perm, kept = _partition_perm_flat(flat)
    row_counts = W.sum(axis=1)
    count = row_counts.sum()
    # per-row overflow: entries beyond kr were dropped from `flat`, so the
    # in-capacity list would be INCOMPLETE — report count > capacity to
    # route the caller to its fallback (kept == count when no row overflows)
    count = jnp.where(row_counts.max() > kr, jnp.int32(capacity + 1), count)
    sel = perm[:capacity]
    r = sel // kr
    j = sel % kr
    sb = order[r, j]
    idxc = jnp.arange(capacity, dtype=jnp.int32)
    valid = idxc < count
    last = jnp.maximum(jnp.minimum(count, capacity) - 1, 0)
    r_pad = jnp.where(valid, r, r[last])
    sb_pad = jnp.where(valid, sb, 0)
    first = valid & ((idxc == 0) | (r_pad != jnp.roll(r_pad, 1)))
    flags = first.astype(jnp.int32) | (valid.astype(jnp.int32) << 1)
    wl = ((r_pad << _WL_TILE_SHIFT) | (sb_pad << _WL_SB_SHIFT) | flags)[None, :]
    return wl, count, W.any(axis=1)


@functools.partial(
    jax.jit, static_argnames=("ray_mask", "tile", "tblk", "super_", "interpret")
)
def pallas_intersect_closest_wl(
    tris_packed: jnp.ndarray,
    bounds: jnp.ndarray,
    wl: jnp.ndarray,  # [1, C] packed i32 (build_worklist)
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    interpret: bool = False,
):
    """Work-list closest sweep -> (t [N], prim [N]). Tiles with NO work-list
    entry return GARBAGE — the caller must mask with build_worklist's
    visited_tiles."""
    step = tblk * super_
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    kernel = functools.partial(_closest_kernel_wl, ray_mask=ray_mask, tblk=tblk, super_=super_)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(wl.shape[1],),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, step), lambda i, wl, b: (0, wl_sb(wl[0, i])), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(wl, bounds, rays, excl, tris_packed)
    t = t_out[0, :n]
    prim = prim_out[0, :n]
    return jnp.where(prim >= 0, t, _BIG), prim


@functools.partial(
    jax.jit, static_argnames=("ray_mask", "tile", "tblk", "super_", "interpret")
)
def pallas_intersect_any_wl(
    tris_packed: jnp.ndarray,
    bounds: jnp.ndarray,
    wl: jnp.ndarray,
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    interpret: bool = False,
):
    """Work-list any-hit sweep -> [N] bool (mask with visited_tiles)."""
    step = tblk * super_
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    kernel = functools.partial(_any_kernel_wl, ray_mask=ray_mask, tblk=tblk, super_=super_)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(wl.shape[1],),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, step), lambda i, wl, b: (0, wl_sb(wl[0, i])), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
    )
    occ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(wl, bounds, rays, excl, tris_packed)
    return occ[0, :n]


def _closest_kernel_wl_mxu(
    wl_ref, bounds_ref, rays_ref, excl_ref, feats_ref, mask_ref, t_ref, prim_ref,
    *, ray_mask: int, tblk: int, super_: int, precision=None, local: bool = False,
):
    i = pl.program_id(0)
    e = wl_ref[0, i]
    flags = wl_flags(e)
    sb = wl_sb(e)

    @pl.when((flags & 1) != 0)  # first entry of this tile's run
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        prim_ref[:, :] = jnp.full_like(prim_ref[:, :], -1)

    rays = rays_ref[:, :]

    @pl.when((flags & 2) != 0)  # valid (non-pad) entry
    def _body():
        tile = rays.shape[1]
        rt = (
            _ray_features_local(rays, bounds_ref, sb * super_)
            if local
            else _ray_features(rays)
        )
        excl = excl_ref[0, :][None, :]
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=t_ref[0, :])

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                t, valid = _mt_block_mxu(
                    rt, rays, feats_ref[:, j * tblk : (j + 1) * tblk, :],
                    mask_ref[0, j * tblk : (j + 1) * tblk], ray_mask,
                    tmax_row=t_ref[0, :], precision=precision,
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                bt, bp = _fold_closest_packed(
                    t, valid, t_ref[0, :], prim_ref[0, :], blk, tblk
                )
                t_ref[0, :] = bt
                prim_ref[0, :] = bp


def _any_kernel_wl_mxu(
    wl_ref, bounds_ref, rays_ref, excl_ref, feats_ref, mask_ref, occ_ref,
    *, ray_mask: int, tblk: int, super_: int, precision=None, local: bool = False,
):
    i = pl.program_id(0)
    e = wl_ref[0, i]
    flags = wl_flags(e)
    sb = wl_sb(e)

    @pl.when((flags & 1) != 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    rays = rays_ref[:, :]

    @pl.when((flags & 2) != 0)
    def _body():
        tile = rays.shape[1]
        rt = (
            _ray_features_local(rays, bounds_ref, sb * super_)
            if local
            else _ray_features(rays)
        )
        excl = excl_ref[0, :][None, :]
        live_tmax = jnp.where(occ_ref[0, :], 0.0, rays[7, :])
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=live_tmax)

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                _, valid = _mt_block_mxu(
                    rt, rays, feats_ref[:, j * tblk : (j + 1) * tblk, :],
                    mask_ref[0, j * tblk : (j + 1) * tblk], ray_mask,
                    precision=precision,
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                occ_ref[0, :] = occ_ref[0, :] | jnp.any(valid, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("ray_mask", "tile", "tblk", "super_", "interpret", "precision", "local"),
)
def pallas_intersect_closest_wl_mxu(
    feats: jnp.ndarray,  # [4, T, 16] (pack_tris_mxu)
    mask: jnp.ndarray,  # [1, T]
    bounds: jnp.ndarray,
    wl: jnp.ndarray,  # [1, C] packed i32 (build_worklist)
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    interpret: bool = False,
    precision=None,
    local: bool = False,  # superblock-local feats (pack_tris_mxu_local)
):
    """MXU work-list closest sweep -> (t [N], prim [N]). Same schedule as
    pallas_intersect_closest_wl but the MT test rides 4 matmuls per live
    sub-block: once dead (tile, superblock) pairs are skipped by the work
    list, the sweep is compute-bound on live steps, where the MXU rate wins
    even though the feature stream is 5.3x the packed-tri bytes. Tiles with
    no work-list entry return GARBAGE — mask with visited_tiles."""
    step = tblk * super_
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    kernel = functools.partial(
        _closest_kernel_wl_mxu, ray_mask=ray_mask, tblk=tblk, super_=super_,
        precision=precision, local=local,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(wl.shape[1],),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, step, _FDIM), lambda i, wl, b: (0, wl_sb(wl[0, i]), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step), lambda i, wl, b: (0, wl_sb(wl[0, i])), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(wl, bounds, rays, excl, feats, mask)
    t = t_out[0, :n]
    prim = prim_out[0, :n]
    return jnp.where(prim >= 0, t, _BIG), prim


@functools.partial(
    jax.jit,
    static_argnames=("ray_mask", "tile", "tblk", "super_", "interpret", "precision", "local"),
)
def pallas_intersect_any_wl_mxu(
    feats: jnp.ndarray,
    mask: jnp.ndarray,
    bounds: jnp.ndarray,
    wl: jnp.ndarray,
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    interpret: bool = False,
    precision=None,
    local: bool = False,  # superblock-local feats (pack_tris_mxu_local)
):
    """MXU work-list any-hit sweep -> [N] bool (mask with visited_tiles)."""
    step = tblk * super_
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    kernel = functools.partial(
        _any_kernel_wl_mxu, ray_mask=ray_mask, tblk=tblk, super_=super_,
        precision=precision, local=local,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(wl.shape[1],),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, step, _FDIM), lambda i, wl, b: (0, wl_sb(wl[0, i]), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step), lambda i, wl, b: (0, wl_sb(wl[0, i])), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
    )
    occ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(wl, bounds, rays, excl, feats, mask)
    return occ[0, :n]


# ---------------------------------------------------------------------------
# Block culling: Morton-sorted triangle blocks + per-cell AABB skip.
# ---------------------------------------------------------------------------


def morton_sort_tris(p):
    """Spatial sort of triangles by centroid Morton code (host, numpy).

    p: [T, 3, 3] corner positions. Returns the permutation. Sorted order
    makes fixed-size kernel blocks spatially tight so their AABBs cull well.
    """
    c = p.mean(axis=1)
    lo = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - lo, 1e-12)
    q = np.clip(((c - lo) / ext * 1023.0).astype(np.uint32), 0, 1023).astype(np.uint64)

    def part1by2(x):
        x &= np.uint64(0x3FF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x30000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x9249249)
        return x

    code = part1by2(q[:, 0]) | (part1by2(q[:, 1]) << np.uint64(1)) | (part1by2(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def _pad_count(t: int, tblk: int, super_: int) -> int:
    step = tblk * super_
    return ((t + step - 1) // step) * step


def block_bounds(v0, e1, e2, geom_mask, tblk: int = DEFAULT_TBLK, super_: int = DEFAULT_SUPER):
    """Per-SUB-block AABBs -> [8, n_blocks] f32 (n_blocks = padded_T/tblk).

    Rows: (min xyz, max xyz, pad, pad). Padded/masked-out triangles get an
    inverted AABB so empty blocks never pass the slab test.
    """
    t = v0.shape[0]
    t_pad = _pad_count(t, tblk, super_)
    nb = t_pad // tblk
    v0 = np.asarray(v0, np.float32)
    p0 = v0
    p1 = v0 + np.asarray(e1, np.float32)
    p2 = v0 + np.asarray(e2, np.float32)
    tmin = np.minimum(np.minimum(p0, p1), p2)
    tmax = np.maximum(np.maximum(p0, p1), p2)
    live = np.asarray(geom_mask) != 0
    big = np.float32(1e30)
    tmin = np.where(live[:, None], tmin, big)
    tmax = np.where(live[:, None], tmax, -big)
    tmin = np.concatenate([tmin, np.full((t_pad - t, 3), big, np.float32)])
    tmax = np.concatenate([tmax, np.full((t_pad - t, 3), -big, np.float32)])
    bmin = tmin.reshape(nb, tblk, 3).min(axis=1)
    bmax = tmax.reshape(nb, tblk, 3).max(axis=1)
    out = np.zeros((8, nb), np.float32)
    out[0:3] = bmin.T
    out[3:6] = bmax.T
    import jax.numpy as _jnp

    return _jnp.asarray(out)


def super_bounds(bounds, super_: int = DEFAULT_SUPER):
    """Union sub-block AABBs into per-superblock AABBs -> [8, nsb]."""
    b = np.asarray(bounds)
    nb = b.shape[1]
    nsb = nb // super_
    lo = b[0:3, : nsb * super_].reshape(3, nsb, super_).min(axis=2)
    hi = b[3:6, : nsb * super_].reshape(3, nsb, super_).max(axis=2)
    out = np.zeros((8, nsb), np.float32)
    out[0:3] = lo
    out[3:6] = hi
    import jax.numpy as _jnp

    return _jnp.asarray(out)


def block_centroids(sbounds) -> jnp.ndarray:
    """[nsb, 3] SUPERBLOCK AABB centers (for per-tile start-offset pick).
    Empty superblocks (inverted AABB) get a far-away centroid."""
    b = np.asarray(sbounds)
    c = 0.5 * (b[0:3] + b[3:6])  # [3, nsb]
    empty = b[0] > b[3]
    c = np.where(empty[None, :], 1e30, c)
    return jnp.asarray(c.T.astype(np.float32))


def tile_sweep_order(origins, centroids, tile: int) -> jnp.ndarray:
    """Per-ray-tile full near-to-far superblock order -> [n_tiles, nsb] i32.

    argsort of the [n_tiles, nsb] tile-centroid -> superblock-centroid
    distance matrix (small: tiles x superblocks)."""
    n = origins.x.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    pad = n_pad - n

    def mean_tiles(c):
        if pad:
            c = jnp.concatenate([c, jnp.zeros(pad, c.dtype)])
        return c.reshape(-1, tile).mean(axis=1)

    cx, cy, cz = mean_tiles(origins.x), mean_tiles(origins.y), mean_tiles(origins.z)
    d2 = (
        (cx[:, None] - centroids[None, :, 0]) ** 2
        + (cy[:, None] - centroids[None, :, 1]) ** 2
        + (cz[:, None] - centroids[None, :, 2]) ** 2
    )
    return jnp.argsort(d2, axis=1).astype(jnp.int32)


def tile_box_d2(origins, sbounds, tile: int) -> jnp.ndarray:
    """Per-tile point-to-AABB distance² matrix [n_tiles, nsb].

    Box distance (not centroid distance): a large flat superblock — e.g. a
    ground-plane slab — whose AABB CONTAINS the tile origin gets distance 0
    and is swept first, where its centroid could be arbitrarily far (the
    failure mode that left ~100% of bounce rays 'open' under the centroid
    metric). Empty blocks (inverted AABB) land at ~1e30 automatically.
    """
    n = origins.x.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    pad = n_pad - n

    def mean_tiles(c):
        if pad:
            c = jnp.concatenate([c, jnp.zeros(pad, c.dtype)])
        return c.reshape(-1, tile).mean(axis=1)

    cm = [mean_tiles(origins.x), mean_tiles(origins.y), mean_tiles(origins.z)]
    d2 = 0.0
    for c in range(3):
        lo = sbounds[c][None, :]
        hi = sbounds[3 + c][None, :]
        dx = jnp.maximum(jnp.maximum(lo - cm[c][:, None], cm[c][:, None] - hi), 0.0)
        d2 = d2 + dx * dx
    return d2


def tile_sweep_order_k(origins, sbounds, tile: int, k: int):
    """Phase-1 residual sweep prep: each tile's K nearest superblocks by
    point-to-AABB distance.

    Returns (order [n_tiles, K] i32, r2_thresh [n_tiles] f32, d2
    [n_tiles, nsb] f32). r2_thresh is the K-th smallest distance²; every
    UNSWEPT superblock satisfies d2 >= r2_thresh (ties make the test
    conservative — a tied swept block re-opens the ray, never the reverse),
    which is what residual_open keys on.
    """
    d2 = tile_box_d2(origins, sbounds, tile)
    nsb = d2.shape[1]
    kk = min(k, nsb)
    # top_k of -d2 = the K smallest, ties broken by lower index — the same
    # selection a stable ascending argsort makes, at O(nsb log K) instead of
    # a full [n_tiles, nsb] sort pair (two of these run per sweep prep)
    neg_vals, order = jax.lax.top_k(-d2, kk)
    return order.astype(jnp.int32), -neg_vals[:, kk - 1], d2


def residual_open(
    origins,
    directions,
    tmin,
    bound,
    sbounds,
    d2,
    r2_thresh,
    tile: int,
    chunk: int = 64,
):
    """[N] bool: could any UNSWEPT superblock still contain a hit closer
    than `bound` (per-ray best_t after phase 1, or the shadow tmax)?

    Pure broadcast elementwise over [n_tiles, tile, nsb_chunk] — rays are
    tile-contiguous so the per-tile d2 row broadcasts with NO gathers.
    sbounds: [8, nsb] superblock AABBs (rows min xyz / max xyz).
    """
    n = tmin.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    pad = n_pad - n

    def tiles(c, fill=0.0):
        if pad:
            c = jnp.concatenate([c, jnp.full(pad, fill, c.dtype)])
        return c.reshape(-1, tile, 1)

    o = [tiles(origins.x), tiles(origins.y), tiles(origins.z)]
    d = [tiles(directions.x), tiles(directions.y), tiles(directions.z)]
    tmin_t = tiles(tmin)
    bound_t = tiles(bound)  # pad lanes: bound 0 -> closed
    inv = [1.0 / jnp.where(jnp.abs(c) > 1e-20, c, 1e-20) for c in d]
    nsb = sbounds.shape[1]
    open_acc = jnp.zeros((n_pad // tile, tile), bool)
    for c0 in range(0, nsb, chunk):
        c1 = min(c0 + chunk, nsb)
        tnear = jnp.broadcast_to(tmin_t, (n_pad // tile, tile, c1 - c0))
        tfar = jnp.broadcast_to(bound_t, (n_pad // tile, tile, c1 - c0))
        for c in range(3):
            lo = sbounds[c, c0:c1][None, None, :]
            hi = sbounds[3 + c, c0:c1][None, None, :]
            t0 = (lo - o[c]) * inv[c]
            t1 = (hi - o[c]) * inv[c]
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
        unswept = (d2[:, c0:c1] >= r2_thresh[:, None])[:, None, :]
        # inverted (empty) boxes do NOT fail the slab test (lo=+big/hi=-big
        # yields [-inf, +inf] after the min/max swap) — test them explicitly
        vb = (
            (sbounds[0, c0:c1] <= sbounds[3, c0:c1])
            & (sbounds[1, c0:c1] <= sbounds[4, c0:c1])
            & (sbounds[2, c0:c1] <= sbounds[5, c0:c1])
        )[None, None, :]
        # strict tnear < bound: a block entered exactly AT the current best
        # cannot beat it, and dead lanes (bound == tmin == 0) stay closed
        hit = (tnear <= tfar) & (tnear < bound_t) & unswept & vb
        open_acc = open_acc | hit.any(-1)
    return open_acc.reshape(-1)[:n]


def super_bounds_jnp(bounds, super_: int = DEFAULT_SUPER):
    """jnp version of super_bounds (for traced callers) -> [8, nsb]."""
    nb = bounds.shape[1]
    nsb = nb // super_
    lo = bounds[0:3, : nsb * super_].reshape(3, nsb, super_).min(axis=2)
    hi = bounds[3:6, : nsb * super_].reshape(3, nsb, super_).max(axis=2)
    return jnp.concatenate([lo, hi, jnp.zeros((2, nsb), bounds.dtype)])


def tile_start_offsets(origins, centroids, tile: int) -> jnp.ndarray:
    """Per-ray-tile start superblock: the Morton-order superblock nearest the
    tile's mean ray origin. origins: Vec3 of [N]. -> [n_tiles] i32.

    Cheap XLA-side prep per sweep: [n_tiles, nsb] distance matrix argmin.
    """
    n = origins.x.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    pad = n_pad - n

    def mean_tiles(c):
        if pad:
            c = jnp.concatenate([c, jnp.zeros(pad, c.dtype)])
        return c.reshape(-1, tile).mean(axis=1)

    cx, cy, cz = mean_tiles(origins.x), mean_tiles(origins.y), mean_tiles(origins.z)
    d2 = (
        (cx[:, None] - centroids[None, :, 0]) ** 2
        + (cy[:, None] - centroids[None, :, 1]) ** 2
        + (cz[:, None] - centroids[None, :, 2]) ** 2
    )
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def _tile_hits_block(rays, bounds_ref, tb, tmax_row=None):
    """Scalar: does ANY ray in the [8, TILE] tile hit block tb's AABB?

    bounds_ref: scalar-prefetch SMEM ref [8, n_blocks]; scalar reads at
    column tb (the block index).
    """
    tmin = rays[6, :]
    tmax = rays[7, :] if tmax_row is None else tmax_row
    tnear = tmin
    tfar = tmax
    for c in range(3):
        o = rays[c, :]
        d = rays[3 + c, :]
        inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
        t0 = (bounds_ref[c, tb] - o) * inv
        t1 = (bounds_ref[3 + c, tb] - o) * inv
        tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
        tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
    # inverted (empty/pad) boxes pass the min/max slab math ([-inf, +inf]);
    # reject them explicitly so empty blocks never trigger MT passes
    valid = bounds_ref[0, tb] <= bounds_ref[3, tb]
    return jnp.any(tnear <= tfar) & valid


# ---------------------------------------------------------------------------
# MXU variant: Moller-Trumbore as matmuls.
#
# The four MT reductions are BILINEAR in ray/triangle features:
#   det   = d . (-n)                       (n = e1 x e2)
#   t*det = o . n - (v0 . n)
#   u*det = (o x d) . e2  - d . (e2 x v0)
#   v*det = -(o x d) . e1 + d . (e1 x v0)
# With ray features R = [d, o x d, o, 1] (10, padded to 16 sublanes) and a
# per-triangle [TBLK, 16] feature matrix per output, each (ray-tile,
# tri-block) cell is 4 small matmuls on the MXU + a ~14-op elementwise
# epilogue on the VPU — vs ~60 VPU ops/pair for the direct form. The MXU
# does fp32 via bf16x3 passes (float32-accurate).
# ---------------------------------------------------------------------------

_FDIM = 16  # feature rows (10 used, padded for sublane tiling)


def pack_tris_mxu(v0, e1, e2, geom_mask, tblk: int = DEFAULT_TBLK, super_: int = DEFAULT_SUPER):
    """Triangle features for the MXU kernel.

    Returns (feats [4, T, 16] f32, mask [1, T] f32). Output order:
    0=det, 1=t*det, 2=u*det, 3=v*det.
    """
    t = v0.shape[0]
    t_pad = _pad_count(t, tblk, super_)
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    n = np.cross(e1, e2)
    e2xv0 = np.cross(e2, v0)
    e1xv0 = np.cross(e1, v0)
    feats = np.zeros((4, t_pad, _FDIM), np.float32)
    # R layout rows: [0:3]=d, [3:6]=o x d, [6:9]=o, [9]=1
    feats[0, :t, 0:3] = -n
    feats[1, :t, 6:9] = n
    feats[1, :t, 9] = -np.sum(v0 * n, axis=-1)
    feats[2, :t, 0:3] = -e2xv0
    feats[2, :t, 3:6] = e2
    feats[3, :t, 0:3] = e1xv0
    feats[3, :t, 3:6] = -e1
    mask = np.zeros((1, t_pad), np.float32)
    mask[0, :t] = np.asarray(geom_mask, np.float32)
    import jax.numpy as _jnp

    return _jnp.asarray(feats), _jnp.asarray(mask)


def pack_tris_mxu_local(
    v0, e1, e2, geom_mask, tblk: int = DEFAULT_TBLK, super_: int = DEFAULT_SUPER,
    bounds=None,
):
    """Superblock-LOCAL MXU features (big-scene variant of pack_tris_mxu).

    Triangles are translated to their superblock's anchor (the center of its
    first sub-block AABB) before the feature products are formed, and the
    kernels rebuild the ray features with the same anchor subtracted from
    the origin (_ray_features_local). Moller-Trumbore is translation-
    invariant, so t/u/v are exactly the world-space values.

    Why: the o x d and e x v0 feature products carry |world position|
    factors; their difference (the useful signal) is ~|tri size|. At
    box_field scale (|o| ~ 13, tris ~ 0.2) the bf16x3 matmul passes lose the
    cancellation bits — measured 47% bad-t / 7% fabricated hits vs an f64
    oracle — which is why the MXU path was small-scene-only. Local anchors
    shrink the magnitudes to superblock radius, the cornell-class regime
    where bf16x3 is proven artifact-free. Feature products are formed in
    f64 at pack time (free accuracy, host-side once per scene).

    Anchor consistency contract: the kernel derives the anchor from the
    ALREADY-PREFETCHED block_bounds via (lo + hi) * 0.5 in f32 (_sb_anchor);
    this function computes it from the same block_bounds output with the
    same f32 ops — bit-identical, no extra kernel input.
    """
    t = v0.shape[0]
    t_pad = _pad_count(t, tblk, super_)
    nsb = t_pad // (tblk * super_)
    # pass the scene's block_bounds output so the anchor contract is enforced
    # by construction (the kernels read anchors from THAT array's SMEM copy)
    b = np.asarray(
        bounds
        if bounds is not None
        else block_bounds(v0, e1, e2, geom_mask, tblk=tblk, super_=super_)
    )
    first = np.arange(nsb) * super_
    anchors = (b[0:3, first] + b[3:6, first]) * np.float32(0.5)  # [3, nsb] f32
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    # per-tri anchor (tris are block-contiguous after the Morton sort)
    tri_sb = np.minimum(np.arange(t) // (tblk * super_), nsb - 1)
    v0l = v0 - anchors.T.astype(np.float64)[tri_sb]
    n = np.cross(e1, e2)
    e2xv0 = np.cross(e2, v0l)
    e1xv0 = np.cross(e1, v0l)
    feats = np.zeros((4, t_pad, _FDIM), np.float32)
    feats[0, :t, 0:3] = -n
    feats[1, :t, 6:9] = n
    feats[1, :t, 9] = -np.sum(v0l * n, axis=-1)
    feats[2, :t, 0:3] = -e2xv0
    feats[2, :t, 3:6] = e2
    feats[3, :t, 0:3] = e1xv0
    feats[3, :t, 3:6] = -e1
    mask = np.zeros((1, t_pad), np.float32)
    mask[0, :t] = np.asarray(geom_mask, np.float32)
    import jax.numpy as _jnp

    return _jnp.asarray(feats), _jnp.asarray(mask)


def _ray_features(rays):
    """[16, TILE] feature rows from the [8, TILE] ray block."""
    o = rays[0:3, :]
    d = rays[3:6, :]
    oxd = jnp.stack(
        [
            o[1] * d[2] - o[2] * d[1],
            o[2] * d[0] - o[0] * d[2],
            o[0] * d[1] - o[1] * d[0],
        ]
    )
    ones = jnp.ones_like(rays[0:1, :])
    zeros = jnp.zeros((_FDIM - 10, rays.shape[1]), rays.dtype)
    return jnp.concatenate([d, oxd, o, ones, zeros], axis=0)


def _sb_anchor(bounds_ref, first_blk):
    """Superblock local-frame anchor: center of its FIRST sub-block AABB.

    MUST match pack_tris_mxu_local bit-for-bit — same (lo + hi) * 0.5 in f32
    on the same block_bounds values (IEEE ops, deterministic both sides)."""
    ax = (bounds_ref[0, first_blk] + bounds_ref[3, first_blk]) * 0.5
    ay = (bounds_ref[1, first_blk] + bounds_ref[4, first_blk]) * 0.5
    az = (bounds_ref[2, first_blk] + bounds_ref[5, first_blk]) * 0.5
    return ax, ay, az


def _ray_features_local(rays, bounds_ref, first_blk):
    """[16, TILE] ray features with origins re-anchored to the superblock's
    local frame (see pack_tris_mxu_local: translation shrinks the o x d /
    e x v0 product magnitudes so the bf16x3 MXU passes keep the MT
    cancellation bits at any world scale — MT itself is translation-
    invariant, so t/u/v are unchanged)."""
    ax, ay, az = _sb_anchor(bounds_ref, first_blk)
    ox = rays[0, :] - ax
    oy = rays[1, :] - ay
    oz = rays[2, :] - az
    d = rays[3:6, :]
    oxd = jnp.stack(
        [
            oy * d[2] - oz * d[1],
            oz * d[0] - ox * d[2],
            ox * d[1] - oy * d[0],
        ]
    )
    o = jnp.stack([ox, oy, oz])
    ones = jnp.ones_like(rays[0:1, :])
    zeros = jnp.zeros((_FDIM - 10, rays.shape[1]), rays.dtype)
    return jnp.concatenate([d, oxd, o, ones, zeros], axis=0)


def _mt_block_mxu(rt, rays, feats, mask_row, ray_mask: int, tmax_row=None, precision=None):
    """(t, valid) [TBLK, TILE] via 4 MXU matmuls + VPU epilogue.

    rt: precomputed [16, TILE] ray features. precision None -> MXU default
    (bf16x3 passes): ~2x faster than the VPU kernel; made artifact-free by
    the exclude-prim guard (self-hits rejected by id, not epsilon). Pass
    jax.lax.Precision.HIGHEST (bf16x6 == f32-exact) for bit-parity runs.
    """
    tmin = rays[6, :][None, :]
    tmax = (rays[7, :] if tmax_row is None else tmax_row)[None, :]
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision
    )
    det = dot(feats[0], rt)
    tdet = dot(feats[1], rt)
    udet = dot(feats[2], rt)
    vdet = dot(feats[3], rt)
    # det==0 needs no explicit guard (see _mt_block): inf/NaN u,v,t fail the
    # ordered compares below — saves abs+compare+select on [TBLK, TILE]
    inv = 1.0 / det
    u = udet * inv
    v = vdet * inv
    t = tdet * inv
    # reshape the int32 BEFORE the bool compare (Mosaic: minor-dim insertion
    # is only supported for 32-bit types)
    mask_i = mask_row.astype(jnp.int32).reshape(-1, 1)  # [TBLK, 1]
    valid = (
        (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < tmax)
        & ((mask_i & ray_mask) != 0)
    )
    return t, valid


def _closest_kernel_mxu(
    sbounds_ref, bounds_ref, starts_ref, rays_ref, excl_ref, feats_ref, mask_ref,
    t_ref, prim_ref, *, ray_mask: int, tblk: int, super_: int, precision=None,
    local: bool = False,
):
    r = pl.program_id(0)
    k = pl.program_id(1)
    nsb = pl.num_programs(1)
    sb = _block_of(starts_ref, r, k, nsb)

    @pl.when(k == 0)
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        prim_ref[:, :] = jnp.full_like(prim_ref[:, :], -1)

    rays = rays_ref[:, :]
    super_hit = _tile_hits_block(rays, sbounds_ref, sb, tmax_row=t_ref[0, :])

    @pl.when(super_hit)
    def _super():
        tile = rays.shape[1]
        rt = (
            _ray_features_local(rays, bounds_ref, sb * super_)
            if local
            else _ray_features(rays)
        )
        excl = excl_ref[0, :][None, :]
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=t_ref[0, :])

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                t, valid = _mt_block_mxu(
                    rt, rays, feats_ref[:, j * tblk : (j + 1) * tblk, :],
                    mask_ref[0, j * tblk : (j + 1) * tblk], ray_mask,
                    tmax_row=t_ref[0, :], precision=precision,
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                bt, bp = _fold_closest_packed(
                    t, valid, t_ref[0, :], prim_ref[0, :], blk, tblk
                )
                t_ref[0, :] = bt
                prim_ref[0, :] = bp


def _any_kernel_mxu(
    sbounds_ref, bounds_ref, starts_ref, rays_ref, excl_ref, feats_ref, mask_ref,
    occ_ref, *, ray_mask: int, tblk: int, super_: int, precision=None,
    local: bool = False,
):
    r = pl.program_id(0)
    k = pl.program_id(1)
    nsb = pl.num_programs(1)
    sb = _block_of(starts_ref, r, k, nsb)

    @pl.when(k == 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    rays = rays_ref[:, :]
    live_tmax = jnp.where(occ_ref[0, :], 0.0, rays[7, :])
    super_hit = _tile_hits_block(rays, sbounds_ref, sb, tmax_row=live_tmax)

    @pl.when(super_hit)
    def _super():
        tile = rays.shape[1]
        rt = (
            _ray_features_local(rays, bounds_ref, sb * super_)
            if local
            else _ray_features(rays)
        )
        excl = excl_ref[0, :][None, :]
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=live_tmax)

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                _, valid = _mt_block_mxu(
                    rt, rays, feats_ref[:, j * tblk : (j + 1) * tblk, :],
                    mask_ref[0, j * tblk : (j + 1) * tblk], ray_mask,
                    precision=precision,
                )
                valid = valid & (_prim_ids(blk, tblk, tile) != excl)
                occ_ref[0, :] = occ_ref[0, :] | jnp.any(valid, axis=0)


def _prep_common(origins, directions, tmin, tmax, exclude, starts, tile, nsb):
    """Shared ray/exclude/order packing for all four kernel wrappers.

    starts: None | [n_tiles] i32 (legacy start offsets -> rotated iota rows)
    | [n_tiles, nsb] i32 full per-tile sweep order."""
    n = tmin.shape[0]
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    excl = _pack_exclude(exclude, n, n_pad)
    n_tiles = n_pad // tile
    iota = jnp.arange(nsb, dtype=jnp.int32)
    if starts is None:
        order = jnp.broadcast_to(iota[None, :], (n_tiles, nsb))
    elif starts.ndim == 2:
        order = jnp.clip(starts.astype(jnp.int32), 0, nsb - 1)
    else:
        s0 = jnp.clip(starts.astype(jnp.int32), 0, nsb - 1)
        rot = s0[:, None] + iota[None, :]
        order = jnp.where(rot >= nsb, rot - nsb, rot)
    return rays, excl, order, n, n_pad, n_tiles


@functools.partial(
    jax.jit,
    static_argnames=("ray_mask", "tile", "tblk", "super_", "interpret", "precision", "local"),
)
def pallas_intersect_closest_mxu(
    feats: jnp.ndarray,  # [4, T, 16] (pack_tris_mxu)
    mask: jnp.ndarray,  # [1, T]
    bounds: jnp.ndarray,  # [8, n_blocks] (block_bounds)
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,  # [N] i32 origin prim (-1 none)
    starts: jnp.ndarray | None = None,  # [n_tiles] i32 superblock offsets
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    interpret: bool = False,
    precision=None,
    local: bool = False,  # superblock-local feats (pack_tris_mxu_local)
):
    t_total = feats.shape[1]
    step = tblk * super_
    nsb = t_total // step
    sbounds = jnp.concatenate(
        [
            bounds[0:3].reshape(3, nsb, super_).min(axis=2),
            bounds[3:6].reshape(3, nsb, super_).max(axis=2),
            jnp.zeros((2, nsb), bounds.dtype),
        ]
    )
    rays, excl, starts, n, n_pad, n_tiles = _prep_common(
        origins, directions, tmin, tmax, exclude, starts, tile, nsb
    )
    # the sweep length follows the order table width: a [n_tiles, K] table
    # with K < nsb sweeps only each tile's K nearest superblocks (phase 1 of
    # the residual two-pass scheme)
    grid = (n_tiles, starts.shape[1])
    kernel = functools.partial(
        _closest_kernel_mxu, ray_mask=ray_mask, tblk=tblk, super_=super_, precision=precision,
        local=local,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, step, _FDIM),
                lambda r, k, sb, b, starts: (0, _block_of(starts, r, k, nsb), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, step),
                lambda r, k, sb, b, starts: (0, _block_of(starts, r, k, nsb)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * _FDIM * n_pad * t_total,
            bytes_accessed=4 * (8 * n_pad + 4 * _FDIM * t_total),
            transcendentals=0,
        ),
        interpret=interpret,
    )(sbounds, bounds, starts, rays, excl, feats, mask)
    t = t_out[0, :n]
    prim = prim_out[0, :n]
    return jnp.where(prim >= 0, t, _BIG), prim


@functools.partial(
    jax.jit,
    static_argnames=("ray_mask", "tile", "tblk", "super_", "interpret", "precision", "local"),
)
def pallas_intersect_any_mxu(
    feats: jnp.ndarray,
    mask: jnp.ndarray,
    bounds: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    starts: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    interpret: bool = False,
    precision=None,
    local: bool = False,  # superblock-local feats (pack_tris_mxu_local)
):
    t_total = feats.shape[1]
    step = tblk * super_
    nsb = t_total // step
    sbounds = jnp.concatenate(
        [
            bounds[0:3].reshape(3, nsb, super_).min(axis=2),
            bounds[3:6].reshape(3, nsb, super_).max(axis=2),
            jnp.zeros((2, nsb), bounds.dtype),
        ]
    )
    rays, excl, starts, n, n_pad, n_tiles = _prep_common(
        origins, directions, tmin, tmax, exclude, starts, tile, nsb
    )
    # the sweep length follows the order table width: a [n_tiles, K] table
    # with K < nsb sweeps only each tile's K nearest superblocks (phase 1 of
    # the residual two-pass scheme)
    grid = (n_tiles, starts.shape[1])
    kernel = functools.partial(
        _any_kernel_mxu, ray_mask=ray_mask, tblk=tblk, super_=super_, precision=precision,
        local=local,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, step, _FDIM),
                lambda r, k, sb, b, starts: (0, _block_of(starts, r, k, nsb), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, step),
                lambda r, k, sb, b, starts: (0, _block_of(starts, r, k, nsb)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
    )
    occ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(sbounds, bounds, starts, rays, excl, feats, mask)
    return occ[0, :n]


def _pack_rays(origins, directions, tmin, tmax, tile):
    """origins/directions: Vec3 of [N] (component-major — no transposes)."""
    from strelka_tpu.ops.vec import Vec3, from_rows

    if not isinstance(origins, Vec3):
        origins = from_rows(origins)
    if not isinstance(directions, Vec3):
        directions = from_rows(directions)
    n = tmin.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    rows = [origins.x, origins.y, origins.z, directions.x, directions.y, directions.z, tmin, tmax]
    if n_pad != n:
        pad = n_pad - n
        rows = [jnp.concatenate([r, jnp.zeros(pad, jnp.float32)]) for r in rows]
    # padded rays: tmax 0 -> no hits
    return jnp.stack(rows), n_pad


def _pack_exclude(exclude, n: int, n_pad: int) -> jnp.ndarray:
    """[1, n_pad] i32 origin-prim ids (-1 = none)."""
    if exclude is None:
        return jnp.full((1, n_pad), -1, jnp.int32)
    exclude = exclude.astype(jnp.int32)
    if n_pad != n:
        exclude = jnp.concatenate([exclude, jnp.full(n_pad - n, -1, jnp.int32)])
    return exclude[None, :]


def pack_tris(v0, e1, e2, geom_mask, tblk: int = DEFAULT_TBLK, super_: int = DEFAULT_SUPER):
    """Host-side packing of triangle SoA to the [12, T] kernel layout."""
    t = v0.shape[0]
    t_pad = _pad_count(t, tblk, super_)
    tris = jnp.zeros((12, t_pad), jnp.float32)
    tris = tris.at[0:3, :t].set(jnp.asarray(v0).T)
    tris = tris.at[3:6, :t].set(jnp.asarray(e1).T)
    tris = tris.at[6:9, :t].set(jnp.asarray(e2).T)
    tris = tris.at[9, :t].set(jnp.asarray(geom_mask).astype(jnp.float32))
    return tris


@functools.partial(
    jax.jit, static_argnames=("ray_mask", "tile", "tblk", "super_", "interpret")
)
def pallas_intersect_closest(
    tris_packed: jnp.ndarray,  # [12, T] (pack_tris)
    bounds: jnp.ndarray,  # [8, n_blocks] (block_bounds)
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    starts: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    interpret: bool = False,
):
    """Dense exact-f32 closest-hit sweep, block-culled -> (t [N], prim [N])."""
    t_total = tris_packed.shape[1]
    step = tblk * super_
    nsb = t_total // step
    sbounds = jnp.concatenate(
        [
            bounds[0:3].reshape(3, nsb, super_).min(axis=2),
            bounds[3:6].reshape(3, nsb, super_).max(axis=2),
            jnp.zeros((2, nsb), bounds.dtype),
        ]
    )
    rays, excl, starts, n, n_pad, n_tiles = _prep_common(
        origins, directions, tmin, tmax, exclude, starts, tile, nsb
    )
    # the sweep length follows the order table width: a [n_tiles, K] table
    # with K < nsb sweeps only each tile's K nearest superblocks (phase 1 of
    # the residual two-pass scheme)
    grid = (n_tiles, starts.shape[1])
    kernel = functools.partial(_closest_kernel, ray_mask=ray_mask, tblk=tblk, super_=super_)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (12, step),
                lambda r, k, sb, b, starts: (0, _block_of(starts, r, k, nsb)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * n_pad * t_total, bytes_accessed=4 * (8 * n_pad + 12 * t_total), transcendentals=0
        ),
        interpret=interpret,
    )(sbounds, bounds, starts, rays, excl, tris_packed)
    t = t_out[0, :n]
    prim = prim_out[0, :n]
    t = jnp.where(prim >= 0, t, _BIG)
    return t, prim


@functools.partial(
    jax.jit, static_argnames=("ray_mask", "tile", "tblk", "super_", "interpret")
)
def pallas_intersect_any(
    tris_packed: jnp.ndarray,
    bounds: jnp.ndarray,  # [8, n_blocks] (block_bounds)
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    starts: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    super_: int = DEFAULT_SUPER,
    interpret: bool = False,
):
    """Dense any-hit (occlusion) sweep, exact f32, block-culled -> [N] bool."""
    t_total = tris_packed.shape[1]
    step = tblk * super_
    nsb = t_total // step
    sbounds = jnp.concatenate(
        [
            bounds[0:3].reshape(3, nsb, super_).min(axis=2),
            bounds[3:6].reshape(3, nsb, super_).max(axis=2),
            jnp.zeros((2, nsb), bounds.dtype),
        ]
    )
    rays, excl, starts, n, n_pad, n_tiles = _prep_common(
        origins, directions, tmin, tmax, exclude, starts, tile, nsb
    )
    # the sweep length follows the order table width: a [n_tiles, K] table
    # with K < nsb sweeps only each tile's K nearest superblocks (phase 1 of
    # the residual two-pass scheme)
    grid = (n_tiles, starts.shape[1])
    kernel = functools.partial(_any_kernel, ray_mask=ray_mask, tblk=tblk, super_=super_)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (12, step),
                lambda r, k, sb, b, starts: (0, _block_of(starts, r, k, nsb)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
    )
    occ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(sbounds, bounds, starts, rays, excl, tris_packed)
    return occ[0, :n]


def recompute_barycentrics(scene_v0, scene_e1, scene_e2, origins, directions, prim):
    """(u, v) for the winning primitive — one gather + MT per ray in XLA
    (standalone gathers are fast; only in-loop gathers are not)."""
    from strelka_tpu.ops import vec as V
    from strelka_tpu.ops.vec import Vec3

    if not isinstance(origins, Vec3):
        origins = V.from_rows(origins)
    if not isinstance(directions, Vec3):
        directions = V.from_rows(directions)
    p = jnp.maximum(prim, 0)
    v0 = V.gather_rows(scene_v0, p)
    e1 = V.gather_rows(scene_e1, p)
    e2 = V.gather_rows(scene_e2, p)
    pvec = V.cross(directions, e2)
    det = V.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origins - v0
    u = V.dot(tvec, pvec) * inv_det
    qvec = V.cross(tvec, e1)
    v = V.dot(directions, qvec) * inv_det
    return u, v


# ---------------------------------------------------------------------------
# FLAT kernels (round-1 structure): grid (ray tiles, tri blocks) with one MT
# pass per step and 1D rotate-offset sweep order. Measured FASTER than the
# superblock kernels on small scenes (cornell e2e 158 vs 265 ms) where
# per-step overhead and culling don't matter; the dispatcher picks them below
# the superblock crossover (intersect.py).
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Small-scene MXU kernels: the WHOLE triangle set resides in VMEM (feats for
# 8192 tris = 2.1 MB), so the grid is 1-D over ray tiles and the kernel loops
# blocks in registers. vs the 2-D flat kernels this removes the per-cell
# ray-feature recompute, the t_ref read->write serialization between grid
# steps (which stalls the matmul pipeline), and the per-cell when-guards
# (useless when every block is hit, as in cornell-class interiors).
# ---------------------------------------------------------------------------

SMALL_MXU_MAX_TRIS = 8192
# fused whole-scene matmul form of the small kernels (one [4T,16]x[16,TILE]
# MXU pass instead of 4*nb separate K=16 matmuls). Measured NEUTRAL on
# cornell (101 vs 100 ms e2e at tile=1024, 104 at 512): the sweeps are
# VPU-epilogue-bound, not pipeline-drain-bound. Kept as an A/B toggle.
_MXU_SMALL_FUSED = os.environ.get("STRELKA_MXU_SMALL_FUSED", "0") == "1"
_FUSED_TILE = int(os.environ.get("STRELKA_FUSED_TILE", "1024"))


def _fold_closest_packed(t, valid, best_t, best_p, blk, tblk: int):
    """Single-reduction closest fold: pack (t, row) into one sortable i32.

    t > 0 so its f32 bit pattern is order-preserving; the low 8 bits carry
    the row id after rounding t's bits UP (conservative: the recovered t is
    >= the true t, so tmax pruning can never reject a genuinely closer hit).
    Quantizes t to ~1.5e-5 relative — far below the bf16x3 matmul noise of
    the MXU intersectors this fold serves. Replaces min + argmin + merge
    (three [TBLK, TILE] reduction passes) with ONE min.
    """
    assert tblk <= 256
    rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    bits = jax.lax.bitcast_convert_type(t, jnp.int32)
    key = ((bits + 0xFF) & ~0xFF) | rows
    key = jnp.where(valid, key, jnp.int32(0x7F800000))  # +inf pattern
    kmin = jnp.min(key, axis=0)
    tq = jax.lax.bitcast_convert_type(kmin & ~0xFF, jnp.float32)
    better = tq < best_t
    best_p = jnp.where(better, blk * tblk + (kmin & 0xFF), best_p)
    best_t = jnp.where(better, tq, best_t)
    return best_t, best_p


def _closest_kernel_mxu_small(
    rays_ref, excl_ref, feats_ref, mask_ref, t_ref, prim_ref,
    *, ray_mask: int, tblk: int, nb: int, precision=None,
):
    rays = rays_ref[:, :]
    tile = rays.shape[1]
    # dead-tile skip: terminated lanes carry tmax <= tmin; once the
    # integrator clusters them to the wavefront tail (flat-compact), a whole
    # tile of them costs one reduction instead of nb matmul sweeps
    t_ref[0, :] = rays[7, :]
    prim_ref[0, :] = jnp.full((tile,), -1, jnp.int32)

    @pl.when(jnp.any(rays[7, :] > rays[6, :]))
    def _live():
        rt = _ray_features(rays)
        excl = excl_ref[0, :][None, :]
        best_t = rays[7, :]
        best_p = jnp.full((tile,), -1, jnp.int32)
        for k in range(nb):
            t, valid = _mt_block_mxu(
                rt, rays, feats_ref[:, k * tblk : (k + 1) * tblk, :],
                mask_ref[0, k * tblk : (k + 1) * tblk], ray_mask,
                tmax_row=best_t, precision=precision,
            )
            valid = valid & (_prim_ids(k, tblk, tile) != excl)
            best_t, best_p = _fold_closest_packed(t, valid, best_t, best_p, k, tblk)
        t_ref[0, :] = best_t
        prim_ref[0, :] = best_p


def _mt_all_mxu(rays, rt, feats2_ref, mask_ref, excl_ref, ray_mask: int, t_total: int, precision):
    """Whole-scene MT for the small kernels: ONE [4T, 16] x [16, TILE]
    matmul (the per-block form issues 4*nb K=16 matmuls, each padded to
    K=128 by the systolic array and separated by a pipeline drain — ~8x the
    effective flops and most of the sweep time).  Returns (t, valid)
    [T, TILE]."""
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision
    )
    out = dot(feats2_ref[:, :], rt)  # [4T, TILE]
    det = out[0:t_total]
    tdet = out[t_total : 2 * t_total]
    udet = out[2 * t_total : 3 * t_total]
    vdet = out[3 * t_total : 4 * t_total]
    inv = 1.0 / det  # det==0 self-rejects via inf/NaN compares (_mt_block)
    u = udet * inv
    v = vdet * inv
    t = tdet * inv
    tmin = rays[6, :][None, :]
    tmax = rays[7, :][None, :]
    tile = rays.shape[1]
    mask_i = mask_ref[0, :].astype(jnp.int32).reshape(-1, 1)
    valid = (
        (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < tmax)
        & ((mask_i & ray_mask) != 0)
        & (_prim_ids(0, t_total, tile) != excl_ref[0, :][None, :])
    )
    return t, valid


def _closest_kernel_mxu_small_fused(
    rays_ref, excl_ref, feats2_ref, mask_ref, t_ref, prim_ref,
    *, ray_mask: int, t_total: int, precision=None,
):
    rays = rays_ref[:, :]
    rt = _ray_features(rays)
    t, valid = _mt_all_mxu(rays, rt, feats2_ref, mask_ref, excl_ref, ray_mask, t_total, precision)
    # packed single-reduction argmin over the WHOLE scene: low bits = row id
    row_bits = max(8, (t_total - 1).bit_length())
    lo_mask = (1 << row_bits) - 1
    rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    bits = jax.lax.bitcast_convert_type(t, jnp.int32)
    key = ((bits + lo_mask) & ~lo_mask) | rows
    key = jnp.where(valid, key, jnp.int32(0x7F800000))
    kmin = jnp.min(key, axis=0)
    tq = jax.lax.bitcast_convert_type(kmin & ~lo_mask, jnp.float32)
    hit = tq < rays[7, :]
    t_ref[0, :] = jnp.where(hit, tq, rays[7, :])
    prim_ref[0, :] = jnp.where(hit, kmin & lo_mask, -1)


def _any_kernel_mxu_small_fused(
    rays_ref, excl_ref, feats2_ref, mask_ref, occ_ref,
    *, ray_mask: int, t_total: int, precision=None,
):
    rays = rays_ref[:, :]
    rt = _ray_features(rays)
    _, valid = _mt_all_mxu(rays, rt, feats2_ref, mask_ref, excl_ref, ray_mask, t_total, precision)
    occ_ref[0, :] = jnp.any(valid, axis=0)


def _any_kernel_mxu_small(
    rays_ref, excl_ref, feats_ref, mask_ref, occ_ref,
    *, ray_mask: int, tblk: int, nb: int, precision=None,
):
    rays = rays_ref[:, :]
    tile = rays.shape[1]
    occ_ref[0, :] = jnp.zeros((tile,), jnp.bool_)

    @pl.when(jnp.any(rays[7, :] > rays[6, :]))
    def _live():
        rt = _ray_features(rays)
        excl = excl_ref[0, :][None, :]
        occ = jnp.zeros((tile,), jnp.bool_)
        for k in range(nb):
            _, valid = _mt_block_mxu(
                rt, rays, feats_ref[:, k * tblk : (k + 1) * tblk, :],
                mask_ref[0, k * tblk : (k + 1) * tblk], ray_mask, precision=precision,
            )
            valid = valid & (_prim_ids(k, tblk, tile) != excl)
            occ = occ | jnp.any(valid, axis=0)
        occ_ref[0, :] = occ


@functools.partial(jax.jit, static_argnames=("ray_mask", "tile", "tblk", "interpret", "precision"))
def pallas_intersect_closest_mxu_small(
    feats: jnp.ndarray,  # [4, T, 16] (pack_tris_mxu)
    mask: jnp.ndarray,  # [1, T]
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    interpret: bool = False,
    precision=None,
):
    t_total = feats.shape[1]
    nb = t_total // tblk
    if _MXU_SMALL_FUSED:
        tile = min(tile, _FUSED_TILE)
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    n_tiles = n_pad // tile
    if _MXU_SMALL_FUSED:
        kernel = functools.partial(
            _closest_kernel_mxu_small_fused, ray_mask=ray_mask, t_total=t_total,
            precision=precision,
        )
        feats_in = feats.reshape(4 * t_total, _FDIM)  # type-major row groups
        feats_spec = pl.BlockSpec((4 * t_total, _FDIM), lambda r: (0, 0), memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(
            _closest_kernel_mxu_small, ray_mask=ray_mask, tblk=tblk, nb=nb, precision=precision
        )
        feats_in = feats
        feats_spec = pl.BlockSpec((4, t_total, _FDIM), lambda r: (0, 0, 0), memory_space=pltpu.VMEM)
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
            feats_spec,
            pl.BlockSpec((1, t_total), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * _FDIM * n_pad * t_total,
            bytes_accessed=4 * (8 * n_pad + 4 * _FDIM * t_total),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rays, excl, feats_in, mask)
    t = t_out[0, :n]
    prim = prim_out[0, :n]
    return jnp.where(prim >= 0, t, _BIG), prim


@functools.partial(jax.jit, static_argnames=("ray_mask", "tile", "tblk", "interpret", "precision"))
def pallas_intersect_any_mxu_small(
    feats: jnp.ndarray,
    mask: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    interpret: bool = False,
    precision=None,
):
    t_total = feats.shape[1]
    nb = t_total // tblk
    if _MXU_SMALL_FUSED:
        tile = min(tile, _FUSED_TILE)
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    n = tmin.shape[0]
    excl = _pack_exclude(exclude, n, n_pad)
    n_tiles = n_pad // tile
    if _MXU_SMALL_FUSED:
        kernel = functools.partial(
            _any_kernel_mxu_small_fused, ray_mask=ray_mask, t_total=t_total,
            precision=precision,
        )
        feats_in = feats.reshape(4 * t_total, _FDIM)
        feats_spec = pl.BlockSpec((4 * t_total, _FDIM), lambda r: (0, 0), memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(
            _any_kernel_mxu_small, ray_mask=ray_mask, tblk=tblk, nb=nb, precision=precision
        )
        feats_in = feats
        feats_spec = pl.BlockSpec((4, t_total, _FDIM), lambda r: (0, 0, 0), memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
            feats_spec,
            pl.BlockSpec((1, t_total), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda r: (0, r), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(rays, excl, feats_in, mask)
    return occ[0, :n]


def _prep_common_flat(origins, directions, tmin, tmax, exclude, starts, tile, nb):
    """Shared ray/exclude/starts packing for all four kernel wrappers."""
    n = tmin.shape[0]
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    excl = _pack_exclude(exclude, n, n_pad)
    n_tiles = n_pad // tile
    if starts is None:
        starts = jnp.zeros(n_tiles, jnp.int32)
    else:
        starts = jnp.clip(starts.astype(jnp.int32), 0, nb - 1)
    return rays, excl, starts, n, n_pad, n_tiles



def _block_of_flat(starts_ref, r, k, nb: int):
    """Per-tile block schedule: walk the Morton order from the tile's start
    offset outward (Morton locality => approximately near-to-far)."""
    s = starts_ref[r] + k
    return jnp.where(s >= nb, s - nb, s)



def _closest_kernel_flat(
    bounds_ref, starts_ref, rays_ref, excl_ref, tris_ref, t_ref, prim_ref, *, ray_mask: int, tblk: int
):
    r = pl.program_id(0)
    k = pl.program_id(1)
    nb = pl.num_programs(1)
    blk = _block_of_flat(starts_ref, r, k, nb)

    @pl.when(k == 0)
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        prim_ref[:, :] = jnp.full_like(prim_ref[:, :], -1)

    rays = rays_ref[:, :]
    any_box = _tile_hits_block(rays, bounds_ref, blk, tmax_row=t_ref[0, :])

    @pl.when(any_box)
    def _work():
        # current best as tmax so farther hits are rejected cheaply
        t, valid = _mt_block(rays, tris_ref[:, :], ray_mask, tmax_row=t_ref[0, :])
        tile = rays.shape[1]
        valid = valid & (_prim_ids(blk, tblk, tile) != excl_ref[0, :][None, :])
        t_masked = jnp.where(valid, t, _BIG)
        blk_best = jnp.min(t_masked, axis=0)  # [TILE]
        blk_arg = jnp.argmin(t_masked, axis=0).astype(jnp.int32)
        better = blk_best < t_ref[0, :]
        t_ref[0, :] = jnp.where(better, blk_best, t_ref[0, :])
        prim_ref[0, :] = jnp.where(better, blk * tblk + blk_arg, prim_ref[0, :])



def _any_kernel_flat(
    bounds_ref, starts_ref, rays_ref, excl_ref, tris_ref, occ_ref, *, ray_mask: int, tblk: int
):
    r = pl.program_id(0)
    k = pl.program_id(1)
    nb = pl.num_programs(1)
    blk = _block_of_flat(starts_ref, r, k, nb)

    @pl.when(k == 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    rays = rays_ref[:, :]
    # progressive pruning: occluded lanes drop out of the slab test
    live_tmax = jnp.where(occ_ref[0, :], 0.0, rays[7, :])
    any_box = _tile_hits_block(rays, bounds_ref, blk, tmax_row=live_tmax)

    @pl.when(any_box)
    def _work():
        _, valid = _mt_block(rays, tris_ref[:, :], ray_mask)
        tile = rays.shape[1]
        valid = valid & (_prim_ids(blk, tblk, tile) != excl_ref[0, :][None, :])
        occ_ref[0, :] = occ_ref[0, :] | jnp.any(valid, axis=0)


# ---------------------------------------------------------------------------
# Block culling: Morton-sorted triangle blocks + per-cell AABB skip.
# ---------------------------------------------------------------------------



def _closest_kernel_mxu_flat(
    bounds_ref, starts_ref, rays_ref, excl_ref, feats_ref, mask_ref, t_ref, prim_ref,
    *, ray_mask: int, tblk: int, precision=None, local: bool = False,
):
    r = pl.program_id(0)
    k = pl.program_id(1)
    nb = pl.num_programs(1)
    blk = _block_of_flat(starts_ref, r, k, nb)

    @pl.when(k == 0)
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        prim_ref[:, :] = jnp.full_like(prim_ref[:, :], -1)

    # block culling: skip the whole cell when no ray can hit the block AABB
    rays = rays_ref[:, :]
    any_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=t_ref[0, :])

    @pl.when(any_hit)
    def _work():
        # flat packing has super_=1, so the local anchor is per-BLOCK
        rt = _ray_features_local(rays, bounds_ref, blk) if local else _ray_features(rays)
        t, valid = _mt_block_mxu(
            rt, rays, feats_ref[:, :, :], mask_ref[0, :], ray_mask,
            tmax_row=t_ref[0, :], precision=precision,
        )
        tile = rays.shape[1]
        valid = valid & (_prim_ids(blk, tblk, tile) != excl_ref[0, :][None, :])
        bt, bp = _fold_closest_packed(t, valid, t_ref[0, :], prim_ref[0, :], blk, tblk)
        t_ref[0, :] = bt
        prim_ref[0, :] = bp


def _any_kernel_mxu_flat(
    bounds_ref, starts_ref, rays_ref, excl_ref, feats_ref, mask_ref, occ_ref,
    *, ray_mask: int, tblk: int, precision=None, local: bool = False,
):
    r = pl.program_id(0)
    k = pl.program_id(1)
    nb = pl.num_programs(1)
    blk = _block_of_flat(starts_ref, r, k, nb)

    @pl.when(k == 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    rays = rays_ref[:, :]
    live_tmax = jnp.where(occ_ref[0, :], 0.0, rays[7, :])
    any_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=live_tmax)

    @pl.when(any_hit)
    def _work():
        rt = _ray_features_local(rays, bounds_ref, blk) if local else _ray_features(rays)
        _, valid = _mt_block_mxu(
            rt, rays, feats_ref[:, :, :], mask_ref[0, :], ray_mask, precision=precision
        )
        tile = rays.shape[1]
        valid = valid & (_prim_ids(blk, tblk, tile) != excl_ref[0, :][None, :])
        occ_ref[0, :] = occ_ref[0, :] | jnp.any(valid, axis=0)



@functools.partial(jax.jit, static_argnames=("ray_mask", "tile", "tblk", "interpret", "precision", "local"))
def pallas_intersect_closest_mxu_flat(
    feats: jnp.ndarray,  # [4, T, 16] (pack_tris_mxu)
    mask: jnp.ndarray,  # [1, T]
    bounds: jnp.ndarray,  # [8, n_blocks] (block_bounds)
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,  # [N] i32 origin prim (-1 none)
    starts: jnp.ndarray | None = None,  # [n_tiles] i32 block sweep offsets
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    interpret: bool = False,
    precision=None,
    local: bool = False,  # per-block-local feats (pack_tris_mxu_local, super_=1)
):
    t_total = feats.shape[1]
    nb = t_total // tblk
    rays, excl, starts, n, n_pad, n_tiles = _prep_common_flat(
        origins, directions, tmin, tmax, exclude, starts, tile, nb
    )
    grid = (n_tiles, nb)
    kernel = functools.partial(_closest_kernel_mxu_flat, ray_mask=ray_mask, tblk=tblk, precision=precision, local=local,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, tblk, _FDIM),
                lambda r, k, bounds, starts: (0, _block_of_flat(starts, r, k, nb), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tblk),
                lambda r, k, bounds, starts: (0, _block_of_flat(starts, r, k, nb)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * _FDIM * n_pad * t_total,
            bytes_accessed=4 * (8 * n_pad + 4 * _FDIM * t_total),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bounds, starts, rays, excl, feats, mask)
    t = t_out[0, :n]
    prim = prim_out[0, :n]
    return jnp.where(prim >= 0, t, _BIG), prim



@functools.partial(jax.jit, static_argnames=("ray_mask", "tile", "tblk", "interpret", "precision", "local"))
def pallas_intersect_any_mxu_flat(
    feats: jnp.ndarray,
    mask: jnp.ndarray,
    bounds: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    starts: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    interpret: bool = False,
    precision=None,
    local: bool = False,  # per-block-local feats (pack_tris_mxu_local, super_=1)
):
    t_total = feats.shape[1]
    nb = t_total // tblk
    rays, excl, starts, n, n_pad, n_tiles = _prep_common_flat(
        origins, directions, tmin, tmax, exclude, starts, tile, nb
    )
    grid = (n_tiles, nb)
    kernel = functools.partial(_any_kernel_mxu_flat, ray_mask=ray_mask, tblk=tblk, precision=precision, local=local,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, tblk, _FDIM),
                lambda r, k, bounds, starts: (0, _block_of_flat(starts, r, k, nb), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tblk),
                lambda r, k, bounds, starts: (0, _block_of_flat(starts, r, k, nb)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
    )
    occ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(bounds, starts, rays, excl, feats, mask)
    return occ[0, :n]



def pallas_intersect_closest_flat(
    tris_packed: jnp.ndarray,  # [12, T] (pack_tris)
    bounds: jnp.ndarray,  # [8, n_blocks] (block_bounds)
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    starts: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    interpret: bool = False,
):
    """Dense exact-f32 closest-hit sweep, block-culled -> (t [N], prim [N])."""
    t_total = tris_packed.shape[1]
    nb = t_total // tblk
    rays, excl, starts, n, n_pad, n_tiles = _prep_common_flat(
        origins, directions, tmin, tmax, exclude, starts, tile, nb
    )
    grid = (n_tiles, nb)
    kernel = functools.partial(_closest_kernel_flat, ray_mask=ray_mask, tblk=tblk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (12, tblk),
                lambda r, k, bounds, starts: (0, _block_of_flat(starts, r, k, nb)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * n_pad * t_total, bytes_accessed=4 * (8 * n_pad + 12 * t_total), transcendentals=0
        ),
        interpret=interpret,
    )(bounds, starts, rays, excl, tris_packed)
    t = t_out[0, :n]
    prim = prim_out[0, :n]
    t = jnp.where(prim >= 0, t, _BIG)
    return t, prim



def pallas_intersect_any_flat(
    tris_packed: jnp.ndarray,
    bounds: jnp.ndarray,  # [8, n_blocks] (block_bounds)
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    ray_mask: int,
    exclude: jnp.ndarray | None = None,
    starts: jnp.ndarray | None = None,
    tile: int = DEFAULT_TILE,
    tblk: int = DEFAULT_TBLK,
    interpret: bool = False,
):
    """Dense any-hit (occlusion) sweep, exact f32, block-culled -> [N] bool."""
    t_total = tris_packed.shape[1]
    nb = t_total // tblk
    rays, excl, starts, n, n_pad, n_tiles = _prep_common_flat(
        origins, directions, tmin, tmax, exclude, starts, tile, nb
    )
    grid = (n_tiles, nb)
    kernel = functools.partial(_any_kernel_flat, ray_mask=ray_mask, tblk=tblk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (12, tblk),
                lambda r, k, bounds, starts: (0, _block_of_flat(starts, r, k, nb)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
    )
    occ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(bounds, starts, rays, excl, tris_packed)
    return occ[0, :n]

