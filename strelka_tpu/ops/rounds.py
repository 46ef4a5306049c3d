"""Per-RAY superblock scheduling: grouped rounds traversal.

The residual two-pass (ops/intersect.py) schedules per ray TILE: phase 1
sweeps each tile's K nearest superblocks whether or not any lane needs
them — measured 3.4x over its flop floor on box_field, and NOTES fact #24
pins the wall: per-ray work == tile-union work, so ~4x further wins need
per-RAY block assignment. The missing piece was a grouping primitive much
cheaper than argsort (25 ms per 0.5M keys); ops/bucket_sort.py provides it.

This module is that scheduler — the TPU analogue of per-ray ordered BVH
traversal (the reference gets it from OptiX RT cores,
src/render/optix/OptixRender.cpp:1010):

  each round:
    1. every open lane picks its NEXT superblock: the unswept block with the
       smallest slab entry distance that could still beat the lane's bound
       (per-ray [N, nsb] slab tests, recomputed on the fly — never stored);
    2. lanes are physically regrouped block-pure (stable bucket sort by
       assigned block; closed lanes park in a tail group);
    3. ONE work-list sweep visits exactly the (tile, block) pairs the lanes
       asked for — a block-pure tile sweeps one superblock, boundary tiles
       at most a few.
  Lanes close when their next candidate's entry distance can no longer beat
  their best hit. The per-lane schedule cursor is the (entry, block-id)
  lexicographic pair (thresh, last) — ties at equal entry (common: several
  blocks containing the origin all clamp to tmin) advance by block id, so
  no tied block is ever skipped. After R rounds a final open test routes
  stragglers to the caller's residual finish: exactness never depends on R.

Recompute determinism: the slab entry formula is a fixed elementwise IEEE
mul/sub/min/max chain — XLA does not reassociate it, so re-evaluating it
in a later round (or the final open test) reproduces bit-identical values,
which the (>, ==) cursor comparisons rely on.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from strelka_tpu.ops.bucket_sort import bucket_sort_perm
from strelka_tpu.ops.vec import Vec3

_BIG = 1e16
_INF = jnp.float32(jnp.inf)

N_ROUNDS = int(_os.environ.get("STRELKA_ROUNDS", "6"))
ROUNDS_CAP = int(_os.environ.get("STRELKA_ROUNDS_CAP", "8"))  # wl pairs/tile


def ray_next_block(o: Vec3, d: Vec3, tmin, bound, sbounds, thresh, last,
                   chunk: int = 64):
    """Per-ray lexicographic-next superblock.

    Returns (tn [N] f32, blk [N] i32): the smallest (entry, id) pair with
    entry < bound among blocks strictly after the (thresh, last) cursor;
    (inf, nsb) when no candidate remains. sbounds: [8, nsb] (lo xyz, hi xyz).
    """
    n = tmin.shape[0]
    nsb = sbounds.shape[1]
    oc = (o.x[:, None], o.y[:, None], o.z[:, None])
    inv = tuple(
        1.0 / jnp.where(jnp.abs(c) > 1e-20, c, 1e-20)[:, None]
        for c in (d.x, d.y, d.z)
    )
    best_tn = jnp.full(n, _INF, jnp.float32)
    best_j = jnp.full(n, nsb, jnp.int32)
    bound_c = bound[:, None]
    thresh_c = thresh[:, None]
    last_c = last[:, None]
    for c0 in range(0, nsb, chunk):
        c1 = min(c0 + chunk, nsb)
        tnear = jnp.broadcast_to(tmin[:, None], (n, c1 - c0))
        tfar = bound_c
        vb = jnp.ones((1, c1 - c0), bool)
        for c in range(3):
            lo = sbounds[c, c0:c1][None, :]
            hi = sbounds[3 + c, c0:c1][None, :]
            t0 = (lo - oc[c]) * inv[c]
            t1 = (hi - oc[c]) * inv[c]
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
            vb = vb & (lo <= hi)  # inverted/empty pad blocks never match
        j = jnp.arange(c0, c1, dtype=jnp.int32)[None, :]
        cand = (
            (tnear <= tfar)
            & (tnear < bound_c)
            & vb
            & ((tnear > thresh_c) | ((tnear == thresh_c) & (j > last_c)))
        )
        tn_c = jnp.where(cand, tnear, _INF)
        cm = tn_c.min(axis=1)
        jm = jnp.where(tn_c == cm[:, None], j, nsb).min(axis=1).astype(jnp.int32)
        upd = (cm < best_tn) | ((cm == best_tn) & (jm < best_j))
        best_tn = jnp.where(upd, cm, best_tn)
        best_j = jnp.where(upd, jm, best_j)
    return best_tn, best_j


def _permute_rows(perm, f32_cols, int_cols):
    """One [N, F] i32 row-gather for many state columns (floats ride as i32
    bitcasts; never the reverse — TPU flushes f32-subnormal int payloads)."""
    bc = jax.lax.bitcast_convert_type
    cols = [bc(c, jnp.int32) for c in f32_cols] + [
        c.astype(jnp.int32) if c.dtype == jnp.bool_ else bc(c, jnp.int32)
        for c in int_cols
    ]
    rows = jnp.stack(cols, axis=1)[perm].T
    nf = len(f32_cols)
    outs_f = [bc(rows[i], jnp.float32) for i in range(nf)]
    outs_i = []
    for i, c in enumerate(int_cols):
        r = rows[nf + i]
        outs_i.append(r != 0 if c.dtype == jnp.bool_ else bc(r, c.dtype))
    return outs_f, outs_i


def rounds_traverse(
    sweep_closest,
    sweep_any,
    sbounds,
    origins: Vec3,
    directions: Vec3,
    tmin,
    tmax,
    exclude,
    *,
    tile: int,
    mode: str,  # "closest" | "any"
    n_rounds: int = N_ROUNDS,
    cap_per_tile: int = ROUNDS_CAP,
    sort_interpret: bool = False,
):
    """Grouped-rounds traversal core. Returns, in ORIGINAL lane order:
      closest: (t [N] f32 (1e16 miss), prim [N] i32, open_ [N] bool)
      any:     (occ [N] bool, open_ [N] bool)
    open_ lanes still have unswept candidate blocks — the caller must finish
    them (residual work-list sweep with the returned bound primed).

    sweep_closest(wl, o, d, tmin, tmax, excl) -> (t, prim);
    sweep_any(wl, o, d, tmin, tmax, excl) -> occ. Only the mode's callback
    is used. Both must accept the wavefront in any lane order.
    """
    from strelka_tpu.ops.pallas_intersect import build_worklist

    n = tmin.shape[0]
    nsb = int(sbounds.shape[1])
    n_tiles = -(-n // tile)
    # the [4, cap] wl rides scalar-prefetch SMEM: bound by the shared
    # constant entry budget so small tiles / big launches can't OOM (ADVICE r3)
    from strelka_tpu.ops.intersect import _wl_cap_per_tile

    cap = n_tiles * min(cap_per_tile, _wl_cap_per_tile(nsb, n_tiles))
    excl = exclude if exclude is not None else jnp.full(n, -1, jnp.int32)
    anyhit = mode == "any"

    state = (
        origins.x, origins.y, origins.z,
        directions.x, directions.y, directions.z,
        tmin, tmax,
        excl,
        jnp.full(n, _BIG, jnp.float32),          # best_t (closest)
        # closest: best prim id (-1 miss); any: 0/1 occluded flag
        jnp.full(n, 0 if anyhit else -1, jnp.int32),
        jnp.full(n, -1.0, jnp.float32),          # thresh (entries are >= 0)
        jnp.full(n, -1, jnp.int32),              # last block id at thresh
        jnp.arange(n, dtype=jnp.int32),          # original lane index
        jnp.int32(0),                            # stalled (wl overflow latch)
    )

    lane_tile = (jnp.arange(n, dtype=jnp.int32) // tile).astype(jnp.int32)

    def bound_of(best_t, tmax_, prim_occ):
        if anyhit:
            return jnp.where(prim_occ > 0, 0.0, tmax_)  # occluded lanes stop
        return jnp.minimum(best_t, tmax_)

    def round_body(st, _):
        # a round whose demand overflowed the work-list cap would recompute
        # the IDENTICAL demand forever — latch `stalled` and short-circuit
        # the remaining rounds (the residual finish handles everything)
        return jax.lax.cond(st[-1] == 0, _round_live, lambda s: s, st), None

    def _round_live(st):
        (ox, oy, oz, dx, dy, dz, tn_, tx_, ex_, bt, pr, th, la, og, _stall) = st
        o = Vec3(ox, oy, oz)
        d = Vec3(dx, dy, dz)
        bound = bound_of(bt, tx_, pr)
        tn_next, blk = ray_next_block(o, d, tn_, bound, sbounds, th, la)
        active = jnp.isfinite(tn_next)
        assign = jnp.where(active, blk, nsb)
        perm = bucket_sort_perm(
            assign, nsb + 1, use_pallas=True, interpret=sort_interpret
        )
        f32s, ints = _permute_rows(
            perm,
            [ox, oy, oz, dx, dy, dz, tn_, tx_, bt, th, tn_next],
            [ex_, pr, la, og, assign, active],
        )
        ox2, oy2, oz2, dx2, dy2, dz2, tn2, tx2, bt2, th2, tnx2 = f32s
        ex2, pr2, la2, og2, as2, ac2 = ints
        o2 = Vec3(ox2, oy2, oz2)
        d2 = Vec3(dx2, dy2, dz2)
        bound2 = bound_of(bt2, tx2, pr2)
        # (tile, block) demand matrix: one scatter-min of the entry distance
        Wtn = jnp.full((n_tiles, nsb), jnp.inf, jnp.float32).at[
            jnp.where(ac2, lane_tile, n_tiles),
            jnp.clip(as2, 0, nsb - 1),
        ].min(tnx2, mode="drop")
        W = jnp.isfinite(Wtn)
        wl, count, visited = build_worklist(W, jnp.where(W, Wtn, 1e30), cap)
        fits = count <= cap
        vis_ray = jnp.repeat(visited, tile)[:n]

        if anyhit:
            def do(_):
                occ = sweep_any(wl, o2, d2, tn2, bound2, ex2)
                return (occ & vis_ray).astype(jnp.int32)

            hit = jax.lax.cond(fits, do, lambda _: jnp.zeros(n, jnp.int32), None)
            pr3 = pr2 | hit
            bt3 = bt2
        else:
            def do(_):
                t2, p2 = sweep_closest(wl, o2, d2, tn2, bound2, ex2)
                return t2, jnp.where(vis_ray, p2, -1)

            t2, p2 = jax.lax.cond(
                fits, do,
                lambda _: (jnp.full(n, _BIG, jnp.float32), jnp.full(n, -1, jnp.int32)),
                None,
            )
            better = p2 >= 0  # sweep hits are < bound2 by construction
            bt3 = jnp.where(better, t2, bt2)
            pr3 = jnp.where(better, p2, pr2)
        adv = ac2 & fits
        th3 = jnp.where(adv, tnx2, th2)
        la3 = jnp.where(adv, as2, la2)
        return (ox2, oy2, oz2, dx2, dy2, dz2, tn2, tx2, ex2, bt3, pr3,
                th3, la3, og2, jnp.where(fits, 0, 1).astype(jnp.int32))

    state, _ = jax.lax.scan(round_body, state, None, length=n_rounds)
    (ox, oy, oz, dx, dy, dz, tn_, tx_, ex_, bt, pr, th, la, og, _stall) = state
    bound = bound_of(bt, tx_, pr)
    tn_left, _ = ray_next_block(
        Vec3(ox, oy, oz), Vec3(dx, dy, dz), tn_, bound, sbounds, th, la
    )
    open_ = jnp.isfinite(tn_left)
    # restore original lane order with ONE row scatter
    bc = jax.lax.bitcast_convert_type
    table = jnp.stack([bc(bt, jnp.int32), pr, open_.astype(jnp.int32)], axis=1)
    back = jnp.zeros((n, 3), jnp.int32).at[og].set(table).T
    t_out = bc(back[0], jnp.float32)
    prim_out = back[1]
    open_out = back[2] != 0
    if anyhit:
        return prim_out > 0, open_out
    return t_out, prim_out, open_out
