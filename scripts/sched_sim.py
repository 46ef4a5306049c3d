"""Scheduling-policy simulator for the residual two-pass on a realistic
bounce wavefront (same trusted wavefront model as predict_open_probe.py /
rounds_sim.py). Scores policies in NORMALIZED work units:

    work = sum over swept (tile, superblock) pairs of (tile_size / 1024)

(one pair = SUPER sub-block x [TBLK, tile] MT passes, cost linear in tile
size), plus the bookkeeping each policy adds (sorts / compactions).

Policies:
  P0 today       : phase-1 K-ball rect @1024 + open-compact + phase-2 union @1024
  P1 p2-tile     : phase 2 at tile 512 / 256 (pair cost scales down)
  P2 p2-octant   : open lanes sub-sorted (octant, Morton) before re-tiling
  P3 iterate     : ball -> compact -> ball (fresh tiles) -> compact -> union
  P4 ball-prune  : phase-1 skips ball pairs where NO lane in the tile passes
                   the slab test (sound: such pairs can't close/open anything)

Usage: python scripts/sched_sim.py [grid-int | bench scene name] [res]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import vec as V
from strelka_tpu.ops.intersect import intersect_closest, offset_ray_vec
from strelka_tpu.ops.pallas_intersect import (
    block_bounds,
    morton_sort_tris,
    super_bounds,
)
from strelka_tpu.ops.vec import Vec3
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY, build_device_scene
from strelka_tpu.scene.testscenes import box_field

SCENE = sys.argv[1] if len(sys.argv) > 1 else "48"  # grid int OR bench scene name
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 256
TBLK, SUPER = 256, 8
SB_SIZE = TBLK * SUPER
TILE = 1024
K = 16

if SCENE.isdigit():
    sh = box_field(grid=int(SCENE))
else:
    import bench

    sh = bench.build_host_scene(SCENE)
scene = build_device_scene(sh)
cam = sh.get_camera(0)
cam.update_aspect_ratio(1.0)
params = I.LaunchParams(
    subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([1.0] * 3, jnp.float32),
    bg_color=jnp.zeros(3, jnp.float32),
)
N = RES * RES
idx = jnp.arange(N, dtype=jnp.uint32)
px, py = idx % RES, idx // RES
o, d = I.generate_camera_rays(params, px, py, jnp.zeros(N), jnp.zeros(N), RES, RES)
tmin = jnp.zeros(N, jnp.float32)
tmax = jnp.full(N, 1e16, jnp.float32)


@jax.jit
def bounce(o, d, seed):
    hit = intersect_closest(scene, o, d, tmin, tmax, RAY_MASK_PRIMARY)
    alive = hit.prim >= 0
    position, _uv, frame, *_ = I._gather_surface(scene, hit, jnp.zeros(N, bool))
    k = jax.random.split(jax.random.PRNGKey(seed), 2)
    u1 = jax.random.uniform(k[0], (N,))
    u2 = jax.random.uniform(k[1], (N,))
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    nd = frame.tangent_u * (r * jnp.cos(phi)) + frame.tangent_v * (r * jnp.sin(phi)) + frame.normal * jnp.sqrt(jnp.maximum(1 - u1, 0.0))
    nd = V.normalize(Vec3(nd.x, nd.y, nd.z))
    no = offset_ray_vec(position, frame.geom_normal)
    hit2 = intersect_closest(scene, no, nd, tmin, tmax, RAY_MASK_PRIMARY,
                             active=alive, exclude=hit.prim)
    return no, nd, hit2.prim, hit2.t, alive & (hit2.prim >= 0)


v0 = np.asarray(scene.v0)
e1 = np.asarray(scene.e1)
e2 = np.asarray(scene.e2)
gm = np.asarray(scene.geom_mask)
order = np.asarray(morton_sort_tris(np.stack([v0, v0 + e1, v0 + e2], axis=1)))
rank = np.empty(order.shape[0], np.int64)
rank[order] = np.arange(order.shape[0])
bounds = np.asarray(
    block_bounds(v0[order], e1[order], e2[order], gm[order], tblk=TBLK, super_=SUPER)
)
sb = np.asarray(super_bounds(jnp.asarray(bounds), SUPER))
nsb = sb.shape[1]
sb_lo, sb_hi = sb[0:3].T, sb[3:6].T
sb_valid = (sb_lo <= sb_hi).all(axis=1)

no, nd, prim, t_true, ok = bounce(o, d, 1)
okn = np.asarray(ok)
O = np.stack([np.asarray(no.x), np.asarray(no.y), np.asarray(no.z)], 1)
D = np.stack([np.asarray(nd.x), np.asarray(nd.y), np.asarray(nd.z)], 1)
T = np.asarray(t_true)
p = np.asarray(prim)
SBH = np.where(p >= 0, rank[np.clip(p, 0, None)] // SB_SIZE, -1)

inv = 1.0 / np.where(np.abs(D) > 1e-20, D, 1e-20)
t0 = (sb_lo[None] - O[:, None]) * inv[:, None]
t1 = (sb_hi[None] - O[:, None]) * inv[:, None]
tn = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)
tf = np.maximum(t0, t1).min(axis=2)
passes = (tn <= tf) & sb_valid[None, :]

import strelka_tpu.ops.integrator as II

MKEY = np.asarray(II._ray_sort_key(scene, no, nd)).astype(np.uint64)
OCT = ((D[:, 0] > 0).astype(np.uint64)
       | ((D[:, 1] > 0).astype(np.uint64) << np.uint64(1))
       | ((D[:, 2] > 0).astype(np.uint64) << np.uint64(2)))
key = np.where(okn, MKEY, np.uint64(1) << np.uint64(40))
PERM = np.argsort(key, kind="stable")


def ball_of(lanes, lv):
    mo = O[lanes][lv].mean(axis=0)
    d2 = np.square(np.maximum(sb_lo - mo, 0) + np.minimum(sb_hi - mo, 0)).sum(1)
    d2 = np.where(sb_valid, d2, 1e30)
    ko = np.argsort(d2)[:K]
    return ko, d2


def ball_pass(perm_order, alive_mask, bound, tile, prune):
    """One K-ball phase over the given lane order. Returns (work_pairs,
    swept_sets list per tile, bound', open_mask). Updates bound where the
    true hit block got swept."""
    nt = -(-N // tile)
    work = 0
    bound = bound.copy()
    openm = np.zeros(N, bool)
    for ti in range(nt):
        lanes = perm_order[ti * tile : (ti + 1) * tile]
        lv = alive_mask[lanes]
        if not lv.any():
            continue
        ko, d2 = ball_of(lanes, lv)
        swept = np.zeros(nsb, bool)
        swept[ko] = True
        if prune:
            # a ball pair is dead if NO lane in the tile passes its slab
            # test against the current bound (sound to skip)
            tile_pass = (passes[lanes] & (tn[lanes] < bound[lanes][:, None])
                         & lv[:, None]).any(0)
            live = swept & tile_pass
            work += live.sum()
        else:
            work += min(K, nsb)
            live = swept
        hs = SBH[lanes]
        found = (hs >= 0) & live[np.clip(hs, 0, nsb - 1)] & lv
        bound[lanes[found]] = np.minimum(bound[lanes[found]], T[lanes[found]])
        om = ((~swept[None, :]) & passes[lanes]
              & (tn[lanes] < bound[lanes][:, None])).any(1)
        openm[lanes] = om & lv
    return work * (tile / 1024.0), bound, openm


def union_pass(perm_order, open_mask, bound, tile):
    nt = -(-N // tile)
    work = 0
    for ti in range(nt):
        lanes = perm_order[ti * tile : (ti + 1) * tile]
        lv = open_mask[lanes]
        if not lv.any():
            continue
        W = (passes[lanes] & (tn[lanes] < bound[lanes][:, None]) & lv[:, None]).any(0)
        work += W.sum()
    return work * (tile / 1024.0)


def compact(open_mask, base_order, octant_sub=False):
    """Open-first stable partition of base_order; optional (octant, keep)
    sub-sort of the open segment."""
    om = open_mask[base_order]
    if octant_sub:
        sub = np.where(om, OCT[base_order], np.uint64(16))
        return base_order[np.argsort(sub, kind="stable")]
    return base_order[np.argsort(~om, kind="stable")]


alive = okn
inf_bound = np.where(okn, 1e30, 0.0)

# P0 today
w1, bound0, open0 = ball_pass(PERM, alive, inf_bound, TILE, prune=False)
ord2 = compact(open0, PERM)
w2 = union_pass(ord2, open0, bound0, TILE)
print(f"P0 today             : phase1={w1:.0f} phase2={w2:.0f} total={w1 + w2:.0f} "
      f"open={open0[okn].mean():.3f}  (+1 sort)")

# P1 phase-2 tile size
for t2 in (512, 256):
    w2b = union_pass(ord2, open0, bound0, t2)
    print(f"P1 p2 tile={t2:<4d}      : phase1={w1:.0f} phase2={w2b:.0f} total={w1 + w2b:.0f}")

# P2 octant sub-sort of the open partition
ord2o = compact(open0, PERM, octant_sub=True)
for t2 in (1024, 512, 256):
    w2c = union_pass(ord2o, open0, bound0, t2)
    print(f"P2 p2 octant t={t2:<4d}  : phase1={w1:.0f} phase2={w2c:.0f} total={w1 + w2c:.0f}")

# P3 iterated ball
wa, bound1, open1 = ball_pass(PERM, alive, inf_bound, TILE, prune=False)
ord_i = compact(open1, PERM)
wb, bound2, open2m = ball_pass(ord_i, open1, bound1, TILE, prune=False)
open2 = open1 & open2m
ord_i2 = compact(open2, ord_i)
wc = union_pass(ord_i2, open2, bound2, TILE)
print(f"P3 iterate ball      : b1={wa:.0f} b2={wb:.0f} union={wc:.0f} "
      f"total={wa + wb + wc:.0f} open2={open2[okn].mean():.3f}  (+2 sorts)")

# P4 pruned ball (phase 1 as a work list instead of rect K columns)
w1p, bound0p, open0p = ball_pass(PERM, alive, inf_bound, TILE, prune=True)
ord2p = compact(open0p, PERM)
w2p = union_pass(ord2p, open0p, bound0p, TILE)
print(f"P4 ball-prune        : phase1={w1p:.0f} phase2={w2p:.0f} total={w1p + w2p:.0f} "
      f"open={open0p[okn].mean():.3f}")

# P4+P2+P1 combined best-of
ord2po = compact(open0p, PERM, octant_sub=True)
for t2 in (512, 256):
    w2po = union_pass(ord2po, open0p, bound0p, t2)
    print(f"P4+P2 t={t2:<4d}         : phase1={w1p:.0f} phase2={w2po:.0f} total={w1p + w2po:.0f}")

# P5: phase-1 tile size x K cross (tighter balls close more lanes; per-lane
# ball work is K regardless of tile, so phase-1 units stay ~flat)
for t1 in (1024, 512, 256):
    for k in (8, 16, 24):
        K = k
        w1x, bx, ox = ball_pass(PERM, alive, inf_bound, t1, prune=False)
        ordx = compact(ox, PERM, octant_sub=True)
        w2x = union_pass(ordx, ox, bx, 256)
        print(f"P5 t1={t1:<4d} K={k:<2d}      : phase1={w1x:.0f} phase2={w2x:.0f} "
              f"total={w1x + w2x:.0f} open={ox[okn].mean():.3f}")

# P6: demand-vote ball — each lane votes for its M nearest along-ray blocks
# (by slab entry), tile sweeps the K most-voted. vs distance ball at same K.
def ball_pass_vote(perm_order, alive_mask, bound, tile, M):
    nt = -(-N // tile)
    work = 0
    bound = bound.copy()
    openm = np.zeros(N, bool)
    for ti in range(nt):
        lanes = perm_order[ti * tile : (ti + 1) * tile]
        lv = alive_mask[lanes]
        if not lv.any():
            continue
        tn_l = np.where(passes[lanes] & lv[:, None], tn[lanes], np.inf)
        # each lane's M smallest entries vote
        part = np.argpartition(tn_l, min(M, nsb - 1), axis=1)[:, :M]
        votes = np.zeros(nsb, np.int64)
        valid_vote = np.take_along_axis(np.isfinite(tn_l), part, axis=1)
        np.add.at(votes, part[valid_vote], 1)
        swept = np.zeros(nsb, bool)
        swept[np.argsort(-votes)[:K]] = True
        work += min(K, nsb)
        hs = SBH[lanes]
        found = (hs >= 0) & swept[np.clip(hs, 0, nsb - 1)] & lv
        bound[lanes[found]] = np.minimum(bound[lanes[found]], T[lanes[found]])
        om = ((~swept[None, :]) & passes[lanes]
              & (tn[lanes] < bound[lanes][:, None])).any(1)
        openm[lanes] = om & lv
    return work * (tile / 1024.0), bound, openm

for t1 in (1024, 512):
    for m in (1, 2, 4):
        K = 16
        w1v, bv, ov = ball_pass_vote(PERM, alive, inf_bound, t1, m)
        ordv = compact(ov, PERM, octant_sub=True)
        w2v = union_pass(ordv, ov, bv, 256)
        print(f"P6 vote t1={t1:<4d} M={m} : phase1={w1v:.0f} phase2={w2v:.0f} "
              f"total={w1v + w2v:.0f} open={ov[okn].mean():.3f}")

# P7: iterated shells with per-lane swept-set tracking — shell s runs the
# K-ball on the re-compacted open lanes only; lanes close as the union of
# everything their tiles ever swept covers their pre-hit corridor.
def shells(t1, K_, S, t2):
    swept_lane = np.zeros((N, nsb), bool)
    bound = inf_bound.copy()
    order_now = PERM
    open_now = okn.copy()
    total = 0.0
    for s in range(S):
        nt = -(-N // t1)
        work = 0
        for ti in range(nt):
            lanes = order_now[ti * t1 : (ti + 1) * t1]
            lv = open_now[lanes]
            if not lv.any():
                continue
            mo = O[lanes][lv].mean(axis=0)
            d2 = np.square(np.maximum(sb_lo - mo, 0) + np.minimum(sb_hi - mo, 0)).sum(1)
            d2 = np.where(sb_valid, d2, 1e30)
            # next-K: nearest K blocks NOT yet swept by most lanes — use the
            # tile's majority swept set (lanes re-tiled so sets align)
            maj = swept_lane[lanes][lv].mean(0) > 0.5
            d2s = np.where(maj, 1e30, d2)
            ko = np.argsort(d2s)[: min(K_, nsb)]
            work += min(K_, nsb)
            swept_lane[lanes[:, None], ko[None, :]] |= True
            hs = SBH[lanes]
            found = (hs >= 0) & np.isin(hs, ko) & lv
            bound[lanes[found]] = np.minimum(bound[lanes[found]], T[lanes[found]])
            om = ((~swept_lane[lanes]) & passes[lanes]
                  & (tn[lanes] < bound[lanes][:, None])).any(1)
            open_now[lanes] = om & lv
        total += work * (t1 / 1024.0)
        print(f"  P7 shell {s}: work={work * (t1 / 1024.0):.0f} "
              f"open={open_now[okn].mean():.3f}")
        order_now = compact(open_now, order_now, octant_sub=True)
    # final union on remaining open
    nt2 = -(-N // t2)
    w2 = 0
    for ti in range(nt2):
        lanes = order_now[ti * t2 : (ti + 1) * t2]
        lv = open_now[lanes]
        if not lv.any():
            continue
        W = ((~swept_lane[lanes]) & passes[lanes]
             & (tn[lanes] < bound[lanes][:, None]) & lv[:, None]).any(0)
        w2 += W.sum()
    w2 *= t2 / 1024.0
    print(f"  P7 t1={t1} K={K_} S={S}: shells={total:.0f} union={w2:.0f} "
          f"total={total + w2:.0f} (+{S} sorts)")

shells(512, 16, 2, 256)
shells(512, 16, 3, 256)
shells(512, 8, 3, 256)

# P8: open partition grouped by each lane's NEAREST-UNSWEPT block id (the
# known next demand — "pred-major without prediction") vs octant grouping.
def compact_by_block(open_mask, base_order, bound):
    # per-lane nearest candidate block after the ball (tn < bound, unswept
    # approximated by tn-ordering: just take argmin of candidate tn)
    tn_c = np.where(passes & (tn < bound[:, None]), tn, np.inf)
    blk0 = np.argmin(tn_c, axis=1)
    key = np.where(open_mask[base_order], blk0[base_order], nsb + 1)
    return base_order[np.argsort(key, kind="stable")]

K = 16
w1b, bb, ob = ball_pass(PERM, alive, inf_bound, 512, prune=False)
for t2 in (1024, 512, 256):
    ordb = compact_by_block(ob, PERM, bb)
    w2b = union_pass(ordb, ob, bb, t2)
    print(f"P8 blk-major t={t2:<4d}  : phase1={w1b:.0f} phase2={w2b:.0f} total={w1b + w2b:.0f}")
