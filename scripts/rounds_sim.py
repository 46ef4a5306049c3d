"""CPU simulation of the grouped-rounds per-ray scheduler (ops/rounds.py)
on a realistic box_field bounce wavefront: rounds-to-close distribution,
work-list pairs per round (the sweep cost proxy: one pair = one
8-sub-block x [TBLK, TILE] grid step), and total swept pairs vs the
two-pass schedule (phase-1 K-ball pairs + phase-2 W pairs).

Same wavefront generation as predict_open_probe.py (which reproduced the
TPU-measured open fraction, so the distributional model is trusted).
Bound model is the same optimism: a sweep of the lane's true hit block sets
bound = t_true; sweeps of other blocks set nothing (real sweeps may prime a
farther bound — so simulated rounds/pairs are upper bounds).

Usage: python scripts/rounds_sim.py [grid] [res] [max_rounds]
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

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 24
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 128
MAX_ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
TBLK, SUPER = 256, 8
SB_SIZE = TBLK * SUPER
TILE = 1024
K_TWOPASS = 16

sh = box_field(grid=grid)
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


# TPU-pack structures on CPU
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
jv = np.arange(nsb)

import strelka_tpu.ops.integrator as II

MKEY = np.asarray(II._ray_sort_key(scene, no, nd)).astype(np.uint64)
key = np.where(okn, MKEY, np.uint64(1) << np.uint64(40))
perm = np.argsort(key, kind="stable")  # the bounce wavefront arrives sorted

n_tiles = -(-N // TILE)
print(f"wavefront: N={N} alive={okn.sum()} nsb={nsb} tiles={n_tiles}")

# ---- two-pass reference cost (pairs) ----
# phase 1: K pairs per alive tile; phase 2: W pairs over the open partition
alive_tiles = np.unique(np.nonzero(okn[perm])[0] // TILE).size
phase1_pairs = alive_tiles * min(K_TWOPASS, nsb)
# open fraction per the validated sim (bound = t_true if hit block in K-ball)
openm = np.zeros(N, bool)
for ti in range(n_tiles):
    lanes = perm[ti * TILE : (ti + 1) * TILE]
    lv = okn[lanes]
    if not lv.any():
        continue
    mo = O[lanes][lv].mean(axis=0)
    d2 = np.square(np.maximum(sb_lo - mo, 0) + np.minimum(sb_hi - mo, 0)).sum(1)
    d2 = np.where(sb_valid, d2, 1e30)
    swept = np.zeros(nsb, bool)
    swept[np.argsort(d2)[:K_TWOPASS]] = True
    hit_sb = SBH[lanes]
    bound = np.where((hit_sb >= 0) & swept[np.clip(hit_sb, 0, nsb - 1)], T[lanes], 1e30)
    om = ((~swept[None, :]) & passes[lanes] & (tn[lanes] < bound[:, None])).any(1)
    openm[lanes] = om & lv
# phase-2 W pairs: open lanes partitioned to front, per-tile union of passes
op = np.argsort(~openm, kind="stable")  # open-first stable partition
p2_pairs = 0
for ti in range(n_tiles):
    lanes = op[ti * TILE : (ti + 1) * TILE]
    lv = openm[lanes]
    if not lv.any():
        continue
    bound = np.where(SBH[lanes] >= 0, T[lanes], 1e30)  # primed by phase 1
    W = (passes[lanes] & (tn[lanes] < bound[:, None]) & lv[:, None]).any(0)
    p2_pairs += W.sum()
print(f"two-pass: phase1 pairs={phase1_pairs} phase2 pairs={p2_pairs} "
      f"total={phase1_pairs + p2_pairs} open={openm[okn].mean():.3f}")

# ---- grouped rounds ----
best = np.full(N, np.inf)
thresh = np.full(N, -1.0)
last = np.full(N, -1)
cur = perm.copy()  # physical order (stability inherits across rounds)
closed_at = np.full(N, -1)
total_pairs = 0
for r in range(MAX_ROUNDS):
    cand = passes & (tn < best[:, None]) & (
        (tn > thresh[:, None]) | ((tn == thresh[:, None]) & (jv[None, :] > last[:, None]))
    )
    cand &= okn[:, None]
    tn_c = np.where(cand, tn, np.inf)
    nm = tn_c.min(1)
    jm = np.where(tn_c == nm[:, None], jv[None, :], nsb).min(1)
    active = np.isfinite(nm)
    newly = (~active) & (closed_at < 0) & okn
    closed_at[newly] = r
    if not active.any():
        print(f"round {r}: all closed")
        break
    assign = np.where(active, jm, nsb)
    # stable regroup of the current physical order by assigned block
    cur = cur[np.argsort(assign[cur], kind="stable")]
    pairs = 0
    for ti in range(n_tiles):
        lanes = cur[ti * TILE : (ti + 1) * TILE]
        blocks = np.unique(assign[lanes][active[lanes]])
        if blocks.size == 0:
            continue
        pairs += blocks.size
        # tile-union sweep: every lane in the tile is swept vs these blocks
        hs = SBH[lanes]
        found = (hs >= 0) & np.isin(hs, blocks)
        best[lanes[found]] = T[lanes[found]]
    total_pairs += pairs
    thresh = np.where(active, nm, thresh)
    last = np.where(active, jm, last)
    print(f"round {r}: active={active.sum()} ({active.sum()/max(okn.sum(),1):.3f}) "
          f"pairs={pairs} cum_pairs={total_pairs}")

still_open = (closed_at < 0) & okn
ca = closed_at[okn & (closed_at >= 0)]
print(f"rounds: total pairs={total_pairs} vs two-pass {phase1_pairs + p2_pairs} "
      f"({total_pairs / max(phase1_pairs + p2_pairs, 1):.2f}x); "
      f"open after {MAX_ROUNDS} rounds: {still_open.mean():.4f}")
if ca.size:
    print("close-round percentiles:",
          {q: int(np.percentile(ca, q)) for q in (50, 90, 95, 99)})
