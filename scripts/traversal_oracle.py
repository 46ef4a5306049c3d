"""Traversal-architecture oracle (r4): on the REAL captured bounce-1
wavefront, compare the block-sweep work of

  A. the CURRENT per-tile dynamic sweep (near-to-far order + rolling
     whole-tile tmax guard — what the dense/two-pass kernels actually do),
  B. per-RAY pair expansion, no pruning (every demanded block per ray),
  C. per-RAY pair expansion, 2 rounds (nearest R1 demanded blocks first,
     re-prime tmax from those hits, remaining demanded blocks only if
     their entry is closer than the round-1 best),

all in LANE-BLOCK units (1 unit = one ray-lane swept against one 2048-tri
superblock; a 1024-lane tile-block sweep = 1024 units, one pair = 1 unit),
using EXACT per-(lane, block) closest distances from the CPU brute-force
intersector on a sampled set of tiles. Decides whether the invert-loop
(per-block ray list) redesign can beat the dynamic guards the static
union-waste numbers ignore (scripts/coherence_probe.py overstates waste:
it has no tmax evolution).

    JAX_PLATFORMS=cpu python scripts/traversal_oracle.py 48 [n_tiles_sample]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # axon tunnel IGNORES the env var
import jax.numpy as jnp

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 48
TILE = 1024  # sampling granularity; sims also evaluate sub-tiles of it
R1 = int(os.environ.get("ORACLE_R1", "4"))

rays = np.load("/tmp/bounce_rays_%d.npz" % grid)

from strelka_tpu.ops.pallas_intersect import super_bounds_jnp
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import box_field

scene = build_device_scene(box_field(grid=grid))
step = scene.kernel_tblk * scene.kernel_super
sb = np.asarray(super_bounds_jnp(scene.tri_bounds, scene.kernel_super))
nsb = sb.shape[1]

o = np.stack([rays["ox"], rays["oy"], rays["oz"]])  # [3, N] (sorted order)
d = np.stack([rays["dx"], rays["dy"], rays["dz"]])
alive = np.asarray(rays["alive"])
N = alive.shape[0]
n_tiles = N // TILE

# sample tiles uniformly over the LIVE prefix (dead lanes sort to the tail)
live_tiles = int(np.ceil(alive.sum() / TILE))
rng = np.random.default_rng(3)
tiles = np.sort(rng.choice(live_tiles, size=min(n_sample, live_tiles), replace=False))
sel = (tiles[:, None] * TILE + np.arange(TILE)[None, :]).ravel()
oS = o[:, sel]
dS = d[:, sel]
aS = alive[sel]
M = sel.size
print(f"grid={grid} nsb={nsb} tiles sampled={len(tiles)}/{live_tiles} live; lanes={M}")

# --- per-(lane, block) slab entry distance + demand -------------------------
inv = 1.0 / np.where(np.abs(dS) > 1e-20, dS, 1e-20)
tnear = np.zeros((M, nsb), np.float32)
tfar = np.full((M, nsb), np.float32(1e16))
for c in range(3):
    lo = sb[c][None, :]
    hi = sb[3 + c][None, :]
    t0 = (lo - oS[c][:, None]) * inv[c][:, None]
    t1 = (hi - oS[c][:, None]) * inv[c][:, None]
    np.maximum(tnear, np.minimum(t0, t1), out=tnear)
    np.minimum(tfar, np.maximum(t0, t1), out=tfar)
vb = ((sb[0] <= sb[3]) & (sb[1] <= sb[4]) & (sb[2] <= sb[5]))[None, :]
demand = (tnear <= tfar) & (tfar >= 0.0) & vb & aS[:, None]

# --- exact per-(lane, block) closest t via CPU brute force ------------------
# one jnp pass per superblock over the sampled lanes (XLA-vectorized)
from strelka_tpu.ops.vec import Vec3

oj = Vec3(*[jnp.asarray(c) for c in oS])
dj = Vec3(*[jnp.asarray(c) for c in dS])
v0 = np.asarray(scene.v0)
e1 = np.asarray(scene.e1)
e2 = np.asarray(scene.e2)


@jax.jit
def block_t(v0b, e1b, e2b, excl0):
    # Moller-Trumbore, min over the block's tris per lane
    t_best = jnp.full(M, 1e16, jnp.float32)
    ox, oy, oz = oj.x, oj.y, oj.z
    dx, dy, dz = dj.x, dj.y, dj.z
    for s in range(0, v0b.shape[0], 512):
        a = [jnp.asarray(v0b[s : s + 512, c]) for c in range(3)]
        b1 = [jnp.asarray(e1b[s : s + 512, c]) for c in range(3)]
        b2 = [jnp.asarray(e2b[s : s + 512, c]) for c in range(3)]
        # pvec = d x e2 : [B, M] broadcast per component
        px = dy[None, :] * b2[2][:, None] - dz[None, :] * b2[1][:, None]
        py = dz[None, :] * b2[0][:, None] - dx[None, :] * b2[2][:, None]
        pz = dx[None, :] * b2[1][:, None] - dy[None, :] * b2[0][:, None]
        det = b1[0][:, None] * px + b1[1][:, None] * py + b1[2][:, None] * pz
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        tx = ox[None, :] - a[0][:, None]
        ty = oy[None, :] - a[1][:, None]
        tz = oz[None, :] - a[2][:, None]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * b1[2][:, None] - tz * b1[1][:, None]
        qy = tz * b1[0][:, None] - tx * b1[2][:, None]
        qz = tx * b1[1][:, None] - ty * b1[0][:, None]
        v = (dx[None, :] * qx + dy[None, :] * qy + dz[None, :] * qz) * inv_det
        t = (b2[0][:, None] * qx + b2[1][:, None] * qy + b2[2][:, None] * qz) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > 1e-4)
        )
        prim_ids = jnp.arange(s, s + v0b[s : s + 512].shape[0])[:, None]
        ok = ok & (prim_ids != excl0[None, :])
        t_best = jnp.minimum(t_best, jnp.where(ok, t, 1e16).min(axis=0))
    return t_best


cache = "/tmp/oracle_tb_%d_%d.npz" % (grid, n_sample)
excl = jnp.asarray(rays["excl"][sel]) if "excl" in rays.files else jnp.full(M, -1)
if os.path.exists(cache):
    tb = np.load(cache)["tb"]
else:
    tb = np.full((M, nsb), np.float32(1e16))
    for b in range(nsb):
        s0, s1 = b * step, min((b + 1) * step, v0.shape[0])
        if s0 >= v0.shape[0]:
            break
        ex = excl - s0  # excl is a global prim id; block pass uses local ids
        tb[:, b] = np.asarray(block_t(v0[s0:s1], e1[s0:s1], e2[s0:s1], ex))
    np.savez_compressed(cache, tb=tb)
t_exact = tb.min(axis=1)
hit_frac = float(((t_exact < 1e15) & aS).sum() / max(aS.sum(), 1))
print(f"exact t computed; hit frac of alive: {hit_frac:.3f}")

# ============================================================================
T = len(tiles)
tnear_t = tnear.reshape(T, TILE, nsb)
demand_t = demand.reshape(T, TILE, nsb)
tb_t = tb.reshape(T, TILE, nsb)

# --- A: per-tile dynamic sweep (near-to-far + rolling whole-tile guard) -----
# evaluated at several tile widths (sub-tiles of the sampled 1024 blocks):
# quantifies how much of the per-ray gap (B below) SMALLER TILES recover
# within the existing per-tile sweep machinery
costA_at = {}
for sub in (1024, 512, 256, 128, 64):
    costA = 0
    for ti in range(T):
        for s0 in range(0, TILE, sub):
            sl = slice(s0, s0 + sub)
            dem = demand_t[ti][sl]
            tn_l = tnear_t[ti][sl]
            tn = np.where(dem, tn_l, 1e16)
            order = np.argsort(tn.min(axis=0))
            best = np.full(sub, 1e16, np.float32)
            for b in order:
                guard = dem[:, b] & (tn_l[:, b] < best)
                if not guard.any():
                    continue
                costA += sub  # whole sub-tile sweeps the block
                best = np.minimum(best, tb_t[ti][sl, b])
    costA_at[sub] = costA

# --- B: pair expansion, no pruning ------------------------------------------
costB = int(demand.sum())

# --- C: pair expansion, 2 rounds with re-primed tmax ------------------------
tn_masked = np.where(demand, tnear, 1e16)
order_r = np.argsort(tn_masked, axis=1)  # per-ray near-to-far demanded blocks
rank = np.argsort(order_r, axis=1)
in_r1 = (rank < R1) & demand
costC1 = int(in_r1.sum())
best_r1 = np.where(in_r1, tb, 1e16).min(axis=1)
in_r2 = demand & ~in_r1 & (tnear < best_r1[:, None])
costC2 = int(in_r2.sum())
costC = costC1 + costC2

alive_n = int(aS.sum())
print("\n== lane-block sweep work (1 unit = 1 lane x 1 superblock of "
      f"{step} tris), per ALIVE ray ==")
for sub, c in costA_at.items():
    print(f"A dynamic per-tile sweep @tile {sub:5d}: {c / alive_n:8.2f}")
print(f"B pairs, no pruning      : {costB / alive_n:8.2f}")
print(f"C pairs, 2 rounds (R1={R1}) : {costC / alive_n:8.2f}"
      f"   (round1 {costC1 / alive_n:.2f} + round2 {costC2 / alive_n:.2f})")
print(f"\ntile occupancy note: A pays dead lanes inside live tiles; "
      f"alive frac in sampled tiles = {aS.mean():.3f}")
