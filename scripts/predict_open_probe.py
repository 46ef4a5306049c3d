"""CPU simulation of the residual OPEN fraction (phase-2 workload) for the
prediction-augmented phase 1 vs the plain K-nearest two-pass.

For a realistic bounce-1 wavefront (cache warmed on N_WARM prior launches),
emulates: pred-major sort -> 1024-lane tiles -> per-tile K-nearest ball +
predicted set = swept -> bound = t_true where the hit block was swept ->
open = any unswept valid superblock with slab tnear < bound. The open
fraction is what phase 2 pays for; measured 0.20 on TPU for K=16 (NOTES
fact #23 era). Ground truth via the CPU BVH at reduced resolution.

Usage: python scripts/predict_open_probe.py [grid] [res]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import strelka_tpu.ops.hitcache as HC
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import vec as V
from strelka_tpu.ops.hitcache import ray_hash
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
TBLK, SUPER = 256, 8
SB_SIZE = TBLK * SUPER
TILE = 1024
CACHE = 1 << 20
N_WARM = 4

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


# --- TPU-pack structures on CPU: Morton order, superblock bounds
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
sb = np.asarray(super_bounds(jnp.asarray(bounds), SUPER))  # [8, nsb]
nsb = sb.shape[1]
sb_lo = sb[0:3].T  # [nsb, 3]
sb_hi = sb[3:6].T
sb_valid = (sb_lo <= sb_hi).all(axis=1)


def sb_of(prim):
    p = np.asarray(prim)
    return np.where(p >= 0, rank[np.clip(p, 0, None)] // SB_SIZE, -1)


class _S:
    world_lo = scene.world_lo
    world_hi = scene.world_hi


# --- warm the cache
waves = [bounce(o, d, s) for s in range(N_WARM + 1)]
cache = np.full(CACHE, -1, np.int64)
for no, nd, prim, t, ok in waves[:N_WARM]:
    okn = np.asarray(ok)
    h = np.asarray(ray_hash(_S(), no, nd, CACHE))
    cache[h[okn]] = sb_of(prim)[okn]

no, nd, prim, t_true, ok = waves[N_WARM]
okn = np.asarray(ok)
O = np.stack([np.asarray(no.x), np.asarray(no.y), np.asarray(no.z)], 1)
D = np.stack([np.asarray(nd.x), np.asarray(nd.y), np.asarray(nd.z)], 1)
T = np.asarray(t_true)
SBH = sb_of(prim)  # true hit superblock
pred = cache[np.asarray(ray_hash(_S(), no, nd, CACHE))]
pred[~okn] = -1

# slab tnear per (lane, superblock)
inv = 1.0 / np.where(np.abs(D) > 1e-20, D, 1e-20)
t0 = (sb_lo[None] - O[:, None]) * inv[:, None]
t1 = (sb_hi[None] - O[:, None]) * inv[:, None]
tn = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)  # entry distance
tf = np.maximum(t0, t1).min(axis=2)
passes = (tn <= tf) & sb_valid[None, :]  # lane could enter block


def _morton_key():
    """The integrator's _ray_sort_key on this wavefront (position Morton +
    octant; see ops/integrator.py)."""
    import strelka_tpu.ops.integrator as II

    k = II._ray_sort_key(scene, no, nd)
    return np.asarray(k).astype(np.uint64)


MKEY = None


def simulate(K, use_pred, label):
    global MKEY
    if MKEY is None:
        MKEY = _morton_key()
    # sort emulation matching _sort_wavefront: Morton (no pred) or
    # pred-major with the top Morton bits below (dead lanes to tail)
    if use_pred:
        group = np.clip(pred + 1, 0, 2**14 - 2).astype(np.uint64)
        key = (group << np.uint64(18)) | (MKEY >> np.uint64(9))
    else:
        key = MKEY
    key = np.where(okn, key, np.uint64(1) << np.uint64(40))
    perm = np.argsort(key, kind="stable")
    n_tiles = -(-N // TILE)
    lane_tile = np.arange(N) // TILE
    # per-tile structures on the SORTED wavefront
    Os = O[perm]
    cent = sb[6:8]  # unused; per-tile d2 from mean origin like tile_box_d2
    open_cnt = 0
    alive_cnt = 0
    swept_true = 0
    for ti in range(n_tiles):
        lanes = perm[ti * TILE : (ti + 1) * TILE]
        lv = okn[lanes]
        if not lv.any():
            continue
        mo = O[lanes][lv].mean(axis=0)
        d2 = np.square(np.maximum(sb_lo - mo, 0) + np.minimum(sb_hi - mo, 0)).sum(1)
        d2 = np.where(sb_valid, d2, 1e30)
        k_eff = min(K, nsb) if K > 0 else 0
        swept = np.zeros(nsb, bool)
        if k_eff:
            swept[np.argsort(d2)[:k_eff]] = True
        if use_pred:
            pv = pred[lanes][lv]
            swept[pv[pv >= 0]] = True
        # bound: true hit if its block swept else +inf (slightly optimistic)
        hit_sb = SBH[lanes]
        bound = np.where((hit_sb >= 0) & swept[np.clip(hit_sb, 0, nsb - 1)], T[lanes], 1e30)
        swept_true += ((hit_sb >= 0) & swept[np.clip(hit_sb, 0, nsb - 1)])[lv].sum()
        # open: any unswept block with entry < bound
        tn_l = tn[lanes]
        p_l = passes[lanes]
        openm = ((~swept[None, :]) & p_l & (tn_l < bound[:, None])).any(axis=1)
        open_cnt += openm[lv].sum()
        alive_cnt += lv.sum()
    print(
        f"{label}: open={open_cnt/alive_cnt:.3f} bound_set={swept_true/alive_cnt:.3f} "
        f"(alive {alive_cnt}, nsb {nsb})"
    )


simulate(16, False, "K=16 no-pred (two-pass today)")
simulate(8, False, "K=8  no-pred")
simulate(8, True, "K=8  + pred")
simulate(4, True, "K=4  + pred")
simulate(16, True, "K=16 + pred")
simulate(0, True, "K=0  pure pred")
# K decay curve (phase-1 cost is ~linear in K with the fused kernel; the
# optimum balances K against open * phase-2 work)
for K in (12, 24, 32, 48):
    simulate(K, False, f"K={K} no-pred")
