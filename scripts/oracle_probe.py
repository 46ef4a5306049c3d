"""Exact f64 oracle vs VPU single-pass / VPU two-pass / MXU on captured
bounce rays: arbitrates which kernel drops or fabricates hits.

Usage: python scripts/oracle_probe.py [grid] [n_oracle]
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

import strelka_tpu.ops.intersect as X
from strelka_tpu.render.device_scene import build_device_scene, RAY_MASK_PRIMARY
from strelka_tpu.scene.testscenes import box_field
from strelka_tpu.ops.vec import Vec3

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
n_oracle = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

sh = box_field(grid=grid)
scene = build_device_scene(sh, intersector="vpu")
scene_mxu = build_device_scene(sh, intersector="mxu")
print("tris:", scene.num_triangles, flush=True)

data = np.load("/tmp/bounce_rays_%d.npz" % grid)
N = data["ox"].shape[0]
rng = np.random.default_rng(7)
alive_np = data["alive"]
idx_alive = np.flatnonzero(alive_np)
sub = rng.choice(idx_alive, size=min(n_oracle, idx_alive.size), replace=False)
sub.sort()

o = Vec3(jnp.asarray(data["ox"]), jnp.asarray(data["oy"]), jnp.asarray(data["oz"]))
d = Vec3(jnp.asarray(data["dx"]), jnp.asarray(data["dy"]), jnp.asarray(data["dz"]))
excl = jnp.asarray(data["excl"])
alive = jnp.asarray(alive_np)
tmin = jnp.zeros(N, jnp.float32)
tmax = jnp.where(alive, 1e16, 0.0).astype(jnp.float32)

# ---- oracle: exact f64 Moller-Trumbore over all tris, chunked ----
v0 = np.asarray(scene.v0, np.float64)
e1 = np.asarray(scene.e1, np.float64)
e2 = np.asarray(scene.e2, np.float64)
gm = np.asarray(scene.geom_mask)
valid_tri = gm != 0
T = v0.shape[0]
oo = np.stack([data["ox"][sub], data["oy"][sub], data["oz"][sub]], 1).astype(np.float64)
dd = np.stack([data["dx"][sub], data["dy"][sub], data["dz"][sub]], 1).astype(np.float64)
ee = data["excl"][sub]

best_t = np.full(sub.size, 1e30)
best_p = np.full(sub.size, -1, np.int64)
CH = 8192
t0 = time.perf_counter()
for s in range(0, T, CH):
    V0 = v0[s:s+CH]; E1 = e1[s:s+CH]; E2 = e2[s:s+CH]
    vt = valid_tri[s:s+CH]
    # [n, c] MT
    pvec = np.cross(dd[:, None, :], E2[None, :, :])
    det = np.einsum('nck,ck->nc', pvec, E1)
    inv = np.where(np.abs(det) > 1e-300, 1.0 / np.where(det == 0, 1, det), 0.0)
    tv = oo[:, None, :] - V0[None, :, :]
    u = np.einsum('nck,nck->nc', tv, pvec) * inv
    qv = np.cross(tv, E1[None, :, :])
    vv = np.einsum('nck,nk->nc', qv, dd) * inv
    t = np.einsum('nck,ck->nc', qv, E2) * inv
    hit = (np.abs(det) > 1e-12) & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > 0) & vt[None, :]
    hit &= (np.arange(s, s+V0.shape[0])[None, :] != ee[:, None])
    t = np.where(hit, t, 1e30)
    j = t.argmin(1)
    tm_ = t[np.arange(sub.size), j]
    upd = tm_ < best_t
    best_t = np.where(upd, tm_, best_t)
    best_p = np.where(upd, s + j, best_p)
print(f"oracle done in {time.perf_counter()-t0:.1f}s", flush=True)

# ---- kernels ----
def run(name, fn):
    t, p = jax.jit(fn)()
    t = np.asarray(t)[sub]; p = np.asarray(p)[sub]
    # a prim mismatch only matters if ts differ beyond f32 noise
    t_ref = np.where(best_p >= 0, best_t, np.inf)
    miss_drop = (p < 0) & (best_p >= 0)
    false_hit = (p >= 0) & (best_p < 0)
    both = (p >= 0) & (best_p >= 0)
    t_rel = np.abs(t[both] - best_t[both]) / np.maximum(best_t[both], 1e-6)
    bad_t = (t_rel > 1e-3).sum()
    prim_diff = (p[both] != best_p[both]) & (np.abs(t[both] - best_t[both]) / np.maximum(best_t[both], 1e-6) > 1e-3)
    print(f"{name:24s} dropped_hits={miss_drop.sum():5d}  false_hits={false_hit.sum():4d}  "
          f"bad_t(>1e-3 rel)={bad_t:5d}  wrong_prim_far={prim_diff.sum():5d}  / {sub.size}", flush=True)
    if miss_drop.sum():
        k = np.flatnonzero(miss_drop)[:5]
        for i in k:
            print(f"   ray {sub[i]}: oracle prim={best_p[i]} t={best_t[i]:.4f} -> kernel miss", flush=True)
    return t, p

run("vpu single", lambda: X._run_super_closest(
    scene, False, o, d, tmin, tmax, RAY_MASK_PRIMARY, excl, X._tile_starts(scene, o)))
run("vpu twopass", lambda: X._closest_twopass(
    scene, False, o, d, tmin, tmax, RAY_MASK_PRIMARY, excl))
run("mxu twopass", lambda: X._closest_twopass(
    scene_mxu, True, o, d, tmin, tmax, RAY_MASK_PRIMARY, excl))
run("mxu single", lambda: X._run_super_closest(
    scene_mxu, True, o, d, tmin, tmax, RAY_MASK_PRIMARY, excl, X._tile_starts(scene_mxu, o)))
