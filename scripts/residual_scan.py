"""Scan (tile, tblk, K) for the residual two-pass on captured bounce rays.

Packs triangles per-config (bypasses the scene's baked packing).
Usage: python scripts/residual_scan.py [grid]
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

import strelka_tpu.ops.intersect as X
import strelka_tpu.ops.pallas_intersect as PI
from strelka_tpu.render.device_scene import build_device_scene, RAY_MASK_PRIMARY
from strelka_tpu.scene.testscenes import box_field
from strelka_tpu.ops.vec import Vec3

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
sh = box_field(grid=grid)
scene = build_device_scene(sh)
v0, e1, e2 = np.asarray(scene.v0), np.asarray(scene.e1), np.asarray(scene.e2)
gm = np.asarray(scene.geom_mask)
data = np.load("/tmp/bounce_rays_%d.npz" % grid)
N = data["ox"].shape[0]
o = Vec3(jnp.asarray(data["ox"]), jnp.asarray(data["oy"]), jnp.asarray(data["oz"]))
d = Vec3(jnp.asarray(data["dx"]), jnp.asarray(data["dy"]), jnp.asarray(data["dz"]))
excl = jnp.asarray(data["excl"]); alive = jnp.asarray(data["alive"])
tmin = jnp.zeros(N, jnp.float32)
tmax = jnp.where(alive, 1e16, 0.0).astype(jnp.float32)

ref_prim = None

def twopass(tile, tblk, super_, K, tris, bounds):
    sbounds = PI.super_bounds_jnp(bounds, super_)
    order_k, r2t, d2 = PI.tile_sweep_order_k(o, sbounds, tile, K)
    t1, prim1 = PI.pallas_intersect_closest(
        tris, bounds, o, d, tmin, tmax, RAY_MASK_PRIMARY,
        exclude=excl, starts=order_k, tile=tile, tblk=tblk, super_=super_)
    bound = jnp.minimum(t1, tmax)
    open_ = PI.residual_open(o, d, tmin, bound, sbounds, d2, r2t, tile)
    perm, pos = X._partition_perm(open_)
    tmax2 = jnp.where(open_, bound, 0.0)
    o2, d2v, tmin2, tmax2p, excl2 = X._gather_ray_rows(perm, o, d, tmin, tmax2, excl)
    d2m = PI.tile_box_d2(o2, sbounds, tile)
    W2 = PI.slab_matrix_any(o2, d2v, tmin2, tmax2p, sbounds, tile)
    cap = (-(-N // tile)) * min(64, W2.shape[1])
    wl, count, visited = PI.build_worklist(W2, d2m, cap)
    t2p, prim2p = PI.pallas_intersect_closest_wl(
        tris, bounds, wl, o2, d2v, tmin2, tmax2p, RAY_MASK_PRIMARY,
        exclude=excl2, tile=tile, tblk=tblk, super_=super_)
    vis_ray = jnp.repeat(visited, tile)[:N]
    prim2p = jnp.where(vis_ray, prim2p, -1)
    back = jnp.stack([jax.lax.bitcast_convert_type(t2p, jnp.int32), prim2p], axis=1)[pos].T
    t2 = jax.lax.bitcast_convert_type(back[0], jnp.float32)
    prim2 = back[1]
    better = prim2 >= 0
    return jnp.where(better, t2, t1), jnp.where(better, prim2, prim1), count

for tblk in (256, 128, 64):
    for step_tris in (2048,):
        super_ = step_tris // tblk
        tris = PI.pack_tris(v0, e1, e2, gm, tblk=tblk, super_=super_)
        bounds = PI.block_bounds(v0, e1, e2, gm, tblk=tblk, super_=super_)
        for tile in (1024, 512):
            for K in (8, 16):
                fn = jax.jit(lambda tris=tris, bounds=bounds, tile=tile, tblk=tblk, super_=super_, K=K:
                             twopass(tile, tblk, super_, K, tris, bounds))
                try:
                    out = fn(); _ = np.asarray(out[0][0])
                    t0 = time.perf_counter()
                    for _ in range(3):
                        out = fn()
                    _ = np.asarray(out[0][0])
                    dt = (time.perf_counter() - t0) / 3
                    prim = np.asarray(out[1]); cnt = int(out[2])
                    if ref_prim is None:
                        ref_prim = prim
                    mism = int((prim != ref_prim).sum())
                    print(f"tblk={tblk:3d} super={super_:2d} tile={tile:4d} K={K:2d}: "
                          f"{dt*1e3:7.1f} ms  wl={cnt}  mism={mism}", flush=True)
                except Exception as e:
                    print(f"tblk={tblk:3d} super={super_:2d} tile={tile:4d} K={K:2d}: FAIL {str(e)[:120]}", flush=True)
