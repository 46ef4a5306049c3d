"""Finer sub-blocks (tblk 64/super 32 = same 2048-tri steps) vs 256/8."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY
from strelka_tpu.scene.testscenes import box_field
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import pallas_intersect as PI
from strelka_tpu.ops.vec import from_rows

sh = box_field(grid=48)
scene = build_device_scene(sh)
# re-pack at given granularity from scene SoA (already morton-sorted)
v0 = np.asarray(scene.v0); e1 = np.asarray(scene.e1); e2 = np.asarray(scene.e2)
gm = np.asarray(scene.geom_mask)
N = 512 * 512
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([1.0]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
zo, _ = I._pixel_zorder(512, 512)
px = jnp.asarray(zo % 512, jnp.uint32); py = jnp.asarray(zo // 512, jnp.uint32)
o, d = I.generate_camera_rays(params, px, py, jnp.zeros(N), jnp.zeros(N), 512, 512)
# incoherent-ish bounce surrogate: origins at first hits, random dirs, sorted
rng = np.random.default_rng(0)
d2_np = rng.normal(size=(N, 3)).astype(np.float32); d2_np /= np.linalg.norm(d2_np, axis=1, keepdims=True)
tmin = jnp.zeros(N); tmax = jnp.full(N, 1e16)

def bench(name, fn, iters=4):
    t, prim = fn(); _ = np.asarray(prim[0])
    t0 = time.perf_counter()
    for _ in range(iters): t, prim = fn()
    _ = np.asarray(prim[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.1f} ms  {N/dt/1e6:6.1f} Mrays/s", flush=True)
    return t, prim

for tblk, sup in ((256, 8), (64, 32), (128, 16)):
    tris = PI.pack_tris(v0, e1, e2, gm, tblk=tblk, super_=sup)
    bnds = PI.block_bounds(v0, e1, e2, gm, tblk=tblk, super_=sup)
    cents = PI.block_centroids(PI.super_bounds(bnds, super_=sup))
    order = PI.tile_sweep_order(o, cents, 1024)
    bench(f"cam vpu tblk={tblk} super={sup}", lambda tris=tris, bnds=bnds, order=order, tblk=tblk, sup=sup:
        PI.pallas_intersect_closest(tris, bnds, o, d, tmin, tmax, RAY_MASK_PRIMARY,
            starts=order, tile=1024, tblk=tblk, super_=sup))
# first-hit origins for bounce surrogate
tris = PI.pack_tris(v0, e1, e2, gm)
bnds = PI.block_bounds(v0, e1, e2, gm)
t0h, p0h = PI.pallas_intersect_closest(tris, bnds, o, d, tmin, tmax, RAY_MASK_PRIMARY, tile=1024)
t_np = np.asarray(t0h); hitm = np.asarray(p0h) >= 0
o_np = np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)
d_np = np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)
org2 = np.stack([o_np[i] + d_np[i] * np.where(hitm, t_np * 0.999, 1.0) for i in range(3)], 1).astype(np.float32)
from strelka_tpu.ops.integrator import _ray_sort_key
key = np.asarray(_ray_sort_key(scene, from_rows(jnp.asarray(org2)), from_rows(jnp.asarray(d2_np))))
key = np.where(hitm, key, np.uint32(0xFFFFFFFF))
perm = np.argsort(key)
ob = from_rows(jnp.asarray(org2[perm])); db = from_rows(jnp.asarray(d2_np[perm]))
tmax_b = jnp.asarray(np.where(hitm[perm], 1e16, 0.0).astype(np.float32))
for tblk, sup in ((256, 8), (64, 32), (128, 16)):
    tris = PI.pack_tris(v0, e1, e2, gm, tblk=tblk, super_=sup)
    bnds = PI.block_bounds(v0, e1, e2, gm, tblk=tblk, super_=sup)
    cents = PI.block_centroids(PI.super_bounds(bnds, super_=sup))
    order = PI.tile_sweep_order(ob, cents, 1024)
    bench(f"bounce vpu tblk={tblk} super={sup}", lambda tris=tris, bnds=bnds, order=order, tblk=tblk, sup=sup:
        PI.pallas_intersect_closest(tris, bnds, ob, db, tmin, tmax_b, RAY_MASK_PRIMARY,
            starts=order, tile=1024, tblk=tblk, super_=sup))
