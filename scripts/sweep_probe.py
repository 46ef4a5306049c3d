"""Isolate the closest-hit sweep on box_field-class geometry.

Measures Mrays/s of ONE pallas closest sweep for coherent (camera) and
incoherent (shuffled-origin random-direction) rays across kernel configs.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from strelka_tpu.render.device_scene import build_device_scene, RAY_MASK_PRIMARY
from strelka_tpu.scene.testscenes import box_field
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops.vec import Vec3, from_rows
from strelka_tpu.ops import pallas_intersect as PI

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
sh = box_field(grid=grid)
scene = build_device_scene(sh)
T = scene.num_triangles
print("tris:", T, flush=True)

N = 512 * 512
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([1.0]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
idx = jnp.arange(N, dtype=jnp.uint32)
px = idx % 512; py = idx // 512
o_cam, d_cam = I.generate_camera_rays(params, px, py, jnp.zeros(N), jnp.zeros(N), 512, 512)
# Z-ORDER camera rays (as the integrator now enumerates pixels)
zo, _ = I._pixel_zorder(512, 512)
pz = jnp.asarray(zo % 512, jnp.uint32); pyz = jnp.asarray(zo // 512, jnp.uint32)
o_camz, d_camz = I.generate_camera_rays(params, pz, pyz, jnp.zeros(N), jnp.zeros(N), 512, 512)

# incoherent: origins on geometry-ish (random in world box), random dirs — SORTED by morton key
rng = np.random.default_rng(0)
lo = np.array(scene.world_lo); hi = np.array(scene.world_hi)
o_np = rng.uniform(lo, hi, (N, 3)).astype(np.float32)
d_np = rng.normal(size=(N, 3)).astype(np.float32); d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
o_inc = from_rows(jnp.asarray(o_np)); d_inc = from_rows(jnp.asarray(d_np))
key = np.asarray(I._ray_sort_key(scene, o_inc, d_inc))
perm = np.argsort(key)
o_srt = from_rows(jnp.asarray(o_np[perm])); d_srt = from_rows(jnp.asarray(d_np[perm]))

tmin = jnp.zeros(N, jnp.float32); tmax = jnp.full(N, 1e16, jnp.float32)

def bench(name, fn, iters=4):
    t, prim = fn()
    _ = np.asarray(prim[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        t, prim = fn()
    _ = np.asarray(prim[0])
    dt = (time.perf_counter() - t0) / iters
    hits = float(np.asarray((prim >= 0).mean()))
    print(f"{name:44s} {dt*1e3:8.1f} ms  {N/dt/1e6:7.1f} Mrays/s  hit={hits:.2f}", flush=True)

from functools import partial
def run_mxu(o, d, tile, use_starts):
    starts = None
    if use_starts:
        starts = PI.tile_sweep_order(o, scene.block_cents, tile)
    return PI.pallas_intersect_closest_mxu(
        scene.tris_feats, scene.tris_mask, scene.tri_bounds, o, d, tmin, tmax,
        RAY_MASK_PRIMARY, starts=starts, tile=tile)

def run_vpu(o, d, tile, use_starts):
    starts = None
    if use_starts:
        starts = PI.tile_sweep_order(o, scene.block_cents, tile)
    return PI.pallas_intersect_closest(
        scene.tris_packed, scene.tri_bounds, o, d, tmin, tmax,
        RAY_MASK_PRIMARY, starts=starts, tile=tile)

for tile in (1024, 512):
    for kern, runner in (("mxu", run_mxu), ("vpu", run_vpu)):
        bench(f"camZ {kern} tile={tile} order=1", lambda: runner(o_camz, d_camz, tile, True))
        bench(f"camROW {kern} tile={tile} order=1", lambda: runner(o_cam, d_cam, tile, True))
        bench(f"inc+sort {kern} tile={tile} order=1", lambda: runner(o_srt, d_srt, tile, True))
        bench(f"inc+sort {kern} tile={tile} order=0", lambda: runner(o_srt, d_srt, tile, False))
