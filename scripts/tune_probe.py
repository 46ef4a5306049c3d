"""Tune tile/super for both kernels on cornell-scale and box-scale scenes."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from strelka_tpu.render.device_scene import build_device_scene, RAY_MASK_PRIMARY
from strelka_tpu.scene import testscenes as TS
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import pallas_intersect as PI
from strelka_tpu.ops.vec import from_rows

which = sys.argv[1]
sh = TS.cornell_box(light_intensity=5000., metal_box=True, glass_sphere=True) if which == "cornell" else TS.box_field(grid=int(which.split(":")[1]))
scene = build_device_scene(sh)
print("tris:", scene.num_triangles, flush=True)
N = 512 * 512
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([1.0]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
zo, _ = I._pixel_zorder(512, 512)
px = jnp.asarray(zo % 512, jnp.uint32); py = jnp.asarray(zo // 512, jnp.uint32)
o, d = I.generate_camera_rays(params, px, py, jnp.zeros(N), jnp.zeros(N), 512, 512)
tmin = jnp.zeros(N, jnp.float32); tmax = jnp.full(N, 1e16, jnp.float32)

def bench(name, fn, iters=6):
    try:
        t, prim = fn()
        _ = np.asarray(prim[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            t, prim = fn()
        _ = np.asarray(prim[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:40s} {dt*1e3:8.1f} ms  {N/dt/1e6:7.1f} Mrays/s", flush=True)
    except Exception as e:
        print(f"{name:40s} FAIL {str(e)[:100]}", flush=True)

for tile in (2048, 1024):
    for sup in (1, 8):
        order = PI.tile_sweep_order(o, scene.block_cents, tile) if scene.block_cents is not None and scene.block_cents.shape[0] >= 8 else None
        bench(f"vpu tile={tile} super={sup}", lambda tile=tile, sup=sup, order=order: PI.pallas_intersect_closest(
            scene.tris_packed, scene.tri_bounds, o, d, tmin, tmax, RAY_MASK_PRIMARY,
            starts=(order if sup == 8 else None), tile=tile, super_=sup))
        bench(f"mxu tile={tile} super={sup}", lambda tile=tile, sup=sup, order=order: PI.pallas_intersect_closest_mxu(
            scene.tris_feats, scene.tris_mask, scene.tri_bounds, o, d, tmin, tmax, RAY_MASK_PRIMARY,
            starts=(order if sup == 8 else None), tile=tile, super_=sup))
