"""Time JUST the intersection sweeps at launch scale (8 chained, one jit)."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from strelka_tpu.render.device_scene import build_device_scene, RAY_MASK_PRIMARY, RAY_MASK_SHADOW
from strelka_tpu.scene.testscenes import cornell_box
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops.intersect import intersect_closest, intersect_any

sh = cornell_box(light_intensity=5000., metal_box=True, glass_sphere=True)
scene = build_device_scene(sh, intersector="mxu")
N = 512 * 512 * 4  # 1M rays (bench wavefront)
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([1.0]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
zo, _ = I._pixel_zorder(512, 512)
px = jnp.tile(jnp.asarray(zo % 512, jnp.uint32), 4); py = jnp.tile(jnp.asarray(zo // 512, jnp.uint32), 4)
o, d = I.generate_camera_rays(params, px, py, jnp.zeros(N), jnp.zeros(N), 512, 512)
tmin = jnp.zeros(N); tmax = jnp.full(N, 1e16)

def sweeps(o, d):
    t_acc = jnp.zeros(N)
    for i in range(4):
        hit = intersect_closest(scene, o, d, tmin, tmax, RAY_MASK_PRIMARY)
        occ = intersect_any(scene, o, d, tmin, jnp.full(N, 3.0), RAY_MASK_SHADOW)
        t_acc = t_acc + hit.t * 1e-20 + occ.astype(jnp.float32) * 1e-20
        # perturb rays so sweeps can't be CSE'd
        d = d._replace(x=d.x + t_acc * 1e-30)
    return t_acc

fn = jax.jit(sweeps)
r = fn(o, d); _ = np.asarray(r[0])
t0 = time.perf_counter()
for _ in range(6):
    r = fn(o, d)
_ = np.asarray(r[0])
dt = (time.perf_counter() - t0) / 6
print(f"8 sweeps at 1M rays: {dt*1e3:.1f} ms  ({dt*1e3/8:.1f} ms/sweep)", flush=True)
