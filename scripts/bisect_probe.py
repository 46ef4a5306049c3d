"""Bisect the cornell e2e regression: toggle z-order / pallas-sampler."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import sampler as S
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import cornell_box

mode = sys.argv[1]
if "nosampler" in mode:
    S.random_dims_pallas = lambda idx, depth, dims, tile=4096: S.random_dims(idx, depth, dims)

W = H = 512; spp = 4; depth = 4
sh = cornell_box(light_intensity=5000.0, metal_box=True, glass_sphere=True)
scene = build_device_scene(sh, intersector="mxu")
if "nozorder" in mode:
    # identity "z-order": row-major tiles but the unsort gather still runs
    I._pixel_zorder = lambda w, h: (np.arange(w*h, dtype=np.int64), np.arange(w*h, dtype=np.int64))
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([6.25e-4]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
state = I.make_frame_state(H, W)
def step(scene, params, state):
    return I.render_launch(scene, params, state, width=W, height=H,
        samples_per_launch=spp, max_sample_count=10000, max_depth=depth, enable_accumulation=True)
fn = jax.jit(step, donate_argnums=(2,))
state, image = fn(scene, params, state)
_ = np.asarray(image[0, 0])
t0 = time.perf_counter()
for _ in range(8):
    state, image = fn(scene, params, state)
_ = np.asarray(image[0, 0])
dt = (time.perf_counter() - t0) / 8
rays = W*H*spp*2*depth
print(f"{mode:24s} {dt*1e3:8.1f} ms/launch {rays/dt/1e6:7.1f} Mrays/s", flush=True)
