"""A/B: VPU vs MXU intersector on box_field e2e (bounce sweeps are
MT-flop-bound per NOTES #24 -> MXU's raw matmul throughput should win there
even though VPU wins camera-coherent culled sweeps)."""
import os, sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

_flags = {k: v for k, v in os.environ.items() if k.startswith("STRELKA_")}
print(f"env: {_flags}", flush=True)
from strelka_tpu.ops import integrator as I
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import box_field

W = H = 512; spp = 2; depth = 4
sh = box_field(grid=48)
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([6.25e-4]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))

for mode in (sys.argv[1:] or ["vpu", "mxu"]):
    scene = build_device_scene(sh, intersector=mode)
    state = I.make_frame_state(H, W)
    def step(scene, params, state):
        return I.render_launch(scene, params, state, width=W, height=H,
            samples_per_launch=spp, max_sample_count=10000, max_depth=depth,
            enable_accumulation=True)
    fn = jax.jit(step, donate_argnums=(2,))
    state, image = fn(scene, params, state)
    _ = np.asarray(image[0, 0])
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        state, image = fn(scene, params, state)
    _ = np.asarray(image[0, 0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    img = np.asarray(image)
    print(f"{mode}: {dt:.0f} ms/launch  mean={img.mean():.5f} nan={np.isnan(img).any()}", flush=True)
