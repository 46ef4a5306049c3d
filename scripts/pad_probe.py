"""Does 2048-multiple padding (nb=8 vs 3) explain cornell's regression?"""
import sys, time, functools
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import strelka_tpu.ops.pallas_intersect as PI
# force small-pad packing (super_=1) for the device-scene build
PI.pack_tris = functools.partial(PI.pack_tris.__wrapped__ if hasattr(PI.pack_tris, "__wrapped__") else PI.pack_tris, super_=1) if False else PI.pack_tris
_orig_pt, _orig_ptm, _orig_bb = PI.pack_tris, PI.pack_tris_mxu, PI.block_bounds
PI.pack_tris = lambda v0, e1, e2, m, tblk=256, super_=8: _orig_pt(v0, e1, e2, m, tblk=tblk, super_=1)
PI.pack_tris_mxu = lambda v0, e1, e2, m, tblk=256, super_=8: _orig_ptm(v0, e1, e2, m, tblk=tblk, super_=1)
PI.block_bounds = lambda v0, e1, e2, m, tblk=256, super_=8: _orig_bb(v0, e1, e2, m, tblk=tblk, super_=1)

from strelka_tpu.ops import integrator as I
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import cornell_box

W = H = 512; spp = 4; depth = 4
sh = cornell_box(light_intensity=5000.0, metal_box=True, glass_sphere=True)
scene = build_device_scene(sh, intersector="mxu")
print("packed tris:", scene.tris_packed.shape, flush=True)
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
print(f"smallpad  {dt*1e3:8.1f} ms/launch {W*H*spp*2*depth/dt/1e6:7.1f} Mrays/s", flush=True)
