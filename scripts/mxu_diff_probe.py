"""Diff VPU vs MXU box_field renders (find where the MXU path diverges)."""
import sys
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from strelka_tpu.ops import integrator as I
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import box_field

W = H = 256; spp = 1; depth = 2
sh = box_field(grid=48)
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([6.25e-4]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
imgs = {}
for mode in ("vpu", "mxu"):
    scene = build_device_scene(sh, intersector=mode)
    state = I.make_frame_state(H, W)
    _, image = I.render_launch(scene, params, state, width=W, height=H,
        samples_per_launch=spp, max_sample_count=10000, max_depth=depth,
        enable_accumulation=False)
    imgs[mode] = np.asarray(image)
    print(mode, "mean", imgs[mode].mean(), flush=True)
a, b = imgs["vpu"], imgs["mxu"]
d = np.abs(a - b).max(axis=0)  # [H, W]
print("max abs diff", d.max(), "frac pixels >1e-2:", (d > 1e-2).mean())
ys, xs = np.where(d > max(1e-2, d.max()*0.5))
print("hot rows", ys[:10], "cols", xs[:10])
np.save("/tmp/box_vpu.npy", a); np.save("/tmp/box_mxu.npy", b)
# also first-bounce debug: depth=1 primary hit only
