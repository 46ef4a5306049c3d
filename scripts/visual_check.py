"""Render cornell at 512x512/512spp on TPU with the MXU intersector and save
a PNG for acne inspection; also prints per-face variance stats."""
import sys, time
import numpy as np
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import tonemap as TM
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import cornell_box
from strelka_tpu.utils.image import write_png

W = H = 512
sh = cornell_box(light_intensity=5000.0, metal_box=True, glass_sphere=True)
scene = build_device_scene(sh, intersector=sys.argv[1] if len(sys.argv) > 1 else "mxu")
cam = sh.get_camera(0)
cam.update_aspect_ratio(1.0)
params = I.LaunchParams(
    subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([6.25e-4] * 3, jnp.float32),
    bg_color=jnp.zeros(3, jnp.float32),
)
state = I.make_frame_state(H, W)

def step(scene, params, state):
    st, img = I.render_launch(
        scene, params, state, width=W, height=H, samples_per_launch=8,
        max_sample_count=100000, max_depth=4, enable_accumulation=True,
    )
    img = TM.apply_tonemap_planar(img, TM.ToneMapperType.eReinhard, params.exposure, 2.4)
    return st, img

fn = jax.jit(step)
for i in range(16):  # 128 spp
    state, img = fn(scene, params, state)
    params = params._replace(subframe_index=params.subframe_index + 8)
img = np.asarray(img)
out = np.clip(img.transpose(1, 2, 0), 0, 1)
name = f"/tmp/cornell_{sys.argv[1] if len(sys.argv)>1 else 'mxu'}_128spp.png"
write_png(name, out, flip=False)
print("saved", name, "mean", out.mean())
# acne shows as salt-and-pepper on flat walls: check local variance on the
# back wall region (should be tiny at 128 spp)
wall = out[200:300, 200:300, :].mean(-1)
lv = np.abs(wall - np.median(wall))
print("back-wall median abs dev:", float(np.median(lv)), "p99:", float(np.quantile(lv, 0.99)))
