"""Long-run stability soak: reference-config converged renders.

cornell at 2048 spp / depth 4 (the reference's Kitchen-Set config scale,
images/Kitchen_2048i_4d_2048spp_0.png) and box_field at 128 spp — checks
progressive accumulation over hundreds of launches for NaN/drift.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import tonemap as TM
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene import testscenes as TS
from strelka_tpu.utils.image import write_png

def soak(name, host, spp_total, spl, depth, W=512, H=512, exposure=6.25e-4):
    scene = build_device_scene(host)
    cam = host.get_camera(0); cam.update_aspect_ratio(W / H)
    params = I.LaunchParams(subframe_index=jnp.int32(0),
        clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
        view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
        exposure=jnp.asarray([exposure]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
    state = I.make_frame_state(H, W)
    def step(scene, params, state):
        st, img = I.render_launch(scene, params, state, width=W, height=H,
            samples_per_launch=spl, max_sample_count=spp_total, max_depth=depth,
            enable_accumulation=True)
        img = TM.apply_tonemap_planar(img, TM.ToneMapperType.eReinhard, params.exposure, 2.4)
        return st, img
    fn = jax.jit(step)
    t0 = time.perf_counter()
    launches = spp_total // spl
    for i in range(launches):
        state, img = fn(scene, params, state)
        params = params._replace(subframe_index=params.subframe_index + spl)
        if (i + 1) % max(launches // 4, 1) == 0:
            a = np.asarray(img)
            assert np.isfinite(a).all(), f"NaN at launch {i}"
            print(f"  {name}: {(i+1)*spl} spp, mean={a.mean():.5f}, {time.perf_counter()-t0:.0f}s", flush=True)
    out = np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1)
    path = f"images/{name}_{spp_total}spp_{depth}d.png"
    write_png(path, out)
    print(f"{path} done in {time.perf_counter()-t0:.0f}s over {launches} launches", flush=True)

soak("cornell", TS.cornell_box(light_intensity=5000.0, metal_box=True, glass_sphere=True), 2048, 8, 4)
soak("box_field", TS.box_field(grid=48), 128, 2, 4, exposure=2e-4)

# Kitchen Set headline config: 2048 spp / 4 bounces (the reference's
# converged image config, images/Kitchen_2048i_4d_2048spp_0.png) — records
# the wall-clock BASELINE.md says to establish
from strelka_tpu.loaders.usd import UsdLoader
from strelka_tpu.scene.kitchen_gen import ensure_kitchen
from strelka_tpu.scene.scene import Scene
if "--kitchen" in sys.argv:
    host = Scene()
    UsdLoader().load(ensure_kitchen(), host)
    soak("kitchen", host, 2048, 4, 4, exposure=1.2e-3)
