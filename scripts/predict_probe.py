"""TPU A/B: temporal hit prediction (STRELKA_HIT_PREDICT) on box_field.

Honest protocol: subframe_index ADVANCES each launch (progressive Sobol
churn, exactly like production render.py) — a fixed subframe would re-trace
identical rays and overstate the cache hit rate. Timing starts at launch 2:
launch 0 compiles, launch 1 warms the cache.

Usage: python scripts/predict_probe.py [grid] [iters]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import os as _os_env
print("env:", {k: v for k, v in _os_env.environ.items() if k.startswith("STRELKA_")}, flush=True)


def run(predict: bool, grid, iters: int, width=512, height=512, spp=2, depth=4):
    os.environ["STRELKA_HIT_PREDICT"] = "1" if predict else "0"
    import jax
    import jax.numpy as jnp

    from strelka_tpu.ops import integrator as I
    from strelka_tpu.render.device_scene import build_device_scene
    from strelka_tpu.scene import testscenes as TS

    if grid == "kitchen":
        from strelka_tpu.loaders.usd import UsdLoader
        from strelka_tpu.scene.kitchen_gen import ensure_kitchen
        from strelka_tpu.scene.scene import Scene

        sh = Scene()
        assert UsdLoader().load(ensure_kitchen(), sh)
    else:
        sh = TS.box_field(grid=int(grid))
    scene = build_device_scene(sh, intersector="vpu")
    cam = sh.get_camera(0)
    cam.update_aspect_ratio(width / height)

    def step(scene, params, state):
        return I.render_launch(
            scene, params, state, width=width, height=height,
            samples_per_launch=spp, max_sample_count=10000, max_depth=depth,
            enable_accumulation=True,
        )

    fn = jax.jit(step, donate_argnums=(2,))

    def params_at(sub):
        return I.LaunchParams(
            subframe_index=jnp.int32(sub),
            clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
            view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
            exposure=jnp.asarray([6.25e-4] * 3, jnp.float32),
            bg_color=jnp.full(3, 0.1, jnp.float32),
        )

    state = I.make_frame_state(height, width, predict=predict)
    t0 = time.perf_counter()
    state, image = fn(scene, params_at(0), state)
    np.asarray(image[0, 0])
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        state, image = fn(scene, params_at(i * spp), state)
        np.asarray(image[0, 0])
        times.append(time.perf_counter() - t0)
    img = np.asarray(image)
    steady = times[1:] if len(times) > 1 else times
    dt = float(np.mean(steady))
    rays = width * height * spp * 2 * depth
    print(
        f"predict={int(predict)} grid={grid} tris={scene.num_triangles} "
        f"{dt*1e3:8.1f} ms/launch {rays/dt/1e6:7.2f} Mrays/s "
        f"(launch1 {times[0]*1e3:.1f} ms, compile {compile_s:.0f}s) "
        f"mean={img.mean():.5f} finite={np.isfinite(img).all()}"
    )
    return img, dt


if __name__ == "__main__":
    grid = sys.argv[1] if len(sys.argv) > 1 else 48
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    img_off, dt_off = run(False, grid, iters)
    img_on, dt_on = run(True, grid, iters)
    diff = np.abs(img_on - img_off)
    print(
        f"speedup x{dt_off/dt_on:.3f}  image max|diff|={diff.max():.3e} "
        f"mean|diff|={diff.mean():.3e} (sweep-order ties only)"
    )
