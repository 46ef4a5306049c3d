"""TPU probe: hair scenes e2e (hair_patch 10k cones, hair_long 800k cones).

A/B the cone residual two-pass with STRELKA_CONE_NO_TWOPASS=1.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import os as _os_env
print("env:", {k: v for k, v in _os_env.environ.items() if k.startswith("STRELKA_")}, flush=True)


def run(name, width=384, height=384, spp=2, depth=4, iters=3):
    import jax
    import jax.numpy as jnp

    import bench
    from strelka_tpu.ops import integrator as I
    from strelka_tpu.render.device_scene import build_device_scene

    host = bench.build_host_scene(name)
    scene = build_device_scene(host)
    cam = host.get_camera(0)
    cam.update_aspect_ratio(width / height)
    params = I.LaunchParams(
        subframe_index=jnp.int32(0),
        clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
        view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
        exposure=jnp.asarray([6.25e-4] * 3, jnp.float32),
        bg_color=jnp.full(3, 0.1, jnp.float32),
    )
    state = I.make_frame_state(height, width)

    def step(scene, params, state):
        return I.render_launch(
            scene, params, state, width=width, height=height,
            samples_per_launch=spp, max_sample_count=10000, max_depth=depth,
            enable_accumulation=True,
        )

    fn = jax.jit(step, donate_argnums=(2,))
    t0 = time.perf_counter()
    state, image = fn(scene, params, state)
    np.asarray(image[0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, image = fn(scene, params, state)
    np.asarray(image[0, 0])
    dt = (time.perf_counter() - t0) / iters
    rays = width * height * spp * 2 * depth
    img = np.asarray(image)
    from strelka_tpu.ops.curves import CURVE_SUBDIV

    print(
        f"{name:12s} cones={scene.num_curve_segments * CURVE_SUBDIV:8d} {dt*1e3:8.1f} ms/launch "
        f"{rays/dt/1e6:7.2f} Mrays/s compile={compile_s:.0f}s "
        f"mean={img.mean():.5f} finite={np.isfinite(img).all()}"
    )


if __name__ == "__main__":
    import os

    print("STRELKA_CONE_NO_TWOPASS =", os.environ.get("STRELKA_CONE_NO_TWOPASS", ""))
    run("hair_patch")
    run("hair_long", iters=2)
