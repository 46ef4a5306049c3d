"""TPU perf probe: cornell + box_field timings under the current kernels."""
import sys, time
import numpy as np

sys.path.insert(0, ".")
import os as _os_env
print("env:", {k: v for k, v in _os_env.environ.items() if k.startswith("STRELKA_")}, flush=True)

def build(scene_name, width, height, spp, depth, intersector="mxu"):
    import jax.numpy as jnp
    from strelka_tpu.ops import integrator as I
    from strelka_tpu.render.device_scene import build_device_scene
    from strelka_tpu.scene import testscenes as TS

    if scene_name == "cornell":
        sh = TS.cornell_box(light_intensity=5000.0, metal_box=True, glass_sphere=True)
    elif scene_name == "kitchen":
        from strelka_tpu.loaders.usd import UsdLoader
        from strelka_tpu.scene.kitchen_gen import ensure_kitchen
        from strelka_tpu.scene.scene import Scene

        sh = Scene()
        assert UsdLoader().load(ensure_kitchen(), sh)
    else:
        sh = TS.box_field(grid=int(scene_name.split(":")[1]))
    scene = build_device_scene(sh, intersector=intersector)
    cam = sh.get_camera(0)
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
    return step, scene, params, state, scene.num_triangles


def run(name, width=512, height=512, spp=2, depth=4, iters=6, intersector="auto"):
    import jax
    step, scene, params, state, ntri = build(name, width, height, spp, depth, intersector)
    fn = jax.jit(step, donate_argnums=(2,))
    t0 = time.perf_counter()
    state, image = fn(scene, params, state)
    _ = np.asarray(image[0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    st = state
    for _ in range(iters):
        st, image = fn(scene, params, st)
    _ = np.asarray(image[0, 0])
    dt = (time.perf_counter() - t0) / iters
    rays = width * height * spp * 2 * depth
    img = np.asarray(image)
    print(f"{name:16s} {intersector:3s} tris={ntri:7d} {dt*1e3:8.1f} ms/launch "
          f"{rays/dt/1e6:8.2f} Mrays/s  compile={compile_s:.0f}s  mean={img.mean():.4f} finite={np.isfinite(img).all()}")
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "cornell"):
        run("cornell", spp=4, intersector="mxu")
        run("cornell", spp=4, intersector="vpu")
    if which in ("all", "box"):
        run("box:48", spp=2, iters=3, intersector="auto")
    if which == "box24":
        run("box:24", spp=2, iters=3, intersector="mxu")
    if which == "kitchen":
        run("kitchen", spp=2, iters=3, intersector="auto")
    if which == "kitchen_ab":
        run("kitchen", spp=2, iters=3, intersector="vpu")
        run("kitchen", spp=2, iters=3, intersector="mxu")
