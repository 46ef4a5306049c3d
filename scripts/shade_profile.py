"""Time the pieces of one bounce on a 1M-ray cornell wavefront: gathers,
BSDF sample/eval, light sampling, canaries — direct attribution for the
fusion(misc) bucket."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from strelka_tpu.render.device_scene import build_device_scene, RAY_MASK_PRIMARY
from strelka_tpu.scene.testscenes import cornell_box
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import bsdf as B
from strelka_tpu.ops import light_sampling as LS
from strelka_tpu.ops import sampler as S
from strelka_tpu.ops import vec as V
from strelka_tpu.ops.intersect import intersect_closest, offset_ray_vec
from strelka_tpu.ops.vec import Vec3

sh = cornell_box(light_intensity=5000., metal_box=True, glass_sphere=True)
scene = build_device_scene(sh, intersector="mxu")
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([1.0]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
spp = 4
N = 512*512*spp
zo, _ = I._pixel_zorder(512, 512)
px = jnp.tile(jnp.asarray(zo % 512, jnp.uint32), spp)
py = jnp.tile(jnp.asarray(zo // 512, jnp.uint32), spp)
o, d = I.generate_camera_rays(params, px, py, jnp.zeros(N), jnp.zeros(N), 512, 512)
tmin = jnp.zeros(N, jnp.float32); tmax = jnp.full(N, 1e16, jnp.float32)
sidx = S.make_sample_index(px, py, jnp.zeros(N, jnp.uint32), 64)

hit = jax.jit(lambda: intersect_closest(scene, o, d, tmin, tmax, RAY_MASK_PRIMARY))()
jax.block_until_ready(hit.t)


def bench(name, fn, iters=8):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:7.2f} ms", flush=True)
    return out


inside = jnp.zeros(N, bool)
out = bench("gather_surface (attr+transpose)", jax.jit(lambda: I._gather_surface(scene, hit, inside)))
position, uv, frame, mat_id, light_id = out
mat, _ = bench("gather_material", jax.jit(lambda: I._gather_material(scene, hit.prim)))
dim_rows = bench("random_dims_pallas x5", jax.jit(lambda: S.random_dims_pallas(sidx, 1, (0, 1, 2, 3, 4))))
xi = (dim_rows[0], dim_rows[1], dim_rows[2], dim_rows[3])
k1 = Vec3(-d.x, -d.y, -d.z)
smp = bench("bsdf_sample", jax.jit(lambda: B.bsdf_sample(mat, frame, k1, xi, jnp.ones(N), jnp.full(N, 1.5), enable_hair=False)))
lp = bench("gather_light", jax.jit(lambda: I._gather_light(scene, jnp.zeros(N, jnp.int32))))
ls = bench("sample_light", jax.jit(lambda: LS.sample_light(lp, dim_rows[0], dim_rows[1], position, 0)))
ev = bench("bsdf_evaluate", jax.jit(lambda: B.bsdf_evaluate(mat, frame, k1, ls.L, enable_hair=False)))
bench("offset_ray", jax.jit(lambda: offset_ray_vec(position, frame.geom_normal)))
bench("packed [n,11] permute", jax.jit(lambda: I._permute_packed(
    jnp.arange(N, dtype=jnp.int32)[::-1],
    [position.x, position.y, position.z, uv[0],
     frame.normal.x, frame.normal.y, frame.normal.z, d.x, d.y],
    [mat_id, light_id])))
