"""CPU probe: temporal hit-prediction HIT RATE under per-launch sample churn.

The open question for ops/hitcache.py is whether bounce rays from launch k
predict launch k+1's hits (different Sobol draws -> different directions).
This measures it without the TPU: two bounce-1 wavefronts with DIFFERENT
cosine-sample seeds, cache built from wavefront A, rate measured on B.
Ground truth comes from the CPU BVH path at reduced resolution.

Usage: python scripts/predict_rate_probe.py [grid] [res] [cell_bits]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import vec as V
from strelka_tpu.ops.hitcache import ray_hash
from strelka_tpu.ops.intersect import intersect_closest, offset_ray_vec
from strelka_tpu.ops.vec import Vec3
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY, build_device_scene
from strelka_tpu.scene.testscenes import box_field

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 24
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 128
CELL_BITS = int(sys.argv[3]) if len(sys.argv) > 3 else 7
SB_SIZE = 2048  # kernel_tblk * kernel_super on the TPU pack (256 * 8)
CACHE = 1 << 20

sh = box_field(grid=grid)
scene = build_device_scene(sh)
cam = sh.get_camera(0)
cam.update_aspect_ratio(1.0)
params = I.LaunchParams(
    subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([1.0] * 3, jnp.float32),
    bg_color=jnp.zeros(3, jnp.float32),
)
N = RES * RES
idx = jnp.arange(N, dtype=jnp.uint32)
px, py = idx % RES, idx // RES
o, d = I.generate_camera_rays(params, px, py, jnp.zeros(N), jnp.zeros(N), RES, RES)
tmin = jnp.zeros(N, jnp.float32)
tmax = jnp.full(N, 1e16, jnp.float32)


@jax.jit
def bounce(o, d, seed):
    hit = intersect_closest(scene, o, d, tmin, tmax, RAY_MASK_PRIMARY)
    alive = hit.prim >= 0
    position, _uv, frame, *_ = I._gather_surface(scene, hit, jnp.zeros(N, bool))
    k = jax.random.split(jax.random.PRNGKey(seed), 2)
    u1 = jax.random.uniform(k[0], (N,))
    u2 = jax.random.uniform(k[1], (N,))
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    nd = frame.tangent_u * (r * jnp.cos(phi)) + frame.tangent_v * (r * jnp.sin(phi)) + frame.normal * jnp.sqrt(jnp.maximum(1 - u1, 0.0))
    nd = V.normalize(Vec3(nd.x, nd.y, nd.z))
    no = offset_ray_vec(position, frame.geom_normal)
    hit2 = intersect_closest(scene, no, nd, tmin, tmax, RAY_MASK_PRIMARY,
                             active=alive, exclude=hit.prim)
    return no, nd, hit2.prim, alive & (hit2.prim >= 0)


# map CPU (unsorted) prim ids -> the TPU pack's Morton-sorted ids so block
# locality matches what the TPU kernels would see
from strelka_tpu.ops.pallas_intersect import morton_sort_tris

v0 = np.asarray(scene.v0)
e1 = np.asarray(scene.e1)
e2 = np.asarray(scene.e2)
order = np.asarray(morton_sort_tris(np.stack([v0, v0 + e1, v0 + e2], axis=1)))
rank = np.empty(order.shape[0], np.int64)
rank[order] = np.arange(order.shape[0])


def sb_of(prim):
    p = np.asarray(prim)
    out = np.where(p >= 0, rank[np.clip(p, 0, None)] // SB_SIZE, -1)
    return out


class _S:
    world_lo = scene.world_lo
    world_hi = scene.world_hi


import strelka_tpu.ops.hitcache as HC

N_WARM = 4  # cache accumulates over this many launches before evaluation
waves = []
for seed in range(N_WARM + 1):
    no, nd, prim, ok = bounce(o, d, seed)
    waves.append((no, nd, sb_of(prim), np.asarray(ok)))
    print(f"wavefront seed {seed}: alive={np.asarray(ok).mean():.2f}")

for cell_bits in (6, 7, 8):
    for dir_bits in (1, 2, 3):
        HC.CELL_BITS = cell_bits
        HC.DIR_BITS = dir_bits
        cache = np.full(CACHE, -1, np.int64)
        for no, nd, sb, ok in waves[:N_WARM]:
            h = np.asarray(ray_hash(_S(), no, nd, CACHE))
            cache[h[ok]] = sb[ok]  # last-writer-wins like the device
        noB, ndB, sbB, okB = waves[N_WARM]
        hB = np.asarray(ray_hash(_S(), noB, ndB, CACHE))
        pred = cache[hB]
        have = pred[okB] >= 0
        correct = (pred[okB] == sbB[okB]) & have
        print(
            f"grid={grid} res={RES} warm={N_WARM} cell={cell_bits} dir={dir_bits}: "
            f"predicted={have.mean():.3f} "
            f"hit(all)={correct.mean():.3f} "
            f"hit(|pred)={correct.sum()/max(have.sum(),1):.3f}"
        )
