"""Capture a REALISTIC bounce-1 wavefront from box_field for sweep probes.

Camera rays (Z-order) -> closest hit -> cosine-sampled secondary directions
from the hit frame, origins offset off the surface; saves o/d/excl/alive (+
the morton-sorted permutation the integrator would apply) to
/tmp/bounce_rays_<grid>.npz.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from strelka_tpu.render.device_scene import build_device_scene, RAY_MASK_PRIMARY
from strelka_tpu.scene.testscenes import box_field
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops.intersect import intersect_closest, offset_ray_vec
from strelka_tpu.ops import vec as V
from strelka_tpu.ops.vec import Vec3

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
W = H = 512
sh = box_field(grid=grid)
scene = build_device_scene(sh)
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([1.0]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
N = W * H
zo, _ = I._pixel_zorder(W, H)
px = jnp.asarray(zo % W, jnp.uint32); py = jnp.asarray(zo // W, jnp.uint32)
o, d = I.generate_camera_rays(params, px, py, jnp.zeros(N), jnp.zeros(N), W, H)
tmin = jnp.zeros(N, jnp.float32); tmax = jnp.full(N, 1e16, jnp.float32)

@jax.jit
def first_bounce(o, d):
    hit = intersect_closest(scene, o, d, tmin, tmax, RAY_MASK_PRIMARY)
    alive = hit.prim >= 0
    position, _uv, frame, *_rest = I._gather_surface(scene, hit, jnp.zeros(N, bool))
    # cosine-hemisphere sample around the shading normal (bsdf-shaped dirs)
    k = jax.random.split(jax.random.PRNGKey(7), 2)
    u1 = jax.random.uniform(k[0], (N,)); u2 = jax.random.uniform(k[1], (N,))
    r = jnp.sqrt(u1); phi = 2 * jnp.pi * u2
    lx = r * jnp.cos(phi); ly = r * jnp.sin(phi); lz = jnp.sqrt(jnp.maximum(1 - u1, 0.0))
    nd = frame.tangent_u * lx + frame.tangent_v * ly + frame.normal * lz
    nd = V.normalize(Vec3(nd.x, nd.y, nd.z))
    no = offset_ray_vec(position, frame.geom_normal)
    return no, nd, hit.prim, alive

no, nd, prim, alive = first_bounce(o, d)
key = I._ray_sort_key(scene, no, nd)
key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
perm = jnp.argsort(key)
out = "/tmp/bounce_rays_%d.npz" % grid
np.savez(out,
         ox=np.asarray(no.x)[perm], oy=np.asarray(no.y)[perm], oz=np.asarray(no.z)[perm],
         dx=np.asarray(nd.x)[perm], dy=np.asarray(nd.y)[perm], dz=np.asarray(nd.z)[perm],
         excl=np.asarray(prim)[perm], alive=np.asarray(alive)[perm])
print("saved", out, "alive frac:", float(np.asarray(alive).mean()))
