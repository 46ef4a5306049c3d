"""Residual two-pass vs single-pass: correctness + perf on captured
bounce-1 rays (/tmp/bounce_rays_<grid>.npz from capture_bounce.py) and on
Z-order camera rays.

Usage: python scripts/residual_probe.py [grid] [K ...]
"""
import os, sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

import strelka_tpu.ops.intersect as X
from strelka_tpu.render.device_scene import build_device_scene, RAY_MASK_PRIMARY, RAY_MASK_SHADOW
from strelka_tpu.scene.testscenes import box_field
from strelka_tpu.ops import integrator as I
from strelka_tpu.ops.vec import Vec3

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
ks = [int(a) for a in sys.argv[2:]] or [16]
sh = box_field(grid=grid)
scene = build_device_scene(sh)
print("tris:", scene.num_triangles, flush=True)
use_mxu = scene.intersector == "mxu" and scene.tris_feats is not None
print("use_mxu:", use_mxu, flush=True)

data = np.load("/tmp/bounce_rays_%d.npz" % grid)
N = data["ox"].shape[0]
o = Vec3(jnp.asarray(data["ox"]), jnp.asarray(data["oy"]), jnp.asarray(data["oz"]))
d = Vec3(jnp.asarray(data["dx"]), jnp.asarray(data["dy"]), jnp.asarray(data["dz"]))
excl = jnp.asarray(data["excl"])
alive = jnp.asarray(data["alive"])
tmin = jnp.zeros(N, jnp.float32)
tmax = jnp.where(alive, 1e16, 0.0).astype(jnp.float32)
print("alive frac:", float(alive.mean()), flush=True)

single_c = jax.jit(lambda: X._run_super_closest(
    scene, use_mxu, o, d, tmin, tmax, RAY_MASK_PRIMARY, excl,
    X._tile_starts(scene, o)))
single_a = jax.jit(lambda: X._run_super_any(
    scene, use_mxu, o, d, tmin, jnp.where(alive, 60.0, 0.0), RAY_MASK_SHADOW, excl,
    X._tile_starts(scene, o)))


def bench(name, fn, iters=3):
    out = fn()
    first = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(first[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    first = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(first[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1e3:8.1f} ms  {N/dt/1e6:7.1f} Mrays/s", flush=True)
    return out


t1, p1 = bench("single closest", single_c)
occ1 = bench("single any", single_a)

for K in ks:
    X.RESIDUAL_K = K
    two_c = jax.jit(lambda: X._closest_twopass(
        scene, use_mxu, o, d, tmin, tmax, RAY_MASK_PRIMARY, excl))
    two_a = jax.jit(lambda: X._any_twopass(
        scene, use_mxu, o, d, tmin, jnp.where(alive, 60.0, 0.0), RAY_MASK_SHADOW, excl))
    t2, p2 = bench(f"twopass closest K={K}", two_c)
    occ2 = bench(f"twopass any K={K}", two_a)
    pm = np.asarray(p1) != np.asarray(p2)
    tm = ~np.isclose(np.asarray(t1), np.asarray(t2), rtol=1e-5)
    om = np.asarray(occ1) != np.asarray(occ2)
    print(f"  K={K}: prim mismatches={pm.sum()}  t mismatches={tm.sum()}  occ mismatches={om.sum()}", flush=True)
