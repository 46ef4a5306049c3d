"""Fast TPU compile smoke of the dense sweep kernels (fails in ~1 min if a
Mosaic lowering breaks — cheaper than discovering it inside a 5-min e2e
probe; fact #48). Run: python scripts/kernel_smoke.py [tris|cone]"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

which = sys.argv[1] if len(sys.argv) > 1 else "tris"
rng = np.random.default_rng(0)
n = 4096
o = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
d = rng.normal(size=(n, 3)); d /= np.linalg.norm(d, axis=1, keepdims=True)
d = jnp.asarray(d, jnp.float32)
tmin = jnp.zeros(n, jnp.float32); tmax = jnp.full(n, 1e16, jnp.float32)

if which == "tris":
    from strelka_tpu.ops.pallas_intersect import (
        pack_tris, block_bounds, pallas_intersect_closest, pallas_intersect_any,
    )
    from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY
    m = 4096
    v0 = rng.uniform(-5, 5, (m, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.3, (m, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.3, (m, 3)).astype(np.float32)
    mask = np.full(m, 255, np.int32)
    tris = pack_tris(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(mask))
    bb = block_bounds(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(mask))
    t0 = time.perf_counter()
    t, prim = pallas_intersect_closest(tris, bb, o, d, tmin, tmax, RAY_MASK_PRIMARY)
    occ = pallas_intersect_any(tris, bb, o, d, tmin, tmax, RAY_MASK_PRIMARY)
    print("closest/any compiled+ran", time.perf_counter() - t0,
          "hits:", int((np.asarray(prim) >= 0).sum()), int(np.asarray(occ).sum()), flush=True)
    assert (np.asarray(prim) >= 0).any()
else:
    from strelka_tpu.ops.curves import FlatCones, morton_sort_cones, pack_cones, pallas_intersect_cones
    m = 4096
    a = rng.uniform(-5, 5, (m, 3)).astype(np.float32)
    b = a + rng.normal(0, 0.4, (m, 3)).astype(np.float32)
    ra = rng.uniform(0.01, 0.15, m).astype(np.float32)
    rb = rng.uniform(0.01, 0.15, m).astype(np.float32)
    cones = FlatCones(a=jnp.asarray(a), b=jnp.asarray(b), ra=jnp.asarray(ra), rb=jnp.asarray(rb),
                      seg_id=jnp.arange(m, dtype=jnp.int32), u0=jnp.zeros(m), u1=jnp.ones(m))
    perm = morton_sort_cones(cones)
    cones = FlatCones(*[jnp.asarray(np.asarray(f)[perm]) for f in cones])
    packed, bounds = pack_cones(cones)
    t0 = time.perf_counter()
    t, cone = pallas_intersect_cones(packed, bounds, o, d, tmin, tmax)
    occ = pallas_intersect_cones(packed, bounds, o, d, tmin, tmax, any_hit=True)
    print("cone closest/any compiled+ran", time.perf_counter() - t0,
          "hits:", int((np.asarray(cone) >= 0).sum()), int(np.asarray(occ).sum()), flush=True)
    assert (np.asarray(cone) >= 0).any()
