"""Native C++ BVH builder: build, validate vs oracle, compare speed."""

import time

import numpy as np
import jax.numpy as jnp
import pytest

from strelka_tpu.native import native_build_bvh
from strelka_tpu.ops.bvh import (
    ThreadedBvh,
    _build_bvh_numpy,
    intersect_bvh,
    thread_bvh,
)
from strelka_tpu.ops.intersect import intersect_closest_bruteforce
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY


def _random_tris(n, rng, spread=10.0):
    v0 = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    return v0, e1, e2


class _Shim:
    def __init__(self, v0, e1, e2, mask):
        self.v0, self.e1, self.e2 = jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)
        self.geom_mask = jnp.asarray(mask)
        self.bvh = None


def test_native_build_valid_tree():
    rng = np.random.default_rng(0)
    v0, e1, e2 = _random_tris(5000, rng)
    out = native_build_bvh(v0, e1, e2, 4)
    assert out is not None, "native builder unavailable (g++ missing?)"
    nodes, perm = out
    assert sorted(perm.tolist()) == list(range(5000))
    count = np.asarray(nodes.count)
    start = np.asarray(nodes.start)
    covered = np.zeros(5000, bool)
    for i in range(len(count)):
        if count[i] > 0:
            assert 0 < count[i] <= 4
            covered[start[i] : start[i] + count[i]] = True
    assert covered.all()


def test_native_traversal_matches_bruteforce():
    rng = np.random.default_rng(1)
    v0, e1, e2 = _random_tris(3000, rng)
    out = native_build_bvh(v0, e1, e2, 4)
    assert out is not None
    nodes, perm = out
    v0p, e1p, e2p = v0[perm], e1[perm], e2[perm]
    mask = np.ones(3000, np.int32)
    o = rng.uniform(-12, 12, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tb = ThreadedBvh(*[jnp.asarray(np.asarray(x)) for x in thread_bvh(nodes)])
    t, prim, _, _ = intersect_bvh(
        tb,
        jnp.asarray(v0p),
        jnp.asarray(e1p),
        jnp.asarray(e2p),
        jnp.asarray(mask),
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.zeros(512, jnp.float32),
        jnp.full(512, 1e16, jnp.float32),
        RAY_MASK_PRIMARY,
    )
    hb = intersect_closest_bruteforce(
        _Shim(v0p, e1p, e2p, mask),
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.zeros(512, jnp.float32),
        jnp.full(512, 1e16, jnp.float32),
        RAY_MASK_PRIMARY,
    )
    np.testing.assert_array_equal(np.asarray(prim) >= 0, np.asarray(hb.prim) >= 0)
    hits = np.asarray(prim) >= 0
    np.testing.assert_allclose(np.asarray(t)[hits], np.asarray(hb.t)[hits], rtol=1e-4)


def test_native_faster_than_numpy():
    rng = np.random.default_rng(2)
    v0, e1, e2 = _random_tris(60000, rng)
    t0 = time.perf_counter()
    out = native_build_bvh(v0, e1, e2, 4)
    t_native = time.perf_counter() - t0
    assert out is not None
    t0 = time.perf_counter()
    _build_bvh_numpy(v0, e1, e2, 4)
    t_numpy = time.perf_counter() - t0
    # native should be dramatically faster; keep a conservative bound
    assert t_native < t_numpy, (t_native, t_numpy)
    print(f"native {t_native*1e3:.0f}ms vs numpy {t_numpy*1e3:.0f}ms")
