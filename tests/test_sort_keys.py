"""Wavefront sort-key variants: the per-ray nearest-block key must match a
brute-force slab oracle, and every key variant must be a pure relabeling
(the bounce sort it feeds is restored exactly, so images are key-invariant;
hardware A/Bs check that end-to-end via bit-equal image means)."""
import types

import numpy as np

import jax
import jax.numpy as jnp

from strelka_tpu.ops import integrator as I
from strelka_tpu.ops.vec import Vec3


def _synthetic_scene(rng, nblk=64, super_=8):
    lo = rng.uniform(-10, 9, (3, nblk)).astype(np.float32)
    hi = lo + rng.uniform(0.5, 1.0, (3, nblk)).astype(np.float32)
    tb = jnp.asarray(np.concatenate([lo, hi, np.zeros((2, nblk), np.float32)]))
    sc = types.SimpleNamespace(
        tri_bounds=tb,
        kernel_super=super_,
        block_cents=jnp.zeros((nblk // super_, 3)),
        world_lo=np.array([-12.0, -12.0, -12.0]),
        world_hi=np.array([12.0, 12.0, 12.0]),
    )
    sb = np.concatenate(
        [lo.reshape(3, -1, super_).min(2), hi.reshape(3, -1, super_).max(2)]
    )
    return sc, sb


def _oracle_nearest(sb, P, D):
    nsb = sb.shape[1]
    out = []
    for i in range(P.shape[0]):
        best, bj = 1e30, nsb
        for j in range(nsb):
            invd = 1.0 / np.where(np.abs(D[i]) > 1e-20, D[i], 1e-20)
            t0 = (sb[0:3, j] - P[i]) * invd
            t1 = (sb[3:6, j] - P[i]) * invd
            tn = max(0.0, float(np.minimum(t0, t1).max()))
            tf = float(np.maximum(t0, t1).min())
            if tn <= tf and tf >= 0 and tn < best:
                best, bj = tn, j
        out.append(bj)
    return np.array(out)


def test_nearest_block_matches_slab_oracle():
    rng = np.random.default_rng(1)
    sc, sb = _synthetic_scene(rng)
    n = 512
    p = Vec3(*(jnp.asarray(rng.uniform(-12, 12, n), jnp.float32) for _ in range(3)))
    d = Vec3(*(jnp.asarray(rng.normal(size=n), jnp.float32) for _ in range(3)))
    blk, nsb = jax.jit(lambda p, d: I._nearest_block_along_ray(sc, p, d))(p, d)
    ref = _oracle_nearest(sb, np.stack([np.asarray(c) for c in (p.x, p.y, p.z)], 1),
                          np.stack([np.asarray(c) for c in (d.x, d.y, d.z)], 1))
    assert int(nsb) == 8
    np.testing.assert_array_equal(np.asarray(blk), ref)


def test_key_variants_trace_and_stay_uint32(monkeypatch):
    rng = np.random.default_rng(2)
    sc, _ = _synthetic_scene(rng)
    n = 256
    p = Vec3(*(jnp.asarray(rng.uniform(-12, 12, n), jnp.float32) for _ in range(3)))
    d = Vec3(*(jnp.asarray(rng.normal(size=n), jnp.float32) for _ in range(3)))
    keys = {}
    for env in (
        {},
        {"STRELKA_KEY_OCT_MID": "18"},
        {"STRELKA_KEY_OCT_MID": "12"},
        {"STRELKA_KEY_NEAREST_BLOCK": "1"},
        {"STRELKA_KEY_OCTANT_MAJOR": "1"},
    ):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        key = jax.jit(lambda p, d: I._ray_sort_key(sc, p, d))(p, d)
        assert key.dtype == jnp.uint32
        keys[tuple(env.items())] = np.asarray(key)
        for k in env:
            monkeypatch.delenv(k)
    # variants actually produce different orderings (not dead flags)
    orders = {tuple(np.argsort(v, kind="stable")) for v in keys.values()}
    assert len(orders) >= 4
