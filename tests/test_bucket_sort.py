"""Bucket counting-sort permutation: Pallas kernel vs stable argsort.

The sorted-wavefront scheduler only needs stable GROUPING by the top key
bits (ops/bucket_sort.py); these tests pin the exactness contract: the
kernel's permutation must equal jnp.argsort (stable) on the bucket key for
every shape/edge case, since the integrator swaps one for the other.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from strelka_tpu.ops.bucket_sort import (
    _bases,
    _pos_pallas,
    _pos_reference,
    bucket_sort_perm,
)


def _perm_via(pos, n_pad, n):
    perm = np.zeros(n_pad, np.int32)
    perm[np.asarray(pos)] = np.arange(n_pad)
    return perm[:n]


@pytest.mark.parametrize("n,nb_buckets", [(4096, 7), (4096, 513), (2048, 1)])
def test_kernel_matches_reference(n, nb_buckets):
    rng = np.random.default_rng(7)
    key = rng.integers(0, nb_buckets, n).astype(np.int32)
    L, B = 2048, ((nb_buckets + 1 + 127) // 128) * 128
    nb = n // L
    bp = jnp.asarray(key)
    base = _bases(bp, nb, L, B)
    pos_ref = _pos_reference(bp, nb, L, B)
    pos_ker = _pos_pallas(bp, base, B=B, L=L, C=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(pos_ker), np.asarray(pos_ref))


@pytest.mark.parametrize("n", [2048, 4096, 5000, 100])
def test_perm_equals_stable_argsort(n):
    rng = np.random.default_rng(3)
    key = rng.integers(0, 512, n).astype(np.int32)
    # a sprinkle of max-bucket lanes (dead rays in the integrator use)
    key[rng.integers(0, n, n // 10)] = 511
    perm = bucket_sort_perm(
        jnp.asarray(key), 512, use_pallas=True, interpret=True
    )
    expect = np.argsort(key, kind="stable")
    np.testing.assert_array_equal(np.asarray(perm), expect)


def test_stability_preserves_prior_order():
    # all lanes in one bucket: perm must be the identity
    key = np.zeros(4096, np.int32)
    perm = bucket_sort_perm(jnp.asarray(key), 8, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(perm), np.arange(4096))


def test_fallback_is_stable_argsort():
    rng = np.random.default_rng(11)
    key = rng.integers(0, 64, 3000).astype(np.int32)
    perm = bucket_sort_perm(jnp.asarray(key), 64, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(perm), np.argsort(key, kind="stable"))


def test_open_partition_octant_groups():
    """_open_partition with p2_octant: open lanes first grouped by direction
    octant (stable within groups), closed lanes at the tail."""
    import os
    from strelka_tpu.ops.intersect import _open_partition
    from strelka_tpu.ops.vec import Vec3

    rng = np.random.default_rng(5)
    n = 4096
    open_ = jnp.asarray(rng.random(n) < 0.3)
    d = rng.standard_normal((3, n)).astype(np.float32)
    dv = Vec3(jnp.asarray(d[0]), jnp.asarray(d[1]), jnp.asarray(d[2]))
    os.environ["STRELKA_P2_OCTANT"] = "1"
    try:
        perm, pos = _open_partition(open_, dv)
    finally:
        del os.environ["STRELKA_P2_OCTANT"]
    perm_np, pos_np = np.asarray(perm), np.asarray(pos)
    # pos is the inverse of perm
    np.testing.assert_array_equal(perm_np[pos_np], np.arange(n))
    octant = (d[0] > 0) | ((d[1] > 0) << 1) | ((d[2] > 0) << 2)
    key = np.where(np.asarray(open_), octant, 8)
    expect = np.argsort(key, kind="stable")
    np.testing.assert_array_equal(perm_np, expect)
