"""Grouped-rounds per-ray traversal (ops/rounds.py) vs brute force.

Exactness contract: lanes the scheduler CLOSES must already hold the true
closest hit / occlusion; lanes left open hold a valid conservative bound
and are finished by the caller's residual pass. With a round budget larger
than the block count, nothing stays open and the result is exact outright.
"""

import numpy as np

import jax.numpy as jnp

from strelka_tpu.ops.intersect import (
    intersect_any_bruteforce,
    intersect_closest_bruteforce,
)
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY
from strelka_tpu.ops.pallas_intersect import (
    block_bounds,
    pack_tris,
    pallas_intersect_any_wl,
    pallas_intersect_closest_wl,
    super_bounds_jnp,
)
from strelka_tpu.ops.rounds import ray_next_block, rounds_traverse
from strelka_tpu.ops.vec import Vec3, from_rows


class _Shim:
    def __init__(self, v0, e1, e2, mask):
        self.v0 = jnp.asarray(v0)
        self.e1 = jnp.asarray(e1)
        self.e2 = jnp.asarray(e2)
        self.geom_mask = jnp.asarray(mask)


def _scene(n, rng):
    base = (rng.random((n, 3), np.float32) - 0.5) * 20.0
    e1 = rng.random((n, 3), np.float32) * 0.8
    e2 = rng.random((n, 3), np.float32) * 0.8
    mask = np.full(n, 0xFF, np.int32)
    return base, e1, e2, mask


def _rays(n, rng):
    o = (rng.random((n, 3), np.float32) - 0.5) * 24.0
    d = rng.random((n, 3), np.float32) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def _setup(seed=23, n_tri=4096, n_ray=512):
    rng = np.random.default_rng(seed)
    v0, e1, e2, mask = _scene(n_tri, rng)
    o, d = _rays(n_ray, rng)
    tmin = np.zeros(n_ray, np.float32)
    tmax = np.full(n_ray, 1e16, np.float32)
    tmax[-64:] = 0.0  # dead lanes
    tris = pack_tris(v0, e1, e2, mask, tblk=128, super_=2)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128, super_=2)
    sbounds = super_bounds_jnp(bounds, 2)

    def sweep_closest(wl, ov, dv, tn, tx, excl):
        return pallas_intersect_closest_wl(
            tris, bounds, wl, ov, dv, tn, tx, RAY_MASK_PRIMARY,
            exclude=excl, tile=256, tblk=128, super_=2, interpret=True,
        )

    def sweep_any(wl, ov, dv, tn, tx, excl):
        return pallas_intersect_any_wl(
            tris, bounds, wl, ov, dv, tn, tx, RAY_MASK_PRIMARY,
            exclude=excl, tile=256, tblk=128, super_=2, interpret=True,
        )

    shim = _Shim(v0, e1, e2, mask)
    return (from_rows(jnp.asarray(o)), from_rows(jnp.asarray(d)),
            jnp.asarray(tmin), jnp.asarray(tmax), sbounds,
            sweep_closest, sweep_any, shim)


def test_rounds_closest_exact_when_budget_covers_all():
    ov, dv, tmin, tmax, sbounds, sc, sa, shim = _setup()
    nsb = int(sbounds.shape[1])
    t, prim, open_ = rounds_traverse(
        sc, sa, sbounds, ov, dv, tmin, tmax, None,
        tile=256, mode="closest", n_rounds=nsb + 1, cap_per_tile=nsb,
        sort_interpret=True,
    )
    assert not bool(np.asarray(open_).any())
    bf = intersect_closest_bruteforce(
        shim, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, active=tmax > 0
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(bf.prim))
    hit = np.asarray(prim) >= 0
    np.testing.assert_allclose(
        np.asarray(t)[hit], np.asarray(bf.t)[hit], rtol=1e-5
    )


def test_rounds_closest_partial_budget_is_conservative():
    ov, dv, tmin, tmax, sbounds, sc, sa, shim = _setup(seed=31)
    nsb = int(sbounds.shape[1])
    t, prim, open_ = rounds_traverse(
        sc, sa, sbounds, ov, dv, tmin, tmax, None,
        tile=256, mode="closest", n_rounds=2, cap_per_tile=nsb,
        sort_interpret=True,
    )
    bf = intersect_closest_bruteforce(
        shim, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, active=tmax > 0
    )
    t_np, prim_np, open_np = np.asarray(t), np.asarray(prim), np.asarray(open_)
    closed = ~open_np
    # closed lanes already hold the exact answer
    np.testing.assert_array_equal(prim_np[closed], np.asarray(bf.prim)[closed])
    # open lanes hold a valid upper bound (the residual pass tightens it)
    assert (t_np[open_np] >= np.asarray(bf.t)[open_np] - 1e-4).all()
    # any recorded hit is a real hit (t finite, prim valid)
    rec = prim_np >= 0
    assert (t_np[rec] < 1e16).all()


def test_rounds_any_matches_bruteforce():
    ov, dv, tmin, tmax, sbounds, sc, sa, shim = _setup(seed=41)
    nsb = int(sbounds.shape[1])
    occ, open_ = rounds_traverse(
        sc, sa, sbounds, ov, dv, tmin, tmax, None,
        tile=256, mode="any", n_rounds=nsb + 1, cap_per_tile=nsb,
        sort_interpret=True,
    )
    assert not bool(np.asarray(open_).any())
    bf = intersect_any_bruteforce(
        shim, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, active=tmax > 0
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(bf))


def test_rounds_respects_exclude():
    ov, dv, tmin, tmax, sbounds, sc, sa, shim = _setup(seed=43)
    nsb = int(sbounds.shape[1])
    bf = intersect_closest_bruteforce(
        shim, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, active=tmax > 0
    )
    excl = bf.prim  # exclude each lane's own closest hit
    t, prim, open_ = rounds_traverse(
        sc, sa, sbounds, ov, dv, tmin, tmax, excl,
        tile=256, mode="closest", n_rounds=nsb + 1, cap_per_tile=nsb,
        sort_interpret=True,
    )
    assert not bool(np.asarray(open_).any())
    bf2 = intersect_closest_bruteforce(
        shim, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, active=tmax > 0,
        exclude=excl,
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(bf2.prim))


def test_ray_next_block_orders_and_terminates():
    """The per-ray cursor enumerates each lane's candidate blocks in strictly
    increasing (entry, id) order and reaches (inf, nsb)."""
    ov, dv, tmin, tmax, sbounds, _, _, _ = _setup(seed=47, n_ray=256)
    nsb = int(sbounds.shape[1])
    bound = jnp.full(256, 1e16, jnp.float32)
    thresh = jnp.full(256, -1.0, jnp.float32)
    last = jnp.full(256, -1, jnp.int32)
    seen = [[] for _ in range(256)]
    for _ in range(nsb + 1):
        tn, blk = ray_next_block(ov, dv, tmin, bound, sbounds, thresh, last)
        tn_np, blk_np = np.asarray(tn), np.asarray(blk)
        act = np.isfinite(tn_np)
        for i in np.nonzero(act)[0]:
            seen[i].append((float(tn_np[i]), int(blk_np[i])))
        thresh = jnp.where(act, tn, thresh)
        last = jnp.where(act, blk, last)
    tn, blk = ray_next_block(ov, dv, tmin, bound, sbounds, thresh, last)
    assert not np.isfinite(np.asarray(tn)).any()
    for s in seen:
        assert s == sorted(s)  # lexicographic, no repeats
        assert len(set(s)) == len(s)
