"""Pallas dense intersector vs brute-force oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from strelka_tpu.ops.intersect import intersect_any_bruteforce, intersect_closest_bruteforce
from strelka_tpu.ops.pallas_intersect import (
    pack_tris,
    pallas_intersect_any,
    pallas_intersect_closest,
    recompute_barycentrics,
)
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY, RAY_MASK_SHADOW


class _Shim:
    def __init__(self, v0, e1, e2, mask):
        self.v0, self.e1, self.e2 = jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)
        self.geom_mask = jnp.asarray(mask)
        self.bvh = None


def _scene(n, rng):
    v0 = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    mask = np.ones(n, np.int32)
    mask[: n // 3] = 4  # light proxies
    return v0, e1, e2, mask


def _rays(n, rng):
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


@pytest.mark.parametrize("ntri,nray", [(100, 700), (1000, 300)])
def test_pallas_closest_matches_bruteforce(ntri, nray):
    rng = np.random.default_rng(0)
    v0, e1, e2, mask = _scene(ntri, rng)
    o, d = _rays(nray, rng)
    tmin = np.zeros(nray, np.float32)
    tmax = np.full(nray, 1e16, np.float32)
    from strelka_tpu.ops.pallas_intersect import block_bounds as _bb2

    tris = pack_tris(v0, e1, e2, mask, tblk=128)
    t, prim = pallas_intersect_closest(
        tris, _bb2(v0, e1, e2, mask, tblk=128), jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, tile=256, tblk=128, interpret=True,
    )
    hb = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY,
    )
    np.testing.assert_array_equal(np.asarray(prim) >= 0, np.asarray(hb.prim) >= 0)
    hits = np.asarray(prim) >= 0
    np.testing.assert_allclose(np.asarray(t)[hits], np.asarray(hb.t)[hits], rtol=2e-4)
    # barycentric recompute matches oracle
    u, v = recompute_barycentrics(
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(o), jnp.asarray(d), prim
    )
    same_prim = np.asarray(prim) == np.asarray(hb.prim)
    sel = hits & same_prim
    np.testing.assert_allclose(np.asarray(u)[sel], np.asarray(hb.u)[sel], atol=2e-4)
    np.testing.assert_allclose(np.asarray(v)[sel], np.asarray(hb.v)[sel], atol=2e-4)


def test_pallas_any_matches_bruteforce():
    rng = np.random.default_rng(1)
    v0, e1, e2, mask = _scene(600, rng)
    o, d = _rays(500, rng)
    tmin = np.zeros(500, np.float32)
    tmax = np.full(500, 25.0, np.float32)
    from strelka_tpu.ops.pallas_intersect import block_bounds as _bb

    tris = pack_tris(v0, e1, e2, mask, tblk=128)
    occ = pallas_intersect_any(
        tris, _bb(v0, e1, e2, mask, tblk=128), jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_SHADOW, tile=256, tblk=128, interpret=True,
    )
    occ_bf = intersect_any_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_SHADOW,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_bf))


def test_pallas_mask_filtering():
    """Shadow mask excludes light-proxy triangles entirely."""
    rng = np.random.default_rng(2)
    v0, e1, e2, _ = _scene(128, rng)
    mask = np.full(128, 4, np.int32)  # ALL light proxies
    o, d = _rays(256, rng)
    from strelka_tpu.ops.pallas_intersect import block_bounds as _bb3

    tris = pack_tris(v0, e1, e2, mask, tblk=128)
    t, prim = pallas_intersect_closest(
        tris, _bb3(v0, e1, e2, mask, tblk=128), jnp.asarray(o), jnp.asarray(d),
        jnp.zeros(256, jnp.float32),
        jnp.full(256, 1e16, jnp.float32), RAY_MASK_SHADOW, tile=256, tblk=128, interpret=True,
    )
    assert (np.asarray(prim) == -1).all()


def test_pallas_mxu_matches_bruteforce():
    """MXU bilinear formulation matches the oracle."""
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds,
        pack_tris_mxu,
        pallas_intersect_any_mxu,
        pallas_intersect_closest_mxu,
    )

    rng = np.random.default_rng(3)
    v0, e1, e2, mask = _scene(500, rng)
    o, d = _rays(300, rng)
    tmin = np.zeros(300, np.float32)
    tmax = np.full(300, 1e16, np.float32)
    feats, maskp = pack_tris_mxu(v0, e1, e2, mask, tblk=128)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128)
    t, prim = pallas_intersect_closest_mxu(
        feats, maskp, bounds, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, tile=256, tblk=128, interpret=True,
    )
    hb = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY,
    )
    np.testing.assert_array_equal(np.asarray(prim) >= 0, np.asarray(hb.prim) >= 0)
    hits = np.asarray(prim) >= 0
    np.testing.assert_allclose(np.asarray(t)[hits], np.asarray(hb.t)[hits], rtol=5e-4)
    occ = pallas_intersect_any_mxu(
        feats, maskp, bounds, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.full(300, 20.0, jnp.float32), RAY_MASK_SHADOW, tile=256, tblk=128, interpret=True,
    )
    occ_bf = intersect_any_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.full(300, 20.0, jnp.float32), RAY_MASK_SHADOW,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_bf))


def test_pallas_exclude_prim():
    """Exclude-prim rejects exactly the origin primitive (self-hit guard)."""
    rng = np.random.default_rng(4)
    v0, e1, e2, mask = _scene(300, rng)
    o, d = _rays(400, rng)
    tmin = np.zeros(400, np.float32)
    tmax = np.full(400, 1e16, np.float32)
    from strelka_tpu.ops.pallas_intersect import block_bounds

    tris = pack_tris(v0, e1, e2, mask, tblk=128)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128)
    t0, prim0 = pallas_intersect_closest(
        tris, bounds, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, tile=256, tblk=128, interpret=True,
    )
    # excluding the winner must yield a different (or no) winner, matching
    # the oracle with that primitive masked out
    excl = jnp.asarray(prim0)
    t1, prim1 = pallas_intersect_closest(
        tris, bounds, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, exclude=excl, tile=256, tblk=128, interpret=True,
    )
    hb = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, exclude=excl,
    )
    np.testing.assert_array_equal(np.asarray(prim1), np.asarray(hb.prim))
    assert not (np.asarray(prim1) == np.asarray(prim0))[np.asarray(prim0) >= 0].any()
    # any-hit honors exclusion too
    occ = pallas_intersect_any(
        tris, bounds, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, exclude=excl, tile=256, tblk=128, interpret=True,
    )
    occ_bf = intersect_any_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, exclude=excl,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_bf))


def test_pallas_start_offsets_invariant():
    """Per-tile block sweep offsets change the iteration ORDER only."""
    rng = np.random.default_rng(5)
    v0, e1, e2, mask = _scene(1024, rng)
    o, d = _rays(512, rng)
    tmin = np.zeros(512, np.float32)
    tmax = np.full(512, 1e16, np.float32)
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds,
        block_centroids,
        pack_tris_mxu,
        pallas_intersect_closest_mxu,
        super_bounds,
        tile_start_offsets,
    )
    from strelka_tpu.ops.vec import from_rows

    feats, maskp = pack_tris_mxu(v0, e1, e2, mask, tblk=128, super_=2)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128, super_=2)
    cents = block_centroids(super_bounds(bounds, super_=2))
    starts = tile_start_offsets(from_rows(jnp.asarray(o)), cents, 256)
    assert starts.shape[0] == 2 and (np.asarray(starts) >= 0).all()
    base = pallas_intersect_closest_mxu(
        feats, maskp, bounds, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, tile=256, tblk=128, super_=2, interpret=True,
    )
    ordered = pallas_intersect_closest_mxu(
        feats, maskp, bounds, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, starts=starts, tile=256, tblk=128, super_=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(ordered[1]))
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(ordered[0]), rtol=1e-6)


def test_pallas_multi_superblock_oracle():
    """nsb > 1 (several streamed superblocks) matches bruteforce — the
    per-tile order-table path must visit every superblock exactly once."""
    rng = np.random.default_rng(6)
    v0, e1, e2, mask = _scene(1024, rng)
    o, d = _rays(512, rng)
    tmin = np.zeros(512, np.float32)
    tmax = np.full(512, 1e16, np.float32)
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds, pack_tris, pack_tris_mxu,
        pallas_intersect_closest_mxu, super_bounds, block_centroids,
        tile_sweep_order,
    )
    from strelka_tpu.ops.vec import from_rows

    # super_=2, tblk=128 -> nsb = 1024/256 = 4 superblocks
    tris = pack_tris(v0, e1, e2, mask, tblk=128, super_=2)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128, super_=2)
    feats, maskp = pack_tris_mxu(v0, e1, e2, mask, tblk=128, super_=2)
    bf = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY,
    )
    for starts in (None, tile_sweep_order(from_rows(jnp.asarray(o)), block_centroids(super_bounds(bounds, super_=2)), 256)):
        t, prim = pallas_intersect_closest(
            tris, bounds, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax),
            RAY_MASK_PRIMARY, starts=starts, tile=256, tblk=128, super_=2, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(prim), np.asarray(bf.prim))
        tm, pm = pallas_intersect_closest_mxu(
            feats, maskp, bounds, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax),
            RAY_MASK_PRIMARY, starts=starts, tile=256, tblk=128, super_=2, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(pm), np.asarray(bf.prim))


def test_pallas_flat_kernels_match_oracle():
    """The small-scene FLAT kernels (round-1 structure) match bruteforce."""
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds, pack_tris, pack_tris_mxu,
        pallas_intersect_closest_flat, pallas_intersect_closest_mxu_flat,
        pallas_intersect_any_flat, pallas_intersect_any_mxu_flat,
    )

    rng = np.random.default_rng(9)
    v0, e1, e2, mask = _scene(700, rng)
    o, d = _rays(500, rng)
    tmin = jnp.zeros(500)
    tmax = jnp.full(500, 1e16)
    tris = pack_tris(v0, e1, e2, mask, tblk=128)
    feats, maskp = pack_tris_mxu(v0, e1, e2, mask, tblk=128)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128)
    bf = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), tmin, tmax, RAY_MASK_PRIMARY,
    )
    t1, p1 = pallas_intersect_closest_flat(
        tris, bounds, jnp.asarray(o), jnp.asarray(d), tmin, tmax,
        RAY_MASK_PRIMARY, tile=256, tblk=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(bf.prim))
    t2, p2 = pallas_intersect_closest_mxu_flat(
        feats, maskp, bounds, jnp.asarray(o), jnp.asarray(d), tmin, tmax,
        RAY_MASK_PRIMARY, tile=256, tblk=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(bf.prim))
    occ_bf = intersect_any_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), tmin,
        jnp.full(500, 20.0), RAY_MASK_SHADOW)
    o1 = pallas_intersect_any_flat(
        tris, bounds, jnp.asarray(o), jnp.asarray(d), tmin, jnp.full(500, 20.0),
        RAY_MASK_SHADOW, tile=256, tblk=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(occ_bf))
    o2 = pallas_intersect_any_mxu_flat(
        feats, maskp, bounds, jnp.asarray(o), jnp.asarray(d), tmin, jnp.full(500, 20.0),
        RAY_MASK_SHADOW, tile=256, tblk=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(occ_bf))


def test_tile_sweep_order_is_nearest_first():
    """Each tile's sweep order lists superblocks by ascending centroid
    distance and is a permutation of all superblocks."""
    from strelka_tpu.ops.pallas_intersect import tile_sweep_order
    from strelka_tpu.ops.vec import from_rows

    rng = np.random.default_rng(12)
    cents = jnp.asarray(rng.uniform(-10, 10, (24, 3)).astype(np.float32))
    o = rng.uniform(-10, 10, (512, 3)).astype(np.float32)
    order = np.asarray(tile_sweep_order(from_rows(jnp.asarray(o)), cents, 256))
    assert order.shape == (2, 24)
    c = np.asarray(cents)
    for r in range(2):
        assert sorted(order[r].tolist()) == list(range(24))
        centroid = o[r * 256 : (r + 1) * 256].mean(axis=0)
        d = np.linalg.norm(c[order[r]] - centroid, axis=1)
        assert (np.diff(d) >= -1e-4).all(), "order must be ascending distance"


def test_exclude_prim_shadow_semantics():
    """A ray leaving a planar triangle never re-hits it even with tmin=0 and
    a grazing direction (the exact-by-id guard, not epsilons)."""
    v0 = np.array([[0, 0, 0]], np.float32)
    e1 = np.array([[1, 0, 0]], np.float32)
    e2 = np.array([[0, 1, 0]], np.float32)
    mask = np.ones(1, np.int32)
    from strelka_tpu.ops.pallas_intersect import block_bounds, pack_tris

    tris = pack_tris(v0, e1, e2, mask, tblk=128)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128)
    # origin ON the triangle plane, direction nearly in-plane
    o = jnp.asarray([[0.25, 0.25, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 1e-7]], jnp.float32)
    occ = pallas_intersect_any(
        tris, bounds, o, d, jnp.zeros(1), jnp.full(1, 1e16), RAY_MASK_PRIMARY,
        exclude=jnp.asarray([0], jnp.int32), tile=256, tblk=128, interpret=True,
    )
    assert not bool(np.asarray(occ)[0])


def test_worklist_kernels_match_oracle():
    """Work-list (pair-scheduled) kernels == bruteforce, including garbage
    masking for unvisited tiles, the first-of-run init, pad entries, and the
    residual-open + partition plumbing in interpret mode."""
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds,
        build_worklist,
        pack_tris,
        pallas_intersect_any_wl,
        pallas_intersect_closest_wl,
        slab_matrix_any,
        super_bounds_jnp,
        tile_box_d2,
    )
    from strelka_tpu.ops.vec import from_rows

    rng = np.random.default_rng(11)
    v0, e1, e2, mask = _scene(1024, rng)
    o, d = _rays(512, rng)
    tmin = np.zeros(512, np.float32)
    tmax = np.full(512, 1e16, np.float32)
    # a dead tile: kill the last 256 rays
    tmax[256:] = 0.0
    tris = pack_tris(v0, e1, e2, mask, tblk=128, super_=2)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128, super_=2)
    ov = from_rows(jnp.asarray(o))
    dv = from_rows(jnp.asarray(d))
    sbounds = super_bounds_jnp(bounds, 2)
    d2 = tile_box_d2(ov, sbounds, 256)
    W = slab_matrix_any(ov, dv, jnp.asarray(tmin), jnp.asarray(tmax), sbounds, 256)
    wl, count, visited = build_worklist(W, d2, 16)
    assert int(count) <= 16
    t, prim = pallas_intersect_closest_wl(
        tris, bounds, wl, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, tile=256, tblk=128, super_=2, interpret=True,
    )
    vis_ray = np.repeat(np.asarray(visited), 256)[:512]
    prim = np.where(vis_ray, np.asarray(prim), -1)
    bf = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, active=jnp.asarray(tmax) > 0,
    )
    np.testing.assert_array_equal(prim, np.asarray(bf.prim))
    occ = pallas_intersect_any_wl(
        tris, bounds, wl, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, tile=256, tblk=128, super_=2, interpret=True,
    )
    occ = np.asarray(occ) & vis_ray
    np.testing.assert_array_equal(occ, np.asarray(bf.prim) >= 0)


def test_worklist_mxu_kernels_match_oracle():
    """MXU work-list kernels == bruteforce (same schedule as the VPU wl
    kernels, MT test on matmul features; interpret mode runs f32-exact)."""
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds,
        build_worklist,
        pack_tris_mxu,
        pallas_intersect_any_wl_mxu,
        pallas_intersect_closest_wl_mxu,
        slab_matrix_any,
        super_bounds_jnp,
        tile_box_d2,
    )
    from strelka_tpu.ops.vec import from_rows

    rng = np.random.default_rng(13)
    v0, e1, e2, mask = _scene(1024, rng)
    o, d = _rays(512, rng)
    tmin = np.zeros(512, np.float32)
    tmax = np.full(512, 1e16, np.float32)
    tmax[256:] = 0.0  # a dead tile
    feats, fmask = pack_tris_mxu(v0, e1, e2, mask, tblk=128, super_=2)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128, super_=2)
    ov = from_rows(jnp.asarray(o))
    dv = from_rows(jnp.asarray(d))
    sbounds = super_bounds_jnp(bounds, 2)
    d2 = tile_box_d2(ov, sbounds, 256)
    W = slab_matrix_any(ov, dv, jnp.asarray(tmin), jnp.asarray(tmax), sbounds, 256)
    wl, count, visited = build_worklist(W, d2, 16)
    t, prim = pallas_intersect_closest_wl_mxu(
        feats, fmask, bounds, wl, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, tile=256, tblk=128, super_=2, interpret=True,
    )
    vis_ray = np.repeat(np.asarray(visited), 256)[:512]
    prim = np.where(vis_ray, np.asarray(prim), -1)
    bf = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, active=jnp.asarray(tmax) > 0,
    )
    np.testing.assert_array_equal(prim, np.asarray(bf.prim))
    occ = pallas_intersect_any_wl_mxu(
        feats, fmask, bounds, wl, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, tile=256, tblk=128, super_=2, interpret=True,
    )
    occ = np.asarray(occ) & vis_ray
    np.testing.assert_array_equal(occ, np.asarray(bf.prim) >= 0)


def test_partition_perm_and_worklist_builder():
    """_partition_perm is a stable open-first permutation; build_worklist
    groups by tile near-to-far and pads safely."""
    import strelka_tpu.ops.intersect as X
    from strelka_tpu.ops.pallas_intersect import build_worklist

    flag = jnp.asarray([False, True, False, True, True, False])
    perm, pos = X._partition_perm(flag)
    np.testing.assert_array_equal(np.asarray(perm), [1, 3, 4, 0, 2, 5])
    np.testing.assert_array_equal(np.asarray(pos), [3, 0, 4, 1, 2, 5])

    W = jnp.asarray([[True, False, True], [False, False, False], [False, True, False]])
    d2 = jnp.asarray([[3.0, 1.0, 2.0], [0.0, 0.0, 0.0], [5.0, 1.0, 9.0]])
    wl, count, visited = build_worklist(W, d2, 6)
    from strelka_tpu.ops.pallas_intersect import wl_flags, wl_sb, wl_tile

    wl = np.asarray(wl)[0]  # [C] packed i32
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(visited), [True, False, True])
    # tile 0 entries near-to-far by d2: sb2 (d2=2) before sb0 (d2=3)
    np.testing.assert_array_equal(wl_tile(wl[:3]), [0, 0, 2])
    np.testing.assert_array_equal(wl_sb(wl[:3]), [2, 0, 1])
    # flags: first-of-run on entries 0 and 2; all three valid
    np.testing.assert_array_equal(wl_flags(wl[:3]), [3, 2, 3])
    # pad entries: last valid tile, invalid flag
    np.testing.assert_array_equal(wl_tile(wl[3:]), [2, 2, 2])
    np.testing.assert_array_equal(wl_flags(wl[3:]), [0, 0, 0])


def test_pallas_open_w_matches_jnp():
    """The fused Pallas open/W kernel == the jnp reference formulations."""
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds,
        pallas_open_w,
        residual_open,
        slab_matrix_any,
        super_bounds_jnp,
        tile_box_d2,
        tile_sweep_order_k,
    )
    from strelka_tpu.ops.vec import from_rows

    rng = np.random.default_rng(13)
    v0, e1, e2, mask = _scene(2048, rng)
    o, d = _rays(512, rng)
    ov = from_rows(jnp.asarray(o))
    dv = from_rows(jnp.asarray(d))
    tmin = jnp.zeros(512, jnp.float32)
    bound = jnp.asarray(rng.uniform(0.5, 20.0, 512).astype(np.float32))
    bounds = block_bounds(v0, e1, e2, mask, tblk=128, super_=2)
    sbounds = super_bounds_jnp(bounds, 2)  # nsb = 8
    _, r2t, d2 = tile_sweep_order_k(ov, sbounds, 128, 3)
    open_p, W_p, tn_p = pallas_open_w(ov, dv, tmin, bound, sbounds, d2, r2t, tile=128, interpret=True)
    open_j = residual_open(ov, dv, tmin, bound, sbounds, d2, r2t, 128)
    W_j = slab_matrix_any(ov, dv, tmin, bound, sbounds, 128)
    np.testing.assert_array_equal(np.asarray(open_p), np.asarray(open_j))
    np.testing.assert_array_equal(np.asarray(W_p), np.asarray(W_j))
    # min_tn: finite exactly where W says some ray enters; along-path order key
    tn = np.asarray(tn_p)
    assert ((tn < 1e15) == np.asarray(W_j)).all()
    assert (tn >= 0.0).all()


def test_small_mxu_kernels_match_oracle():
    """Whole-scene-in-VMEM MXU kernels (1-D grid, register accumulation)
    == bruteforce in interpret mode."""
    from strelka_tpu.ops.pallas_intersect import (
        pack_tris_mxu,
        pallas_intersect_any_mxu_small,
        pallas_intersect_closest_mxu_small,
    )

    rng = np.random.default_rng(17)
    v0, e1, e2, mask = _scene(512, rng)
    o, d = _rays(512, rng)
    tmin = np.zeros(512, np.float32)
    tmax = np.full(512, 1e16, np.float32)
    feats, maskp = pack_tris_mxu(v0, e1, e2, mask, tblk=128, super_=1)
    bf = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY,
    )
    t, prim = pallas_intersect_closest_mxu_small(
        feats, maskp, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, tile=256, tblk=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(bf.prim))
    occ = pallas_intersect_any_mxu_small(
        feats, maskp, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, tile=256, tblk=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(bf.prim) >= 0)


def test_small_mxu_kernels_dead_tile_guard():
    """Fully-dead tiles (all tmax <= tmin) skip the sweep but still emit
    miss/unoccluded; mixed tiles are unaffected (flat-compact support)."""
    from strelka_tpu.ops.pallas_intersect import (
        pack_tris_mxu,
        pallas_intersect_any_mxu_small,
        pallas_intersect_closest_mxu_small,
    )

    rng = np.random.default_rng(19)
    v0, e1, e2, mask = _scene(512, rng)
    o, d = _rays(512, rng)
    tmin = np.zeros(512, np.float32)
    tmax = np.full(512, 1e16, np.float32)
    tmax[256:] = 0.0  # tile 1 fully dead
    tmax[100:120] = 0.0  # dead lanes inside a live tile
    feats, maskp = pack_tris_mxu(v0, e1, e2, mask, tblk=128, super_=1)
    bf = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, active=jnp.asarray(tmax) > 0,
    )
    t, prim = pallas_intersect_closest_mxu_small(
        feats, maskp, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, tile=256, tblk=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(bf.prim))
    assert (np.asarray(prim)[256:] == -1).all()
    occ = pallas_intersect_any_mxu_small(
        feats, maskp, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, tile=256, tblk=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(bf.prim) >= 0)


def test_fusedk_phase1_matches_rect():
    """Fused-K phase-1 kernels == the rectangular K-column sweep bit-for-bit
    (same comparisons, register accumulation instead of t_ref round trips),
    including the dead-tile guard, K < nsb partial sweeps, and the FUSED
    residual open flag == pallas_open_w."""
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds,
        pack_tris,
        pallas_intersect_any,
        pallas_intersect_any_fusedk,
        pallas_intersect_closest,
        pallas_intersect_closest_fusedk,
        pallas_open_w,
        super_bounds_jnp,
        tile_sweep_order_k,
    )
    from strelka_tpu.ops.vec import from_rows

    rng = np.random.default_rng(29)
    v0, e1, e2, mask = _scene(4096, rng)  # 8 superblocks at tblk=256/super_=2
    o, d = _rays(512, rng)
    tmin = np.zeros(512, np.float32)
    tmax = np.full(512, 1e16, np.float32)
    tmax[256:] = 0.0  # a dead tile for the live guard
    tris = pack_tris(v0, e1, e2, mask, tblk=256, super_=2)
    bounds = block_bounds(v0, e1, e2, mask, tblk=256, super_=2)
    ov, dv = from_rows(jnp.asarray(o)), from_rows(jnp.asarray(d))
    sbounds = super_bounds_jnp(bounds, 2)
    order_k, r2t, d2 = tile_sweep_order_k(ov, sbounds, 256, 3)  # K=3 of 8

    t_r, prim_r = pallas_intersect_closest(
        tris, bounds, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, starts=order_k, tile=256, tblk=256, super_=2,
        interpret=True,
    )
    t_f, prim_f, open_f = pallas_intersect_closest_fusedk(
        tris, order_k, sbounds, d2, r2t, ov, dv, jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_PRIMARY, tile=256, tblk=256, super_=2,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(prim_f), np.asarray(prim_r))
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_r))
    bound = jnp.minimum(jnp.where(prim_r >= 0, t_r, 1e16), jnp.asarray(tmax))
    open_ref, _, _ = pallas_open_w(
        ov, dv, jnp.asarray(tmin), bound, sbounds, d2, r2t, 256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(open_f), np.asarray(open_ref))

    occ_r = pallas_intersect_any(
        tris, bounds, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_SHADOW, starts=order_k, tile=256, tblk=256, super_=2,
        interpret=True,
    )
    occ_f, aopen_f = pallas_intersect_any_fusedk(
        tris, order_k, sbounds, d2, r2t, ov, dv, jnp.asarray(tmin),
        jnp.asarray(tmax), RAY_MASK_SHADOW, tile=256, tblk=256, super_=2,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_r))
    abound = jnp.where(occ_r, 0.0, jnp.asarray(tmax))
    aopen_ref, _, _ = pallas_open_w(
        ov, dv, jnp.asarray(tmin), abound, sbounds, d2, r2t, 256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(aopen_f), np.asarray(aopen_ref))


def test_fusedk_mxu_phase1_matches_rect():
    """Partial-fusion MXU phase-1 kernels == the rectangular MXU sweep
    (chunk superblocks per step in registers; order padded to a chunk
    multiple by repeating the last column — idempotent folds), global and
    superblock-LOCAL feature anchoring both."""
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds,
        pack_tris_mxu,
        pack_tris_mxu_local,
        pallas_intersect_any_fusedk_mxu,
        pallas_intersect_any_mxu,
        pallas_intersect_closest_fusedk_mxu,
        pallas_intersect_closest_mxu,
        super_bounds_jnp,
        tile_sweep_order_k,
    )
    from strelka_tpu.ops.vec import from_rows

    rng = np.random.default_rng(37)
    v0, e1, e2, mask = _scene(4096, rng)
    o, d = _rays(512, rng)
    tmin = np.zeros(512, np.float32)
    tmax = np.full(512, 1e16, np.float32)
    tmax[256:] = 0.0  # dead tile
    bounds = block_bounds(v0, e1, e2, mask, tblk=256, super_=2)
    ov, dv = from_rows(jnp.asarray(o)), from_rows(jnp.asarray(d))
    sbounds = super_bounds_jnp(bounds, 2)
    order_k, r2t, d2 = tile_sweep_order_k(ov, sbounds, 256, 3)  # K=3 pads to 4

    for local in (False, True):
        if local:
            feats, fmask = pack_tris_mxu_local(
                v0, e1, e2, mask, tblk=256, super_=2, bounds=np.asarray(bounds)
            )
        else:
            feats, fmask = pack_tris_mxu(v0, e1, e2, mask, tblk=256, super_=2)
        t_r, prim_r = pallas_intersect_closest_mxu(
            feats, fmask, bounds, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
            RAY_MASK_PRIMARY, starts=order_k, tile=256, tblk=256, super_=2,
            interpret=True, local=local,
        )
        t_f, prim_f, open_f = pallas_intersect_closest_fusedk_mxu(
            feats, fmask, bounds, order_k, sbounds, d2, r2t, ov, dv,
            jnp.asarray(tmin), jnp.asarray(tmax), RAY_MASK_PRIMARY,
            tile=256, tblk=256, super_=2, chunk=2, interpret=True, local=local,
        )
        np.testing.assert_array_equal(
            np.asarray(prim_f), np.asarray(prim_r), err_msg=f"local={local}"
        )
        np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_r))
        from strelka_tpu.ops.pallas_intersect import pallas_open_w

        bound = jnp.minimum(jnp.where(prim_r >= 0, t_r, 1e16), jnp.asarray(tmax))
        open_ref, _, _ = pallas_open_w(
            ov, dv, jnp.asarray(tmin), bound, sbounds, d2, r2t, 256, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(open_f), np.asarray(open_ref))
        occ_r = pallas_intersect_any_mxu(
            feats, fmask, bounds, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
            RAY_MASK_SHADOW, starts=order_k, tile=256, tblk=256, super_=2,
            interpret=True, local=local,
        )
        occ_f, _aopen = pallas_intersect_any_fusedk_mxu(
            feats, fmask, bounds, order_k, sbounds, d2, r2t, ov, dv,
            jnp.asarray(tmin), jnp.asarray(tmax), RAY_MASK_SHADOW,
            tile=256, tblk=256, super_=2, chunk=2, interpret=True, local=local,
        )
        np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_r))


def test_pallas_onehot_gather_bit_exact():
    """MXU one-hot gather == table[idx].T bit-exactly (HIGHEST precision)."""
    from strelka_tpu.ops.pallas_gather import pallas_gather_rows_t

    rng = np.random.default_rng(23)
    table = jnp.asarray(rng.standard_normal((517, 36)).astype(np.float32) * 1e3)
    idx = jnp.asarray(rng.integers(0, 517, 1000).astype(np.int32))
    out = pallas_gather_rows_t(table, idx, tile=256, interpret=True)
    ref = np.asarray(table)[np.asarray(idx)].T
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_local_feats_match_global_and_oracle():
    """Superblock-local MXU packing (pack_tris_mxu_local + local=True) gives
    the same hits as the global packing and the bruteforce oracle, on a
    scene translated FAR from the origin (the regime where the bf16x3 MXU
    passes break with global features — interpret mode is f32 so here it
    checks the anchor bookkeeping, not the precision win itself)."""
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds,
        build_worklist,
        pack_tris_mxu,
        pack_tris_mxu_local,
        pallas_intersect_any_mxu,
        pallas_intersect_any_wl_mxu,
        pallas_intersect_closest_mxu,
        pallas_intersect_closest_wl_mxu,
        slab_matrix_any,
        super_bounds_jnp,
        tile_box_d2,
    )
    from strelka_tpu.ops.vec import from_rows

    rng = np.random.default_rng(21)
    v0, e1, e2, mask = _scene(1024, rng)
    o, d = _rays(512, rng)
    shift = np.array([500.0, -300.0, 800.0], np.float32)  # far from origin
    v0 = v0 + shift
    o = o + shift
    tmin = np.zeros(512, np.float32)
    tmax = np.full(512, 1e16, np.float32)
    featsL, maskL = pack_tris_mxu_local(v0, e1, e2, mask, tblk=128, super_=2)
    featsG, maskG = pack_tris_mxu(v0, e1, e2, mask, tblk=128, super_=2)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128, super_=2)
    ov = from_rows(jnp.asarray(o))
    dv = from_rows(jnp.asarray(d))
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax))
    tL, pL = pallas_intersect_closest_mxu(
        featsL, maskL, bounds, *args, RAY_MASK_PRIMARY,
        tile=256, tblk=128, super_=2, interpret=True, local=True,
    )
    tG, pG = pallas_intersect_closest_mxu(
        featsG, maskG, bounds, *args, RAY_MASK_PRIMARY,
        tile=256, tblk=128, super_=2, interpret=True,
    )
    bf = intersect_closest_bruteforce(
        _Shim(v0, e1, e2, mask), *args, RAY_MASK_PRIMARY,
    )
    np.testing.assert_array_equal(np.asarray(pL), np.asarray(bf.prim))
    np.testing.assert_array_equal(np.asarray(pL), np.asarray(pG))
    hits = np.asarray(pL) >= 0
    np.testing.assert_allclose(
        np.asarray(tL)[hits], np.asarray(bf.t)[hits], rtol=2e-4, atol=2e-3
    )
    occL = pallas_intersect_any_mxu(
        featsL, maskL, bounds, *args, RAY_MASK_PRIMARY,
        tile=256, tblk=128, super_=2, interpret=True, local=True,
    )
    np.testing.assert_array_equal(np.asarray(occL), hits)
    # work-list kernels with local feats
    sbounds = super_bounds_jnp(bounds, 2)
    d2 = tile_box_d2(ov, sbounds, 256)
    W = slab_matrix_any(ov, dv, jnp.asarray(tmin), jnp.asarray(tmax), sbounds, 256)
    wl, count, visited = build_worklist(W, d2, 16)
    twl, pwl = pallas_intersect_closest_wl_mxu(
        featsL, maskL, bounds, wl, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, tile=256, tblk=128, super_=2, interpret=True, local=True,
    )
    vis_ray = np.repeat(np.asarray(visited), 256)[:512]
    np.testing.assert_array_equal(
        np.where(vis_ray, np.asarray(pwl), -1), np.asarray(bf.prim)
    )
    owl = pallas_intersect_any_wl_mxu(
        featsL, maskL, bounds, wl, ov, dv, jnp.asarray(tmin), jnp.asarray(tmax),
        RAY_MASK_PRIMARY, tile=256, tblk=128, super_=2, interpret=True, local=True,
    )
    np.testing.assert_array_equal(np.asarray(owl) & vis_ray, hits)


def test_local_feats_flat_kernels():
    """Flat-path kernels (super_=1 -> per-block anchors) with local feats
    match the oracle on far-from-origin geometry."""
    from strelka_tpu.ops.pallas_intersect import (
        block_bounds,
        pack_tris_mxu_local,
        pallas_intersect_any_mxu_flat,
        pallas_intersect_closest_mxu_flat,
    )

    rng = np.random.default_rng(22)
    v0, e1, e2, mask = _scene(512, rng)
    o, d = _rays(300, rng)
    shift = np.array([-700.0, 250.0, 400.0], np.float32)
    v0 = v0 + shift
    o = o + shift
    tmin = np.zeros(300, np.float32)
    tmax = np.full(300, 1e16, np.float32)
    feats, maskp = pack_tris_mxu_local(v0, e1, e2, mask, tblk=128, super_=1)
    bounds = block_bounds(v0, e1, e2, mask, tblk=128, super_=1)
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax))
    t, prim = pallas_intersect_closest_mxu_flat(
        feats, maskp, bounds, *args, RAY_MASK_PRIMARY,
        tile=256, tblk=128, interpret=True, local=True,
    )
    bf = intersect_closest_bruteforce(_Shim(v0, e1, e2, mask), *args, RAY_MASK_PRIMARY)
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(bf.prim))
    occ = pallas_intersect_any_mxu_flat(
        feats, maskp, bounds, *args, RAY_MASK_PRIMARY,
        tile=256, tblk=128, interpret=True, local=True,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(bf.prim) >= 0)


def test_tile_sweep_order_topk_matches_argsort():
    """tile_sweep_order_k's lax.top_k selection == stable-argsort first-K,
    including exact distance ties (several blocks containing the origin all
    quantize to d2=0) and the K-th-smallest threshold."""
    from strelka_tpu.ops.pallas_intersect import tile_box_d2, tile_sweep_order_k
    from strelka_tpu.ops.vec import from_rows

    rng = np.random.default_rng(17)
    n, nsb, tile, k = 1024, 40, 256, 7
    o = (rng.random((n, 3), np.float32) - 0.5) * 10.0
    lo = (rng.random((nsb, 3), np.float32) - 0.5) * 12.0
    hi = lo + rng.random((nsb, 3), np.float32) * 6.0  # several contain origins
    sbounds = jnp.asarray(
        np.concatenate([lo.T, hi.T, np.zeros((2, nsb), np.float32)], axis=0)
    )
    ov = from_rows(jnp.asarray(o))
    order, r2t, d2 = tile_sweep_order_k(ov, sbounds, tile, k)
    d2_np = np.asarray(tile_box_d2(ov, sbounds, tile))
    expect_order = np.argsort(d2_np, axis=1, kind="stable")[:, :k]
    expect_r2t = np.sort(d2_np, axis=1)[:, k - 1]
    np.testing.assert_array_equal(np.asarray(order), expect_order)
    np.testing.assert_array_equal(np.asarray(r2t), expect_r2t)
    assert (d2_np == 0).any(), "test must include containing-block ties"


def test_build_worklist_row_overflow_forces_fallback():
    """A W row denser than the per-row top_k cap must report count >
    capacity (silent truncation would drop blocks = wrong hits); sparse
    rows keep the exact count and near-to-far in-row order."""
    from strelka_tpu.ops.pallas_intersect import build_worklist

    n_tiles, nsb = 4, 12
    W = np.zeros((n_tiles, nsb), bool)
    W[0, :3] = True
    W[2, 1:4] = True
    d2 = np.tile(np.arange(nsb, 0, -1, dtype=np.float32), (n_tiles, 1))
    wl, count, visited = build_worklist(
        jnp.asarray(W), jnp.asarray(d2), capacity=8  # kr = 2 < row count 3
    )
    assert int(count) > 8
    wl2, count2, visited2 = build_worklist(
        jnp.asarray(W), jnp.asarray(d2), capacity=16  # kr = 4 >= all rows
    )
    assert int(count2) == 6
    from strelka_tpu.ops.pallas_intersect import wl_sb, wl_tile

    wl2 = np.asarray(wl2)[0]  # [C] packed i32
    # grouped by tile, near-to-far (d2 decreasing in block id here)
    np.testing.assert_array_equal(wl_tile(wl2[:6]), [0, 0, 0, 2, 2, 2])
    np.testing.assert_array_equal(wl_sb(wl2[:6]), [2, 1, 0, 3, 2, 1])
    np.testing.assert_array_equal(np.asarray(visited2), [True, False, True, False])
