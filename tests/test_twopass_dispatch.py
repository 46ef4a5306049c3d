"""End-to-end residual two-pass dispatch vs brute force, in interpret mode,
across the tuned tiling knobs (p1_tile / p2_tile / p2_octant).

The interpret kernel tests cover each kernel in isolation; THIS exercises
the real `_closest_twopass` / `_any_twopass` drivers — order prep, fused-K
phase 1, open partition, phase-2 work list, merge — with phase tiles that
DIFFER, the exact configuration the hardware A/B chain runs, so a shape or
threading bug surfaces here instead of on the chip.
"""

import functools

import numpy as np
import pytest

import jax.numpy as jnp

import strelka_tpu.ops.pallas_intersect as PI
from strelka_tpu.ops.intersect import (
    _any_twopass,
    _closest_twopass,
    intersect_any_bruteforce,
    intersect_closest_bruteforce,
)
from strelka_tpu.ops.vec import from_rows
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY

_PATCH = [
    "pallas_intersect_closest_fusedk",
    "pallas_intersect_any_fusedk",
    "pallas_intersect_closest_wl",
    "pallas_intersect_any_wl",
    "pallas_intersect_closest",
    "pallas_intersect_any",
    "pallas_open_w",
]


@pytest.fixture
def interp(monkeypatch):
    for name in _PATCH:
        fn = getattr(PI, name)
        monkeypatch.setattr(PI, name, functools.partial(fn, interpret=True))


class _Scene:
    def __init__(self, v0, e1, e2, mask, tblk, super_):
        self.v0 = jnp.asarray(v0)
        self.e1 = jnp.asarray(e1)
        self.e2 = jnp.asarray(e2)
        self.geom_mask = jnp.asarray(mask)
        self.tris_packed = PI.pack_tris(v0, e1, e2, mask, tblk=tblk, super_=super_)
        self.tri_bounds = PI.block_bounds(v0, e1, e2, mask, tblk=tblk, super_=super_)
        self.tris_feats = None  # VPU path
        self.tris_mask = None
        self.tris_local = False
        self.kernel_tblk = tblk
        self.kernel_super = super_


def _setup(seed=53):
    rng = np.random.default_rng(seed)
    n_tri, n_ray = 8192, 512  # nsb = 32 = 2*RESIDUAL_K (residual threshold)
    base = (rng.random((n_tri, 3), np.float32) - 0.5) * 20.0
    e1 = rng.random((n_tri, 3), np.float32) * 0.8
    e2 = rng.random((n_tri, 3), np.float32) * 0.8
    mask = np.full(n_tri, 0xFF, np.int32)
    o = (rng.random((n_ray, 3), np.float32) - 0.5) * 24.0
    d = rng.random((n_ray, 3), np.float32) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmin = np.zeros(n_ray, np.float32)
    tmax = np.full(n_ray, 1e16, np.float32)
    tmax[-64:] = 0.0  # dead lanes
    scene = _Scene(base, e1, e2, mask, tblk=128, super_=2)
    return (scene, from_rows(jnp.asarray(o)), from_rows(jnp.asarray(d)),
            jnp.asarray(tmin), jnp.asarray(tmax))


KNOBS = [
    {},  # baked defaults (p1 = p2 = SUPER_PATH_TILE)
    {"STRELKA_P1_TILE": "512", "STRELKA_P2_TILE": "256"},
    {"STRELKA_P1_TILE": "256", "STRELKA_P2_TILE": "128",
     "STRELKA_P2_OCTANT": "1"},
]


@pytest.mark.parametrize("knobs", KNOBS)
def test_closest_twopass_matches_bruteforce(interp, monkeypatch, knobs):
    for k, v in knobs.items():
        monkeypatch.setenv(k, v)
    scene, ov, dv, tmin, tmax = _setup()
    t, prim = _closest_twopass(
        scene, False, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, None
    )
    bf = intersect_closest_bruteforce(
        scene, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, active=tmax > 0
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(bf.prim))
    hit = np.asarray(prim) >= 0
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(bf.t)[hit], rtol=1e-5)


@pytest.mark.parametrize("knobs", KNOBS)
def test_any_twopass_matches_bruteforce(interp, monkeypatch, knobs):
    for k, v in knobs.items():
        monkeypatch.setenv(k, v)
    scene, ov, dv, tmin, tmax = _setup(seed=59)
    occ = _any_twopass(scene, False, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, None)
    bf = intersect_any_bruteforce(
        scene, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, active=tmax > 0
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(bf))


class _SceneMxu(_Scene):
    def __init__(self, v0, e1, e2, mask, tblk, super_):
        super().__init__(v0, e1, e2, mask, tblk, super_)
        self.tris_feats, self.tris_mask = PI.pack_tris_mxu_local(
            v0, e1, e2, mask, tblk=tblk, super_=super_,
            bounds=np.asarray(self.tri_bounds),
        )
        self.tris_local = True


_PATCH_MXU = [
    "pallas_intersect_closest_fusedk_mxu",
    "pallas_intersect_any_fusedk_mxu",
    "pallas_intersect_closest_wl_mxu",
    "pallas_intersect_any_wl_mxu",
    "pallas_intersect_closest_mxu",
    "pallas_intersect_any_mxu",
    "pallas_open_w",
]


def test_mxu_local_twopass_matches_bruteforce(monkeypatch):
    """The mxu_big configuration end-to-end: fused-K MXU phase 1 with
    superblock-LOCAL feature anchoring + MXU work-list phase 2 at the tuned
    tiles (interpret mode is f32-exact, so brute-force equality holds)."""
    for name in _PATCH_MXU:
        fn = getattr(PI, name)
        monkeypatch.setattr(PI, name, functools.partial(fn, interpret=True))
    monkeypatch.setenv("STRELKA_P1_TILE", "512")
    monkeypatch.setenv("STRELKA_P2_TILE", "256")
    monkeypatch.setenv("STRELKA_P2_OCTANT", "1")
    rng = np.random.default_rng(61)
    n_tri, n_ray = 8192, 512
    base = (rng.random((n_tri, 3), np.float32) - 0.5) * 20.0
    e1 = rng.random((n_tri, 3), np.float32) * 0.8
    e2 = rng.random((n_tri, 3), np.float32) * 0.8
    mask = np.full(n_tri, 0xFF, np.int32)
    o = (rng.random((n_ray, 3), np.float32) - 0.5) * 24.0
    d = rng.random((n_ray, 3), np.float32) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.zeros(n_ray, jnp.float32)
    tmax = jnp.full(n_ray, 1e16, jnp.float32)
    scene = _SceneMxu(base, e1, e2, mask, tblk=128, super_=2)
    ov, dv = from_rows(jnp.asarray(o)), from_rows(jnp.asarray(d))
    t, prim = _closest_twopass(
        scene, True, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, None
    )
    bf = intersect_closest_bruteforce(
        scene, ov, dv, tmin, tmax, RAY_MASK_PRIMARY
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(bf.prim))
    occ = _any_twopass(scene, True, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, None)
    bfo = intersect_any_bruteforce(scene, ov, dv, tmin, tmax, RAY_MASK_PRIMARY)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(bfo))
