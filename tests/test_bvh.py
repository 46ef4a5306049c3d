"""BVH build + traversal vs brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from strelka_tpu.ops.bvh import ThreadedBvh, build_bvh_sah, intersect_bvh, thread_bvh
from strelka_tpu.ops.intersect import intersect_any_bruteforce, intersect_closest_bruteforce
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY, RAY_MASK_SHADOW


def _random_tris(n, rng, spread=10.0):
    v0 = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    return v0, e1, e2


def _random_rays(n, rng, spread=12.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


class _SceneShim:
    """Minimal DeviceScene stand-in for the brute-force oracle."""

    def __init__(self, v0, e1, e2, mask):
        self.v0 = jnp.asarray(v0)
        self.e1 = jnp.asarray(e1)
        self.e2 = jnp.asarray(e2)
        self.geom_mask = jnp.asarray(mask)
        self.bvh = None


def test_bvh_build_structure():
    rng = np.random.default_rng(0)
    v0, e1, e2 = _random_tris(1000, rng)
    nodes, perm = build_bvh_sah(v0, e1, e2)
    assert sorted(perm.tolist()) == list(range(1000))
    count = np.asarray(nodes.count)
    start = np.asarray(nodes.start)
    # every triangle appears in exactly one leaf
    covered = np.zeros(1000, bool)
    for i in range(len(count)):
        if count[i] > 0:
            assert count[i] <= 4
            covered[start[i] : start[i] + count[i]] = True
    assert covered.all()
    # root bbox contains everything
    p0, p1, p2 = v0, v0 + e1, v0 + e2
    lo = np.minimum(np.minimum(p0, p1), p2).min(0)
    hi = np.maximum(np.maximum(p0, p1), p2).max(0)
    assert np.all(np.asarray(nodes.bb_min[0]) <= lo + 1e-4)
    assert np.all(np.asarray(nodes.bb_max[0]) >= hi - 1e-4)


@pytest.mark.parametrize("ntri,nray", [(64, 256), (1500, 512)])
def test_bvh_closest_matches_bruteforce(ntri, nray):
    rng = np.random.default_rng(42)
    v0, e1, e2 = _random_tris(ntri, rng)
    mask = np.ones(ntri, np.int32)
    nodes, perm = build_bvh_sah(v0, e1, e2)
    v0p, e1p, e2p = v0[perm], e1[perm], e2[perm]
    maskp = mask[perm]
    o, d = _random_rays(nray, rng)
    tmin = np.zeros(nray, np.float32)
    tmax = np.full(nray, 1e16, np.float32)

    nodes_j = ThreadedBvh(*[jnp.asarray(np.asarray(x)) for x in thread_bvh(nodes)])
    t_bvh, prim_bvh, u_bvh, v_bvh = intersect_bvh(
        nodes_j,
        jnp.asarray(v0p),
        jnp.asarray(e1p),
        jnp.asarray(e2p),
        jnp.asarray(maskp),
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.asarray(tmin),
        jnp.asarray(tmax),
        RAY_MASK_PRIMARY,
    )
    shim = _SceneShim(v0p, e1p, e2p, maskp)
    hit_bf = intersect_closest_bruteforce(
        shim, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax), RAY_MASK_PRIMARY
    )
    t_bvh = np.asarray(t_bvh)
    t_bf = np.asarray(hit_bf.t)
    # same hit/miss classification
    np.testing.assert_array_equal(np.asarray(prim_bvh) >= 0, np.asarray(hit_bf.prim) >= 0)
    # same closest distance (identical float math on identical tris)
    hits = np.asarray(prim_bvh) >= 0
    np.testing.assert_allclose(t_bvh[hits], t_bf[hits], rtol=1e-4)
    # same primitive unless coplanar tie
    same = np.asarray(prim_bvh) == np.asarray(hit_bf.prim)
    assert same[hits].mean() > 0.99


def test_bvh_any_hit_matches_bruteforce():
    rng = np.random.default_rng(7)
    v0, e1, e2 = _random_tris(800, rng)
    mask = np.full(800, 1, np.int32)
    mask[::3] = 4  # a third are "light" triangles, excluded from shadow mask
    nodes, perm = build_bvh_sah(v0, e1, e2)
    v0p, e1p, e2p, maskp = v0[perm], e1[perm], e2[perm], mask[perm]
    o, d = _random_rays(400, rng)
    tmin = np.zeros(400, np.float32)
    tmax = np.full(400, 30.0, np.float32)
    nodes_j = ThreadedBvh(*[jnp.asarray(np.asarray(x)) for x in thread_bvh(nodes)])
    _, prim, _, _ = intersect_bvh(
        nodes_j,
        jnp.asarray(v0p),
        jnp.asarray(e1p),
        jnp.asarray(e2p),
        jnp.asarray(maskp),
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.asarray(tmin),
        jnp.asarray(tmax),
        RAY_MASK_SHADOW,
        any_hit=True,
    )
    occ_bvh = np.asarray(prim >= 0)
    shim = _SceneShim(v0p, e1p, e2p, maskp)
    occ_bf = np.asarray(
        intersect_any_bruteforce(
            shim, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax), RAY_MASK_SHADOW
        )
    )
    np.testing.assert_array_equal(occ_bvh, occ_bf)


def test_bvh_respects_tmax_and_active():
    rng = np.random.default_rng(3)
    v0, e1, e2 = _random_tris(100, rng, spread=2.0)
    nodes, perm = build_bvh_sah(v0, e1, e2)
    nodes_j = ThreadedBvh(*[jnp.asarray(np.asarray(x)) for x in thread_bvh(nodes)])
    o, d = _random_rays(64, rng, spread=3.0)
    args = (
        nodes_j,
        jnp.asarray(v0[perm]),
        jnp.asarray(e1[perm]),
        jnp.asarray(e2[perm]),
        jnp.ones(100, jnp.int32),
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.zeros(64, jnp.float32),
    )
    # tmax=0 -> no hits
    t, prim, _, _ = intersect_bvh(*args, jnp.zeros(64, jnp.float32), RAY_MASK_PRIMARY)
    assert (np.asarray(prim) == -1).all()
    # active=False -> no hits
    t, prim, _, _ = intersect_bvh(
        *args, jnp.full(64, 1e16, jnp.float32), RAY_MASK_PRIMARY, active=jnp.zeros(64, bool)
    )
    assert (np.asarray(prim) == -1).all()


def test_cornell_renders_identically_with_bvh():
    """Force-BVH render equals brute-force render on the same scene."""
    import jax

    from strelka_tpu.ops import integrator as I
    from strelka_tpu.render.device_scene import build_device_scene
    from strelka_tpu.scene.testscenes import cornell_box

    host = cornell_box(light_intensity=5000.0)
    kwargs = dict(
        width=24,
        height=24,
        samples_per_launch=2,
        max_sample_count=8,
        max_depth=3,
        enable_accumulation=True,
    )

    def run(dev_scene):
        cam = host.get_camera(0)
        params = I.LaunchParams(
            subframe_index=jnp.int32(0),
            clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
            view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
            exposure=jnp.asarray([1e-3] * 3),
            bg_color=jnp.zeros(3),
        )
        state = I.make_frame_state(24, 24)
        _, img = jax.jit(lambda s, p, st: I.render_launch(s, p, st, **kwargs))(dev_scene, params, state)
        return np.asarray(img)

    img_bf = run(build_device_scene(host, use_bvh=False))
    img_bvh = run(build_device_scene(host, use_bvh=True))
    assert not np.isnan(img_bvh).any()
    # identical up to float op-ordering (XLA fuses the two paths differently)
    np.testing.assert_allclose(img_bvh, img_bf, atol=1e-3)
