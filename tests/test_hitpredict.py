"""Temporal hit prediction (ops/hitcache.py + _closest_predicted).

Correctness contract: predictions are a scheduling hint only — any mix of
right, wrong, and missing predictions must produce exactly the bruteforce
closest hit (phase 2's residual open test is conservative). Kernels run in
interpret mode on CPU via monkeypatched entry points (they are imported
function-locally inside ops/intersect.py, so module setattr takes effect).
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

import strelka_tpu.ops.intersect as X
import strelka_tpu.ops.pallas_intersect as PI
from strelka_tpu.ops import hitcache
from strelka_tpu.ops.intersect import intersect_closest_bruteforce
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY
from strelka_tpu.ops.vec import from_rows

TBLK, SUPER, TILE = 128, 2, 256
SB_SIZE = TBLK * SUPER


class _Shim:
    """Minimal DeviceScene stand-in for the residual dispatch helpers."""

    def __init__(self, v0, e1, e2, mask):
        self.v0 = jnp.asarray(v0)
        self.e1 = jnp.asarray(e1)
        self.e2 = jnp.asarray(e2)
        self.geom_mask = jnp.asarray(mask)
        self.num_triangles = v0.shape[0]
        self.kernel_tblk = TBLK
        self.kernel_super = SUPER
        self.tris_packed = PI.pack_tris(v0, e1, e2, mask, tblk=TBLK, super_=SUPER)
        self.tri_bounds = PI.block_bounds(v0, e1, e2, mask, tblk=TBLK, super_=SUPER)
        self.tris_feats = None  # VPU work-list path
        self.tris_mask = None
        self.tris_local = False


def _scene(n_tri: int, rng):
    """Morton-ordered random triangle soup in [0,1]^3 (blocks spatially
    tight, like device_scene's packer)."""
    c = rng.random((n_tri, 3), np.float32)
    order = np.asarray(PI.morton_sort_tris(np.stack([c, c, c], axis=1)))
    c = c[order]
    v0 = c + rng.normal(0, 0.02, (n_tri, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.05, (n_tri, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.05, (n_tri, 3)).astype(np.float32)
    mask = np.full(n_tri, 0xFF, np.int32)
    return v0, e1, e2, mask


def _rays(n: int, rng):
    o = rng.random((n, 3)).astype(np.float32) * 1.4 - 0.2
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


@pytest.fixture()
def interp(monkeypatch):
    """Route every Pallas kernel the residual dispatch uses through
    interpret mode, and shrink the ray tile to the test size."""
    for name in (
        "pallas_intersect_closest_wl",
        "pallas_intersect_any_wl",
        "pallas_intersect_closest_wl_mxu",
        "pallas_intersect_any_wl_mxu",
        "pallas_intersect_closest",
        "pallas_intersect_any",
        "pallas_intersect_closest_mxu",
        "pallas_intersect_any_mxu",
        "pallas_intersect_closest_fusedk",
        "pallas_intersect_any_fusedk",
        "pallas_open_w",
    ):
        fn = getattr(PI, name)
        monkeypatch.setattr(PI, name, functools.partial(fn, interpret=True))
    monkeypatch.setattr(X, "SUPER_PATH_TILE", TILE)


def test_hitcache_unit():
    cache = hitcache.make_cache(1024)
    assert int(cache.min()) == -1
    idx = jnp.asarray([3, 3, 7, 900], jnp.int32)
    sb = jnp.asarray([5, 6, 2, 9], jnp.int32)
    valid = jnp.asarray([True, True, True, False])
    cache = hitcache.update(cache, idx, sb, valid)
    # last writer wins on the 3/3 collision; invalid lane 900 dropped
    assert int(cache[3]) == 6 and int(cache[7]) == 2 and int(cache[900]) == -1
    got = hitcache.predict(cache, jnp.asarray([3, 7, 900, 0], jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), [6, 2, -1, -1])


def test_hitcache_hash_range_and_octants():
    class S:
        world_lo = (0.0, 0.0, 0.0)
        world_hi = (1.0, 1.0, 1.0)

    rng = np.random.default_rng(5)
    o, d = _rays(512, rng)
    h = hitcache.ray_hash(S(), from_rows(jnp.asarray(o)), from_rows(jnp.asarray(d)), 4096)
    h = np.asarray(h)
    assert h.min() >= 0 and h.max() < 4096
    # flipping the direction octant changes the key (same position cell)
    h2 = hitcache.ray_hash(S(), from_rows(jnp.asarray(o)), from_rows(jnp.asarray(-d)), 4096)
    assert (h != np.asarray(h2)).mean() > 0.9
    # non-power-of-two table (sharded slice) stays in range
    h3 = np.asarray(
        hitcache.ray_hash(S(), from_rows(jnp.asarray(o)), from_rows(jnp.asarray(d)), 3000)
    )
    assert h3.min() >= 0 and h3.max() < 3000


def test_closest_predicted_matches_bruteforce(interp):
    """Right, wrong, and missing predictions all converge to bruteforce."""
    rng = np.random.default_rng(23)
    v0, e1, e2, mask = _scene(1024, rng)
    scene = _Shim(v0, e1, e2, mask)
    o, d = _rays(512, rng)
    tmin = jnp.zeros(512, jnp.float32)
    tmax = jnp.full(512, 1e16, jnp.float32)
    ov, dv = from_rows(jnp.asarray(o)), from_rows(jnp.asarray(d))

    bf = intersect_closest_bruteforce(
        scene, jnp.asarray(o), jnp.asarray(d), tmin, tmax, RAY_MASK_PRIMARY
    )
    true_sb = np.where(np.asarray(bf.prim) >= 0, np.asarray(bf.prim) // SB_SIZE, -1)

    nsb = scene.tri_bounds.shape[1] // SUPER
    lanes = np.arange(512)
    for label, pred_np in (
        ("oracle", true_sb),
        ("cold", np.full(512, -1)),
        ("garbage", (lanes * 7) % nsb),
        ("mixed", np.where(lanes % 3 == 0, true_sb, np.where(lanes % 3 == 1, -1, (lanes * 5) % nsb))),
    ):
        t, prim = X._closest_predicted(
            scene, False, ov, dv, tmin, tmax, RAY_MASK_PRIMARY,
            jnp.full(512, -1, jnp.int32), jnp.asarray(pred_np, jnp.int32),
        )
        np.testing.assert_array_equal(np.asarray(prim), np.asarray(bf.prim), err_msg=label)
        hitm = np.asarray(bf.prim) >= 0
        np.testing.assert_allclose(
            np.asarray(t)[hitm], np.asarray(bf.t)[hitm], rtol=1e-5, err_msg=label
        )


def test_predicted_equals_twopass(interp):
    """With no predictions the predicted dispatch equals the K-nearest
    two-pass bit-for-bit (same phase 2, phase 1 resolves nothing)."""
    rng = np.random.default_rng(31)
    v0, e1, e2, mask = _scene(2048, rng)
    scene = _Shim(v0, e1, e2, mask)
    o, d = _rays(512, rng)
    tmin = jnp.zeros(512, jnp.float32)
    tmax = jnp.full(512, 1e16, jnp.float32)
    ov, dv = from_rows(jnp.asarray(o)), from_rows(jnp.asarray(d))
    excl = jnp.full(512, -1, jnp.int32)

    t_tp, prim_tp = X._closest_twopass(scene, False, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, excl)
    t_pr, prim_pr = X._closest_predicted(
        scene, False, ov, dv, tmin, tmax, RAY_MASK_PRIMARY, excl,
        jnp.full(512, -1, jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(prim_pr), np.asarray(prim_tp))
    m = np.asarray(prim_tp) >= 0
    np.testing.assert_array_equal(np.asarray(t_pr)[m], np.asarray(t_tp)[m])


def test_framestate_threading_cpu():
    """hit_cache rides FrameState through a CPU render_launch unchanged
    (prediction requires the Pallas path) and images match predict=False."""
    import jax

    from strelka_tpu.ops import integrator as I
    from strelka_tpu.render.device_scene import build_device_scene
    from strelka_tpu.scene import testscenes as TS

    sh = TS.cornell_box()
    scene = build_device_scene(sh)
    cam = sh.get_camera(0)
    cam.update_aspect_ratio(1.0)
    params = I.LaunchParams(
        subframe_index=jnp.int32(0),
        clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
        view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
        exposure=jnp.asarray([6.25e-4] * 3, jnp.float32),
        bg_color=jnp.full(3, 0.1, jnp.float32),
    )

    def run(state):
        return I.render_launch(
            scene, params, state, width=16, height=16, samples_per_launch=1,
            max_sample_count=16, max_depth=2, enable_accumulation=True,
        )

    s_off = I.make_frame_state(16, 16, predict=False)
    s_on = I.make_frame_state(16, 16, predict=True)
    assert s_off.hit_cache is None and s_on.hit_cache is not None
    st0, img0 = jax.jit(run)(s_off)
    st1, img1 = jax.jit(run)(s_on)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    assert st0.hit_cache is None
    assert int(st1.hit_cache.min()) == -1  # CPU path never engages prediction
