"""Texture atlas, bilinear sampling, normal mapping, and textured rendering."""

import numpy as np
import jax.numpy as jnp
import pytest

from strelka_tpu.textures import TextureManager, apply_normal_map, sample_bilinear


def _checker(s=8, scale=64):
    yy, xx = np.mgrid[0:scale, 0:scale]
    c = (((yy // s) + (xx // s)) % 2).astype(np.float32)
    img = np.stack([c, 1 - c, np.full_like(c, 0.5)], -1)
    return img


def test_atlas_pack_and_sample_exact():
    tm = TextureManager(atlas_size=64)
    img = _checker(scale=64)
    tid = tm.add_array(img, "checker")
    flat = tm.add_array(np.full((64, 64, 3), 0.25, np.float32), "flat")
    atlas = tm.build_atlas(dtype="f32")
    # shelf-packed sheet: both 64x64 layers present at native resolution
    assert atlas.data.shape[-1] == 4
    r = np.asarray(atlas.rects)
    # level-0 rects are rows 0..n_tex-1; mip rects follow
    assert (r[:2, 2] == 64).all() and (r[:2, 3] == 64).all()
    # sample at texel centers: u=(x+0.5)/64, v flipped
    xs = np.array([0, 5, 17, 63])
    ys = np.array([0, 9, 30, 63])
    u = (xs + 0.5) / 64.0
    v = 1.0 - (ys + 0.5) / 64.0
    uv = jnp.asarray(np.stack([u, v], -1).astype(np.float32))
    out = np.asarray(sample_bilinear(atlas, jnp.full(4, tid, jnp.int32), uv))
    np.testing.assert_allclose(out[:, :3], img[ys, xs], atol=1e-5)
    out2 = np.asarray(sample_bilinear(atlas, jnp.full(4, flat, jnp.int32), uv))
    np.testing.assert_allclose(out2[:, :3], 0.25, atol=1e-5)
    # tex_id -1 -> ones
    out3 = np.asarray(sample_bilinear(atlas, jnp.full(4, -1, jnp.int32), uv))
    np.testing.assert_allclose(out3, 1.0)


def test_bilinear_interpolates_between_texels():
    tm = TextureManager(atlas_size=64)
    img = np.zeros((64, 64, 3), np.float32)
    img[:, 32:] = 1.0  # step in x
    tid = tm.add_array(img)
    atlas = tm.build_atlas(dtype="f32")
    # halfway between texel 31 and 32 -> 0.5
    u = (31.5 + 0.5) / 64.0
    uv = jnp.asarray([[u, 0.5]], jnp.float32)
    out = np.asarray(sample_bilinear(atlas, jnp.array([tid], jnp.int32), uv))
    assert out[0, 0] == pytest.approx(0.5, abs=1e-5)


def test_smootherstep_filter_warps_fraction(monkeypatch):
    """STRELKA_TEX_SMOOTHERSTEP: quintic warp pulls off-center fractions
    toward the nearer texel; the midpoint is a fixed point (parity with the
    reference's USE_SMOOTHERSTEP_FILTER, texture_support_cuda.h:265-280)."""
    import strelka_tpu.textures as T

    tm = TextureManager(atlas_size=64)
    img = np.zeros((64, 64, 3), np.float32)
    img[:, 32:] = 1.0
    tid = tm.add_array(img)
    atlas = tm.build_atlas(dtype="f32")
    ids = jnp.array([tid], jnp.int32)
    mid = jnp.asarray([[(31.5 + 0.5) / 64.0, 0.5]], jnp.float32)
    quarter = jnp.asarray([[(31.25 + 0.5) / 64.0, 0.5]], jnp.float32)
    plain = np.asarray(sample_bilinear(atlas, ids, quarter))[0, 0]
    monkeypatch.setattr(T, "SMOOTHERSTEP", True)
    warped_mid = np.asarray(sample_bilinear(atlas, ids, mid))[0, 0]
    warped_q = np.asarray(sample_bilinear(atlas, ids, quarter))[0, 0]
    assert warped_mid == pytest.approx(0.5, abs=1e-5)
    assert plain == pytest.approx(0.25, abs=1e-5)
    # smootherstep(0.25) ~= 0.1035 < 0.25: pulled toward the nearer texel
    assert warped_q < plain - 0.1


def test_wrap_addressing():
    tm = TextureManager(atlas_size=64)
    tid = tm.add_array(_checker(scale=64))
    atlas = tm.build_atlas(dtype="f32")
    uv0 = jnp.asarray([[0.3, 0.7]], jnp.float32)
    uv1 = jnp.asarray([[1.3, -0.3]], jnp.float32)  # wraps to same point
    a = np.asarray(sample_bilinear(atlas, jnp.array([tid], jnp.int32), uv0))
    b = np.asarray(sample_bilinear(atlas, jnp.array([tid], jnp.int32), uv1))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_variable_resolution_and_clamp():
    """Textures keep native size; clamp address mode holds edge texels."""
    from strelka_tpu.textures import ADDRESS_CLAMP

    tm = TextureManager()
    big = np.zeros((256, 512, 3), np.float32)
    big[:, -1] = (1.0, 0.0, 0.0)  # red right edge column
    small = np.full((16, 16, 3), 0.5, np.float32)
    tb = tm.add_array(big, "big", address_mode=ADDRESS_CLAMP)
    ts = tm.add_array(small, "small")
    atlas = tm.build_atlas(dtype="f32")
    r = np.asarray(atlas.rects)
    assert tuple(r[tb][2:4]) == (512, 256)  # native w, h preserved
    assert tuple(r[ts][2:4]) == (16, 16)
    # clamp: u > 1 stays on the red edge column (wrap would blend to col 0)
    uv = jnp.asarray([[1.5, 0.5]], jnp.float32)
    out = np.asarray(sample_bilinear(atlas, jnp.array([tb], jnp.int32), uv))
    np.testing.assert_allclose(out[0, :3], [1.0, 0.0, 0.0], atol=1e-5)
    # small texture sampling is exact at its own resolution
    uv2 = jnp.asarray([[0.5, 0.5]], jnp.float32)
    out2 = np.asarray(sample_bilinear(atlas, jnp.array([ts], jnp.int32), uv2))
    np.testing.assert_allclose(out2[0, :3], 0.5, atol=1e-5)


def test_normal_map():
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    b = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    # flat map (0.5,0.5,1) -> unchanged normal
    flat = jnp.asarray([[0.5, 0.5, 1.0]], jnp.float32)
    out = np.asarray(apply_normal_map(n, t, b, flat))
    np.testing.assert_allclose(out, [[0, 0, 1]], atol=1e-6)
    # tilt toward tangent
    tilt = jnp.asarray([[1.0, 0.5, 1.0]], jnp.float32)
    out = np.asarray(apply_normal_map(n, t, b, tilt))
    assert out[0, 0] > 0.3 and out[0, 2] > 0.5
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-5)


def test_textured_render_end_to_end():
    """Floor with a checker diffuse texture shows spatial variation."""
    import jax

    from strelka_tpu.materials import MaterialManager
    from strelka_tpu.ops import integrator as I
    from strelka_tpu.render.device_scene import build_device_scene
    from strelka_tpu.scene.testscenes import cornell_box

    host = cornell_box(light_intensity=5000.0, with_boxes=False)
    mm = MaterialManager()
    tm = TextureManager(atlas_size=64)
    mm.texture_manager = tm
    checker_id = tm.add_array(_checker(s=8, scale=64), "checker")
    # attach checker to the white material (floor/walls)
    host.materials[0].params["__test_tex__"] = None  # keep dict non-empty
    scene = build_device_scene(host, mm)
    # manually point material 0's diffuse texture at the checker
    # (mat_table col 12 = diffuse_tex — the table the integrator gathers)
    import dataclasses

    from strelka_tpu.render.device_scene import rejoin_attr_tables

    scene = rejoin_attr_tables(
        dataclasses.replace(
            scene, mat_table=scene.mat_table.at[0, 12].set(float(checker_id))
        )
    )

    cam = host.get_camera(0)
    params = I.LaunchParams(
        subframe_index=jnp.int32(0),
        clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
        view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
        exposure=jnp.asarray([1e-3] * 3),
        bg_color=jnp.zeros(3),
    )
    state = I.make_frame_state(32, 32)
    _, img = jax.jit(
        lambda s, p, st: I.render_launch(
            s, p, st, width=32, height=32, samples_per_launch=4,
            max_sample_count=8, max_depth=2, enable_accumulation=True,
        )
    )(scene, params, state)
    img = np.asarray(img)  # planar [3, H, W]
    assert not np.isnan(img).any()
    # checkered floor: red and green channels both present and anticorrelated
    floor = img[:, 4:14]  # bottom rows (y small = floor in view)
    assert floor[0].max() > 0.005 and floor[1].max() > 0.005


def test_mip_chain_layout_and_counts():
    """Mip rects are consecutive per texture; counts cover down to 1x1."""
    from strelka_tpu.textures import RC_BASE, RC_COUNT, RC_H, RC_W

    tm = TextureManager(atlas_size=64)
    t0 = tm.add_array(_checker(scale=64))          # 64x64 -> 7 levels
    t1 = tm.add_array(np.full((16, 8, 3), 0.5, np.float32))  # 16x8 -> 5 levels
    atlas = tm.build_atlas(dtype="f32")
    r = np.asarray(atlas.rects)
    assert r[t0, RC_COUNT] == 7 and r[t1, RC_COUNT] == 5
    base0 = r[t0, RC_BASE]
    # level 1..6 of t0: halved dims each step
    for l in range(1, 7):
        assert r[base0 + l - 1, RC_W] == 64 >> l
        assert r[base0 + l - 1, RC_H] == 64 >> l
    assert r[r[t1, RC_BASE] + 3, RC_W] == 1 and r[r[t1, RC_BASE] + 3, RC_H] == 1


def test_trilinear_lod_selection():
    """High LOD converges to the checker mean; lod blends between levels."""
    import jax.numpy as jnp

    from strelka_tpu.textures import sample_trilinear

    tm = TextureManager(atlas_size=64)
    tid = tm.add_array(_checker(s=8, scale=64))
    atlas = tm.build_atlas(dtype="f32")
    uv = jnp.asarray([[0.31, 0.57]], jnp.float32)
    tids = jnp.array([tid], jnp.int32)
    # lod_uv = -log2(64) selects level 0 exactly == bilinear
    lo = np.asarray(sample_trilinear(atlas, tids, uv, jnp.array([-6.0], jnp.float32)))
    bi = np.asarray(sample_bilinear(atlas, tids, uv))
    np.testing.assert_allclose(lo, bi, atol=1e-6)
    # lod_uv = 0 (footprint covers the whole texture) -> 1x1 level = mean
    hi = np.asarray(sample_trilinear(atlas, tids, uv, jnp.array([0.0], jnp.float32)))
    np.testing.assert_allclose(hi[0, :2], 0.5, atol=0.02)
    # negative id still -> ones
    none = np.asarray(
        sample_trilinear(atlas, jnp.array([-1], jnp.int32), uv, jnp.zeros(1, jnp.float32))
    )
    np.testing.assert_allclose(none, 1.0)


def test_u8_atlas_quantization_and_hdr_scale():
    """Default u8 storage: LDR within 1/255, HDR preserved via scale."""
    import jax.numpy as jnp

    tm = TextureManager(atlas_size=64)
    ldr = tm.add_array(_checker(scale=64))
    hdr = tm.add_array(np.full((8, 8, 3), 12.0, np.float32), "hdr")
    atlas = tm.build_atlas()  # default u8 + mips
    assert np.asarray(atlas.data).dtype == np.uint8
    uv = jnp.asarray([[0.25, 0.25]], jnp.float32)
    out = np.asarray(sample_bilinear(atlas, jnp.array([ldr], jnp.int32), uv))
    assert abs(out[0, 2] - 0.5) < 1.5 / 255.0
    out_hdr = np.asarray(sample_bilinear(atlas, jnp.array([hdr], jnp.int32), uv))
    np.testing.assert_allclose(out_hdr[0, :3], 12.0, rtol=0.01)


def test_u8_srgb_storage_roundtrip(tmp_path):
    """File-loaded color textures store sRGB u8 and decode exactly."""
    import jax.numpy as jnp
    from PIL import Image

    vals = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16 + 8
    img = np.stack([vals] * 3 + [np.full_like(vals, 255)], -1)
    p = str(tmp_path / "t.png")
    Image.fromarray(img, "RGBA").save(p)
    tm = TextureManager(atlas_size=64)
    tid = tm.load(p, srgb=True)
    atlas = tm.build_atlas()
    # texel centers decode to the exact sRGB EOTF of the source byte
    uv = jnp.asarray([[(1 + 0.5) / 4.0, 1.0 - (2 + 0.5) / 4.0]], jnp.float32)
    out = np.asarray(sample_bilinear(atlas, jnp.array([tid], jnp.int32), uv))
    srgb = img[2, 1, 0] / 255.0
    expect = srgb / 12.92 if srgb <= 0.04045 else ((srgb + 0.055) / 1.055) ** 2.4
    np.testing.assert_allclose(out[0, 0], expect, atol=1e-6)


def test_mipmapped_render_no_shimmer():
    """A heavily-tiled 1-texel checker (mean 0.5): the mipmapped render must
    match a constant-0.5-albedo render of the SAME sample set (filtering to
    the mean), while the unfiltered level-0 render aliases badly — the
    shimmer test from the round-3 verdict."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from strelka_tpu.materials import MaterialManager
    from strelka_tpu.ops import integrator as I
    from strelka_tpu.render.device_scene import build_device_scene
    from strelka_tpu.scene.testscenes import cornell_box

    host = cornell_box(light_intensity=5000.0, with_boxes=False)
    out = {}
    for config in ("const", "raw", "mip"):
        mm = MaterialManager()
        tm = TextureManager(atlas_size=64)
        mm.texture_manager = tm
        checker_id = tm.add_array(_checker(s=1, scale=64), "checker1")
        host.materials[0].params["__test_tex__"] = None
        scene = build_device_scene(host, mm)
        if config == "const":
            # same mean albedo as the checker, no texture
            mt = scene.mat_table.at[0, 1:4].set(0.5)
        else:
            # mat_table col 12 = diffuse_tex; cols 16-17 = uv tiling (64x ->
            # texel frequency far above pixel frequency)
            mt = scene.mat_table.at[0, 12].set(float(checker_id))
            mt = mt.at[0, 16].set(64.0).at[0, 17].set(64.0)
        from strelka_tpu.render.device_scene import rejoin_attr_tables

        scene = rejoin_attr_tables(dataclasses.replace(scene, mat_table=mt))
        if config == "raw":
            atlas = scene.textures
            rects = np.asarray(atlas.rects).copy()
            rects[:, 7] = 1  # RC_COUNT: truncate every chain to level 0
            scene = dataclasses.replace(
                scene, textures=atlas._replace(rects=jnp.asarray(rects))
            )
        cam = host.get_camera(0)
        params = I.LaunchParams(
            subframe_index=jnp.int32(0),
            clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
            view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
            exposure=jnp.asarray([1e-3] * 3),
            bg_color=jnp.zeros(3),
        )
        state = I.make_frame_state(24, 24)
        _, img = jax.jit(
            lambda s, p, st: I.render_launch(
                s, p, st, width=24, height=24, samples_per_launch=2,
                max_sample_count=64, max_depth=2, enable_accumulation=False,
            )
        )(scene, params, state)
        img = np.asarray(img)
        assert not np.isnan(img).any()
        out[config] = img
    # identical sample set -> lighting noise cancels in the differences;
    # what remains is pure texture aliasing
    err_mip = np.abs(out["mip"] - out["const"]).mean()
    err_raw = np.abs(out["raw"] - out["const"]).mean()
    assert err_mip < err_raw * 0.35, (err_mip, err_raw)


def test_volume_3d_lookup():
    """texture_3d: slice-exact at slice centers, lerped between slices,
    wrap vs clamp in w (tex_lookup_float4_3d parity,
    texture_support_cuda.h:433-463)."""
    from strelka_tpu.textures import ADDRESS_CLAMP, sample_3d

    tm = TextureManager(atlas_size=64)
    d, h, w = 4, 8, 8
    vol = np.zeros((d, h, w, 3), np.float32)
    for k in range(d):
        vol[k] = (k + 1) / d  # constant slice values 0.25, 0.5, 0.75, 1.0
    tid = tm.add_volume(vol, "vol")
    tid_c = tm.add_volume(vol, "vol_clamp", address_mode=ADDRESS_CLAMP)
    atlas = tm.build_atlas(dtype="f32")
    assert int(np.asarray(atlas.meta)[tid, 0]) == 1
    assert int(np.asarray(atlas.meta)[tid, 1]) == d

    ids = jnp.full(4, tid, jnp.int32)
    # slice centers: w = (k + 0.5)/D -> exactly slice k
    uvw = jnp.asarray([[0.5, 0.5, (k + 0.5) / d] for k in range(4)], jnp.float32)
    out = np.asarray(sample_3d(atlas, ids, uvw))
    np.testing.assert_allclose(out[:, 0], [(k + 1) / d for k in range(4)], atol=1e-6)
    # midpoint between slice 0 and 1
    mid = np.asarray(sample_3d(atlas, ids[:1], jnp.asarray([[0.5, 0.5, 0.25]], jnp.float32)))
    np.testing.assert_allclose(mid[0, 0], (0.25 + 0.5) / 2, atol=1e-6)
    # wrap: w just below 0 blends slices D-1 and 0; clamp pins to slice 0
    below = jnp.asarray([[0.5, 0.5, 0.01]], jnp.float32)
    wr = np.asarray(sample_3d(atlas, ids[:1], below))[0, 0]
    cl = np.asarray(sample_3d(atlas, jnp.full(1, tid_c, jnp.int32), below))[0, 0]
    assert wr > 0.3  # pulled up by the wrap blend with slice D-1 (=1.0)
    np.testing.assert_allclose(cl, 0.25, atol=0.02)
    # invalid id -> ones
    ones = np.asarray(sample_3d(atlas, jnp.full(1, -1, jnp.int32), below))
    np.testing.assert_allclose(ones, 1.0)


def test_cubemap_lookup():
    """texture_cube: axis directions land on the right faces (CUDA face
    order +x -x +y -y +z -z; tex_lookup_float4_cube,
    texture_support_cuda.h:522-558)."""
    from strelka_tpu.textures import sample_cube

    tm = TextureManager(atlas_size=64)
    colors = np.asarray(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1]], np.float32
    )
    faces = np.zeros((6, 8, 8, 3), np.float32)
    faces[:] = colors[:, None, None, :]
    tid = tm.add_cubemap(faces, "env")
    atlas = tm.build_atlas(dtype="f32")
    assert int(np.asarray(atlas.meta)[tid, 0]) == 2

    dirs = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        jnp.float32,
    )
    out = np.asarray(sample_cube(atlas, jnp.full(6, tid, jnp.int32), dirs))
    np.testing.assert_allclose(out[:, :3], colors, atol=1e-6)
    # off-axis direction still selects the major-axis face
    d2 = jnp.asarray([[1.0, 0.3, -0.2]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sample_cube(atlas, jnp.full(1, tid, jnp.int32), d2))[0, :3],
        colors[0], atol=1e-6,
    )


def test_stochastic_trilinear_expectation_matches_exact():
    """E[one-texel stochastic lookup] == exact trilinear (decode-then-filter
    on both sides), on a u8 sRGB atlas with wrap addressing and a fractional
    mip level — averaged over a stratified grid of the 3 filter uniforms."""
    import jax.numpy as jnp

    from strelka_tpu.textures import sample_trilinear, sample_trilinear_stochastic

    rng = np.random.default_rng(7)
    tm = TextureManager(atlas_size=64)
    tid = tm.add_array(rng.random((16, 16, 3)).astype(np.float32))
    atlas = tm.build_atlas()  # u8 + mips
    # filter fractions pinned to quarters at level 0 (-> eighths at level 1,
    # half the resolution) so a k=8 stratified-midpoint grid integrates each
    # {rnd < frac} indicator EXACTLY (#mids below frac == 8*frac):
    # uv -> fu = uu*16 - 0.5 with fractional part .25/.75; lod = 1.25/1.75
    uv = jnp.asarray(
        [[(3 + 0.75) / 16.0, 1.0 - (5 + 0.25) / 16.0],
         [(9 + 0.25) / 16.0, 1.0 - (1 + 0.75) / 16.0]],
        jnp.float32,
    )
    tids = jnp.full(2, tid, jnp.int32)
    lod = jnp.asarray([1.25 - 4.0, 1.75 - 4.0], jnp.float32)  # log2(16) = 4
    exact = np.asarray(sample_trilinear(atlas, tids, uv, lod))
    # k=16 mids resolve the coarsest straddled level's sixteenth-aligned
    # fractions exactly; one vectorized call over the full (level, x, y) grid
    k = 16
    grid = ((np.arange(k) + 0.5) / k).astype(np.float32)
    ga, gb, gc = [g.ravel() for g in np.meshgrid(grid, grid, grid, indexing="ij")]
    m = ga.size
    uv_b = jnp.asarray(np.repeat(np.asarray(uv), m, axis=0))
    tid_b = jnp.asarray(np.repeat(np.asarray(tids), m))
    lod_b = jnp.asarray(np.repeat(np.asarray(lod), m))
    r3 = (
        jnp.asarray(np.tile(ga, 2)),
        jnp.asarray(np.tile(gb, 2)),
        jnp.asarray(np.tile(gc, 2)),
    )
    all_out = np.asarray(
        sample_trilinear_stochastic(atlas, tid_b, uv_b, lod_b, r3)
    ).reshape(2, m, 4)
    acc = all_out.mean(axis=1)
    np.testing.assert_allclose(acc, exact, atol=1e-4)
    # negative id still -> ones regardless of uniforms
    none = np.asarray(
        sample_trilinear_stochastic(
            atlas, jnp.array([-1, -1], jnp.int32), uv, lod,
            (jnp.zeros(2), jnp.zeros(2), jnp.zeros(2)),
        )
    )
    np.testing.assert_allclose(none, 1.0)
