"""Emissive materials, stochastic alpha cutout, thin-walled glass.

Reference anchors: emission funcs linked per material
(mdlPtxCodeGen.cpp:133-172), alpha-mode -> OmniGlass/enable_opacity
(gltfloader.cpp:358-421), MDL thin_walled semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp

from strelka_tpu.ops import integrator as I
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.camera import Camera
from strelka_tpu.scene.scene import InstanceType, MaterialDescription, Scene
from strelka_tpu.scene.testscenes import _diffuse_material, _quad
from strelka_tpu.utils import math3d as m3


def _render(scene_host, width=24, height=24, spp=4, depth=3, bg=0.0):
    scene = build_device_scene(scene_host)
    cam = scene_host.get_camera(0)
    cam.update_aspect_ratio(width / height)
    params = I.LaunchParams(
        subframe_index=jnp.int32(0),
        clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
        view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
        exposure=jnp.asarray([1.0] * 3, jnp.float32),
        bg_color=jnp.full(3, bg, jnp.float32),
    )
    state = I.make_frame_state(height, width)
    _, image = I.render_launch(
        scene, params, state, width=width, height=height,
        samples_per_launch=spp, max_sample_count=64, max_depth=depth,
        enable_accumulation=False,
    )
    return np.asarray(image)  # [3, H, W] HDR


def _add_quad(scene, mat, pts, xf=None):
    pos, idx, nrm, uv = _quad(*pts)
    mesh = scene.create_mesh(pos, idx, normals=nrm, uvs=uv)
    scene.create_instance(InstanceType.eMesh, mesh, mat, xf if xf is not None else m3.identity4())


def _camera(scene, pos=(0.0, 1.0, 3.0)):
    cam = Camera(name="Main", fov=45.0, aspect=1.0)
    cam.set_position(list(pos))
    scene.add_camera(cam)


def test_emissive_material_illuminates_neighbors():
    """An emissive-material quad (NOT a light prim) lights a diffuse floor."""
    scene = Scene()
    white = scene.add_material(_diffuse_material("white", [0.8, 0.8, 0.8]))
    glow = MaterialDescription(type="mdl", file="default.mdl", name="glow")
    glow.params = {"emissive_color": [4.0, 2.0, 1.0]}
    glow_id = scene.add_material(glow)
    # floor at y=0 (normal +y), emitter at y=2 facing DOWN (-y)
    _add_quad(scene, white, ([-2, 0, 2], [2, 0, 2], [2, 0, -2], [-2, 0, -2]))
    _add_quad(scene, glow_id, ([-1, 2, -1], [1, 2, -1], [1, 2, 1], [-1, 2, 1]))
    _camera(scene, (0.0, 1.0, 3.5))
    img = _render(scene)
    assert np.isfinite(img).all()
    # floor region (lower half of image) receives bounced emission
    floor = img[:, img.shape[1] // 2 :, :]
    assert floor.max() > 1e-3, "emissive material does not illuminate the floor"
    # emission is colored: red channel dominates
    assert img[0].sum() > img[2].sum()


def test_emissive_direct_view():
    """Camera directly sees an emissive surface at its emission radiance."""
    scene = Scene()
    glow = MaterialDescription(type="mdl", file="default.mdl", name="glow")
    glow.params = {"emissive_color": [3.0, 3.0, 3.0]}
    gid = scene.add_material(glow)
    # quad facing +z (towards the camera)
    _add_quad(scene, gid, ([-1, 0, 0], [1, 0, 0], [1, 2, 0], [-1, 2, 0]))
    _camera(scene, (0.0, 1.0, 3.0))
    img = _render(scene, depth=2)
    c = img[:, img.shape[1] // 2, img.shape[2] // 2]
    np.testing.assert_allclose(c, [3.0, 3.0, 3.0], rtol=0.05)


def test_opacity_cutout_passes_through():
    """opacity=0 surface is fully transparent; opacity=1 blocks."""
    def build(op):
        scene = Scene()
        glow = MaterialDescription(type="mdl", file="default.mdl", name="glow")
        glow.params = {"emissive_color": [2.0, 2.0, 2.0]}
        gid = scene.add_material(glow)
        cut = MaterialDescription(type="mdl", file="default.mdl", name="cut", has_color=True, color=[0.0, 0.0, 0.0])
        cut.params = {"opacity": op}
        cid = scene.add_material(cut)
        _add_quad(scene, gid, ([-2, -1, -1], [2, -1, -1], [2, 3, -1], [-2, 3, -1]))
        _add_quad(scene, cid, ([-2, -1, 1], [2, -1, 1], [2, 3, 1], [-2, 3, 1]))
        _camera(scene, (0.0, 1.0, 3.0))
        return scene

    see_through = _render(build(0.0), depth=3)
    blocked = _render(build(1.0), depth=3)
    c_thru = see_through[:, 12, 12]
    c_blk = blocked[:, 12, 12]
    np.testing.assert_allclose(c_thru, [2.0, 2.0, 2.0], rtol=0.05)
    assert c_blk.max() < 0.05, "opaque black quad should block the emitter"


def test_thin_walled_glass_straight_through():
    """Thin-walled glass transmits straight (no refraction shift); solid
    glass at the same slab bends/offsets rays at the interfaces."""
    def build(thin):
        scene = Scene()
        glow = MaterialDescription(type="mdl", file="default.mdl", name="glow")
        glow.params = {"emissive_color": [2.0, 0.5, 0.25]}
        gid = scene.add_material(glow)
        glass = MaterialDescription(type="mdl", file="OmniGlass.mdl", name="g")
        glass.params = {"ior": 1.5, "thin_walled": thin}
        gl = scene.add_material(glass)
        _add_quad(scene, gid, ([-2, -1, -1], [2, -1, -1], [2, 3, -1], [-2, 3, -1]))
        # tilted glass pane between camera and emitter
        xf = m3.translate([0, 1, 1]) @ m3.quat_to_mat4(
            m3.quat_axis_angle([0, 1, 0], np.radians(30))
        )
        _add_quad(scene, gl, ([-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]), xf)
        _camera(scene, (0.0, 1.0, 3.0))
        return scene

    thin_img = _render(build(True), spp=16, depth=4)
    c = thin_img[:, 12, 12]
    # through thin glass the emitter is seen at ~Fresnel-attenuated radiance,
    # definitely bright and with the emitter's color ratio
    assert c[0] > 1.0, f"thin glass should transmit straight, got {c}"
    assert c[0] > 3.0 * c[2]


def test_hair_patch_renders():
    """Curves shade with the HAIR bsdf (hair df parity) and produce a finite,
    lit image."""
    from strelka_tpu.scene.testscenes import hair_patch

    scene = hair_patch(n_curves=12)
    img = _render(scene, width=20, height=20, spp=2, depth=2)
    assert np.isfinite(img).all()
    assert img.max() > 1e-4
