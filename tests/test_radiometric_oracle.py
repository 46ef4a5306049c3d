"""End-to-end analytic radiometric oracles.

The reference validates frames visually against OptiX goldens (images/);
with no GPU in this environment, these tests pin the renderer to CLOSED-FORM
radiometry instead — an external ground truth that a mirrored bug in both
backends cannot satisfy:

  1. white furnace: a Lambertian sphere of albedo rho in a uniform
     environment L renders as exactly rho * L (cosine importance sampling
     makes the estimator zero-variance: f/pdf == rho per bounce, and every
     secondary ray from a convex body escapes to the environment);
  2. inverse-square sphere light: a Lambertian plane point directly under a
     uniform sphere light (radius r, distance D, radiance L) has outgoing
     radiance rho * L * r^2 / D^2 (E = pi L sin^2 alpha, sin alpha = r/D).

Raw linear output: tonemapperType=3 (none) + gamma=0 disables the whole
post chain (render.py tonemap dispatch).
"""

import numpy as np

from strelka_tpu.render.buffer import BufferDesc, BufferFormat
from strelka_tpu.render.render import RenderFactory
from strelka_tpu.scene.camera import Camera
from strelka_tpu.scene.scene import InstanceType, Scene, UniformLightDesc
from strelka_tpu.scene.testscenes import _diffuse_material, _quad, furnace_scene
from strelka_tpu.settings import SharedContext, make_default_settings
from strelka_tpu.utils import math3d as m3


def _render_raw(scene, width=48, height=48, spp=8, total=64, depth=4, bg=(0, 0, 0)):
    s = make_default_settings(width, height)
    s.set("render/pt/sppTotal", total)
    s.set("render/pt/spp", spp)
    s.set("render/pt/depth", depth)
    s.set("render/pt/tonemapperType", 3)  # none
    s.set("render/post/gamma", 0.0)  # raw linear
    s.set("render/bgColor", tuple(float(c) for c in bg))
    ctx = SharedContext(s)
    r = RenderFactory.create_render()
    r.set_scene(scene)
    r.set_shared_context(ctx)
    r.init()
    buf = r.create_buffer(BufferDesc(width, height, BufferFormat.FLOAT4))
    for _ in range(max(1, total // spp)):
        r.render(buf)
    return np.asarray(buf.map())[..., :3]


def test_furnace_closed_form():
    """Sphere of albedo rho in a unit environment -> pixel == rho exactly."""
    rho = 0.7
    img = _render_raw(furnace_scene(albedo=rho), bg=(1.0, 1.0, 1.0), depth=3)
    h, w = img.shape[:2]
    center = img[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2]
    np.testing.assert_allclose(center.mean(axis=(0, 1)), [rho] * 3, atol=0.02)
    # background pixels see the environment directly
    np.testing.assert_allclose(img[1, 1], [1.0] * 3, atol=0.01)


def test_furnace_invisible_at_unit_albedo():
    """rho == 1: the sphere is radiometrically invisible (classic furnace).

    Known non-ideality: ~1% of samples leak below their facet (cosine lobe
    sampled around the interpolated normal while the geometry is planar),
    get trapped inside the closed tessellated sphere, and die at the depth
    limit — isolated pixels lose up to ~10% (6/64 samples). This is the
    standard shading-normal leak every one-sample path tracer shares
    (measured depth-independent at 6 vs 10), so the oracle bounds the mean
    and the distribution tail rather than demanding per-pixel exactness."""
    img = _render_raw(furnace_scene(albedo=1.0), bg=(1.0, 1.0, 1.0), depth=6)
    assert np.isfinite(img).all()
    assert abs(float(img.mean()) - 1.0) < 0.01
    d = np.abs(img - 1.0)
    assert np.quantile(d, 0.95) < 0.02  # all but leak-outlier pixels exact
    assert float(np.median(d)) < 0.002


def test_sphere_light_inverse_square():
    """Plane point under a sphere light: L_o = rho * L * r^2 / D^2."""
    rho, L, r, D = 0.6, 40.0, 0.25, 2.0
    scene = Scene()
    desc = _diffuse_material("ground", [rho] * 3)
    # the default uber material carries a GGX lobe (specular_level 0.5 ->
    # F0 = 0.04) which adds ~13% here; the closed form is for pure Lambert
    desc.params = {"specular_level": 0.0, "reflection_roughness_constant": 1.0}
    mat = scene.add_material(desc)
    # floor quad (normal +y), large enough to fill the narrow-fov view
    pos, idx, nrm, uv = _quad([-4, 0, 4], [4, 0, 4], [4, 0, -4], [-4, 0, -4])
    mesh = scene.create_mesh(pos, idx, normals=nrm, uvs=uv)
    scene.create_instance(InstanceType.eMesh, mesh, mat, m3.identity4())
    scene.create_light(
        UniformLightDesc(
            type=2,  # sphere
            position=np.array([0.0, D, 0.0]),
            color=np.array([1.0, 1.0, 1.0]),
            intensity=L,
            radius=r,
        )
    )
    cam = Camera(name="Main", fov=8.0, aspect=1.0)
    cam.set_position([2.0, 2.0, 2.0])
    cam.look_at([2.0, 2.0, 2.0], [0.0, 0.0, 0.0])
    scene.add_camera(cam)

    img = _render_raw(scene, spp=8, total=256, depth=2)
    h, w = img.shape[:2]
    center = img[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2].mean(axis=(0, 1))
    expect = rho * L * (r / D) ** 2  # 0.375
    np.testing.assert_allclose(center, [expect] * 3, rtol=0.06)
