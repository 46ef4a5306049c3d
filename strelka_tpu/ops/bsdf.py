"""JAX-traceable BSDF library — the TPU replacement for MDL-generated code.

The reference JIT-compiles each MDL material to PTX exposing mdlcode_init /
mdlcode_sample / mdlcode_evaluate (OptixRender_radiance_closest_hit.cu:31-33,
called at :502-571). Here the same contract is a fixed set of analytic BSDFs
switched by a per-material type id, evaluated branchlessly across the whole
wavefront (every lobe is cheap VPU math; masked selects beat divergence).

Contract parity with mi::neuraylib (target_code_types.h):
  * sample() consumes 4 uniforms (xi), returns k2, pdf, bsdf_over_pdf and an
    event bitmask; bsdf_over_pdf INCLUDES cos(k2)/pdf.
  * evaluate() returns bsdf_diffuse / bsdf_glossy which INCLUDE cos(k2), plus
    the sample pdf; zero for specular events (so NEE/MIS skip them, matching
    the event_type & (DIFFUSE|GLOSSY) gate at cu:547).
  * pure-specular sampling returns pdf == 0 (MDL convention; the integrator
    maps it to lastBsdfPdf = 1, OptixRender_radiance_closest_hit.cu:602-603).

Models: DIFFUSE (default.mdl), OMNI_PBR (GGX metal/rough + diffuse base),
OMNI_GLASS (smooth dielectric with transmission tint).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from strelka_tpu.materials import BsdfType

M_PI = jnp.float32(3.14159265358979323846)

# mi::neuraylib::Bsdf_event_type bit values
BSDF_EVENT_ABSORB = 0
BSDF_EVENT_DIFFUSE = 1
BSDF_EVENT_GLOSSY = 2
BSDF_EVENT_SPECULAR = 4
BSDF_EVENT_REFLECTION = 8
BSDF_EVENT_TRANSMISSION = 16
BSDF_EVENT_DIFFUSE_REFLECTION = BSDF_EVENT_DIFFUSE | BSDF_EVENT_REFLECTION
BSDF_EVENT_GLOSSY_REFLECTION = BSDF_EVENT_GLOSSY | BSDF_EVENT_REFLECTION
BSDF_EVENT_SPECULAR_REFLECTION = BSDF_EVENT_SPECULAR | BSDF_EVENT_REFLECTION
BSDF_EVENT_SPECULAR_TRANSMISSION = BSDF_EVENT_SPECULAR | BSDF_EVENT_TRANSMISSION


class ShadingFrame(NamedTuple):
    """Subset of Shading_state_material (cu:477-494): world-space frame."""

    normal: jnp.ndarray  # [N,3] shading normal (flipped when inside)
    tangent_u: jnp.ndarray  # [N,3]
    tangent_v: jnp.ndarray  # [N,3]
    geom_normal: jnp.ndarray  # [N,3] (flipped when inside)


class SurfaceParams(NamedTuple):
    """Per-hit material parameters (gathered rows of the MaterialTable)."""

    bsdf_type: jnp.ndarray  # [N] int32
    diffuse_color: jnp.ndarray  # [N,3]
    metallic: jnp.ndarray  # [N]
    roughness: jnp.ndarray  # [N]
    specular_level: jnp.ndarray  # [N]
    ior: jnp.ndarray  # [N]
    glass_color: jnp.ndarray  # [N,3]
    opacity: jnp.ndarray  # [N]


class BsdfSample(NamedTuple):
    k2: jnp.ndarray  # [N,3]
    pdf: jnp.ndarray  # [N] (0 for specular)
    bsdf_over_pdf: jnp.ndarray  # [N,3] (includes cos/pdf)
    event_type: jnp.ndarray  # [N] int32


class BsdfEval(NamedTuple):
    bsdf_diffuse: jnp.ndarray  # [N,3] (includes cos)
    bsdf_glossy: jnp.ndarray  # [N,3] (includes cos)
    pdf: jnp.ndarray  # [N]


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _norm(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def _luminance(c):
    return _dot(c, jnp.array([0.299, 0.587, 0.114], jnp.float32))


def _to_local(frame: ShadingFrame, w):
    """World -> tangent space (z = shading normal)."""
    return jnp.stack([_dot(w, frame.tangent_u), _dot(w, frame.tangent_v), _dot(w, frame.normal)], -1)


def _to_world(frame: ShadingFrame, w):
    return (
        w[..., 0:1] * frame.tangent_u + w[..., 1:2] * frame.tangent_v + w[..., 2:3] * frame.normal
    )


def cosine_sample_hemisphere(u1, u2):
    """Concentric-free cosine hemisphere sample in local space (z up)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * M_PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    return jnp.stack([x, y, z], -1)


def _schlick(f0, cos_theta):
    """Fresnel-Schlick; f0 [N,3], cos [N]."""
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * (m**5)[..., None]


def fresnel_dielectric(cos_i, eta_i, eta_t):
    """Exact unpolarized dielectric Fresnel. cos_i > 0."""
    sin2_t = (eta_i / eta_t) ** 2 * jnp.maximum(1.0 - cos_i**2, 0.0)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta_t * cos_i - eta_i * cos_t) / jnp.maximum(eta_t * cos_i + eta_i * cos_t, 1e-20)
    r_perp = (eta_i * cos_i - eta_t * cos_t) / jnp.maximum(eta_i * cos_i + eta_t * cos_t, 1e-20)
    f = 0.5 * (r_par**2 + r_perp**2)
    return jnp.where(tir, 1.0, f), cos_t, tir


# --- GGX (Trowbridge-Reitz) with Smith height-correlated masking ---


def _ggx_ndf(alpha, cos_h):
    a2 = alpha * alpha
    d = cos_h * cos_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(M_PI * d * d, 1e-12)


def _smith_lambda(alpha, cos_v):
    a2 = alpha * alpha
    c2 = jnp.clip(cos_v * cos_v, 1e-9, 1.0)
    return 0.5 * (jnp.sqrt(1.0 + a2 * (1.0 - c2) / c2) - 1.0)


def _smith_g2(alpha, cos_i, cos_o):
    return 1.0 / (1.0 + _smith_lambda(alpha, cos_i) + _smith_lambda(alpha, cos_o))


def _smith_g1(alpha, cos_v):
    return 1.0 / (1.0 + _smith_lambda(alpha, cos_v))


def sample_ggx_vndf(k1_local, alpha, u1, u2):
    """Heitz 2018 visible-NDF half-vector sampling (isotropic). k1 z>0."""
    v = _norm(jnp.stack([alpha * k1_local[..., 0], alpha * k1_local[..., 1], k1_local[..., 2]], -1))
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1] * inv, v[..., 0] * inv, jnp.zeros_like(inv)], -1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), v.shape),
    )
    t2 = jnp.cross(v, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * M_PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    h = _norm(jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1], jnp.maximum(nh[..., 2], 0.0)], -1))
    return h


def _ggx_vndf_pdf(alpha, k1_local, h_local):
    """pdf of sample_ggx_vndf in solid angle of k2 = G1 * D * |k1.h| / (cos1 * 4 |k1.h|)."""
    cos1 = jnp.maximum(k1_local[..., 2], 1e-6)
    d = _ggx_ndf(alpha, h_local[..., 2])
    g1 = _smith_g1(alpha, cos1)
    return g1 * d / (4.0 * cos1)


_SPECULAR_ROUGHNESS_EPS = 1e-3


def _pbr_lobes(params: SurfaceParams, cos1):
    """Shared OmniPBR lobe quantities: F0, diffuse albedo, lobe weights."""
    f0 = (
        0.08 * params.specular_level[..., None] * (1.0 - params.metallic[..., None])
        + params.diffuse_color * params.metallic[..., None]
    )
    albedo_d = params.diffuse_color * (1.0 - params.metallic[..., None])
    f_k1 = _schlick(f0, cos1)
    w_spec = _luminance(f_k1)
    w_diff = _luminance(albedo_d)
    p_spec = w_spec / jnp.maximum(w_spec + w_diff, 1e-8)
    p_spec = jnp.where(w_spec + w_diff < 1e-8, 0.5, jnp.clip(p_spec, 0.05, 0.95))
    return f0, albedo_d, p_spec


def _pbr_eval_local(params: SurfaceParams, k1l, k2l):
    """f*cos and pdf for OmniPBR in local space; both directions above surface."""
    alpha = jnp.maximum(params.roughness**2, 1e-6)
    cos1 = jnp.maximum(k1l[..., 2], 1e-6)
    cos2 = jnp.maximum(k2l[..., 2], 0.0)
    f0, albedo_d, p_spec = _pbr_lobes(params, cos1)
    h = _norm(k1l + k2l)
    cos_h = jnp.clip(h[..., 2], 0.0, 1.0)
    k1h = jnp.maximum(_dot(k1l, h), 1e-6)
    d = _ggx_ndf(alpha, cos_h)
    g = _smith_g2(alpha, cos1, cos2)
    f = _schlick(f0, k1h)
    spec = f * (d * g / jnp.maximum(4.0 * cos1, 1e-9))[..., None]  # * cos2 folded: D*G*F/(4 c1 c2) * c2
    diff = albedo_d / M_PI * cos2[..., None]
    pdf_spec = _ggx_vndf_pdf(alpha, k1l, h)
    pdf_diff = cos2 / M_PI
    pdf = p_spec * pdf_spec + (1.0 - p_spec) * pdf_diff
    valid = (k2l[..., 2] > 0.0) & (k1l[..., 2] > 0.0)
    zero3 = jnp.zeros_like(diff)
    return (
        jnp.where(valid[..., None], diff, zero3),
        jnp.where(valid[..., None], spec, zero3),
        jnp.where(valid, pdf, 0.0),
    )


def bsdf_evaluate(params: SurfaceParams, frame: ShadingFrame, k1, k2) -> BsdfEval:
    """mdlcode_evaluate equivalent: returns f*cos split diffuse/glossy + pdf."""
    k1l = _to_local(frame, k1)
    k2l = _to_local(frame, k2)
    cos2 = jnp.maximum(k2l[..., 2], 0.0)
    # DIFFUSE
    d_diff = params.diffuse_color / M_PI * cos2[..., None]
    d_pdf = cos2 / M_PI
    # OMNI_PBR
    p_diff, p_spec_v, p_pdf = _pbr_eval_local(params, k1l, k2l)
    # OMNI_GLASS: pure specular -> zero
    t = params.bsdf_type
    is_d = (t == BsdfType.DIFFUSE)[..., None]
    is_p = (t == BsdfType.OMNI_PBR)[..., None]
    bsdf_diffuse = jnp.where(is_d, d_diff, jnp.where(is_p, p_diff, 0.0))
    bsdf_glossy = jnp.where(is_p, p_spec_v, 0.0)
    pdf = jnp.where(t == BsdfType.DIFFUSE, d_pdf, jnp.where(t == BsdfType.OMNI_PBR, p_pdf, 0.0))
    return BsdfEval(bsdf_diffuse, bsdf_glossy, pdf)


def bsdf_sample(
    params: SurfaceParams, frame: ShadingFrame, k1, xi, ior1, ior2
) -> BsdfSample:
    """mdlcode_sample equivalent.

    k1: [N,3] outgoing (towards camera/previous vertex). xi: [N,4] uniforms.
    ior1/ior2: [N] incident/transmitted IOR (MI_NEURAYLIB_BSDF_USE_MATERIAL_IOR
    already resolved by the caller to params.ior).
    """
    n = k1.shape[0]
    k1l = _to_local(frame, k1)
    cos1 = k1l[..., 2]
    u1, u2, u3, _u4 = xi[..., 0], xi[..., 1], xi[..., 2], xi[..., 3]

    # ---------------- diffuse lobe (shared by DIFFUSE and PBR-diffuse branch)
    k2l_diff = cosine_sample_hemisphere(u1, u2)
    pdf_diff = jnp.maximum(k2l_diff[..., 2], 0.0) / M_PI

    # ---------------- PBR specular lobe
    alpha = jnp.maximum(params.roughness**2, 1e-6)
    k1l_up = jnp.stack([k1l[..., 0], k1l[..., 1], jnp.maximum(cos1, 1e-4)], -1)
    h = sample_ggx_vndf(k1l_up, alpha, u1, u2)
    k2l_spec = _norm(2.0 * _dot(k1l_up, h)[..., None] * h - k1l_up)

    _f0, _albedo, p_spec = _pbr_lobes(params, jnp.maximum(cos1, 1e-6))
    take_spec = u3 < p_spec
    k2l_pbr = jnp.where(take_spec[..., None], k2l_spec, k2l_diff)
    pbr_diff, pbr_spec, pbr_pdf = _pbr_eval_local(params, k1l, k2l_pbr)
    f_total = pbr_diff + pbr_spec  # includes cos2
    pbr_over_pdf = f_total / jnp.maximum(pbr_pdf, 1e-12)[..., None]
    pbr_event = jnp.where(
        take_spec, BSDF_EVENT_GLOSSY_REFLECTION, BSDF_EVENT_DIFFUSE_REFLECTION
    ).astype(jnp.int32)
    pbr_valid = (pbr_pdf > 0.0) & (cos1 > 0.0)

    # near-zero roughness: treat as perfect mirror (MDL SPECULAR convention)
    mirror_k2l = jnp.stack([-k1l[..., 0], -k1l[..., 1], k1l[..., 2]], -1)
    f0_m, _alb, _p = _pbr_lobes(params, jnp.maximum(cos1, 1e-6))
    is_mirror = params.roughness < _SPECULAR_ROUGHNESS_EPS
    k2l_pbr = jnp.where(is_mirror[..., None], mirror_k2l, k2l_pbr)
    pbr_over_pdf = jnp.where(is_mirror[..., None], _schlick(f0_m, jnp.maximum(cos1, 1e-6)), pbr_over_pdf)
    pbr_pdf = jnp.where(is_mirror, 0.0, pbr_pdf)
    pbr_event = jnp.where(is_mirror, BSDF_EVENT_SPECULAR_REFLECTION, pbr_event)
    pbr_valid = pbr_valid | (is_mirror & (cos1 > 0.0))

    # ---------------- glass (smooth dielectric)
    eta_i = ior1
    eta_t = ior2
    cos_i = jnp.maximum(cos1, 1e-6)
    fr, cos_t, tir = fresnel_dielectric(cos_i, eta_i, eta_t)
    reflect = (u3 < fr) | tir
    k2l_refl = jnp.stack([-k1l[..., 0], -k1l[..., 1], k1l[..., 2]], -1)
    eta_rel = eta_i / eta_t
    # refract: k2 = -eta*k1 + (eta*cos_i - cos_t) * n  (local: n = +z)
    k2l_refr = jnp.stack(
        [
            -eta_rel * k1l[..., 0],
            -eta_rel * k1l[..., 1],
            -(cos_t),
        ],
        -1,
    )
    k2l_glass = jnp.where(reflect[..., None], k2l_refl, _norm(k2l_refr))
    glass_tint = jnp.where(reflect[..., None], jnp.ones_like(params.glass_color), params.glass_color)
    glass_event = jnp.where(
        reflect, BSDF_EVENT_SPECULAR_REFLECTION, BSDF_EVENT_SPECULAR_TRANSMISSION
    ).astype(jnp.int32)
    glass_valid = cos1 > 0.0

    # ---------------- DIFFUSE-only material
    diff_over_pdf = params.diffuse_color  # f*cos/pdf = albedo
    diff_event = jnp.full(n, BSDF_EVENT_DIFFUSE_REFLECTION, jnp.int32)
    diff_valid = (cos1 > 0.0) & (k2l_diff[..., 2] > 0.0)

    # ---------------- combine by material type
    t = params.bsdf_type
    is_d = t == BsdfType.DIFFUSE
    is_p = t == BsdfType.OMNI_PBR
    is_g = t == BsdfType.OMNI_GLASS

    k2l = jnp.where(is_d[..., None], k2l_diff, jnp.where(is_p[..., None], k2l_pbr, k2l_glass))
    pdf = jnp.where(is_d, pdf_diff, jnp.where(is_p, pbr_pdf, 0.0))
    over_pdf = jnp.where(
        is_d[..., None], diff_over_pdf, jnp.where(is_p[..., None], pbr_over_pdf, glass_tint)
    )
    event = jnp.where(is_d, diff_event, jnp.where(is_p, pbr_event, glass_event))
    valid = jnp.where(is_d, diff_valid, jnp.where(is_p, pbr_valid, glass_valid))

    event = jnp.where(valid, event, BSDF_EVENT_ABSORB).astype(jnp.int32)
    over_pdf = jnp.where(valid[..., None], over_pdf, 0.0)
    k2 = _to_world(frame, k2l)
    return BsdfSample(k2=_norm(k2), pdf=pdf, bsdf_over_pdf=over_pdf, event_type=event)
