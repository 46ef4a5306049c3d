"""Physics validation: BSDF sample/eval consistency, energy conservation,
light-sampling pdfs vs Monte-Carlo, accumulation semantics.

This is the test tier the reference lacks entirely (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strelka_tpu.materials import BsdfType
from strelka_tpu.ops import bsdf as B
from strelka_tpu.ops import light_sampling as LS
from strelka_tpu.ops import tonemap as TM


from strelka_tpu.ops import vec as V


def _v3(rows):
    return V.from_rows(jnp.asarray(np.asarray(rows, np.float32)))


def _frame(n):
    normal = _v3(np.tile([0.0, 0.0, 1.0], (n, 1)))
    tu = _v3(np.tile([1.0, 0.0, 0.0], (n, 1)))
    tv = _v3(np.tile([0.0, 1.0, 0.0], (n, 1)))
    return B.ShadingFrame(normal=normal, tangent_u=tu, tangent_v=tv, geom_normal=normal)


def _params(n, bsdf_type, **over):
    d = dict(
        bsdf_type=np.full(n, bsdf_type, np.int32),
        diffuse_color=np.tile([0.6, 0.5, 0.4], (n, 1)).astype(np.float32),
        metallic=np.full(n, 0.3, np.float32),
        roughness=np.full(n, 0.4, np.float32),
        specular_level=np.full(n, 0.5, np.float32),
        ior=np.full(n, 1.5, np.float32),
        glass_color=np.tile([0.9, 0.9, 0.9], (n, 1)).astype(np.float32),
        opacity=np.ones(n, np.float32),
        emission_color=np.zeros((n, 3), np.float32),
        thin_walled=np.zeros(n, np.float32),
    )
    d.update({k: np.asarray(v, np.float32) for k, v in over.items()})
    out = {}
    for k, v in d.items():
        arr = jnp.asarray(v)
        out[k] = V.from_rows(arr) if arr.ndim == 2 else arr
    out["thin_walled"] = out["thin_walled"] > 0.5
    return B.SurfaceParams(**out)


def _k1(n, rng):
    k = rng.normal(size=(n, 3)).astype(np.float32)
    k[:, 2] = np.abs(k[:, 2]) + 0.1
    return _v3(k / np.linalg.norm(k, axis=1, keepdims=True))


def test_diffuse_sample_eval_consistency():
    n = 4096
    rng = np.random.default_rng(0)
    frame = _frame(n)
    params = _params(n, BsdfType.DIFFUSE)
    k1 = _k1(n, rng)
    xi = tuple(jnp.asarray(rng.uniform(size=n).astype(np.float32)) for _ in range(4))
    smp = B.bsdf_sample(params, frame, k1, xi, jnp.ones(n), jnp.full(n, 1.5))
    ev = B.bsdf_evaluate(params, frame, k1, smp.k2)
    ok = np.asarray(smp.event_type) != B.BSDF_EVENT_ABSORB
    # eval pdf must equal sample pdf
    np.testing.assert_allclose(np.asarray(ev.pdf)[ok], np.asarray(smp.pdf)[ok], rtol=1e-4)
    # f*cos/pdf must equal bsdf_over_pdf (= albedo for cosine-sampled diffuse)
    ratio = np.asarray(V.to_rows(ev.bsdf_diffuse))[ok] / np.asarray(smp.pdf)[ok][:, None]
    np.testing.assert_allclose(ratio, np.asarray(V.to_rows(smp.bsdf_over_pdf))[ok], rtol=1e-3)


def test_pbr_sample_eval_consistency():
    n = 8192
    rng = np.random.default_rng(1)
    frame = _frame(n)
    params = _params(n, BsdfType.OMNI_PBR, roughness=np.full(8192, 0.5))
    k1 = _k1(n, rng)
    xi = tuple(jnp.asarray(rng.uniform(size=n).astype(np.float32)) for _ in range(4))
    smp = B.bsdf_sample(params, frame, k1, xi, jnp.ones(n), jnp.full(n, 1.5))
    ev = B.bsdf_evaluate(params, frame, k1, smp.k2)
    ok = (np.asarray(smp.event_type) != B.BSDF_EVENT_ABSORB) & (np.asarray(smp.pdf) > 1e-5)
    np.testing.assert_allclose(np.asarray(ev.pdf)[ok], np.asarray(smp.pdf)[ok], rtol=1e-3)
    f_total = np.asarray(V.to_rows(ev.bsdf_diffuse + ev.bsdf_glossy))[ok]
    ratio = f_total / np.asarray(smp.pdf)[ok][:, None]
    np.testing.assert_allclose(ratio, np.asarray(V.to_rows(smp.bsdf_over_pdf))[ok], rtol=2e-3, atol=1e-4)


def test_pbr_white_furnace_bounded():
    """Energy conservation: integral of f*cos over hemisphere <= 1 (white)."""
    n = 1 << 16
    rng = np.random.default_rng(2)
    frame = _frame(n)
    params = _params(
        n,
        BsdfType.OMNI_PBR,
        diffuse_color=np.ones((n, 3)),
        metallic=np.zeros(n),
        roughness=np.full(n, 0.6),
    )
    k1 = _v3(np.tile([0.0, 0.0, 1.0], (n, 1)))
    xi = tuple(jnp.asarray(rng.uniform(size=n).astype(np.float32)) for _ in range(4))
    smp = B.bsdf_sample(params, frame, k1, xi, jnp.ones(n), jnp.full(n, 1.5))
    ok = np.asarray(smp.event_type) != B.BSDF_EVENT_ABSORB
    # E[bsdf_over_pdf] = integral(f cos) -- must be <= 1 + MC noise
    reflectance = np.asarray(V.to_rows(smp.bsdf_over_pdf))[ok].mean(axis=0) * ok.mean()
    assert np.all(reflectance < 1.05), reflectance
    assert np.all(reflectance > 0.5), reflectance


def test_glass_energy_and_direction():
    n = 4096
    rng = np.random.default_rng(3)
    frame = _frame(n)
    params = _params(n, BsdfType.OMNI_GLASS)
    k1 = _k1(n, rng)
    xi = tuple(jnp.asarray(rng.uniform(size=n).astype(np.float32)) for _ in range(4))
    smp = B.bsdf_sample(params, frame, k1, xi, jnp.ones(n), jnp.full(n, 1.5))
    ev = np.asarray(smp.event_type)
    k2 = np.asarray(V.to_rows(smp.k2))
    refl = ev == B.BSDF_EVENT_SPECULAR_REFLECTION
    trans = ev == B.BSDF_EVENT_SPECULAR_TRANSMISSION
    assert refl.any() and trans.any()
    assert (k2[refl][:, 2] > 0).all()  # reflection stays above surface
    assert (k2[trans][:, 2] < 0).all()  # transmission goes below
    # pdf == 0 for specular (MDL convention)
    assert (np.asarray(smp.pdf)[refl | trans] == 0).all()
    # Snell's law on transmission: sin_t = sin_i / 1.5
    k1n = np.asarray(V.to_rows(k1))
    sin_i = np.sqrt(np.clip(1 - k1n[trans][:, 2] ** 2, 0, 1))
    sin_t = np.sqrt(np.clip(1 - k2[trans][:, 2] ** 2, 0, 1))
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-3)


def test_cosine_hemisphere_stats():
    n = 1 << 16
    rng = np.random.default_rng(4)
    u = rng.uniform(size=(2, n)).astype(np.float32)
    d = np.asarray(V.to_rows(B.cosine_sample_hemisphere(jnp.asarray(u[0]), jnp.asarray(u[1]))))
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # E[cos] for cosine-weighted = 2/3
    np.testing.assert_allclose(d[:, 2].mean(), 2.0 / 3.0, atol=5e-3)


def test_rect_light_solid_angle_mc():
    """SphQuad.S equals MC estimate of the rect's solid angle from pdf."""
    n = 1 << 16
    rng = np.random.default_rng(5)
    # rect: corners p0..p3 (reference order: +,+ / -,+ / -,- / +,-) at y=2
    # corner order chosen so normal = -normalize(cross(e1,e2)) = -y (faces origin)
    pts = np.array(
        [[[0.5, 2.0, 0.5], [0.5, 2.0, -0.5], [-0.5, 2.0, -0.5], [-0.5, 2.0, 0.5]]], np.float32
    )
    points = np.tile(pts, (n, 1, 1))
    lp = LS.LightParams(
        p0=_v3(points[:, 0]), p1=_v3(points[:, 1]), p2=_v3(points[:, 2]), p3=_v3(points[:, 3]),
        color=_v3(np.ones((n, 3))), normal=_v3(np.zeros((n, 3))),
        type=jnp.zeros(n, jnp.int32), half_angle=jnp.zeros(n), radius=jnp.zeros(n),
    )
    hit = _v3(np.zeros((n, 3)))
    u = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    v = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    # solid angle via uniform-area sampling: E[1/pdf] = Omega
    uni = LS.sample_rect_light_uniform(lp, u, v, hit)
    omega_mc = float((1.0 / np.asarray(uni.pdf)).mean())
    q = LS.sph_quad_init(lp, hit)
    omega_exact = float(np.asarray(q.S)[0])
    assert omega_exact == pytest.approx(omega_mc, rel=2e-2)
    # sphquad sampling pdf is exactly 1/S
    sph = LS.sample_rect_light_sphquad(lp, u, v, hit)
    np.testing.assert_allclose(np.asarray(sph.pdf), 1.0 / omega_exact, rtol=1e-4)
    # and its samples lie on the rect plane
    pol = np.asarray(V.to_rows(sph.point_on_light))
    np.testing.assert_allclose(pol[:, 1], 2.0, atol=1e-4)
    assert (np.abs(pol[:, [0, 2]]) <= 0.5 + 1e-4).all()


def test_sphere_distant_light_pdfs():
    n = 1024
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    v = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    # sphere light radius 0.5 at (0,3,0)
    pts = np.zeros((n, 4, 3), np.float32)
    pts[:, 0, 0] = 0.5
    pts[:, 1] = [0, 3, 0]
    lp = LS.LightParams(
        p0=_v3(pts[:, 0]), p1=_v3(pts[:, 1]), p2=_v3(pts[:, 2]), p3=_v3(pts[:, 3]),
        color=_v3(np.ones((n, 3))), normal=_v3(np.tile([0.0, -1.0, 0.0], (n, 1))),
        type=jnp.full(n, 2, jnp.int32), half_angle=jnp.full(n, 0.2), radius=jnp.full(n, 0.5),
    )
    hit = _v3(np.zeros((n, 3)))
    sph = LS.sample_sphere_light(lp, u, v, hit)
    # visible-cap cone sampling (deviation from the reference's 1/4pi —
    # see sample_sphere_light): pdf = 1/(2pi(1-cos_a)), cos_a from r/d
    cos_a = np.sqrt(1.0 - (0.5 / 3.0) ** 2)
    np.testing.assert_allclose(np.asarray(sph.pdf), 1.0 / (2 * np.pi * (1 - cos_a)), rtol=1e-4)
    p = np.asarray(V.to_rows(sph.point_on_light))
    np.testing.assert_allclose(np.linalg.norm(p - [0, 3, 0], axis=1), 0.5, atol=1e-4)
    # sampled directions lie inside the subtended cone, and the MIS-side
    # pdf agrees with the sampling pdf (consistency the balance heuristic needs)
    dirs = np.asarray(V.to_rows(sph.L))
    assert (dirs @ np.array([0, 1.0, 0]) >= cos_a - 1e-4).all()
    mis_pdf = np.asarray(LS.get_light_pdf(lp, sph.point_on_light, hit))
    np.testing.assert_allclose(mis_pdf, np.asarray(sph.pdf), rtol=1e-4)
    # distant light: directions within half-angle cone around -normal
    d = LS.sample_distant_light(lp, u, v)
    cosang = np.asarray(V.to_rows(d.L)) @ np.array([0, 1.0, 0])
    assert (cosang >= np.cos(0.2) - 1e-5).all()
    np.testing.assert_allclose(np.asarray(d.pdf), 1.0 / (2 * np.pi * (1 - np.cos(0.2))), rtol=1e-4)


def test_accumulate_matches_reference_recurrence():
    """accumulate() == the reference's per-sample LDR-lerp recursion
    (OptixRender.cu:60-78): history_n = invTm(lerp(tm(h_{n-1}), tm(x_n), 1/(n+1)))."""
    rng = np.random.default_rng(7)
    exposure = jnp.asarray([0.5, 0.5, 0.5])
    samples = rng.uniform(0.0, 4.0, (10, 4, 4, 3)).astype(np.float32)
    hist = jnp.zeros((4, 4, 3))
    for i, s in enumerate(samples):
        hist = TM.accumulate(hist, jnp.asarray(s), exposure, jnp.int32(i))
    # manual recurrence
    def tm(c):
        c = c * 0.5
        return c / (c + 1)
    def itm(c):
        return c / (0.5 - c * 0.5)
    h = samples[0].astype(np.float64)
    for i in range(1, 10):
        a = 1.0 / (i + 1)
        h = itm(tm(h) + (tm(samples[i]) - tm(h)) * a)
    np.testing.assert_allclose(np.asarray(hist), h, rtol=1e-4)


def test_tonemappers_match_reference_formulas():
    x = jnp.asarray(np.linspace(0, 4, 64, dtype=np.float32).reshape(-1, 1) * np.array([[1, 0.5, 0.25]], np.float32))
    r = np.asarray(TM.reinhard(x))
    lum = np.asarray(x) @ np.array([0.299, 0.587, 0.114])
    np.testing.assert_allclose(r, np.asarray(x) / (lum[:, None] + 1), rtol=1e-5)
    f = np.asarray(TM.aces_film(x))
    xx = np.asarray(x)
    np.testing.assert_allclose(
        f, np.clip((xx * (2.51 * xx + 0.03)) / (xx * (2.43 * xx + 0.59) + 0.14), 0, 1), rtol=1e-5
    )
    a = np.asarray(TM.aces_fitted(x))
    assert a.min() >= 0.0 and a.max() <= 1.0
    g = np.asarray(TM.gamma_correction(x, 2.4))
    np.testing.assert_allclose(g, np.power(np.asarray(x), 1 / 2.4), rtol=1e-5)


def test_offset_ray_bit_exact():
    """offset_ray int-bit trick vs scalar transliteration."""
    from strelka_tpu.ops.intersect import offset_ray

    rng = np.random.default_rng(8)
    p = rng.uniform(-100, 100, (64, 3)).astype(np.float32)
    p[:8] = rng.uniform(-0.01, 0.01, (8, 3)).astype(np.float32)  # near-origin branch
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    got = np.asarray(offset_ray(jnp.asarray(p), jnp.asarray(n)))

    def scalar(p, n):
        out = np.empty(3, np.float32)
        of_i = (256.0 * n).astype(np.int32)
        for c in range(3):
            pi = np.float32(p[c])
            bits = pi.view(np.int32) if hasattr(pi, "view") else np.int32(0)
            bits = np.array([p[c]], np.float32).view(np.int32)[0]
            adj = bits + (-of_i[c] if p[c] < 0 else of_i[c])
            p_i = np.array([adj], np.int32).view(np.float32)[0]
            out[c] = p[c] + (1.0 / 65536.0) * n[c] if abs(p[c]) < 1.0 / 32.0 else p_i
        return out

    want = np.stack([scalar(p[i], n[i]) for i in range(64)])
    np.testing.assert_array_equal(got, want)


def test_hair_sample_eval_consistency():
    """HAIR (Kajiya-Kay fiber lobes): eval pdf == sample pdf, f/pdf == over_pdf."""
    n = 4096
    rng = np.random.default_rng(7)
    frame = _frame(n)
    params = _params(n, BsdfType.HAIR, roughness=np.full(n, 0.35))
    k1 = _k1(n, rng)
    xi = tuple(jnp.asarray(rng.uniform(size=n).astype(np.float32)) for _ in range(4))
    smp = B.bsdf_sample(params, frame, k1, xi, jnp.ones(n), jnp.full(n, 1.5))
    ev = B.bsdf_evaluate(params, frame, k1, smp.k2)
    ok = (np.asarray(smp.event_type) != B.BSDF_EVENT_ABSORB) & (np.asarray(smp.pdf) > 1e-5)
    assert ok.mean() > 0.8
    np.testing.assert_allclose(np.asarray(ev.pdf)[ok], np.asarray(smp.pdf)[ok], rtol=1e-3)
    f_total = np.asarray(V.to_rows(ev.bsdf_diffuse + ev.bsdf_glossy))[ok]
    ratio = f_total / np.asarray(smp.pdf)[ok][:, None]
    np.testing.assert_allclose(ratio, np.asarray(V.to_rows(smp.bsdf_over_pdf))[ok], rtol=2e-3, atol=1e-4)
    # strand specular peaks where sin(T,H) is max: k2 perpendicular to tangent
    assert float(np.asarray(ev.bsdf_glossy.x)[ok].max()) > 0.0


def test_hair_energy_bounded():
    """Hemisphere integral of f*cos stays <= ~1 (no energy explosion)."""
    n = 1 << 16
    rng = np.random.default_rng(8)
    frame = _frame(n)
    params = _params(
        n, BsdfType.HAIR,
        diffuse_color=np.tile([1.0, 1.0, 1.0], (n, 1)),
        roughness=np.full(n, 0.4),
        specular_level=np.full(n, 0.5),
    )
    # fixed view, uniform-hemisphere MC over k2
    k1 = _v3(np.tile([0.4, 0.2, np.sqrt(1 - 0.2)], (n, 1)) / np.linalg.norm([0.4, 0.2, np.sqrt(1 - 0.2)]))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ev = B.bsdf_evaluate(params, frame, k1, _v3(d))
    f = np.asarray(V.to_rows(ev.bsdf_diffuse + ev.bsdf_glossy))
    integral = f.mean(axis=0) * 2 * np.pi  # uniform hemisphere pdf = 1/(2pi)
    assert (integral < 1.6).all(), f"hair lobes leak energy: {integral}"


def test_hair_chiang_white_furnace():
    """Chiang R/TT/TRT+residual: full-sphere integral of f == 1 at zero
    absorption (the A_p sum telescopes to 1 by construction), and < 1 with
    absorption. Importance weights stay bounded (f/pdf <= ~1)."""
    from strelka_tpu.ops import hair as H

    n = 1 << 18
    rng = np.random.default_rng(11)
    frame = _frame(n)
    k1 = _v3(np.tile([0.3, 0.2, 0.93], (n, 1)) / np.linalg.norm([0.3, 0.2, 0.93]))
    # uniform-sphere MC directions
    z = 1.0 - 2.0 * rng.random(n)
    phi = 2 * np.pi * rng.random(n)
    r = np.sqrt(np.maximum(1 - z * z, 0))
    wi = _v3(np.stack([r * np.cos(phi), r * np.sin(phi), z], 1).astype(np.float32))
    for color, lo, hi in (
        ([1.0, 1.0, 1.0], 0.93, 1.05),  # white furnace: == 1 (MC tolerance)
        ([0.6, 0.3, 0.1], 0.25, 0.99),  # absorbing: strictly below 1
    ):
        params = _params(
            n, BsdfType.HAIR,
            diffuse_color=np.tile(color, (n, 1)),
            roughness=np.full(n, 0.45),
        )
        f_r, f_rest, pdf = H.hair_eval(params, frame, k1, wi)
        f = np.asarray(V.to_rows(f_r + f_rest))
        integral = f.mean(axis=0) * 4 * np.pi
        assert (integral > lo).all() and (integral < hi).all(), integral
        if color[0] != color[2]:
            # absorption ordering follows the color channels
            assert integral[0] > integral[1] > integral[2], integral
        pdf_int = float(np.asarray(pdf).mean() * 4 * np.pi)
        assert abs(pdf_int - 1.0) < 0.07, pdf_int
    # importance weights bounded: sample and check f/pdf
    params = _params(n, BsdfType.HAIR, diffuse_color=np.tile([1.0, 1.0, 1.0], (n, 1)),
                     roughness=np.full(n, 0.45))
    xi = tuple(jnp.asarray(rng.random(n).astype(np.float32)) for _ in range(4))
    _k2, pdf, over, valid = H.hair_sample(params, frame, k1, xi)
    w = np.asarray(V.to_rows(over))[np.asarray(valid)]
    assert w.max() < 1.1, w.max()
    assert abs(w.mean() - 1.0) < 0.05  # white hair: unbiased unit albedo


def test_hair_chiang_double_highlight():
    """Cuticle tilt separates the R and TRT longitudinal peaks: the
    white (R) and colored (TRT) lobes peak at different theta_i."""
    from strelka_tpu.ops import hair as H

    n = 721
    frame = _frame(n)
    # wo at theta_o = 20 deg from the azimuthal plane, phi_o = 0
    to = np.radians(20.0)
    k1 = _v3(np.tile([np.sin(to), 0.0, np.cos(to)], (n, 1)).astype(np.float32))
    # wi sweeps theta in the phi_i = 0 half-plane (the reflection side:
    # R and TRT both deflect by Phi ~ 0 mod 2pi at h ~ 0)
    th = np.radians(np.linspace(-90, 90, n)).astype(np.float32)
    wi = _v3(np.stack([np.sin(th), np.zeros(n, np.float32), np.cos(th)], 1))
    params = _params(
        n, BsdfType.HAIR,
        diffuse_color=np.tile([0.8, 0.4, 0.1], (n, 1)),
        roughness=np.full(n, 0.25),
    )
    f_r, f_rest, _ = H.hair_eval(params, frame, k1, wi)
    i_r = int(np.asarray(f_r.x).argmax())
    i_trt = int(np.asarray(f_rest.x).argmax())
    # both peaks near the specular cone (theta_i ~ -theta_o) but shifted in
    # OPPOSITE directions by the tilt (R by -2a, TRT by +4a)
    assert abs(th[i_r] + to) < np.radians(12.0)
    assert abs(th[i_trt] + to) < np.radians(16.0)
    assert th[i_trt] != th[i_r], "tilt must separate the two highlights"
    assert abs(np.degrees(th[i_trt] - th[i_r])) > 2.0


def test_sphere_light_pdf_distant_stability():
    """1-cos_a must be computed stably (sin^2/(1+cos)): at d/r = 1e4 the
    naive f32 difference underflows to 0 and the clamped pdf is ~5x wrong,
    collapsing distant small sphere lights to black."""
    n = 8
    r, d = 0.25, 2500.0
    pts = np.zeros((n, 4, 3), np.float32)
    pts[:, 0, 0] = r
    pts[:, 1] = [0, d, 0]
    lp = LS.LightParams(
        p0=_v3(pts[:, 0]), p1=_v3(pts[:, 1]), p2=_v3(pts[:, 2]), p3=_v3(pts[:, 3]),
        color=_v3(np.ones((n, 3))), normal=_v3(np.tile([0.0, -1.0, 0.0], (n, 1))),
        type=jnp.full(n, 2, jnp.int32), half_angle=jnp.full(n, 0.1),
        radius=jnp.full(n, r, jnp.float32),
    )
    hit = _v3(np.zeros((n, 3)))
    u = jnp.linspace(0.05, 0.95, n)
    s = LS.sample_sphere_light(lp, u, u, hit)
    # exact f64 cone pdf
    sin_a = r / d
    one_minus = np.float64(sin_a) ** 2 / (1.0 + np.sqrt(1.0 - np.float64(sin_a) ** 2))
    expect = 1.0 / (2.0 * np.pi * one_minus)
    np.testing.assert_allclose(np.asarray(s.pdf), expect, rtol=1e-3)
    mis = np.asarray(LS.get_light_pdf(lp, s.point_on_light, hit))
    np.testing.assert_allclose(mis, np.asarray(s.pdf), rtol=1e-3)
    # sampled directions stay inside the (tiny) cone
    dirs = np.asarray(V.to_rows(s.L))
    assert (dirs @ np.array([0, 1.0, 0]) >= 1.0 - 3e-8).all()
