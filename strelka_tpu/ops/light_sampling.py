"""Light sampling library — vectorized port of include/render/Lights.h.

Light types: 0 rect, 1 disc, 2 sphere, 3 distant. All functions take
per-ray gathered light parameters (points [N,4,3], color [N,3], normal
[N,3], type [N], half_angle [N]) and sample uvs [N,2]; they return a
LightSampleData SoA. Branches become masked selects — every ray computes
every light-type formula (4 cheap closed forms) and picks by type, which is
the divergence-free TPU analog of the reference's switch (Lights.h:245-362).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

M_PI = jnp.float32(3.14159265358979323846)


class LightSampleData(NamedTuple):
    """Lights.h:16-26."""

    point_on_light: jnp.ndarray  # [N,3]
    pdf: jnp.ndarray  # [N]
    normal: jnp.ndarray  # [N,3]
    area: jnp.ndarray  # [N]
    L: jnp.ndarray  # [N,3]
    dist_to_light: jnp.ndarray  # [N]


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _norm(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def mis_weight_balance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lights.h:28-31 (note: NOT guarded against a==0; callers guard)."""
    return 1.0 / (1.0 + b / a)


def calc_light_area(points: jnp.ndarray, ltype: jnp.ndarray) -> jnp.ndarray:
    """Lights.h:33-52."""
    e1 = points[:, 1] - points[:, 0]
    e2 = points[:, 3] - points[:, 0]
    rect_area = jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    r = points[:, 0, 0]
    disc_area = M_PI * r * r
    sphere_area = 4.0 * M_PI * r * r
    return jnp.where(ltype == 0, rect_area, jnp.where(ltype == 1, disc_area, jnp.where(ltype == 2, sphere_area, 0.0)))


def calc_light_normal(points: jnp.ndarray, normal: jnp.ndarray, ltype: jnp.ndarray, hit_point: jnp.ndarray) -> jnp.ndarray:
    """Lights.h:54-74."""
    e1 = points[:, 1] - points[:, 0]
    e2 = points[:, 3] - points[:, 0]
    rect_n = -_norm(jnp.cross(e1, e2))
    sphere_n = _norm(hit_point - points[:, 1])
    return jnp.where(
        (ltype == 0)[:, None], rect_n, jnp.where((ltype == 1)[:, None], normal, jnp.where((ltype == 2)[:, None], sphere_n, jnp.zeros_like(rect_n)))
    )


class SphQuad(NamedTuple):
    """Urena spherical rectangle precomputation (Lights.h:86-161)."""

    o: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    z0: jnp.ndarray
    z0sq: jnp.ndarray
    x0: jnp.ndarray
    y0: jnp.ndarray
    y0sq: jnp.ndarray
    x1: jnp.ndarray
    y1: jnp.ndarray
    y1sq: jnp.ndarray
    b0: jnp.ndarray
    b1: jnp.ndarray
    b0sq: jnp.ndarray
    k: jnp.ndarray
    S: jnp.ndarray


def sph_quad_init(points: jnp.ndarray, o: jnp.ndarray) -> SphQuad:
    """Lights.h:97-161. points [N,4,3], o [N,3]."""
    ex = points[:, 1] - points[:, 0]
    ey = points[:, 3] - points[:, 0]
    s = points[:, 0]
    exl = jnp.linalg.norm(ex, axis=-1)
    eyl = jnp.linalg.norm(ey, axis=-1)
    x = ex / jnp.maximum(exl, 1e-20)[:, None]
    y = ey / jnp.maximum(eyl, 1e-20)[:, None]
    z = jnp.cross(x, y)
    d = s - o
    z0 = _dot(d, z)
    flip = z0 > 0
    z = jnp.where(flip[:, None], -z, z)
    z0 = jnp.where(flip, -z0, z0)
    z0sq = z0 * z0
    x0 = _dot(d, x)
    y0 = _dot(d, y)
    x1 = x0 + exl
    y1 = y0 + eyl
    y0sq = y0 * y0
    y1sq = y1 * y1
    v00 = jnp.stack([x0, y0, z0], -1)
    v01 = jnp.stack([x0, y1, z0], -1)
    v10 = jnp.stack([x1, y0, z0], -1)
    v11 = jnp.stack([x1, y1, z0], -1)
    n0 = _norm(jnp.cross(v00, v10))
    n1 = _norm(jnp.cross(v10, v11))
    n2 = _norm(jnp.cross(v11, v01))
    n3 = _norm(jnp.cross(v01, v00))
    g0 = jnp.arccos(jnp.clip(-_dot(n0, n1), -1.0, 1.0))
    g1 = jnp.arccos(jnp.clip(-_dot(n1, n2), -1.0, 1.0))
    g2 = jnp.arccos(jnp.clip(-_dot(n2, n3), -1.0, 1.0))
    g3 = jnp.arccos(jnp.clip(-_dot(n3, n0), -1.0, 1.0))
    b0 = n0[:, 2]
    b1 = n2[:, 2]
    k = 2.0 * M_PI - g2 - g3
    S = g0 + g1 - k
    return SphQuad(o, x, y, z, z0, z0sq, x0, y0, y0sq, x1, y1, y1sq, b0, b1, b0 * b0, k, S)


def sph_quad_sample(q: SphQuad, uv: jnp.ndarray) -> jnp.ndarray:
    """Lights.h:163-189."""
    u = uv[:, 0]
    v = uv[:, 1]
    au = u * q.S + q.k
    fu = (jnp.cos(au) * q.b0 - q.b1) / jnp.where(jnp.abs(jnp.sin(au)) > 1e-20, jnp.sin(au), 1e-20)
    cu = 1.0 / jnp.sqrt(fu * fu + q.b0sq) * jnp.where(fu > 0.0, 1.0, -1.0)
    cu = jnp.clip(cu, -1.0, 1.0)
    xu = -(cu * q.z0) / jnp.sqrt(jnp.maximum(1.0 - cu * cu, 1e-20))
    xu = jnp.clip(xu, q.x0, q.x1)
    d = jnp.sqrt(xu * xu + q.z0sq)
    h0 = q.y0 / jnp.sqrt(d * d + q.y0sq)
    h1 = q.y1 / jnp.sqrt(d * d + q.y1sq)
    hv = h0 + v * (h1 - h0)
    hv2 = hv * hv
    yv = jnp.where(hv < 1.0 - 1e-5, (hv * d) / jnp.sqrt(jnp.maximum(1.0 - hv2, 1e-20)), q.y1)
    return q.o + xu[:, None] * q.x + yv[:, None] * q.y + q.z0[:, None] * q.z


def _fill_light_data(points, normal, ltype, hit_point, point_on_light):
    """Lights.h:76-84."""
    area = calc_light_area(points, ltype)
    n = calc_light_normal(points, normal, ltype, hit_point)
    to_light = point_on_light - hit_point
    dist = jnp.linalg.norm(to_light, axis=-1)
    L = to_light / jnp.maximum(dist, 1e-20)[:, None]
    return area, n, L, dist


def sample_rect_light_uniform(points, normal, ltype, uv, hit_point) -> LightSampleData:
    """Lights.h:277-289: uniform area sample + area->solid-angle pdf."""
    e1 = points[:, 1] - points[:, 0]
    e2 = points[:, 3] - points[:, 0]
    pol = points[:, 0] + e1 * uv[:, 0:1] + e2 * uv[:, 1:2]
    area, n, L, dist = _fill_light_data(points, normal, ltype, hit_point, pol)
    pdf = dist * dist / (-_dot(L, n) * area)
    return LightSampleData(pol, pdf, n, area, L, dist)


def sample_rect_light_sphquad(points, normal, ltype, uv, hit_point) -> LightSampleData:
    """Lights.h:245-275: Urena solid-angle sampling with small-S fallbacks."""
    q = sph_quad_init(points, hit_point)
    uni = sample_rect_light_uniform(points, normal, ltype, uv, hit_point)
    pol = sph_quad_sample(q, uv)
    area, n, L, dist = _fill_light_data(points, normal, ltype, hit_point, pol)
    sph = LightSampleData(pol, 1.0 / jnp.maximum(q.S, 1e-20), n, area, L, dist)
    # S <= 0 -> uniform point with pdf 0; S < 1e-3 -> uniform; else sphquad
    use_sph = q.S >= 1e-3

    def sel2(s, u):
        m = use_sph[:, None] if s.ndim == 2 else use_sph
        return jnp.where(m, s, u)

    res = LightSampleData(*[sel2(s, u) for s, u in zip(sph, uni)])
    pdf = jnp.where(q.S <= 0.0, 0.0, res.pdf)
    return res._replace(pdf=pdf)


def sample_sphere_light(points, uv, hit_point) -> LightSampleData:
    """Lights.h:335-362 (uniform direction on sphere; pdf = 1/4pi)."""
    cos_theta = 1.0 - 2.0 * uv[:, 0]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * M_PI * uv[:, 1]
    radius = points[:, 0, 0]
    sphere_dir = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], -1)
    light_point = points[:, 1] + radius[:, None] * sphere_dir
    to_light = light_point - hit_point
    dist = jnp.linalg.norm(to_light, axis=-1)
    L = to_light / jnp.maximum(dist, 1e-20)[:, None]
    pdf = jnp.full(uv.shape[0], 1.0 / (4.0 * M_PI))
    return LightSampleData(light_point, pdf, sphere_dir, jnp.zeros_like(pdf), L, dist)


def create_coordinate_system(n: jnp.ndarray):
    """Lights.h:291-300."""
    use_x = jnp.abs(n[:, 0]) > jnp.abs(n[:, 1])
    inv_len_x = 1.0 / jnp.sqrt(n[:, 0] ** 2 + n[:, 2] ** 2 + 1e-20)
    tx = jnp.stack([-n[:, 2] * inv_len_x, jnp.zeros_like(inv_len_x), n[:, 0] * inv_len_x], -1)
    inv_len_y = 1.0 / jnp.sqrt(n[:, 1] ** 2 + n[:, 2] ** 2 + 1e-20)
    ty = jnp.stack([jnp.zeros_like(inv_len_y), n[:, 2] * inv_len_y, -n[:, 1] * inv_len_y], -1)
    nt = jnp.where(use_x[:, None], tx, ty)
    nb = jnp.cross(n, nt)
    return nt, nb


def sample_cone(uv, angle, direction):
    """Lights.h:302-317."""
    phi = 2.0 * M_PI * uv[:, 0]
    cos_theta = 1.0 - uv[:, 1] * (1.0 - jnp.cos(angle))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    u, v = create_coordinate_system(direction)
    d = _norm(
        jnp.cos(phi)[:, None] * sin_theta[:, None] * u
        + jnp.sin(phi)[:, None] * sin_theta[:, None] * v
        + cos_theta[:, None] * direction
    )
    pdf = 1.0 / (2.0 * M_PI * (1.0 - jnp.cos(angle)))
    return d, pdf


def sample_distant_light(normal, half_angle, uv) -> LightSampleData:
    """Lights.h:319-333."""
    cone, pdf = sample_cone(uv, half_angle, -normal)
    n = uv.shape[0]
    return LightSampleData(
        point_on_light=cone,
        pdf=pdf,
        normal=normal,
        area=jnp.zeros(n),
        L=cone,
        dist_to_light=jnp.full(n, 1e9),
    )


def sample_light(points, color, normal, ltype, half_angle, uv, hit_point, rect_sampling_method: int):
    """Type dispatch (closest-hit sampleLight, cu:260-310) as masked selects.

    Returns LightSampleData. Disc lights (type 1) are not sampled by the
    reference either (case 1 commented out, cu:281-283) -> pdf 0.
    """
    if rect_sampling_method == 0:
        rect = sample_rect_light_uniform(points, normal, ltype, uv, hit_point)
    else:
        rect = sample_rect_light_sphquad(points, normal, ltype, uv, hit_point)
    sphere = sample_sphere_light(points, uv, hit_point)
    distant = sample_distant_light(normal, half_angle, uv)

    def sel(r, s, d):
        c = (ltype[..., None] if r.ndim == 2 else ltype)
        return jnp.where(c == 0, r, jnp.where(c == 2, s, jnp.where(c == 3, d, jnp.zeros_like(r))))

    out = LightSampleData(*[sel(r, s, d) for r, s, d in zip(rect, sphere, distant)])
    return out._replace(pdf=jnp.where(ltype == 1, 0.0, out.pdf))


def get_light_pdf(points, normal, ltype, half_angle, light_hit_point, surface_hit_point) -> jnp.ndarray:
    """Lights.h:221-243 — pdf used for MIS on BSDF-sampled emitter hits.

    NOTE reference quirk kept: rect lights use the UNIFORM area pdf here even
    when NEE sampled with the spherical-quad method (Lights.h:201-209).
    """
    area, n, L, dist = _fill_light_data(points, normal, ltype, surface_hit_point, light_hit_point)
    rect_pdf = dist * dist / (_dot(-L, n) * area)
    sphere_pdf = jnp.full(ltype.shape, 1.0 / (4.0 * M_PI))
    distant_pdf = 1.0 / (2.0 * M_PI * (1.0 - jnp.cos(half_angle)))
    return jnp.where(ltype == 0, rect_pdf, jnp.where(ltype == 2, sphere_pdf, jnp.where(ltype == 3, distant_pdf, 0.0)))
