"""Ray / cubic-B-spline curve (hair) intersection — TPU-native design.

The reference uses OptiX's built-in ROUND_CUBIC_BSPLINE phantom intersector
(OptixRender.cpp:554-560) with cuda/curve.h interpolators for shading
normals/tangents (OptixRender_radiance_closest_hit.cu:423-454). Phantom
intersection is an iterative root-finder — a divergent while-loop per ray,
the worst shape for this TPU backend. Instead each B-spline segment is
FLATTENED at build time into K round-cone (sphere-swept line) subsegments
with exact closed-form intersection — dense elementwise math over
(ray x subsegment) blocks, zero iteration, matching hair-rendering practice
on SIMD hardware. K=8 keeps curvature error well under typical hair widths.

Shading attributes are evaluated on the true spline: the hit's spline
parameter u is recovered from the subsegment index + local cone axial
position, then position/tangent come from the exact cubic basis
(CubicInterpolator::initializeFromBSpline semantics) and the normal is the
offset from the spine (surfaceNormal semantics).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e16
# round-cone subsegments per cubic segment (broad phase). The exact Newton
# refinement (ops/curve_refine.py) recovers the true swept envelope from any
# seed cone, so coarser flattening trades broad-phase sweep cost for seed
# quality only — the A/B knob for the hair-throughput experiments.
from strelka_tpu import tuned as _tuned

CURVE_SUBDIV = _tuned.get_int("curve_subdiv", 8)


def bspline_basis(u):
    """Uniform cubic B-spline basis weights for p0..p3 at parameter u."""
    u2 = u * u
    u3 = u2 * u
    b0 = (1.0 - 3.0 * u + 3.0 * u2 - u3) / 6.0
    b1 = (4.0 - 6.0 * u2 + 3.0 * u3) / 6.0
    b2 = (1.0 + 3.0 * u + 3.0 * u2 - 3.0 * u3) / 6.0
    b3 = u3 / 6.0
    return b0, b1, b2, b3


def bspline_basis_deriv(u):
    u2 = u * u
    d0 = (-3.0 + 6.0 * u - 3.0 * u2) / 6.0
    d1 = (-12.0 * u + 9.0 * u2) / 6.0
    d2 = (3.0 + 6.0 * u - 9.0 * u2) / 6.0
    d3 = 3.0 * u2 / 6.0
    return d0, d1, d2, d3


def eval_bspline(p0, p1, p2, p3, u):
    """Position on the spline; p*: [...,3], u: [...]. -> [...,3]."""
    b0, b1, b2, b3 = bspline_basis(u)
    return (
        b0[..., None] * p0 + b1[..., None] * p1 + b2[..., None] * p2 + b3[..., None] * p3
    )


def eval_bspline_scalar(w0, w1, w2, w3, u):
    b0, b1, b2, b3 = bspline_basis(u)
    return b0 * w0 + b1 * w1 + b2 * w2 + b3 * w3


def eval_bspline_tangent(p0, p1, p2, p3, u):
    d0, d1, d2, d3 = bspline_basis_deriv(u)
    return (
        d0[..., None] * p0 + d1[..., None] * p1 + d2[..., None] * p2 + d3[..., None] * p3
    )


class FlatCones(NamedTuple):
    """Flattened curve subsegments (round cones). Leading dim S*K."""

    a: jnp.ndarray  # [M,3] start point
    b: jnp.ndarray  # [M,3] end point
    ra: jnp.ndarray  # [M] start radius
    rb: jnp.ndarray  # [M] end radius
    seg_id: jnp.ndarray  # [M] i32 parent cubic segment
    u0: jnp.ndarray  # [M] spline parameter at a
    u1: jnp.ndarray  # [M] spline parameter at b


def flatten_curves(curves) -> FlatCones:
    """DeviceCurves -> round-cone list (host/build time, runs under jit too).

    When the exact Newton refinement is enabled (curve_refine, default on),
    cone radii are INFLATED by the mid-subsegment chord deviation so the
    swept-cone broad phase COVERS the exact envelope — a chord always
    undercuts the arc, and at CURVE_SUBDIV <= 4 the sagitta is wide enough
    to miss silhouette hits the refinement could otherwise recover
    (hardware fact: subdiv 8->4 shifted hair_patch image mean 8.66->8.90).
    Ghost candidates the inflation admits are rejected by the seed-residual
    check in curve_refine.refine_scene_curve_hit."""
    us = jnp.linspace(0.0, 1.0, CURVE_SUBDIV + 1)
    p0, p1, p2, p3 = curves.p0, curves.p1, curves.p2, curves.p3
    w0, w1, w2, w3 = curves.w0, curves.w1, curves.w2, curves.w3
    s = p0.shape[0]
    # [K+1, S, 3] spline points
    pts = jax.vmap(lambda u: eval_bspline(p0, p1, p2, p3, jnp.full(s, u)))(us)
    rads = jax.vmap(lambda u: eval_bspline_scalar(w0, w1, w2, w3, jnp.full(s, u)))(us)
    a = pts[:-1].reshape(-1, 3)
    b = pts[1:].reshape(-1, 3)
    ra = rads[:-1].reshape(-1)
    rb = rads[1:].reshape(-1)
    if _tuned.get_bool("curve_refine", True):
        ums = 0.5 * (us[:-1] + us[1:])
        mid_pts = jax.vmap(lambda u: eval_bspline(p0, p1, p2, p3, jnp.full(s, u)))(ums)
        mid_rads = jax.vmap(lambda u: eval_bspline_scalar(w0, w1, w2, w3, jnp.full(s, u)))(ums)
        chord_mid = 0.5 * (pts[:-1] + pts[1:])
        dev_c = jnp.linalg.norm(mid_pts - chord_mid, axis=-1)
        dev_r = jnp.maximum(mid_rads - 0.5 * (rads[:-1] + rads[1:]), 0.0)
        # 4/3 safety: the cubic's max chord deviation is near but not
        # exactly at the midpoint
        pad = (4.0 / 3.0) * (dev_c + dev_r).reshape(-1)
        ra = ra + pad
        rb = rb + pad
    seg = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (CURVE_SUBDIV, s)).reshape(-1)
    u0 = jnp.broadcast_to(us[:-1, None], (CURVE_SUBDIV, s)).reshape(-1)
    u1 = jnp.broadcast_to(us[1:, None], (CURVE_SUBDIV, s)).reshape(-1)
    return FlatCones(a=a, b=b, ra=ra, rb=rb, seg_id=seg, u0=u0, u1=u1)


def flatten_curves_np(curves_np: dict) -> FlatCones:
    """Pure-numpy flatten (host/build time). Under the axon TPU tunnel every
    eager jnp op is a remote round trip, so the jit path (flatten_curves)
    took ~minutes at einar scale during scene build — numpy is <1 s."""
    us = np.linspace(0.0, 1.0, CURVE_SUBDIV + 1, dtype=np.float32)
    p = [np.asarray(curves_np[f"p{j}"], np.float32) for j in range(4)]
    w = [np.asarray(curves_np[f"w{j}"], np.float32) for j in range(4)]
    s = p[0].shape[0]
    b = bspline_basis(us)  # 4 x [K+1]
    pts = sum(b[j][:, None, None] * p[j][None] for j in range(4))  # [K+1, S, 3]
    rads = sum(b[j][:, None] * w[j][None] for j in range(4))  # [K+1, S]
    ra = rads[:-1].reshape(-1)
    rb = rads[1:].reshape(-1)
    if _tuned.get_bool("curve_refine", True):
        # envelope-covering radius inflation — see flatten_curves
        ums = (0.5 * (us[:-1] + us[1:])).astype(np.float32)
        bm = bspline_basis(ums)
        mid_pts = sum(bm[j][:, None, None] * p[j][None] for j in range(4))
        mid_rads = sum(bm[j][:, None] * w[j][None] for j in range(4))
        chord_mid = 0.5 * (pts[:-1] + pts[1:])
        dev_c = np.linalg.norm(mid_pts - chord_mid, axis=-1)
        dev_r = np.maximum(mid_rads - 0.5 * (rads[:-1] + rads[1:]), 0.0)
        pad = ((4.0 / 3.0) * (dev_c + dev_r)).reshape(-1).astype(np.float32)
        ra = ra + pad
        rb = rb + pad
    seg = np.broadcast_to(np.arange(s, dtype=np.int32)[None, :], (CURVE_SUBDIV, s))
    u0 = np.broadcast_to(us[:-1, None], (CURVE_SUBDIV, s))
    u1 = np.broadcast_to(us[1:, None], (CURVE_SUBDIV, s))
    return FlatCones(
        a=pts[:-1].reshape(-1, 3),
        b=pts[1:].reshape(-1, 3),
        ra=ra,
        rb=rb,
        seg_id=seg.reshape(-1),
        u0=u0.reshape(-1).astype(np.float32),
        u1=u1.reshape(-1).astype(np.float32),
    )


def _ray_round_cone(o, d, a, b, ra, rb, tmin, tmax):
    """Closed-form ray vs sphere-swept line segment (round cone).

    o,d: Vec3 of [N]; a,b: [M,3]; ra,rb: [M]. Returns (t [N,M], axial y in
    [0,1], hit mask). All intermediates are [N,M] per component (no
    [N,M,3] minor-dim-3 arrays). Quadratic from the standard swept-sphere
    derivation (cf. Quilez's roundcone).
    """
    from strelka_tpu.ops.vec import Vec3

    # component broadcasts: ray [N,1] x segment [1,M]
    ox, oy, oz = o.x[:, None], o.y[:, None], o.z[:, None]
    dx, dy, dz = d.x[:, None], d.y[:, None], d.z[:, None]
    ax, ay, az = a[:, 0][None, :], a[:, 1][None, :], a[:, 2][None, :]
    bax = (b[:, 0] - a[:, 0])[None, :]
    bay = (b[:, 1] - a[:, 1])[None, :]
    baz = (b[:, 2] - a[:, 2])[None, :]
    oax, oay, oaz = ox - ax, oy - ay, oz - az
    rr = (ra - rb)[None, :]
    m0 = bax * bax + bay * bay + baz * baz
    m1 = oax * bax + oay * bay + oaz * baz
    m2 = dx * bax + dy * bay + dz * baz
    m3 = dx * oax + dy * oay + dz * oaz
    m5 = oax * oax + oay * oay + oaz * oaz
    ra_b = ra[None, :]
    d2 = m0 - rr * rr
    k2 = d2 - m2 * m2
    k1 = d2 * m3 - m1 * m2 + m2 * rr * ra_b
    k0 = d2 * m5 - m1 * m1 + 2.0 * m1 * rr * ra_b - d2 * ra_b * ra_b
    h = k1 * k1 - k0 * k2
    safe_k2 = jnp.where(jnp.abs(k2) > 1e-12, k2, 1e-12)
    t_body = (-jnp.sqrt(jnp.maximum(h, 0.0)) - k1) / safe_k2
    y = m1 + t_body * m2  # axial position * m0
    body_ok = (h > 0.0) & (y > 0.0) & (y < d2)

    # cap spheres at a (radius ra) and b (radius rb)
    def sphere(cx, cy, cz, r):
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        bq = ocx * dx + ocy * dy + ocz * dz
        cq = ocx * ocx + ocy * ocy + ocz * ocz - (r * r)[None, :]
        hq = bq * bq - cq
        tq = -bq - jnp.sqrt(jnp.maximum(hq, 0.0))
        return tq, hq > 0.0

    t_ca, ok_ca = sphere(ax, ay, az, ra)
    t_cb, ok_cb = sphere(b[:, 0][None, :], b[:, 1][None, :], b[:, 2][None, :], rb)

    t_body_m = jnp.where(body_ok, t_body, _BIG)
    t_ca_m = jnp.where(ok_ca, t_ca, _BIG)
    t_cb_m = jnp.where(ok_cb, t_cb, _BIG)
    t = jnp.minimum(t_body_m, jnp.minimum(t_ca_m, t_cb_m))
    in_range = (t > tmin[:, None]) & (t < tmax[:, None])
    hit = (t < _BIG) & in_range
    y_norm = jnp.clip(y / jnp.maximum(d2, 1e-12), 0.0, 1.0)
    y_norm = jnp.where(t == t_ca_m, 0.0, jnp.where(t == t_cb_m, 1.0, y_norm))
    return jnp.where(hit, t, _BIG), y_norm, hit


class CurveHit(NamedTuple):
    t: jnp.ndarray  # [N]
    seg: jnp.ndarray  # [N] i32, -1 miss
    u: jnp.ndarray  # [N] spline parameter


def intersect_curves_closest(
    cones: FlatCones,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    active: Optional[jnp.ndarray] = None,
    block: int = 256,
) -> CurveHit:
    """Closest hit over all cone subsegments (blocked dense sweep).

    origins/directions: Vec3 of [N] (or [N,3], converted)."""
    from strelka_tpu.ops import vec as V
    from strelka_tpu.ops.vec import Vec3

    if not isinstance(origins, Vec3):
        origins = V.from_rows(origins)
    if not isinstance(directions, Vec3):
        directions = V.from_rows(directions)
    n = tmin.shape[0]
    m = cones.a.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    block = min(block, m)
    num_blocks = (m + block - 1) // block
    pad = num_blocks * block - m
    cn = cones
    if pad:
        zero3 = jnp.zeros((pad, 3), jnp.float32)
        cn = FlatCones(
            a=jnp.concatenate([cn.a, zero3]),
            b=jnp.concatenate([cn.b, zero3 + 1.0]),
            ra=jnp.concatenate([cn.ra, jnp.full(pad, -1.0)]),  # negative radius = never hit
            rb=jnp.concatenate([cn.rb, jnp.full(pad, -1.0)]),
            seg_id=jnp.concatenate([cn.seg_id, jnp.full(pad, -1, jnp.int32)]),
            u0=jnp.concatenate([cn.u0, jnp.zeros(pad)]),
            u1=jnp.concatenate([cn.u1, jnp.zeros(pad)]),
        )

    def body(carry, bi):
        best_t, best_seg, best_u = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, bi * block, block, axis=0)
        t, y, hit = _ray_round_cone(
            origins, directions, sl(cn.a), sl(cn.b), sl(cn.ra), sl(cn.rb), tmin, tmax
        )
        t = jnp.where(hit & active[:, None] & (sl(cn.ra) >= 0.0)[None, :], t, _BIG)
        arg = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        t_blk = t[rows, arg]
        better = t_blk < best_t
        u_hit = sl(cn.u0)[arg] + (sl(cn.u1)[arg] - sl(cn.u0)[arg]) * y[rows, arg]
        best_seg = jnp.where(better, sl(cn.seg_id)[arg], best_seg)
        best_u = jnp.where(better, u_hit, best_u)
        best_t = jnp.where(better, t_blk, best_t)
        return (best_t, best_seg, best_u), None

    init = (jnp.full(n, _BIG), jnp.full(n, -1, jnp.int32), jnp.zeros(n))
    (t, seg, u), _ = jax.lax.scan(body, init, jnp.arange(num_blocks))
    return CurveHit(t=t, seg=seg, u=u)


def intersect_curves_any(
    cones: FlatCones,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    active: Optional[jnp.ndarray] = None,
    block: int = 256,
) -> jnp.ndarray:
    """Occlusion sweep -> [N] bool."""
    hit = intersect_curves_closest(cones, origins, directions, tmin, tmax, active, block)
    return hit.seg >= 0


def curve_shading_frame(curves, seg, u, hit_position):
    """Normal/tangent at a curve hit (fillCurveGeomData semantics, cu:423-454).

    normal = offset from spine point (sphere-like), tangent = spline tangent.
    """
    s = jnp.maximum(seg, 0)
    p0, p1, p2, p3 = curves.p0[s], curves.p1[s], curves.p2[s], curves.p3[s]
    spine = eval_bspline(p0, p1, p2, p3, u)
    tangent = eval_bspline_tangent(p0, p1, p2, p3, u)
    tangent = tangent / jnp.maximum(jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-12)
    n = hit_position - spine
    # remove axial component so the normal is perpendicular to the hair fiber
    n = n - jnp.sum(n * tangent, axis=-1, keepdims=True) * tangent
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(norm > 1e-9, n / jnp.maximum(norm, 1e-9), jnp.array([0.0, 0.0, 1.0]))
    binormal = jnp.cross(n, tangent)
    return n, tangent, binormal


def curve_shading_frame_vec(curves, seg, u, hit_position):
    """Vec3 variant of curve_shading_frame (component-major hot path)."""
    from strelka_tpu.ops import vec as V
    from strelka_tpu.ops.vec import Vec3

    s = jnp.maximum(seg, 0)
    b0, b1, b2, b3 = bspline_basis(u)
    d0, d1, d2, d3 = bspline_basis_deriv(u)
    g = lambda t: V.gather_rows(t, s)
    p0, p1, p2, p3 = g(curves.p0), g(curves.p1), g(curves.p2), g(curves.p3)
    spine = p0 * b0 + p1 * b1 + p2 * b2 + p3 * b3
    tangent = V.normalize(p0 * d0 + p1 * d1 + p2 * d2 + p3 * d3, eps=1e-12)
    n = hit_position - spine
    n = n - tangent * V.dot(n, tangent)
    norm = V.length(n)
    ok = norm > 1e-9
    inv = 1.0 / jnp.maximum(norm, 1e-9)
    fallback = V.splat((0.0, 0.0, 1.0), norm.shape)
    n = V.where(ok, n * inv, fallback)
    binormal = V.cross(n, tangent)
    return n, tangent, binormal


# ---------------------------------------------------------------------------
# Pallas TPU cone kernels — dense (ray tile x cone block) sweeps with Morton
# block culling, the hair-scale path (einar/hairmat-class curve counts). Same
# architecture as ops/pallas_intersect.py; the round-cone closed form replaces
# Moller-Trumbore. The reference gets this from OptiX's built-in B-spline
# intersector (OptixRender.cpp:554-560); flattened cones + dense blocks is
# the TPU-native equivalent.
# ---------------------------------------------------------------------------

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strelka_tpu.ops.pallas_intersect import wl_flags, wl_sb, wl_tile

from strelka_tpu import tuned as _tuned_k

# Cone block granularity (tunable): hair is see-through 1D geometry — a
# 256-cone Morton cell's AABB is fat relative to the strands inside it, so
# finer sub-blocks sharpen both the slab culling and the lane-compacted
# demand. Pack (device_scene) and dispatch read the SAME constants.
CONE_TBLK = _tuned_k.get_int("cone_tblk", 256)  # cones per culled sub-block
CONE_SUPER = _tuned_k.get_int("cone_super", 8)  # sub-blocks per superblock


def morton_sort_cones(cones: FlatCones) -> np.ndarray:
    """Permutation sorting cones by midpoint Morton code (host numpy)."""
    from strelka_tpu.ops.pallas_intersect import morton_sort_tris

    a = np.asarray(cones.a)
    b = np.asarray(cones.b)
    mid = 0.5 * (a + b)
    # reuse the triangle Morton sorter via degenerate "corners"
    return morton_sort_tris(np.stack([mid, mid, mid], axis=1))


def pack_cones(cones: FlatCones, tblk: int = CONE_TBLK, super_: int = CONE_SUPER):
    """FlatCones -> ([12, M_pad] kernel rows, [8, nb] sub-block AABBs).

    Rows: a.xyz, b.xyz, ra, rb, u0, u1, seg_id, pad. Padded entries get
    ra = rb = -1 (never hit) and inverted AABBs.
    """
    m = int(cones.a.shape[0])
    step = tblk * super_
    m_pad = ((m + step - 1) // step) * step
    rows = np.zeros((12, m_pad), np.float32)
    a = np.asarray(cones.a, np.float32)
    b = np.asarray(cones.b, np.float32)
    ra = np.asarray(cones.ra, np.float32)
    rb = np.asarray(cones.rb, np.float32)
    rows[0:3, :m] = a.T
    rows[3:6, :m] = b.T
    rows[6, :m] = ra
    rows[7, :m] = rb
    rows[8, :m] = np.asarray(cones.u0, np.float32)
    rows[9, :m] = np.asarray(cones.u1, np.float32)
    rows[10, :m] = np.asarray(cones.seg_id, np.float32)
    rows[6, m:] = -1.0
    rows[7, m:] = -1.0
    # sub-block AABBs (sphere-swept segment bounds)
    nb = m_pad // tblk
    lo = np.full((m_pad, 3), 1e30, np.float32)
    hi = np.full((m_pad, 3), -1e30, np.float32)
    live = np.zeros(m_pad, bool)
    live[:m] = ra >= 0.0
    lo[:m] = np.minimum(a - ra[:, None], b - rb[:, None])
    hi[:m] = np.maximum(a + ra[:, None], b + rb[:, None])
    lo[~live] = 1e30
    hi[~live] = -1e30
    bounds = np.zeros((8, nb), np.float32)
    bounds[0:3] = lo.reshape(nb, tblk, 3).min(axis=1).T
    bounds[3:6] = hi.reshape(nb, tblk, 3).max(axis=1).T
    return jnp.asarray(rows), jnp.asarray(bounds)


def _cone_block(rays, cones, tmax_row=None):
    """Round-cone test for a [CBLK] cone block x [TILE] ray tile.

    rays: [8, TILE]; cones: [12, CBLK]. Returns (t, valid): [CBLK, TILE].
    Same closed form as _ray_round_cone, restructured component-major.
    """
    o = (rays[0, :][None, :], rays[1, :][None, :], rays[2, :][None, :])
    d = (rays[3, :][None, :], rays[4, :][None, :], rays[5, :][None, :])
    tmin = rays[6, :][None, :]
    tmax = (rays[7, :] if tmax_row is None else tmax_row)[None, :]
    a = (cones[0, :][:, None], cones[1, :][:, None], cones[2, :][:, None])
    b = (cones[3, :][:, None], cones[4, :][:, None], cones[5, :][:, None])
    ra = cones[6, :][:, None]
    rb = cones[7, :][:, None]

    def dot(x, y):
        return x[0] * y[0] + x[1] * y[1] + x[2] * y[2]

    ba = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    oa = (o[0] - a[0], o[1] - a[1], o[2] - a[2])
    rr = ra - rb
    m0 = dot(ba, ba)
    m1 = dot(oa, ba)
    m2 = dot(d, ba)
    m3 = dot(d, oa)
    m5 = dot(oa, oa)
    d2 = m0 - rr * rr
    k2 = d2 - m2 * m2
    k1 = d2 * m3 - m1 * m2 + m2 * rr * ra
    k0 = d2 * m5 - m1 * m1 + 2.0 * m1 * rr * ra - d2 * ra * ra
    h = k1 * k1 - k0 * k2
    safe_k2 = jnp.where(jnp.abs(k2) > 1e-12, k2, 1e-12)
    t_body = (-jnp.sqrt(jnp.maximum(h, 0.0)) - k1) / safe_k2
    y = m1 + t_body * m2
    body_ok = (h > 0.0) & (y > 0.0) & (y < d2)

    def sphere(c, r):
        oc = (o[0] - c[0], o[1] - c[1], o[2] - c[2])
        bq = dot(oc, d)
        cq = dot(oc, oc) - r * r
        hq = bq * bq - cq
        tq = -bq - jnp.sqrt(jnp.maximum(hq, 0.0))
        return tq, hq > 0.0

    t_ca, ok_ca = sphere(a, ra)
    t_cb, ok_cb = sphere(b, rb)
    t = jnp.where(body_ok, t_body, _BIG)
    t = jnp.minimum(t, jnp.where(ok_ca, t_ca, _BIG))
    t = jnp.minimum(t, jnp.where(ok_cb, t_cb, _BIG))
    valid = (t > tmin) & (t < tmax) & (ra >= 0.0)
    return t, valid


def _cone_closest_kernel(
    sbounds_ref, bounds_ref, starts_ref, rays_ref, cones_ref, t_ref, cone_ref,
    *, tblk: int, super_: int,
):
    from strelka_tpu.ops.pallas_intersect import _block_of, _tile_hits_block

    r = pl.program_id(0)
    k = pl.program_id(1)
    nsb = pl.num_programs(1)
    sb = _block_of(starts_ref, r, k, nsb)

    @pl.when(k == 0)
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        cone_ref[:, :] = jnp.full_like(cone_ref[:, :], -1)

    rays = rays_ref[:, :]
    super_hit = _tile_hits_block(rays, sbounds_ref, sb, tmax_row=t_ref[0, :])

    @pl.when(super_hit)
    def _super():
        tile = rays.shape[1]
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=t_ref[0, :])

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                t, valid = _cone_block(
                    rays, cones_ref[:, j * tblk : (j + 1) * tblk], tmax_row=t_ref[0, :]
                )
                t_masked = jnp.where(valid, t, _BIG)
                blk_best = jnp.min(t_masked, axis=0)
                blk_arg = jnp.argmin(t_masked, axis=0).astype(jnp.int32)
                better = blk_best < t_ref[0, :]
                t_ref[0, :] = jnp.where(better, blk_best, t_ref[0, :])
                cone_ref[0, :] = jnp.where(better, blk * tblk + blk_arg, cone_ref[0, :])


def _cone_any_kernel(
    sbounds_ref, bounds_ref, starts_ref, rays_ref, cones_ref, occ_ref,
    *, tblk: int, super_: int,
):
    from strelka_tpu.ops.pallas_intersect import _block_of, _tile_hits_block

    r = pl.program_id(0)
    k = pl.program_id(1)
    nsb = pl.num_programs(1)
    sb = _block_of(starts_ref, r, k, nsb)

    @pl.when(k == 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    rays = rays_ref[:, :]
    # progressive pruning: occluded lanes drop out of the slab tests
    live_tmax = jnp.where(occ_ref[0, :], 0.0, rays[7, :])
    super_hit = _tile_hits_block(rays, sbounds_ref, sb, tmax_row=live_tmax)

    @pl.when(super_hit)
    def _super():
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=live_tmax)

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                _, valid = _cone_block(rays, cones_ref[:, j * tblk : (j + 1) * tblk])
                occ_ref[0, :] = occ_ref[0, :] | jnp.any(valid, axis=0)


# fused-K phase-1 cone kernels: grid dim 0 walks ray tiles, grid dim 1
# walks the tile's K-nearest-superblock schedule CHUNK superblocks at a
# time (prefetch-indexed inputs, register accumulation within a step,
# t/cone accumulated across steps through the output refs) — same design
# as the triangle fused-K kernels (ops/pallas_intersect.py). Full-K
# register fusion unrolled K*super_=128 cone blocks and spilled 135MB of
# registers at hair_long scale (r4_stage2.log) — the same VMEM-bound
# failure the triangle kernels hit at K=16, fixed the same way.


def _cone_closest_kernel_fusedk(*refs, tblk: int, super_: int, chunk: int,
                                nsb_pad: int):
    from strelka_tpu.ops.pallas_intersect import _fused_open_epilogue

    starts_ref, rays_ref, sb_ref, d2_ref, r2_ref = refs[0:5]
    cones_refs = refs[5 : 5 + chunk]
    t_ref, cone_ref, open_ref = refs[5 + chunk : 8 + chunk]
    r = pl.program_id(0)
    kc = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(kc == 0)
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        cone_ref[:, :] = jnp.full_like(cone_ref[:, :], -1)
        open_ref[:, :] = jnp.zeros_like(open_ref[:, :])

    rays = rays_ref[:, :]

    @pl.when(jnp.any(rays[7, :] > rays[6, :]))
    def _live():
        best_t = t_ref[0, :]
        best_c = cone_ref[0, :]
        for i in range(chunk):
            sb = starts_ref[kc * chunk + i, r]
            for j in range(super_):
                blk = sb * super_ + j
                t, valid = _cone_block(
                    rays, cones_refs[i][:, j * tblk : (j + 1) * tblk],
                    tmax_row=best_t,
                )
                t_masked = jnp.where(valid, t, _BIG)
                blk_best = jnp.min(t_masked, axis=0)
                blk_arg = jnp.argmin(t_masked, axis=0).astype(jnp.int32)
                better = blk_best < best_t
                best_t = jnp.where(better, blk_best, best_t)
                best_c = jnp.where(better, blk * tblk + blk_arg, best_c)
        t_ref[0, :] = best_t
        cone_ref[0, :] = best_c

        @pl.when(kc == last)
        def _open():
            open_ref[0, :] = _fused_open_epilogue(
                rays, best_t, sb_ref, d2_ref, r2_ref, nsb_pad=nsb_pad
            )


def _cone_any_kernel_fusedk(*refs, tblk: int, super_: int, chunk: int,
                            nsb_pad: int):
    from strelka_tpu.ops.pallas_intersect import _fused_open_epilogue

    starts_ref, rays_ref, sb_ref, d2_ref, r2_ref = refs[0:5]
    cones_refs = refs[5 : 5 + chunk]
    occ_ref, open_ref = refs[5 + chunk : 7 + chunk]
    r = pl.program_id(0)
    kc = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(kc == 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])
        open_ref[:, :] = jnp.zeros_like(open_ref[:, :])

    rays = rays_ref[:, :]

    @pl.when(jnp.any(rays[7, :] > rays[6, :]))
    def _live():
        occ = occ_ref[0, :]
        for i in range(chunk):
            sb = starts_ref[kc * chunk + i, r]
            for j in range(super_):
                _, valid = _cone_block(
                    rays, cones_refs[i][:, j * tblk : (j + 1) * tblk]
                )
                occ = occ | jnp.any(valid, axis=0)
        occ_ref[0, :] = occ

        @pl.when(kc == last)
        def _open():
            bound = jnp.where(occ, 0.0, rays[7, :])
            open_ref[0, :] = _fused_open_epilogue(
                rays, bound, sb_ref, d2_ref, r2_ref, nsb_pad=nsb_pad
            )


@functools.partial(jax.jit, static_argnames=("tile", "tblk", "super_", "chunk",
                                              "interpret", "any_hit"))
def pallas_intersect_cones_fusedk(
    cones_packed: jnp.ndarray,  # [12, M]
    order_k: jnp.ndarray,  # [n_tiles, K] i32
    sbounds: jnp.ndarray,  # [8, nsb] (fused open epilogue)
    d2: jnp.ndarray,  # [n_tiles, nsb]
    r2t: jnp.ndarray,  # [n_tiles]
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    tile: int = 1024,
    tblk: int = CONE_TBLK,
    super_: int = CONE_SUPER,
    chunk: int = 1,  # superblocks per grid step (VMEM/register bound)
    interpret: bool = False,
    any_hit: bool = False,
):
    """Fused-K phase-1 cone sweep (CHUNK superblocks per grid step, K walked
    by grid dim 1) with the residual open test fused at the last step
    -> (t, cone, open) or (occ, open); t/cone/occ bit-compatible with the
    rectangular sweep over the same order table, open with pallas_open_w."""
    from strelka_tpu.ops.pallas_intersect import (
        _pack_rays, _pad_open_inputs, _pad_order_chunk,
    )

    n = tmin.shape[0]
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    step = tblk * super_
    order_k = _pad_order_chunk(order_k, chunk)
    k_fused = int(order_k.shape[1])
    n_steps = k_fused // chunk
    n_tiles = n_pad // tile
    sbounds, d2r, nsb_pad = _pad_open_inputs(sbounds, d2, n_tiles)
    in_specs = [
        pl.BlockSpec((8, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, nsb_pad), lambda r, kc, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nsb_pad), lambda r, kc, *_: (r, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda r, kc, *_: (r, 0, 0), memory_space=pltpu.VMEM),
    ]
    for i in range(chunk):
        in_specs.append(
            pl.BlockSpec(
                (12, step),
                (lambda i: lambda r, kc, starts: (0, starts[kc * chunk + i, r]))(i),
                memory_space=pltpu.VMEM,
            )
        )
    operands = (
        # [K, n_tiles]: SMEM pads the MINOR dim to 128, so the transposed
        # order table is K/128ths the footprint of [n_tiles, K]
        order_k.astype(jnp.int32).T, rays, sbounds, d2r, r2t.reshape(-1, 1, 1),
        *([cones_packed] * chunk),
    )
    if any_hit:
        kernel = functools.partial(
            _cone_any_kernel_fusedk, tblk=tblk, super_=super_, chunk=chunk,
            nsb_pad=nsb_pad,
        )
        occ, open_out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles, n_steps),
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*operands)
        return occ[0, :n], open_out[0, :n] != 0
    kernel = functools.partial(
        _cone_closest_kernel_fusedk, tblk=tblk, super_=super_, chunk=chunk,
        nsb_pad=nsb_pad,
    )
    t_out, cone_out, open_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles, n_steps),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda r, kc, *_: (0, r), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    t = t_out[0, :n]
    cone = cone_out[0, :n]
    return jnp.where(cone >= 0, t, _BIG), cone, open_out[0, :n] != 0


def _cone_closest_kernel_wl(
    wl_ref, bounds_ref, rays_ref, cones_ref, t_ref, cone_ref,
    *, tblk: int, super_: int,
):
    """Work-list form of _cone_closest_kernel: 1-D grid over scalar-
    prefetched (tile, cone-superblock) pairs — an 800k-cone stage's
    rectangular grid is ~100k mostly-dead steps/launch at the ~1.2us/step
    bookkeeping floor; the pair list only visits (tile, sb) whose slab test
    passed (pallas_open_w W matrix)."""
    from strelka_tpu.ops.pallas_intersect import _tile_hits_block

    i = pl.program_id(0)
    e = wl_ref[0, i]
    flags = wl_flags(e)
    sb = wl_sb(e)

    @pl.when((flags & 1) != 0)  # first entry of this tile's run
    def _init():
        t_ref[:, :] = rays_ref[7, :][None, :]
        cone_ref[:, :] = jnp.full_like(cone_ref[:, :], -1)

    rays = rays_ref[:, :]

    @pl.when((flags & 2) != 0)  # valid (non-pad) entry
    def _body():
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=t_ref[0, :])

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                t, valid = _cone_block(
                    rays, cones_ref[:, j * tblk : (j + 1) * tblk], tmax_row=t_ref[0, :]
                )
                t_masked = jnp.where(valid, t, _BIG)
                blk_best = jnp.min(t_masked, axis=0)
                blk_arg = jnp.argmin(t_masked, axis=0).astype(jnp.int32)
                better = blk_best < t_ref[0, :]
                t_ref[0, :] = jnp.where(better, blk_best, t_ref[0, :])
                cone_ref[0, :] = jnp.where(better, blk * tblk + blk_arg, cone_ref[0, :])


def _cone_any_kernel_wl(
    wl_ref, bounds_ref, rays_ref, cones_ref, occ_ref,
    *, tblk: int, super_: int,
):
    from strelka_tpu.ops.pallas_intersect import _tile_hits_block

    i = pl.program_id(0)
    e = wl_ref[0, i]
    flags = wl_flags(e)
    sb = wl_sb(e)

    @pl.when((flags & 1) != 0)
    def _init():
        occ_ref[:, :] = jnp.zeros_like(occ_ref[:, :])

    rays = rays_ref[:, :]

    @pl.when((flags & 2) != 0)
    def _body():
        live_tmax = jnp.where(occ_ref[0, :], 0.0, rays[7, :])
        for j in range(super_):
            blk = sb * super_ + j
            sub_hit = _tile_hits_block(rays, bounds_ref, blk, tmax_row=live_tmax)

            @pl.when(sub_hit)
            def _work(j=j, blk=blk):
                _, valid = _cone_block(rays, cones_ref[:, j * tblk : (j + 1) * tblk])
                occ_ref[0, :] = occ_ref[0, :] | jnp.any(valid, axis=0)


@functools.partial(jax.jit, static_argnames=("tile", "tblk", "super_", "interpret", "any_hit"))
def pallas_intersect_cones_wl(
    cones_packed: jnp.ndarray,  # [12, M]
    bounds: jnp.ndarray,  # [8, nb]
    wl: jnp.ndarray,  # [1, C] packed i32 (build_worklist)
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    tile: int = 1024,
    tblk: int = CONE_TBLK,
    super_: int = CONE_SUPER,
    interpret: bool = False,
    any_hit: bool = False,
):
    """Work-list cone sweep. Tiles with NO entry return GARBAGE — mask with
    build_worklist's visited_tiles."""
    from strelka_tpu.ops.pallas_intersect import _pack_rays

    n = tmin.shape[0]
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    step = tblk * super_
    in_specs = [
        pl.BlockSpec((8, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
        pl.BlockSpec((12, step), lambda i, wl, b: (0, wl_sb(wl[0, i])), memory_space=pltpu.VMEM),
    ]
    if any_hit:
        kernel = functools.partial(_cone_any_kernel_wl, tblk=tblk, super_=super_)
        occ = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(wl.shape[1],),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(wl, bounds, rays, cones_packed)
        return occ[0, :n]
    kernel = functools.partial(_cone_closest_kernel_wl, tblk=tblk, super_=super_)
    t_out, cone_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(wl.shape[1],),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i, wl, b: (0, wl_tile(wl[0, i])), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(wl, bounds, rays, cones_packed)
    t = t_out[0, :n]
    cone = cone_out[0, :n]
    return jnp.where(cone >= 0, t, _BIG), cone


@functools.partial(jax.jit, static_argnames=("tile", "tblk", "super_", "interpret", "any_hit"))
def pallas_intersect_cones(
    cones_packed: jnp.ndarray,  # [12, M] (pack_cones)
    bounds: jnp.ndarray,  # [8, nb]
    origins,
    directions,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    tile: int = 1024,
    tblk: int = CONE_TBLK,
    super_: int = CONE_SUPER,
    interpret: bool = False,
    any_hit: bool = False,
    starts: jnp.ndarray | None = None,  # [n_tiles, K] per-tile sweep order
):
    """Dense block-culled cone sweep -> (t [N], cone [N] i32) or occ [N].

    starts: optional [n_tiles, K] i32 order table; K < nsb sweeps only each
    tile's K scheduled superblocks (phase 1 of the cone residual two-pass)."""
    from strelka_tpu.ops.pallas_intersect import _pack_rays

    n = tmin.shape[0]
    rays, n_pad = _pack_rays(origins, directions, tmin, tmax, tile)
    m_total = cones_packed.shape[1]
    step = tblk * super_
    nsb = m_total // step
    sbounds = jnp.concatenate(
        [
            bounds[0:3].reshape(3, nsb, super_).min(axis=2),
            bounds[3:6].reshape(3, nsb, super_).max(axis=2),
            jnp.zeros((2, nsb), bounds.dtype),
        ]
    )
    n_tiles = n_pad // tile
    # per-tile NEAR-TO-FAR sweep order (point-to-AABB distance of the tile's
    # mean origin to each cone superblock — same scheme as the triangle
    # path): closest-hit tmax pruning can then reject the far tail, and the
    # any-hit progressive pruning finds near occluders first. Falls back to
    # plain order when the SMEM table would overflow (1MB SMEM budget).
    padded_tbl_bytes = n_tiles * (-(-nsb // 128) * 128) * 4
    if starts is not None:
        starts = jnp.clip(starts.astype(jnp.int32), 0, nsb - 1)
    elif nsb >= 8 and padded_tbl_bytes <= 600_000:
        from strelka_tpu.ops import vec as V
        from strelka_tpu.ops.pallas_intersect import tile_box_d2

        org_v = origins if hasattr(origins, "x") else V.from_rows(origins)
        d2 = tile_box_d2(org_v, sbounds, tile)
        starts = jnp.argsort(d2, axis=1).astype(jnp.int32)
    else:
        starts = jnp.broadcast_to(jnp.arange(nsb, dtype=jnp.int32)[None, :], (n_tiles, nsb))
    grid = (n_tiles, starts.shape[1])
    in_specs = [
        pl.BlockSpec((8, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (12, step),
            lambda r, k, sb, b, order: (0, order[r, k]),
            memory_space=pltpu.VMEM,
        ),
    ]
    if any_hit:
        kernel = functools.partial(_cone_any_kernel, tblk=tblk, super_=super_)
        occ = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.bool_),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(sbounds, bounds, starts, rays, cones_packed)
        return occ[0, :n]
    kernel = functools.partial(_cone_closest_kernel, tblk=tblk, super_=super_)
    t_out, cone_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda r, t, *_: (0, r), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(sbounds, bounds, starts, rays, cones_packed)
    t = t_out[0, :n]
    cone = cone_out[0, :n]
    return jnp.where(cone >= 0, t, _BIG), cone


def cone_hit_to_seg_u(cones: FlatCones, origins, directions, t, cone_idx) -> CurveHit:
    """Map a winning cone index + t to (seg, spline u) — one row gather + the
    axial solve in XLA (mirrors recompute_barycentrics for triangles)."""
    from strelka_tpu.ops import vec as V
    from strelka_tpu.ops.vec import Vec3

    if not isinstance(origins, Vec3):
        origins = V.from_rows(origins)
    if not isinstance(directions, Vec3):
        directions = V.from_rows(directions)
    c = jnp.maximum(cone_idx, 0)
    a = V.gather_rows(cones.a, c)
    b = V.gather_rows(cones.b, c)
    ra = cones.ra[c]
    rb = cones.rb[c]
    u0 = cones.u0[c]
    u1 = cones.u1[c]
    seg = cones.seg_id[c]
    ba = b - a
    p = origins + directions * t
    pa = p - a
    rr = ra - rb
    m0 = V.dot(ba, ba)
    d2 = m0 - rr * rr
    y = V.dot(pa, ba)
    y_norm = jnp.clip(y / jnp.maximum(d2, 1e-12), 0.0, 1.0)
    u = u0 + (u1 - u0) * y_norm
    miss = cone_idx < 0
    return CurveHit(
        t=jnp.where(miss, _BIG, t),
        seg=jnp.where(miss, -1, seg).astype(jnp.int32),
        u=jnp.where(miss, 0.0, u),
    )


_CONE_WL_MIN_NSB = 32  # below this the rectangular sweep's bookkeeping is fine
_CONE_WL_CAP = 48


def _cone_super_bounds(bounds, super_: int):
    nsb = bounds.shape[1] // super_
    return jnp.concatenate(
        [
            bounds[0:3].reshape(3, nsb, super_).min(axis=2),
            bounds[3:6].reshape(3, nsb, super_).max(axis=2),
            jnp.zeros((2, nsb), bounds.dtype),
        ]
    )


def _cones_sweep(scene, origins, directions, tmin, tmax, any_hit: bool):
    """Work-list scheduling for big cone sets (einar-class 10^5+ segments):
    the [n_tiles, nsb] rectangular grid pays ~1.2us/step even when every
    slab test fails; the (tile, superblock) pair list visits only passing
    pairs. Falls back to the rectangular sweep on work-list overflow."""
    from strelka_tpu.ops import vec as V
    from strelka_tpu.ops.pallas_intersect import (
        build_worklist,
        pallas_open_w,
        tile_box_d2,
    )

    m_total = scene.cones_packed.shape[1]
    nsb = m_total // (CONE_TBLK * CONE_SUPER)
    rect = lambda _=None: pallas_intersect_cones(
        scene.cones_packed, scene.cone_bounds, origins, directions, tmin, tmax,
        any_hit=any_hit,
    )
    if nsb < _CONE_WL_MIN_NSB:
        return rect()
    tile = 1024
    n = tmin.shape[0]
    org_v = origins if hasattr(origins, "x") else V.from_rows(origins)
    dir_v = directions if hasattr(directions, "x") else V.from_rows(directions)
    sbounds = _cone_super_bounds(scene.cone_bounds, CONE_SUPER)
    d2 = tile_box_d2(org_v, sbounds, tile)
    no_open = jnp.full(d2.shape[0], jnp.inf, jnp.float32)
    _, W, _ = pallas_open_w(org_v, dir_v, tmin, tmax, sbounds, d2, no_open, tile)
    from strelka_tpu.ops.intersect import _wl_cap_per_tile

    n_tiles = -(-n // tile)
    cap = n_tiles * min(_CONE_WL_CAP, _wl_cap_per_tile(W.shape[1], n_tiles))
    wl, count, visited = build_worklist(W, d2, cap)

    def wl_path(_):
        out = pallas_intersect_cones_wl(
            scene.cones_packed, scene.cone_bounds, wl, origins, directions,
            tmin, tmax, tile=tile, any_hit=any_hit,
        )
        vis_ray = jnp.repeat(visited, tile)[:n]
        if any_hit:
            return out & vis_ray
        t, cone = out
        cone = jnp.where(vis_ray, cone, -1)
        return jnp.where(cone >= 0, t, _BIG), cone

    return jax.lax.cond(count <= cap, wl_path, lambda _: rect(), None)


# cone residual two-pass (bounce wavefronts on einar-class cone sets): hair
# hits are usually within the ray's own strand cluster, so the K-nearest
# ball primes a tight bound and the open test closes most lanes; the open
# remainder compacts and finishes work-listed (same machinery as triangles,
# ops/intersect.py:_closest_twopass)
CONE_RESIDUAL_K = int(__import__("os").environ.get("STRELKA_CONE_K", "16"))
_CONE_NO_TWOPASS = __import__("os").environ.get("STRELKA_CONE_NO_TWOPASS") == "1"


def _cones_twopass(scene, origins, directions, tmin, tmax, any_hit: bool,
                   tile: int = 1024, tblk: int = CONE_TBLK,
                   super_: int = CONE_SUPER, k: int | None = None):
    from strelka_tpu.ops import vec as V
    from strelka_tpu.ops.intersect import _gather_ray_rows
    from strelka_tpu.ops.pallas_intersect import (
        build_worklist,
        pallas_open_w,
        tile_box_d2,
        tile_sweep_order_k,
    )

    n = tmin.shape[0]
    org_v = origins if hasattr(origins, "x") else V.from_rows(origins)
    dir_v = directions if hasattr(directions, "x") else V.from_rows(directions)
    sbounds = _cone_super_bounds(scene.cone_bounds, super_)
    nsb = sbounds.shape[1]
    k = min(CONE_RESIDUAL_K if k is None else k, nsb)
    order_k, r2t, d2 = tile_sweep_order_k(org_v, sbounds, tile, k)
    out1 = pallas_intersect_cones_fusedk(
        scene.cones_packed, order_k, sbounds, d2, r2t, org_v, dir_v, tmin, tmax,
        any_hit=any_hit, tile=tile, tblk=tblk, super_=super_,
    )
    if any_hit:
        occ1, open_ = out1
        bound = jnp.where(occ1, 0.0, tmax)
    else:
        t1, cone1, open_ = out1
        bound = jnp.minimum(t1, tmax)
    tmax2 = jnp.where(open_, jnp.where(any_hit, tmax, bound), 0.0)
    # phase-2 shares the triangle path's tuned tile/partition knobs: the
    # compacted open remainder is incoherent on hair too (p2_tile/p2_octant)
    from strelka_tpu.ops.intersect import _open_partition, _p2_tile

    tile2 = min(_p2_tile(), tile)
    perm, pos = _open_partition(open_, dir_v)
    o2, d2v, tmin2, tmax2p, _ = _gather_ray_rows(
        perm, org_v, dir_v, tmin, tmax2, None
    )
    d2m = tile_box_d2(o2, sbounds, tile2)
    no_open = jnp.full(d2m.shape[0], jnp.inf, jnp.float32)
    _, W2, _ = pallas_open_w(o2, d2v, tmin2, tmax2p, sbounds, d2m, no_open, tile2)
    # the [4, cap] wl and the fallback's [n_tiles, nsb] order table ride
    # SMEM exactly like the triangle path — share its constant entry budget
    # and rectangular tile floor (ADVICE r3 medium: tuning p2_tile small must
    # not re-open the SMEM OOM class on scenes with curves)
    from strelka_tpu.ops.intersect import _rect_fallback_order, _wl_cap_per_tile

    n_tiles2 = -(-n // tile2)
    cap = n_tiles2 * min(_CONE_WL_CAP, _wl_cap_per_tile(nsb, n_tiles2))
    wl, count, visited = build_worklist(W2, d2m, cap)

    def wl_path(_):
        return pallas_intersect_cones_wl(
            scene.cones_packed, scene.cone_bounds, wl, o2, d2v,
            tmin2, tmax2p, tile=tile2, tblk=tblk, super_=super_, any_hit=any_hit,
        )

    def rect_path(_):
        fb_tile, starts2 = _rect_fallback_order(o2, sbounds, d2m, tile2)
        return pallas_intersect_cones(
            scene.cones_packed, scene.cone_bounds, o2, d2v, tmin2, tmax2p,
            any_hit=any_hit, starts=starts2, tile=fb_tile, tblk=tblk, super_=super_,
        )

    vis_ray = jnp.repeat(visited, tile2)[:n]
    if any_hit:
        occ2p = jax.lax.cond(count <= cap, wl_path, rect_path, None)
        # wl garbage on unvisited tiles only matters for the wl path; the
        # rect path writes every tile — mask is safe for both (an unvisited
        # tile has no open lane that could be occluded in phase 2)
        occ2p = occ2p & vis_ray
        occ2 = occ2p.astype(jnp.int32)[:, None][pos][:, 0] != 0
        return occ1 | occ2
    t2p, cone2p = jax.lax.cond(count <= cap, wl_path, rect_path, None)
    cone2p = jnp.where(vis_ray, cone2p, -1)
    back = jnp.stack(
        [jax.lax.bitcast_convert_type(t2p, jnp.int32), cone2p], axis=1
    )[pos].T
    t2 = jax.lax.bitcast_convert_type(back[0], jnp.float32)
    cone2 = back[1]
    better = cone2 >= 0  # phase-2 hits are < bound by construction
    return jnp.where(better, t2, t1), jnp.where(better, cone2, cone1)


def _cones_dispatch(scene, origins, directions, tmin, tmax, any_hit: bool,
                    shared_origin: bool):
    m_total = scene.cones_packed.shape[1]
    nsb = m_total // (CONE_TBLK * CONE_SUPER)
    if (
        not _CONE_NO_TWOPASS
        and not shared_origin
        and nsb >= 2 * CONE_RESIDUAL_K
    ):
        return _cones_twopass(scene, origins, directions, tmin, tmax, any_hit)
    return _cones_sweep(scene, origins, directions, tmin, tmax, any_hit)


def intersect_curves_closest_scene(scene, origins, directions, tmin, tmax,
                                   active=None, shared_origin=False) -> CurveHit:
    """Dispatch: Pallas cone kernel on TPU, jnp scan sweep otherwise."""
    if getattr(scene, "cones_packed", None) is not None:
        if active is not None:
            tmax = jnp.where(active, tmax, 0.0)
        t, cone = _cones_dispatch(
            scene, origins, directions, tmin, tmax, any_hit=False,
            shared_origin=shared_origin,
        )
        return cone_hit_to_seg_u(scene.cones, origins, directions, t, cone)
    return intersect_curves_closest(scene.cones, origins, directions, tmin, tmax, active)


def intersect_curves_any_scene(scene, origins, directions, tmin, tmax,
                               active=None, shared_origin=False) -> jnp.ndarray:
    if getattr(scene, "cones_packed", None) is not None:
        if active is not None:
            tmax = jnp.where(active, tmax, 0.0)
        return _cones_dispatch(
            scene, origins, directions, tmin, tmax, any_hit=True,
            shared_origin=shared_origin,
        )
    return intersect_curves_any(scene.cones, origins, directions, tmin, tmax, active)
