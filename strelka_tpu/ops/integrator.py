"""Wavefront path-tracing integrator — the TPU replacement for the OptiX
megakernel (__raygen__rg, OptixRender.cu:80-248 + __closesthit__radiance,
OptixRender_radiance_closest_hit.cu:456-606).

Control flow is replicated exactly, restructured for SPMD: all W*H rays
advance in lockstep through a statically-unrolled bounce loop; branch
divergence becomes masked selects; each bounce issues one closest-hit sweep
(radiance ray, mask PRIMARY) and one any-hit sweep (NEE shadow ray, mask
SHADOW). Progressive accumulation and the diffuse/specular first-event AOVs
(incl. per-pixel uint16 counters) match the reference bit-for-bit in
structure.

Reference quirks intentionally preserved for image parity:
  * NEE radiance includes cos(N,L) AND the MDL-style evaluate() also folds
    cos in — the cosine is squared in next-event contributions (cu:306+586).
  * BSDF-hit emitter MIS uses the uniform-area rect pdf regardless of the
    NEE rect sampling method (Lights.h:221-243).
  * lastBsdfPdf = 1.0 for specular events (cu:602-603).
  * Russian roulette starts after depth 3 with 1/(p+1e-5) boost
    (OptixRender.cu:134-142); throughput cutoff |T|^2 < 1e-5 (:144-147).
  * NaN canary paints radiance (1e4,0,0) (cu:552-558, 573-579).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from strelka_tpu.materials import BsdfType
from strelka_tpu.ops import bsdf as B
from strelka_tpu.ops import light_sampling as LS
from strelka_tpu.ops import sampler as S
from strelka_tpu.ops import tonemap as TM
from strelka_tpu.ops.intersect import (
    Hit,
    intersect_any,
    intersect_closest,
    offset_ray,
)
from strelka_tpu.render.device_scene import (
    RAY_MASK_PRIMARY,
    RAY_MASK_SHADOW,
    DeviceScene,
)

Dim = S.SampleDimension


class EventType:
    """OptixRenderParams.h:68-76."""

    eUndef = 0
    eAbsorb = 1
    eDiffuse = 2
    eSpecular = 3


class LaunchParams(NamedTuple):
    """Traced per-launch values (subset of Params, OptixRenderParams.h:38-68).

    Static knobs (depth, spp, debug, ...) are passed to render_launch as
    Python values and baked into the trace, mirroring how the reference
    re-reads settings host-side each frame.
    """

    subframe_index: jnp.ndarray  # i32 scalar — accumulated spp so far
    clip_to_view: jnp.ndarray  # [4,4] f32
    view_to_world: jnp.ndarray  # [4,4] f32
    exposure: jnp.ndarray  # [3] f32
    bg_color: jnp.ndarray  # [3] f32


class FrameState(NamedTuple):
    """Accumulation history (accum/diffuse/specular + counters)."""

    accum: jnp.ndarray  # [H,W,3] f32
    diffuse: jnp.ndarray  # [H,W,3] f32
    diffuse_counter: jnp.ndarray  # [H,W] i32 (uint16 in reference)
    specular: jnp.ndarray  # [H,W,3] f32
    specular_counter: jnp.ndarray  # [H,W] i32


def make_frame_state(height: int, width: int) -> FrameState:
    # distinct buffers (donation requires unique buffers per argument)
    z3 = lambda: jnp.zeros((height, width, 3), jnp.float32)
    zc = lambda: jnp.zeros((height, width), jnp.int32)
    return FrameState(z3(), z3(), zc(), z3(), zc())


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _norm(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def generate_camera_rays(params: LaunchParams, px, py, jx, jy, width, height):
    """generateCameraRay (OptixRender.cu:38-58)."""
    pixel_x = px.astype(jnp.float32) + jx
    pixel_y = py.astype(jnp.float32) + jy
    ndc_x = pixel_x / width * 2.0 - 1.0
    ndc_y = pixel_y / height * 2.0 - 1.0
    ones = jnp.ones_like(ndc_x)
    clip = jnp.stack([ndc_x, ndc_y, ones, ones], -1)
    view = clip @ params.clip_to_view.T
    wdir = view.at[..., 3].set(0.0) @ params.view_to_world.T
    origin = jnp.broadcast_to(params.view_to_world[:3, 3], wdir[..., :3].shape)
    direction = _norm(wdir[..., :3])
    return origin, direction


def _gather_surface(scene: DeviceScene, hit: Hit, ray_dir, inside):
    """fillTriangleGeomData (cu:365-421): interpolate attributes at the hit."""
    prim = jnp.maximum(hit.prim, 0)
    w0 = (1.0 - hit.u - hit.v)[..., None]
    wu = hit.u[..., None]
    wv = hit.v[..., None]
    v0 = scene.v0[prim]
    e1 = scene.e1[prim]
    e2 = scene.e2[prim]
    position = v0 + wu * e1 + wv * e2
    normal = _norm(w0 * scene.n0[prim] + wu * scene.n1[prim] + wv * scene.n2[prim])
    tangent = _norm(w0 * scene.t0[prim] + wu * scene.t1[prim] + wv * scene.t2[prim])
    uv = w0 * scene.uv0[prim] + wu * scene.uv1[prim] + wv * scene.uv2[prim]
    geom_normal = _norm(jnp.cross(e1, e2))
    flip = jnp.where(inside, -1.0, 1.0)[..., None]
    normal = normal * flip
    geom_normal = geom_normal * flip
    binormal = jnp.cross(normal, tangent)
    frame = B.ShadingFrame(normal=normal, tangent_u=tangent, tangent_v=binormal, geom_normal=geom_normal)
    return position, uv, frame


def _gather_material(scene: DeviceScene, prim) -> B.SurfaceParams:
    mid = jnp.maximum(scene.material_id[jnp.maximum(prim, 0)], 0)
    return _gather_material_by_id(scene, mid)


def _gather_material_by_id(scene: DeviceScene, mid) -> B.SurfaceParams:
    m = scene.materials
    return B.SurfaceParams(
        bsdf_type=m.bsdf_type[mid],
        diffuse_color=m.diffuse_color[mid],
        metallic=m.metallic[mid],
        roughness=m.roughness[mid],
        specular_level=m.specular_level[mid],
        ior=m.ior[mid],
        glass_color=m.glass_color[mid],
        opacity=m.opacity[mid],
    )


def _apply_textures(scene: DeviceScene, mat: B.SurfaceParams, frame: B.ShadingFrame, prim, uv):
    """Texture lookups modulating material params + normal mapping.

    The tex_lookup path of the MDL runtime (texture_support_cuda.h:287-528):
    diffuse texture replaces the constant color, roughness/metallic textures
    override their scalars (R channel), normal map perturbs the frame.
    """
    from strelka_tpu.textures import apply_normal_map, sample_bilinear

    mid = jnp.maximum(scene.material_id[jnp.maximum(prim, 0)], 0)
    m = scene.materials
    uv_t = uv * m.uv_scale[mid] + m.uv_offset[mid]
    d_id = m.diffuse_tex[mid]
    diff = sample_bilinear(scene.textures, d_id, uv_t)
    mat = mat._replace(
        diffuse_color=jnp.where((d_id >= 0)[:, None], diff[..., :3], mat.diffuse_color)
    )
    r_id = m.roughness_tex[mid]
    rough = sample_bilinear(scene.textures, r_id, uv_t)
    mat = mat._replace(roughness=jnp.where(r_id >= 0, rough[..., 0], mat.roughness))
    mt_id = m.metallic_tex[mid]
    metal = sample_bilinear(scene.textures, mt_id, uv_t)
    mat = mat._replace(metallic=jnp.where(mt_id >= 0, metal[..., 0], mat.metallic))
    n_id = m.normal_tex[mid]
    n_map = apply_normal_map(frame.normal, frame.tangent_u, frame.tangent_v, sample_bilinear(scene.textures, n_id, uv_t)[..., :3])
    new_n = jnp.where((n_id >= 0)[:, None], n_map, frame.normal)
    frame = frame._replace(normal=new_n, tangent_v=jnp.cross(new_n, frame.tangent_u))
    return mat, frame


def _gather_light(scene: DeviceScene, light_id):
    lid = jnp.clip(light_id, 0, scene.lights.points.shape[0] - 1)
    L = scene.lights
    return L.points[lid], L.color[lid], L.normal[lid], L.type[lid], L.half_angle[lid]


def trace_paths(
    scene: DeviceScene,
    params: LaunchParams,
    sample_idx: jnp.ndarray,  # [N] uint32 sobol sample indices
    origin: jnp.ndarray,  # [N,3]
    direction: jnp.ndarray,  # [N,3]
    *,
    max_depth: int,
    rect_light_sampling_method: int,
    shadow_ray_tmin: float,
    material_ray_tmin: float,
    debug: int,
):
    """One path per entry; returns (radiance [N,3], first_event [N])."""
    n = origin.shape[0]
    f3 = lambda v: jnp.full((n, 3), v, jnp.float32)
    radiance = f3(0.0)
    throughput = f3(1.0)
    inside = jnp.zeros(n, bool)
    specular_bounce = jnp.zeros(n, bool)
    last_bsdf_pdf = jnp.zeros(n, jnp.float32)
    first_event = jnp.zeros(n, jnp.int32)
    alive = jnp.ones(n, bool)
    num_lights = scene.num_lights

    tmin_mat = jnp.full(n, material_ray_tmin, jnp.float32)
    tmax_big = jnp.full(n, 1e16, jnp.float32)

    for depth in range(max_depth):
        # One batched draw of the 5 folded Sobol dimensions per bounce.
        # (dimension = Dim % 5, RandomSampler.h:224 — e.g. eBSDF2 and
        # eLightId collide on dim 2 in the reference too; bit-identical.)
        dim_rows = S.random_dims(sample_idx, depth, (0, 1, 2, 3, 4))
        rnd = lambda dim: dim_rows[int(dim) % 5]
        hit = intersect_closest(
            scene, origin, direction, tmin_mat, tmax_big, RAY_MASK_PRIMARY, active=alive
        )
        # curve (hair) primitives: dense round-cone sweep, closest wins
        is_curve = jnp.zeros(n, bool)
        chit = None
        if scene.cones is not None:
            from strelka_tpu.ops.curves import intersect_curves_closest

            chit = intersect_curves_closest(
                scene.cones, origin, direction, tmin_mat, tmax_big, active=alive
            )
            is_curve = alive & (chit.seg >= 0) & (chit.t < hit.t)
        missed = alive & (hit.prim < 0) & ~is_curve
        # __miss__ms (cu:250-257)
        radiance = jnp.where(missed[:, None], radiance + throughput * params.bg_color, radiance)
        throughput = jnp.where(missed[:, None], 0.0, throughput)

        prim_light_id = jnp.where(hit.prim >= 0, scene.light_id[jnp.maximum(hit.prim, 0)], -1)
        hit_light = alive & ~missed & (prim_light_id >= 0) & ~is_curve
        hit_surface = alive & ~missed & ~hit_light

        # ---- __closesthit__light (cu:315-341)
        if num_lights > 0:
            lpts, lcol, lnrm, ltyp, lang = _gather_light(scene, prim_light_id)
            hit_point_l = origin + hit.t[:, None] * direction
            light_n = LS.calc_light_normal(lpts, lnrm, ltyp, hit_point_l)
            cos_l = -_dot(direction, light_n)
            direct_vis = (depth == 0) | specular_bounce
            light_pdf_hit = (
                LS.get_light_pdf(lpts, lnrm, ltyp, lang, hit_point_l, origin) / num_lights
            )
            mis_w = LS.mis_weight_balance(jnp.maximum(last_bsdf_pdf, 1e-20), light_pdf_hit)
            contrib = throughput * lcol * cos_l[:, None] * jnp.where(direct_vis, 1.0, mis_w)[:, None]
            add = hit_light & (cos_l > 0.0)
            radiance = jnp.where(add[:, None], radiance + contrib, radiance)
        throughput = jnp.where(hit_light[:, None], 0.0, throughput)

        # ---- __closesthit__radiance (surface shading)
        position, uv, frame = _gather_surface(scene, hit, direction, inside)
        mat = _gather_material(scene, hit.prim)
        if scene.textures is not None:
            mat, frame = _apply_textures(scene, mat, frame, hit.prim, uv)
        if chit is not None:
            # fillCurveGeomData (cu:423-454): spine-offset normal, spline tangent
            from strelka_tpu.ops.curves import curve_shading_frame

            pos_curve = origin + chit.t[:, None] * direction
            cn, ct, cb = curve_shading_frame(scene.curves, chit.seg, chit.u, pos_curve)
            flip = jnp.where(inside, -1.0, 1.0)[:, None]
            cn = cn * flip
            icn = is_curve[:, None]
            position = jnp.where(icn, pos_curve, position)
            frame = B.ShadingFrame(
                normal=jnp.where(icn, cn, frame.normal),
                tangent_u=jnp.where(icn, ct, frame.tangent_u),
                tangent_v=jnp.where(icn, jnp.cross(cn, ct), frame.tangent_v),
                geom_normal=jnp.where(icn, cn, frame.geom_normal),
            )
            uv = jnp.where(icn, 0.5, uv)
            cmat = _gather_material_by_id(
                scene, scene.curves.material_id[jnp.maximum(chit.seg, 0)]
            )
            mat = B.SurfaceParams(
                *[
                    jnp.where(icn if a.ndim == 2 else is_curve, ca, ta)
                    for ta, ca, a in zip(mat, cmat, mat)
                ]
            )

        if debug == 1:
            normals_col = (frame.normal + 1.0) * 0.5
            radiance = jnp.where(hit_surface[:, None], normals_col, radiance)
            first_event = jnp.where(hit_surface, EventType.eUndef, first_event)
            break

        ior1 = jnp.where(inside, mat.ior, 1.0)
        ior2 = jnp.where(inside, 1.0, mat.ior)
        xi = jnp.stack([rnd(Dim.eBSDF0), rnd(Dim.eBSDF1), rnd(Dim.eBSDF2), rnd(Dim.eBSDF3)], -1)
        k1 = -direction
        smp = B.bsdf_sample(mat, frame, k1, xi, ior1, ior2)

        absorbed = hit_surface & (smp.event_type == B.BSDF_EVENT_ABSORB)
        if depth == 0:
            first_event = jnp.where(absorbed, EventType.eAbsorb, first_event)
            first_event = jnp.where(
                hit_surface & ((smp.event_type & B.BSDF_EVENT_DIFFUSE) != 0),
                EventType.eDiffuse,
                first_event,
            )
            first_event = jnp.where(
                hit_surface & ((smp.event_type & B.BSDF_EVENT_GLOSSY) != 0),
                EventType.eSpecular,
                first_event,
            )
        throughput = jnp.where(absorbed[:, None], 0.0, throughput)
        shade = hit_surface & ~absorbed
        specular_bounce = jnp.where(
            shade, (smp.event_type & B.BSDF_EVENT_SPECULAR) != 0, specular_bounce
        )

        # ---- NEE (estimateDirectLighting, cu:312-324 + sampleLight :260-310)
        if num_lights > 0:
            nee_able = shade & (
                (smp.event_type & (B.BSDF_EVENT_DIFFUSE | B.BSDF_EVENT_GLOSSY)) != 0
            )
            u_l = rnd(Dim.eLightId)
            light_id = jnp.clip(
                (num_lights * u_l).astype(jnp.int32), 0, num_lights - 1
            )
            lpts, lcol, lnrm, ltyp, lang = _gather_light(scene, light_id)
            uv_l = jnp.stack([rnd(Dim.eLightPointX), rnd(Dim.eLightPointY)], -1)
            ls = LS.sample_light(
                lpts, lcol, lnrm, ltyp, lang, uv_l, position, rect_light_sampling_method
            )
            to_light = ls.L
            li_all_nonzero = jnp.all(lcol != 0.0, axis=-1)
            geom_ok = (_dot(frame.normal, to_light) > 0.0) & (-_dot(to_light, ls.normal) > 0.0) & li_all_nonzero
            shadow_org = offset_ray(position, frame.geom_normal)
            occluded = intersect_any(
                scene,
                shadow_org,
                to_light,
                jnp.full(n, shadow_ray_tmin, jnp.float32),
                ls.dist_to_light,
                RAY_MASK_SHADOW,
                active=nee_able & geom_ok,
            )
            if scene.cones is not None:
                from strelka_tpu.ops.curves import intersect_curves_any

                occluded = occluded | intersect_curves_any(
                    scene.cones,
                    shadow_org,
                    to_light,
                    jnp.full(n, shadow_ray_tmin, jnp.float32),
                    ls.dist_to_light,
                    active=nee_able & geom_ok,
                )
            visibility = jnp.where(geom_ok & ~occluded, 1.0, 0.0)
            nee_radiance = (
                visibility[:, None]
                * lcol
                * jnp.clip(_dot(frame.normal, to_light), 0.0, 1.0)[:, None]
            )
            light_pdf = jnp.where(geom_ok, ls.pdf, 0.0) * (1.0 / num_lights)

            # NaN canary #1 (cu:552-558)
            nan1 = nee_able & (jnp.any(jnp.isnan(nee_radiance), axis=-1) | jnp.isnan(light_pdf))

            next_event_valid = ((_dot(to_light, frame.normal) > 0.0) != inside) & (light_pdf != 0.0) & nee_able
            ev = B.bsdf_evaluate(mat, frame, k1, to_light)
            nan2 = nee_able & (
                jnp.any(jnp.isnan(ev.bsdf_diffuse), axis=-1) | jnp.any(jnp.isnan(ev.bsdf_glossy), axis=-1)
            )
            contribute = next_event_valid & (ev.pdf > 0.0) & ~nan1 & ~nan2
            radiance_over_pdf = nee_radiance / jnp.maximum(light_pdf, 1e-20)[:, None]
            mis_w = LS.mis_weight_balance(jnp.maximum(light_pdf, 1e-20), ev.pdf)
            nee_contrib = throughput * radiance_over_pdf * mis_w[:, None] * (ev.bsdf_diffuse + ev.bsdf_glossy)
            radiance = jnp.where(contribute[:, None], radiance + nee_contrib, radiance)
            # canary: radiance = (1e4, 0, 0), kill
            canary = nan1 | nan2
            radiance = jnp.where(
                canary[:, None], jnp.array([1e4, 0.0, 0.0], jnp.float32), radiance
            )
            throughput = jnp.where(canary[:, None], 0.0, throughput)
            shade = shade & ~canary

        # ---- next segment setup (cu:591-605)
        transmission = (smp.event_type & B.BSDF_EVENT_TRANSMISSION) != 0
        new_origin = jnp.where(
            transmission[:, None],
            offset_ray(position, -frame.geom_normal),
            offset_ray(position, frame.geom_normal),
        )
        origin = jnp.where(shade[:, None], new_origin, origin)
        direction = jnp.where(shade[:, None], smp.k2, direction)
        inside = jnp.where(shade & transmission, ~inside, inside)
        last_bsdf_pdf = jnp.where(
            shade, jnp.where((smp.event_type & B.BSDF_EVENT_SPECULAR) != 0, 1.0, smp.pdf), last_bsdf_pdf
        )
        throughput = jnp.where(shade[:, None], throughput * smp.bsdf_over_pdf, throughput)

        # ---- Russian roulette (OptixRender.cu:134-147)
        if depth > 3:
            p = jnp.max(throughput, axis=-1)
            kill_rr = rnd(Dim.eRussianRoulette) > p
            throughput = jnp.where(kill_rr[:, None], throughput, throughput / (p + 1e-5)[:, None])
            alive = alive & ~kill_rr
        alive = alive & (_dot(throughput, throughput) >= 1e-5)

    return radiance, first_event


def render_launch(
    scene: DeviceScene,
    params: LaunchParams,
    state: FrameState,
    *,
    width: int,
    height: int,
    samples_per_launch: int,
    max_sample_count: int,
    max_depth: int,
    enable_accumulation: bool,
    rect_light_sampling_method: int = 0,
    shadow_ray_tmin: float = 0.0,
    material_ray_tmin: float = 0.0,
    debug: int = 0,
):
    """__raygen__rg equivalent: run samples_per_launch paths/pixel, update
    the accumulators, and return (new_state, ldr_image_pre_tonemap).

    Returns image in linear HDR; tonemap is applied by the Render host layer
    (matching the reference's separate tonemap kernel dispatch).
    """
    n = width * height
    if debug == 1:
        samples_this_launch = 1
    else:
        samples_this_launch = samples_per_launch
    spl = samples_this_launch

    # All samples of the launch ride ONE wavefront of spl*W*H rays — on TPU a
    # single wide sweep beats spl sequential sweeps (fixed per-op overheads
    # amortize; the Pallas intersector runs at its best with big ray tiles).
    idx = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.tile(idx % jnp.uint32(width), spl)
    py = jnp.tile(idx // jnp.uint32(width), spl)
    s_of_ray = jnp.repeat(jnp.arange(spl, dtype=jnp.uint32), n)
    sample_index = params.subframe_index.astype(jnp.uint32) + s_of_ray
    sample_idx = S.make_sample_index(px, py, sample_index, max_sample_count)
    jxy = S.random_dims(sample_idx, 0, (Dim.ePixelX, Dim.ePixelY))
    jx, jy = jxy[0], jxy[1]
    origin, direction = generate_camera_rays(params, px, py, jx, jy, width, height)
    radiance, first_event = trace_paths(
        scene,
        params,
        sample_idx,
        origin,
        direction,
        max_depth=max_depth,
        rect_light_sampling_method=rect_light_sampling_method,
        shadow_ray_tmin=shadow_ray_tmin,
        material_ray_tmin=material_ray_tmin,
        debug=debug,
    )
    radiance = radiance.reshape(spl, n, 3)
    first_event = first_event.reshape(spl, n)
    result = jnp.sum(radiance, axis=0)
    is_d = first_event == EventType.eDiffuse
    is_s = first_event == EventType.eSpecular
    diffuse_sum = jnp.sum(jnp.where(is_d[..., None], radiance, 0.0), axis=0)
    specular_sum = jnp.sum(jnp.where(is_s[..., None], radiance, 0.0), axis=0)
    dcount = jnp.sum(is_d.astype(jnp.int32), axis=0)
    scount = jnp.sum(is_s.astype(jnp.int32), axis=0)

    shape_img = (height, width, 3)
    result = (result / samples_this_launch).reshape(shape_img)
    exposure = params.exposure
    sub = params.subframe_index

    # --- diffuse/specular AOV accumulation (OptixRender.cu:157-210)
    dcount2 = dcount.reshape(height, width)
    scount2 = scount.reshape(height, width)
    d_mean = (diffuse_sum.reshape(shape_img)) / jnp.maximum(dcount2, 1)[..., None]
    s_mean = (specular_sum.reshape(shape_img)) / jnp.maximum(scount2, 1)[..., None]
    prev_d = jnp.where(sub > 0, state.diffuse_counter, 0)
    prev_s = jnp.where(sub > 0, state.specular_counter, 0)
    new_diffuse = jnp.where(
        (dcount2 > 0)[..., None],
        TM.accumulate(state.diffuse, d_mean, exposure, prev_d),
        jnp.where(sub == 0, jnp.zeros_like(state.diffuse), state.diffuse),
    )
    new_dcount = jnp.where(dcount2 > 0, prev_d + dcount2, jnp.where(sub == 0, 0, state.diffuse_counter))
    new_specular = jnp.where(
        (scount2 > 0)[..., None],
        TM.accumulate(state.specular, s_mean, exposure, prev_s),
        jnp.where(sub == 0, jnp.zeros_like(state.specular), state.specular),
    )
    new_scount = jnp.where(scount2 > 0, prev_s + scount2, jnp.where(sub == 0, 0, state.specular_counter))

    # --- main accumulation (OptixRender.cu:223-247)
    if enable_accumulation and debug == 0:
        new_accum = TM.accumulate(state.accum, result, exposure, sub)
        image = new_accum
    else:
        new_accum = state.accum
        image = result

    if debug == 2:
        image = new_diffuse
    elif debug == 3:
        image = jnp.where((new_scount > 0)[..., None], new_specular, 0.0)

    new_state = FrameState(
        accum=new_accum,
        diffuse=new_diffuse,
        diffuse_counter=new_dcount,
        specular=new_specular,
        specular_counter=new_scount,
    )
    return new_state, image
