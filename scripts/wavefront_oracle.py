"""Union-demand oracle for the work-list sweeps (r5 task 1).

On a CPU re-creation of the REAL bounce-1 wavefront (closest rays AND the
NEE shadow rays the integrator would trace), measure at each candidate ray
tile size:
  - per-tile union demand (the pairs the work list enumerates)
  - the pair count vs the SMEM cap at 4-word and 1-word wl encodings
  - the rolling-tmax skip potential (pairs whose slab entry lies beyond the
    tile's ALL-rays-converged bound under near-to-far order)

per-RAY demand is the perfect-coherence floor (coherence_probe.py measured
13.9x tile-union waste on the kitchen bounce wavefront at tile=1024).

    python scripts/wavefront_oracle.py kitchen
    python scripts/wavefront_oracle.py box:48
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")  # axon tunnel IGNORES the env var
import jax.numpy as jnp

from strelka_tpu.ops import integrator as I
from strelka_tpu.ops import vec as V
from strelka_tpu.ops.intersect import intersect_closest, offset_ray_vec
from strelka_tpu.ops.pallas_intersect import super_bounds_jnp
from strelka_tpu.ops.vec import Vec3
from strelka_tpu.render.device_scene import RAY_MASK_PRIMARY, build_device_scene

scene_name = sys.argv[1] if len(sys.argv) > 1 else "kitchen"
W = H = 512

from perf_probe import build  # scene builders (kitchen/cornell/box:N)

_, scene, params, state, ntri = build(scene_name, W, H, 1, 1, intersector="auto")
host = None
# keep the pallas BLOCK LAYOUT (kernel_super/tri_bounds) for the demand
# analysis, but trace the bounce wavefront itself through the BVH path —
# pallas_call has no CPU lowering outside interpret mode
scene = dataclasses.replace(scene, use_pallas=False)
print(f"{scene_name}: {ntri} tris", flush=True)

N = W * H
zo, _ = I._pixel_zorder(W, H)
px = jnp.asarray(zo % W, jnp.uint32)
py = jnp.asarray(zo // W, jnp.uint32)
o, d = I.generate_camera_rays(params, px, py, jnp.zeros(N), jnp.zeros(N), W, H)
tmin = jnp.zeros(N, jnp.float32)
tmax = jnp.full(N, 1e16, jnp.float32)

t0 = time.time()


@jax.jit
def bounce(o, d):
    hit = intersect_closest(scene, o, d, tmin, tmax, RAY_MASK_PRIMARY)
    alive = hit.prim >= 0
    position, _uv, frame, *_ = I._gather_surface(scene, hit, jnp.zeros(N, bool))
    k = jax.random.split(jax.random.PRNGKey(7), 3)
    u1 = jax.random.uniform(k[0], (N,))
    u2 = jax.random.uniform(k[1], (N,))
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    nd = (
        frame.tangent_u * (r * jnp.cos(phi))
        + frame.tangent_v * (r * jnp.sin(phi))
        + frame.normal * jnp.sqrt(jnp.maximum(1 - u1, 0.0))
    )
    nd = V.normalize(Vec3(nd.x, nd.y, nd.z))
    no = offset_ray_vec(position, frame.geom_normal)
    # NEE shadow ray: uniform point on a uniformly-chosen light quad
    pts = scene.lights.points  # [L, P, 3] corner points
    nl = max(int(pts.shape[0]), 1)
    li = jax.random.randint(k[2], (N,), 0, nl)
    p0, p1, p3 = pts[li, 0], pts[li, 1], pts[li, 3 % pts.shape[1]]
    u3 = jax.random.uniform(jax.random.PRNGKey(11), (N, 2))
    lp = Vec3(
        p0[:, 0] + (p1[:, 0] - p0[:, 0]) * u3[:, 0] + (p3[:, 0] - p0[:, 0]) * u3[:, 1],
        p0[:, 1] + (p1[:, 1] - p0[:, 1]) * u3[:, 0] + (p3[:, 1] - p0[:, 1]) * u3[:, 1],
        p0[:, 2] + (p1[:, 2] - p0[:, 2]) * u3[:, 0] + (p3[:, 2] - p0[:, 2]) * u3[:, 1],
    )
    sd = Vec3(lp.x - no.x, lp.y - no.y, lp.z - no.z)
    dist = jnp.sqrt(sd.x**2 + sd.y**2 + sd.z**2)
    sd = V.normalize(sd)
    key = I._ray_sort_key(scene, no, nd)
    key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(key)
    # closest t of the BOUNCE rays (for the termination-floor stat)
    hit2 = intersect_closest(
        scene, no, nd, tmin, jnp.where(alive, 1e16, 0.0), RAY_MASK_PRIMARY,
        exclude=hit.prim,
    )
    return no, nd, sd, dist, alive, perm, hit2.t


no, nd, sd, dist, alive, perm, t2 = bounce(o, d)
print(f"bounce trace {time.time()-t0:.0f}s alive={float(alive.mean()):.3f}", flush=True)

perm = np.asarray(perm)
o_np = [np.asarray(c)[perm] for c in (no.x, no.y, no.z)]
alive_np = np.asarray(alive)[perm]
t2_np = np.asarray(t2)[perm]


def demand_and_entry(sb_np, o, d, tmin_np, tmax_np):
    """([N, nsb] bool demand, [N, nsb] f32 slab entry distance)."""
    nsb = sb_np.shape[1]
    n = o[0].shape[0]
    D = np.zeros((n, nsb), bool)
    TN = np.full((n, nsb), np.inf, np.float32)
    inv = [1.0 / np.where(np.abs(c) > 1e-20, c, 1e-20) for c in d]
    chunk = 64
    for c0 in range(0, nsb, chunk):
        c1 = min(c0 + chunk, nsb)
        tn = np.broadcast_to(tmin_np[:, None], (n, c1 - c0)).copy()
        tf = np.broadcast_to(tmax_np[:, None], (n, c1 - c0)).copy()
        for c in range(3):
            lo = sb_np[c, c0:c1][None, :]
            hi = sb_np[3 + c, c0:c1][None, :]
            t0 = (lo - o[c][:, None]) * inv[c][:, None]
            t1 = (hi - o[c][:, None]) * inv[c][:, None]
            np.maximum(tn, np.minimum(t0, t1), out=tn)
            np.minimum(tf, np.maximum(t0, t1), out=tf)
        vb = (
            (sb_np[0, c0:c1] <= sb_np[3, c0:c1])
            & (sb_np[1, c0:c1] <= sb_np[4, c0:c1])
            & (sb_np[2, c0:c1] <= sb_np[5, c0:c1])
        )[None, :]
        ok = (tn <= tf) & (tn < tmax_np[:, None]) & vb
        D[:, c0:c1] = ok
        TN[:, c0:c1] = np.where(ok, tn, np.inf)
    return D, TN


def report(label, o, d, tmin_np, tmax_np, term_t=None, fine=False):
    """fine=True measures demand at tblk-block granularity (tri_bounds) —
    the candidate wl_fine schedule (super_=1) — instead of superblocks."""
    if fine:
        sb = scene.tri_bounds[:8]
    else:
        sb = super_bounds_jnp(scene.tri_bounds, scene.kernel_super)
    sb_np = np.asarray(sb)
    nsb = sb_np.shape[1]
    D, TN = demand_and_entry(sb_np, o, d, tmin_np, tmax_np)
    per_ray = D.sum(1)
    pr = per_ray[tmax_np > 0]
    print(f"\n== {label}: nsb={nsb} rays={len(pr)}")
    print(
        f"  per-RAY demand: mean={pr.mean():.1f} p50={np.median(pr):.0f} "
        f"p90={np.percentile(pr, 90):.0f}"
    )
    if term_t is not None:
        # termination floor: blocks whose entry <= the ray's closest hit t
        TT = np.where(tmax_np > 0, term_t, 0.0)
        Dt = D & (TN <= TT[:, None])
        pt = Dt.sum(1)[tmax_np > 0]
        print(
            f"  terminated per-RAY: mean={pt.mean():.1f} p50={np.median(pt):.0f} "
            f"p90={np.percentile(pt, 90):.0f}"
        )
    n = D.shape[0]
    for tile in (1024, 512, 256, 128):
        nt = n // tile
        Dt = D[: nt * tile].reshape(nt, tile, nsb)
        union = Dt.any(1)
        pairs = int(union.sum())
        work = (union.sum(1) * tile).sum()
        # rolling-tmax tile skip: near-to-far, a pair is skippable once every
        # ray in the tile has its closest hit before the pair's min entry
        skip_note = ""
        if term_t is not None:
            TNt = TN[: nt * tile].reshape(nt, tile, nsb)
            tile_entry = np.where(union, TNt.min(1), np.inf)
            tile_done = np.where(
                (tmax_np[: nt * tile].reshape(nt, tile) > 0),
                term_t[: nt * tile].reshape(nt, tile),
                0.0,
            ).max(1)
            live = union & (tile_entry <= tile_done[:, None])
            skip_note = f" live-pairs={int(live.sum()):7d} ({live.sum()/max(pairs,1)*100:.0f}%)"
        print(
            f"  tile {tile:5d}: union mean={union.sum(1).mean():6.1f} pairs={pairs:7d} "
            f"work/ray-demand={work / max(per_ray.sum(), 1):5.2f}x"
            f" smem4w={pairs*16/1024:.0f}KB smem1w={pairs*4/1024:.0f}KB" + skip_note
        )


tmax_b = np.where(alive_np, 1e16, 0.0).astype(np.float32)
d_np = [np.asarray(c)[perm] for c in (nd.x, nd.y, nd.z)]
report("bounce closest", o_np, d_np, np.zeros(N, np.float32), tmax_b, term_t=t2_np)
report("bounce closest FINE", o_np, d_np, np.zeros(N, np.float32), tmax_b,
       term_t=t2_np, fine=True)

sd_np = [np.asarray(c)[perm] for c in (sd.x, sd.y, sd.z)]
dist_np = np.asarray(dist)[perm]
tmax_s = np.where(alive_np, dist_np * 0.999, 0.0).astype(np.float32)
report("shadow any", o_np, sd_np, np.zeros(N, np.float32), tmax_s)
report("shadow any FINE", o_np, sd_np, np.zeros(N, np.float32), tmax_s, fine=True)
