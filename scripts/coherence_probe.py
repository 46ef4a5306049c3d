"""Coherence-headroom probe (r4): on the REAL captured bounce-1 wavefront,
compare per-RAY demanded superblocks (the perfect-coherence floor) against
the per-TILE union demand the dense/work-list sweeps actually pay, at
several tile sizes and both block granularities.

If per-tile union >> per-ray demand, sort keys / smaller tiles have
headroom; if they're close, the sweep architecture is at its structural
floor and the next 2x must come from somewhere else (MXU, finer blocks,
algorithmic change).

    JAX_PLATFORMS=cpu python scripts/coherence_probe.py 48
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # axon tunnel IGNORES the env var
import jax.numpy as jnp

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
path = "/tmp/bounce_rays_%d.npz" % grid
rays = np.load(path)

from strelka_tpu.ops import vec as V
from strelka_tpu.ops.pallas_intersect import super_bounds_jnp
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import box_field

scene = build_device_scene(box_field(grid=grid))


def demand_matrix(sbounds_np, o, d, tmin, tmax):
    """[N, nsb] bool: ray i enters block b's AABB within its segment."""
    nsb = sbounds_np.shape[1]
    n = o[0].shape[0]
    out = np.zeros((n, nsb), bool)
    inv = [1.0 / np.where(np.abs(c) > 1e-20, c, 1e-20) for c in d]
    chunk = 64
    for c0 in range(0, nsb, chunk):
        c1 = min(c0 + chunk, nsb)
        tn = np.broadcast_to(tmin[:, None], (n, c1 - c0)).copy()
        tf = np.broadcast_to(tmax[:, None], (n, c1 - c0)).copy()
        for c in range(3):
            lo = sbounds_np[c, c0:c1][None, :]
            hi = sbounds_np[3 + c, c0:c1][None, :]
            t0 = (lo - o[c][:, None]) * inv[c][:, None]
            t1 = (hi - o[c][:, None]) * inv[c][:, None]
            np.maximum(tn, np.minimum(t0, t1), out=tn)
            np.minimum(tf, np.maximum(t0, t1), out=tf)
        vb = (
            (sbounds_np[0, c0:c1] <= sbounds_np[3, c0:c1])
            & (sbounds_np[1, c0:c1] <= sbounds_np[4, c0:c1])
            & (sbounds_np[2, c0:c1] <= sbounds_np[5, c0:c1])
        )[None, :]
        out[:, c0:c1] = (tn <= tf) & (tn < tmax[:, None]) & vb
    return out


o = [np.asarray(rays[k]) for k in ("ox", "oy", "oz")]
d = [np.asarray(rays[k]) for k in ("dx", "dy", "dz")]
alive = np.asarray(rays["alive"])
n = alive.shape[0]
tmin = np.zeros(n, np.float32)
tmax = np.where(alive, 1e16, 0.0).astype(np.float32)

# the permutation the integrator's wavefront sort would apply
perm = np.asarray(rays["perm"]) if "perm" in rays.files else None
if perm is not None:
    o = [c[perm] for c in o]
    d = [c[perm] for c in d]
    alive = alive[perm]
    tmax = tmax[perm]

for label, super_ in (("superblock-2048", scene.kernel_super), ("subblock-256", 1)):
    sb = super_bounds_jnp(scene.tri_bounds, super_)
    sb_np = np.asarray(sb)
    nsb = sb_np.shape[1]
    D = demand_matrix(sb_np, o, d, tmin, tmax)
    per_ray = D.sum(1)
    pr_alive = per_ray[alive]
    print(f"\n== {label}: nsb={nsb} alive={alive.mean():.3f}")
    print(
        f"per-RAY demand: mean={pr_alive.mean():.1f} median={np.median(pr_alive):.0f} "
        f"p90={np.percentile(pr_alive, 90):.0f} max={pr_alive.max()}"
    )
    for tile in (1024, 512, 256, 128):
        nt = n // tile
        Dt = D[: nt * tile].reshape(nt, tile, nsb)
        union = Dt.any(1).sum(1)  # per-tile union demand
        # swept tris per ray = union * tris_per_block; per-ray useful = per_ray
        total_union_work = (union * tile).sum()  # ray-block pairs swept
        total_ray_work = per_ray.sum()  # ray-block pairs demanded
        print(
            f"tile {tile:5d}: union mean={union.mean():7.1f}  "
            f"sweep/demand waste = {total_union_work / max(total_ray_work, 1):.2f}x"
        )
