"""Count-vs-cap probe for the phase-2 work list (fact #33 follow-up).

Before any small-tile p2 schedule is retried on hardware, measure how many
(tile, superblock) pairs the REAL bounce wavefront demands at each candidate
tile vs the SMEM entry budget's cap — a count > cap means the lax.cond takes
the rectangular fallback EVERY sweep (baseline cost + wasted wl prep, the
suspected mechanism of the p2_tile=256 hardware loss).

Runs on CPU (interpret-mode pallas). Usage:
    python scripts/capture_bounce.py 48        # once, any backend
    JAX_PLATFORMS=cpu python scripts/wl_count_probe.py 48 1024 512 256
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
tiles = [int(t) for t in sys.argv[2:]] or [1024, 512, 256]

path = "/tmp/bounce_rays_%d.npz" % grid
if not os.path.exists(path):
    raise SystemExit(f"{path} missing - run scripts/capture_bounce.py {grid} first")
rays = np.load(path)

from strelka_tpu.ops import intersect as X
from strelka_tpu.ops import vec as V
from strelka_tpu.ops.pallas_intersect import (
    build_worklist,
    pallas_open_w,
    super_bounds_jnp,
    tile_box_d2,
)
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import box_field

scene = build_device_scene(box_field(grid=grid))
sbounds = super_bounds_jnp(scene.tri_bounds, scene.kernel_super)
nsb = int(sbounds.shape[1])

o = V.Vec3(*(jnp.asarray(rays[k]) for k in ("ox", "oy", "oz")))
d = V.Vec3(*(jnp.asarray(rays[k]) for k in ("dx", "dy", "dz")))
alive = jnp.asarray(rays["alive"])
n = int(alive.shape[0])
tmin = jnp.zeros(n, jnp.float32)
tmax = jnp.where(alive, 1e16, 0.0).astype(jnp.float32)

# phase-2 demand: open fraction after the K-ball is ~0.2 on box_field; the
# open lanes compact to the FRONT, so the work list's densest tiles are the
# first ceil(0.2*n/tile). Model it pessimistically with the FULL wavefront
# (upper bound) and with the front 25% (realistic compacted shape).
for frac, label in ((1.0, "full"), (0.25, "front-quarter")):
    m = max(1, int(n * frac)) // 1024 * 1024 or 1024
    om = V.Vec3(o.x[:m], o.y[:m], o.z[:m])
    dm = V.Vec3(d.x[:m], d.y[:m], d.z[:m])
    for tile in tiles:
        d2m = tile_box_d2(om, sbounds, tile)
        no_open = jnp.full(d2m.shape[0], jnp.inf, jnp.float32)
        _, W, _ = pallas_open_w(om, dm, tmin[:m], tmax[:m], sbounds, d2m, no_open, tile)
        n_tiles = -(-m // tile)
        per_tile = X._wl_cap_per_tile(nsb, n_tiles)
        cap = n_tiles * per_tile
        wl, count, _ = build_worklist(W, d2m, cap)
        rowc = np.asarray(W.sum(axis=1))
        print(
            f"{label:14s} tile={tile:5d} n_tiles={n_tiles:5d} nsb={nsb:4d} "
            f"cap/tile={per_tile:3d} cap={cap:6d} count={int(count):6d} "
            f"overflow={'YES' if int(count) > cap else 'no '} "
            f"row mean/p95/max={rowc.mean():.1f}/{np.percentile(rowc, 95):.0f}/{rowc.max():.0f}",
            flush=True,
        )
