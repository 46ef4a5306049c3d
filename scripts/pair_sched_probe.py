"""Price the pair-expansion SCHEDULING overheads on hardware (r4 de-risk
for the fact-#43 invert-loop build): on the captured bounce-1 wavefront,
jit + time the full per-ray pair pipeline EXCEPT the intersect kernel —

  1. per-ray demand matrix D [N, nsb] (chunked slab test),
  2. per-block counting sort into chunk-padded, block-grouped pair slots
     (column cumsum + one scatter),
  3. packed row-gather of ray state into pair order,
  4. scatter-min of per-pair results back to rays (t, then prim by
     equality — the two-scatter combine the real path needs),

with a stand-in per-pair "result" (the pair's slab tnear). The measured
ms/sweep is the fixed tax the pair path pays to buy the oracle's 4.4x
sweep-work reduction (43.4 -> 9.8 lane-block units per ray).

    python scripts/pair_sched_probe.py 48        # runs on the TPU tunnel
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
CHUNK = int(os.environ.get("PAIR_CHUNK", "512"))
K_CAP = int(os.environ.get("PAIR_K_CAP", "24"))  # oracle: mean 9.8, p90 14, max 51

rays = np.load("/tmp/bounce_rays_%d.npz" % grid)

from strelka_tpu.ops.pallas_intersect import super_bounds_jnp
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import box_field

scene = build_device_scene(box_field(grid=grid))
sbounds = super_bounds_jnp(scene.tri_bounds, scene.kernel_super)
nsb = sbounds.shape[1]
N = rays["ox"].shape[0]
P_CAP = N * K_CAP // 2 + nsb * CHUNK  # mean demand 9.8 << K_CAP/2

o = [jnp.asarray(rays[k]) for k in ("ox", "oy", "oz")]
d = [jnp.asarray(rays[k]) for k in ("dx", "dy", "dz")]
alive = jnp.asarray(rays["alive"])
tmin = jnp.zeros(N, jnp.float32)
tmax = jnp.where(alive, 1e16, 0.0).astype(jnp.float32)
state = jnp.stack(o + d + [tmin, tmax], axis=1)  # [N, 8] packed ray rows


STAGE = int(os.environ.get("PAIR_STAGE", "4"))  # 1 demand, 2 +sort, 3 +gather, 4 full


@jax.jit
def schedule(o0, o1, o2, d0, d1, d2, tmin, tmax, state):
    # --- 1. demand matrix + per-pair tnear, chunked over blocks ---------
    inv = [1.0 / jnp.where(jnp.abs(c) > 1e-20, c, 1e-20) for c in (d0, d1, d2)]
    oo = (o0, o1, o2)
    tn_cols = []
    for c0 in range(0, nsb, 64):
        c1 = min(c0 + 64, nsb)
        tn = jnp.broadcast_to(tmin[:, None], (N, c1 - c0))
        tf = jnp.broadcast_to(tmax[:, None], (N, c1 - c0))
        for c in range(3):
            lo = sbounds[c, c0:c1][None, :]
            hi = sbounds[3 + c, c0:c1][None, :]
            t0 = (lo - oo[c][:, None]) * inv[c][:, None]
            t1 = (hi - oo[c][:, None]) * inv[c][:, None]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        vb = (
            (sbounds[0, c0:c1] <= sbounds[3, c0:c1])
            & (sbounds[1, c0:c1] <= sbounds[4, c0:c1])
        )[None, :]
        tn_cols.append(jnp.where((tn <= tf) & (tn < tmax[:, None]) & vb, tn, jnp.inf))
    tn_all = jnp.concatenate(tn_cols, axis=1)  # [N, nsb], inf = no demand
    D = jnp.isfinite(tn_all)
    if STAGE == 1:
        z = D.sum()
        return z, z.astype(jnp.float32), z

    # --- 2. block-grouped chunk-padded pair slots -----------------------
    Di = D.astype(jnp.int32)
    counts = Di.sum(axis=0)  # [nsb]
    padded = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1]])
    rank = jnp.cumsum(Di, axis=0) - 1  # [N, nsb] rank within block
    pos = jnp.where(D, offsets[None, :] + rank, P_CAP)  # pad slot = P_CAP
    ray_of_pair = jnp.full(P_CAP + 1, N, jnp.int32)
    ridx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, nsb))
    ray_of_pair = ray_of_pair.at[pos.reshape(-1)].set(ridx.reshape(-1))
    ray_of_pair = ray_of_pair[:P_CAP]
    tn_of_pair = jnp.full(P_CAP + 1, jnp.inf, jnp.float32)
    tn_of_pair = tn_of_pair.at[pos.reshape(-1)].set(tn_all.reshape(-1))[:P_CAP]
    n_pairs = padded.sum()
    if STAGE == 2:
        return n_pairs, tn_of_pair.sum(), ray_of_pair.sum()

    # --- 3. packed row-gather of ray state into pair order --------------
    state_pad = jnp.concatenate([state, jnp.zeros((1, state.shape[1]), state.dtype)])
    pair_state = state_pad[jnp.minimum(ray_of_pair, N)]  # [P_CAP, 8]
    if STAGE == 3:
        return n_pairs, pair_state.sum(), ray_of_pair.sum()

    # --- 4. scatter-min combine back to rays (t, then prim by equality) -
    fake_t = tn_of_pair + pair_state[:, 7] * 0.0  # consume the gather
    best = jnp.full(N + 1, 1e16, jnp.float32).at[ray_of_pair].min(
        jnp.where(jnp.isfinite(fake_t), fake_t, 1e16)
    )
    t_back = best[jnp.minimum(ray_of_pair, N)]
    is_best = fake_t == t_back
    fake_prim = ray_of_pair * 7  # stand-in per-pair prim id
    prim = jnp.full(N + 1, -1, jnp.int32).at[ray_of_pair].max(
        jnp.where(is_best, fake_prim, -1)
    )
    return n_pairs, best[:N], prim[:N]


def _sync(x):
    a = np.asarray(x)
    return a if a.ndim == 0 else a.ravel()[0]


args = o + d + [tmin, tmax, state]
t0 = time.perf_counter()
n_pairs, best, prim = schedule(*args)
_sync(best)
print(f"compile+first {time.perf_counter() - t0:.1f}s", flush=True)
times = []
for _ in range(6):
    t0 = time.perf_counter()
    n_pairs, best, prim = schedule(*args)
    _sync(best)
    times.append(time.perf_counter() - t0)
npairs = int(np.asarray(n_pairs)) if STAGE >= 2 else -1
alive_n = int(np.asarray(alive).sum())
print(f"pairs={npairs} ({npairs / alive_n:.1f}/alive ray, cap {P_CAP})")
print(f"schedule+gather+scatter overhead: {np.mean(times[1:]) * 1e3:.1f} ms/sweep "
      f"(min {np.min(times) * 1e3:.1f})")
