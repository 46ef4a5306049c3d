"""Temporal hit prediction for incoherent bounce wavefronts.

Progressive rendering re-traces statistically similar rays every launch: a
bounce ray leaving cell C in direction octant O tends to hit the same
triangle superblock as the last launch's rays that left C toward O. A
persistent hash table (FrameState.hit_cache) maps
hash(position cell, direction octant) -> superblock id of the LAST closest
hit with that key. Per bounce the integrator gathers predictions, sorts the
wavefront predicted-block-major (tiles become block-pure), and the
intersector sweeps each tile's predicted blocks FIRST — one work-list step
primes tmax for the whole tile — before the standard residual phase 2
finishes the open lanes (strelka_tpu/ops/intersect.py:_closest_predicted).

This replaces the K-nearest-superblock phase 1 of the residual two-pass,
whose cost is per-TILE-union MT work (NOTES fact #24: K=16 on a 411k-tri
scene is ~516 GFLOP of mostly-unculled slab-passing sub-blocks). Prediction
is the per-RAY block assignment that rectangular scheduling cannot express.

The capability replaced from the reference: OptiX's hardware per-ray BVH
traversal order (/root/reference/src/render/optix/OptixRender.cpp:1010-1011)
— the RT cores give every ray its own near-to-far block schedule; this cache
recovers a statistical approximation of it for lockstep tiles. Adapted from
the temporal-hit-caching idea of arXiv:1910.01304 (see PAPERS.md #2).

Correctness does not depend on prediction quality: phase 1 only PRIMES
tmax; the residual open test (pallas_open_w) conservatively re-opens any
lane whose unswept superblocks could still beat its bound, and phase 2
completes them. A cold or thrashing cache only costs speed.
"""

from __future__ import annotations

import os as _os

import jax.numpy as jnp

# table size (entries, power of two). 2^20 x i32 = 4 MiB device-resident.
CACHE_BITS = int(_os.environ.get("STRELKA_HIT_CACHE_BITS", "20"))
# position-cell resolution: 2^CELL_BITS cells per world-AABB axis.
# scripts/predict_rate_probe.py scan (box_field 103k tris, 4 warm launches):
# cell=6/dir=2 maximizes overall hit rate (0.52; coverage 0.89 x cond 0.58) —
# finer keys lose more coverage than they gain accuracy.
CELL_BITS = int(_os.environ.get("STRELKA_PRED_CELL_BITS", "6"))
# direction quantization: 2^DIR_BITS bins per direction component (1 =
# octant). Finer bins raise conditional accuracy at the cost of coverage
# density (measured by scripts/predict_rate_probe.py).
DIR_BITS = int(_os.environ.get("STRELKA_PRED_DIR_BITS", "2"))
# phase-1 work-list capacity per ray tile (distinct predicted superblocks in
# one tile after the predicted-major sort; overflow skips the predicted pass)
PRED_CAP = int(_os.environ.get("STRELKA_PRED_CAP", "8"))
# K-nearest superblocks swept alongside the predicted block in phase 1.
# Prediction alone primes a TIGHT bound but cannot CLOSE a lane (every
# unswept block entering before the hit keeps it open); the K nearest are
# exactly those blocks. 0 = pure prediction (scan option). Open-fraction sim
# at 411k tris/202 superblocks: K=16+pred open=0.54 vs 0.65 without pred.
PRED_K = int(_os.environ.get("STRELKA_PRED_K", "16"))


def enabled() -> bool:
    """Master switch (STRELKA_HIT_PREDICT env, else tuned.json, else off;
    the integrator additionally requires the residual path and sort_rays)."""
    from strelka_tpu import tuned

    return tuned.get_bool("hit_predict", False)


def make_cache(n_entries: int | None = None) -> jnp.ndarray:
    """[H] i32, -1 = no prediction."""
    h = n_entries if n_entries is not None else (1 << CACHE_BITS)
    return jnp.full(h, -1, jnp.int32)


def ray_hash(scene, origin, direction, n_entries: int) -> jnp.ndarray:
    """[N] i32 table index: position cell (2^CELL_BITS per axis over the
    static world AABB) + direction octant, mixed with distinct odd constants
    (Teschner-style spatial hash). Elementwise — safe to recompute after any
    wavefront permutation."""
    lo, hi = scene.world_lo, scene.world_hi
    scale = float(1 << CELL_BITS) - 1.0

    def q(c, lo_c, hi_c):
        ext = max(hi_c - lo_c, 1e-9)
        x = jnp.clip((c - lo_c) * (1.0 / ext), 0.0, 1.0)
        return (x * scale).astype(jnp.uint32)

    cx = q(origin.x, lo[0], hi[0])
    cy = q(origin.y, lo[1], hi[1])
    cz = q(origin.z, lo[2], hi[2])
    dscale = float(1 << DIR_BITS) - 1.0

    def qd(c):
        x = jnp.clip((c + 1.0) * 0.5, 0.0, 1.0)
        return (x * dscale).astype(jnp.uint32)

    dbin = (
        qd(direction.x)
        | (qd(direction.y) << DIR_BITS)
        | (qd(direction.z) << (2 * DIR_BITS))
    )
    h = (
        cx * jnp.uint32(0x9E3779B1)
        ^ cy * jnp.uint32(0x85EBCA77)
        ^ cz * jnp.uint32(0xC2B2AE3D)
        ^ dbin * jnp.uint32(0x27D4EB2F)
    )
    h = h ^ (h >> 15)
    if n_entries & (n_entries - 1) == 0:
        return (h & jnp.uint32(n_entries - 1)).astype(jnp.int32)
    # non-power-of-two table (e.g. a sharded slice of one): modulo fallback
    return (h % jnp.uint32(n_entries)).astype(jnp.int32)


def predict(cache: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[N] i32 predicted superblock ids (-1 unknown). One [N] gather."""
    return cache[idx]


def update(cache: jnp.ndarray, idx: jnp.ndarray, superblock: jnp.ndarray,
           valid: jnp.ndarray) -> jnp.ndarray:
    """Write superblock ids for valid lanes (last-writer-wins on collisions).
    Invalid lanes scatter out of bounds and are dropped — ONE [N] scatter."""
    h = cache.shape[0]
    tgt = jnp.where(valid, idx, h)
    return cache.at[tgt].set(superblock, mode="drop")
