"""Benchmark: Cornell-box progressive render throughput in Mrays/s/chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Ray accounting: per pixel sample and bounce the integrator traces one
radiance ray (closest-hit sweep) and one NEE shadow ray (any-hit sweep); all
lanes run every bounce (masked SIMD), so rays = W*H*spp*2*depth per launch.

Timing: many launches chained, ONE hard sync at the end (np.asarray of a
pixel) — block_until_ready does not reliably wait on the axon TPU tunnel, and
per-launch syncs add ~25ms of tunnel round trip.

Baseline: the reference publishes no numbers (BASELINE.md); the driver target
is 100 Mrays/s/chip, so vs_baseline = value / 100.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    quick = "--quick" in sys.argv
    width = height = 256 if quick else 512
    spp = 2 if quick else 4
    depth = 4
    iters = 8 if quick else 16

    sys.path.insert(0, ".")
    from __graft_entry__ import _build

    step, (scene, params, state) = _build(width=width, height=height, spp=spp, depth=depth)
    fn = jax.jit(step, donate_argnums=(2,))

    # warmup / compile, then hard sync
    state, image = fn(scene, params, state)
    _ = np.asarray(image[0, 0])

    t0 = time.perf_counter()
    st = state
    for _ in range(iters):
        st, image = fn(scene, params, st)
    _ = np.asarray(image[0, 0])  # hard sync
    dt = (time.perf_counter() - t0) / iters

    rays = width * height * spp * 2 * depth
    mrays = rays / dt / 1e6
    n_chips = jax.device_count()
    result = {
        "metric": "cornell_box_mrays_per_sec_per_chip",
        "value": round(mrays / max(n_chips, 1), 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / max(n_chips, 1) / 100.0, 3),
        "config": f"{width}x{height} spp={spp} depth={depth} iters={iters}",
        "ms_per_launch": round(dt * 1e3, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
