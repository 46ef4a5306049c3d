"""Benchmark: Cornell-box progressive render throughput in Mrays/s/chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Ray accounting: the wavefront integrator traces, per pixel sample and bounce,
one radiance ray (closest-hit sweep) and one NEE shadow ray (any-hit sweep).
All lanes execute every bounce (masked SIMD), so rays = W*H*spp*2*max_depth is
the true amount of traversal work performed per launch.

Baseline: the reference publishes no numbers (BASELINE.md); the driver target
is 100 Mrays/s/chip, so vs_baseline = value / 100.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax

    quick = "--quick" in sys.argv
    width = height = 256 if quick else 512
    spp = 2 if quick else 4
    depth = 4

    sys.path.insert(0, ".")
    from __graft_entry__ import _build

    step, (scene, params, state) = _build(width=width, height=height, spp=spp, depth=depth)
    fn = jax.jit(step, donate_argnums=(2,))

    # warmup / compile
    state2, image = fn(scene, params, state)
    image.block_until_ready()

    iters = 3 if quick else 5
    t0 = time.perf_counter()
    st = state2
    for _ in range(iters):
        st, image = fn(scene, params, st)
    image.block_until_ready()
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
