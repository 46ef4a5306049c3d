"""Multi-chip execution: pixel-row sharding over a jax.sharding.Mesh.

The reference has NO multi-GPU path (SURVEY.md §2.4) — this is the TPU-native
scaling axis prescribed by BASELINE.json: tile pixels across a slice, keep
per-chip accumulators local, and let XLA move only the final framebuffer over
ICI. Rays never cross chips (paths are pixel-local), so the only collective
is the implicit gather when the host reads the image — the cheapest possible
decomposition for a path tracer.

Per-pixel Sobol seeding is GLOBAL (Morton code of absolute pixel coords), so
the sharded render is bitwise identical to the single-chip render.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from strelka_tpu import log


def make_render_mesh(devices: Optional[list] = None, axis_name: str = "rows") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_launch(launch_fn, mesh: Mesh, axis_name: str = "rows"):
    """Wrap a launch(scene, params, state)->(state, image) in row sharding.

    The FrameState arrays ([H,W,...]) and the output image are sharded on
    their leading (row) dim; scene arrays and launch params are replicated.
    XLA then executes the whole wavefront loop chip-locally.
    """
    # FrameState images are planar [3, H, W]; counters [H, W]: shard H rows
    rows_img = NamedSharding(mesh, P(None, axis_name))
    rows_cnt = NamedSharding(mesh, P(axis_name))
    # output frame [H, W, 4]: rows = leading dim
    rows_out = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    def shard_of(x):
        return rows_img if getattr(x, "ndim", 0) == 3 else rows_cnt

    def wrapper(scene, params, state):
        scene = jax.device_put(scene, replicated)
        params = jax.device_put(params, replicated)
        state = jax.tree.map(lambda x: jax.device_put(x, shard_of(x)), state)
        out_shardings = (jax.tree.map(shard_of, state), rows_out)
        fn = jax.jit(launch_fn, out_shardings=out_shardings, donate_argnums=(2,))
        return fn(scene, params, state)

    return wrapper


def num_devices() -> int:
    return jax.device_count()
