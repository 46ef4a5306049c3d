"""strelka_tpu — a TPU-native progressive physically-based path-tracing framework.

A ground-up re-design of the capabilities of the Strelka renderer
(reference: arhix52/Strelka, C++/OptiX/Metal) for TPU hardware:

* device compute path is JAX/XLA + Pallas (wavefront path tracing over a
  pixel-sharded ``jax.sharding.Mesh``),
* host orchestration is Python (scene model, loaders, settings, CLI),
* hot host-side preprocessing (LBVH build) has a native C++ path.

Layer map (mirrors reference layers, see SURVEY.md §1):
  L0 device kernels   -> strelka_tpu.ops        (sampler, intersect, bsdf, ...)
  L1 host render      -> strelka_tpu.render     (Render, Buffer, factory)
  L2 materials        -> strelka_tpu.materials  (MaterialManager equivalent)
  L3 scene model      -> strelka_tpu.scene      (Scene, Camera, lights)
  L4 scene ingestion  -> strelka_tpu.loaders    (glTF, USDA subset)
  L5 Hydra-style      -> strelka_tpu.hydra      (render delegate shaped API)
  L6 applications     -> strelka_tpu.app        (CLI runner, usd_runner)
  X2 config           -> strelka_tpu.settings   (SettingsManager)
  X3 logging          -> strelka_tpu.log
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (the analog of the driver-side OptiX
    pipeline cache): makes repeated launch configs compile once per machine."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "STRELKA_XLA_CACHE", _os.path.expanduser("~/.cache/strelka_tpu_xla")
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


_enable_compilation_cache()

from strelka_tpu.settings import SettingsManager, SharedContext  # noqa: F401
