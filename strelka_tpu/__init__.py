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

from strelka_tpu.settings import SettingsManager, SharedContext  # noqa: F401
