from strelka_tpu.hydra.delegate import (  # noqa: F401
    HdStrelkaDriverName,
    StrelkaRenderDelegate,
    StrelkaRendererPlugin,
    StrelkaRenderPass,
)
