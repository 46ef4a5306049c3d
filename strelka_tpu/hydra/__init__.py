from strelka_tpu.hydra.delegate import (  # noqa: F401
    HdStrelkaDriverName,
    SimpleRenderTask,
    StrelkaRenderDelegate,
    StrelkaRendererPlugin,
    StrelkaRenderPass,
)
