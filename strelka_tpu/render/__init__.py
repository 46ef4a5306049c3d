from strelka_tpu.render.render import Render, RenderFactory, RenderType  # noqa: F401
from strelka_tpu.render.buffer import Buffer, BufferDesc, BufferFormat, ImageBuffer  # noqa: F401
