"""Render backend package (layer L1). Lazy exports to avoid import cycles
between ops (device code) and render (host orchestration)."""


def __getattr__(name):
    if name in ("Render", "RenderFactory", "RenderType", "TpuRender"):
        from strelka_tpu.render import render as _r

        return getattr(_r, name)
    if name in ("Buffer", "BufferDesc", "BufferFormat", "ImageBuffer"):
        from strelka_tpu.render import buffer as _b

        return getattr(_b, name)
    raise AttributeError(name)
