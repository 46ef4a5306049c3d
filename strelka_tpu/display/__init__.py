from strelka_tpu.display.display import (  # noqa: F401
    Display,
    DisplayFactory,
    HeadlessDisplay,
    InputHandler,
    MatplotlibDisplay,
    ResizeHandler,
)


def __getattr__(name):  # lazy: web server module only when asked for
    if name == "WebDisplay":
        from strelka_tpu.display.web import WebDisplay

        return WebDisplay
    raise AttributeError(name)
