from strelka_tpu.display.display import (  # noqa: F401
    Display,
    DisplayFactory,
    HeadlessDisplay,
    InputHandler,
    MatplotlibDisplay,
    ResizeHandler,
)
