"""Interactive viewer — the reference's GLFW/ImGui display loop
(src/app/main.cpp:366-404 + src/display/) on the available display stack.

CameraController ports the FPS control mapping (main.cpp:16-248): WASD +
QE vertical, arrow keys rotate; each camera change resets progressive
accumulation through the render layer's view-change detection.

Usage: python -m strelka_tpu.app.viewer -s builtin://cornell_box --cpu
(MatplotlibDisplay when a GUI exists, HeadlessDisplay with periodic PNG
otherwise.)
"""

from __future__ import annotations

import argparse
import sys
import time

from strelka_tpu import log
from strelka_tpu.app.cli import load_scene
from strelka_tpu.display import DisplayFactory, InputHandler
from strelka_tpu.render.buffer import BufferDesc, BufferFormat
from strelka_tpu.render.render import RenderFactory
from strelka_tpu.settings import SharedContext, make_default_settings
from strelka_tpu.utils.profiling import FrameStats


class CameraController(InputHandler):
    """FPS camera controls (app/main.cpp:16-248 key mapping)."""

    MOVE_KEYS = {
        "w": (0.0, 0.0, -1.0),
        "s": (0.0, 0.0, 1.0),
        "a": (-1.0, 0.0, 0.0),
        "d": (1.0, 0.0, 0.0),
        "q": (0.0, -1.0, 0.0),
        "e": (0.0, 1.0, 0.0),
    }
    ROT_KEYS = {"left": (-5.0, 0.0), "right": (5.0, 0.0), "up": (0.0, -5.0), "down": (0.0, 5.0)}

    def __init__(self, camera, speed: float = 1.0):
        self.camera = camera
        self.speed = speed

    def key_press(self, key: str, action: str) -> None:
        key = (key or "").lower()
        if key in self.MOVE_KEYS:
            d = self.MOVE_KEYS[key]
            self.camera.translate([c * self.speed * 0.25 for c in d])
        elif key in self.ROT_KEYS:
            r, u = self.ROT_KEYS[key]
            self.camera.rotate(r * 8, u * 8)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("strelka-viewer")
    parser.add_argument("-s", "--scene", required=True)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--depth", type=int, default=4)
    parser.add_argument("-t", "--spp-total", type=int, default=512)
    parser.add_argument("-f", "--spp-subframe", type=int, default=1)
    parser.add_argument("--frames", type=int, default=0, help="exit after N frames (0 = run until closed)")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--png-stream", default="", help="headless: write latest frame here every frame")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    settings = make_default_settings(args.width, args.height)
    settings.set("render/pt/sppTotal", args.spp_total)
    settings.set("render/pt/spp", args.spp_subframe)
    settings.set("render/pt/depth", args.depth)
    ctx = SharedContext(settings)
    scene = load_scene(args.scene)

    render = RenderFactory.create_render()
    render.set_scene(scene)
    render.set_shared_context(ctx)
    render.init()
    ctx.render = render

    display = DisplayFactory.create_display(
        png_path=args.png_stream or "/tmp/strelka_view.png", png_every_n=4
    )
    display.init(args.width, args.height, ctx)
    controller = CameraController(scene.get_camera(0), settings.get_float("render/cameraSpeed"))
    display.set_input_handler(controller)

    buf = render.create_buffer(BufferDesc(args.width, args.height, BufferFormat.FLOAT4))
    stats = FrameStats()
    frame = 0
    while not display.window_should_close():
        t0 = time.perf_counter()
        display.poll_events()
        display.on_begin_frame()
        scene.update_camera(controller.camera, 0)
        render.render(buf)
        buf.map()
        display.draw_frame(buf.as_image())
        display.draw_ui()
        display.on_end_frame()
        stats.add_frame(time.perf_counter() - t0)
        display.set_window_title(stats.title(spp=ctx.subframe_index))
        frame += 1
        if args.frames and frame >= args.frames:
            break
    display.destroy()
    log.info("Viewer exited after {} frames ({} spp)", frame, ctx.subframe_index)
    return 0


if __name__ == "__main__":
    sys.exit(main())
