"""Hydra delegate, usd_runner CLI, and display layer tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

STAGE = """#usda 1.0
(
    defaultPrim = "World"
)
def Xform "World"
{
    def Mesh "floor"
    {
        point3f[] points = [(-3, 0, -3), (3, 0, -3), (3, 0, 3), (-3, 0, 3)]
        int[] faceVertexIndices = [0, 3, 2, 1]
        int[] faceVertexCounts = [4]
        normal3f[] normals = [(0, 1, 0), (0, 1, 0), (0, 1, 0), (0, 1, 0)]
    }
    def Camera "cam"
    {
        float focalLength = 35
        double3 xformOp:translate = (0, 2, 6)
        double3 xformOp:rotateXYZ = (-15, 0, 0)
        uniform token[] xformOpOrder = ["xformOp:translate", "xformOp:rotateXYZ"]
    }
    def DistantLight "sun"
    {
        float inputs:intensity = 5000
        float inputs:angle = 1
        double3 xformOp:rotateXYZ = (-50, 20, 0)
        uniform token[] xformOpOrder = ["xformOp:rotateXYZ"]
    }
}
"""


def test_delegate_api_shape(tmp_path):
    from strelka_tpu.hydra import HdStrelkaDriverName, StrelkaRendererPlugin
    from strelka_tpu.settings import SharedContext, make_default_settings

    p = tmp_path / "stage.usda"
    p.write_text(STAGE)
    settings = make_default_settings(24, 24)
    settings.set("render/pt/sppTotal", 2)
    settings.set("render/pt/spp", 2)
    ctx = SharedContext(settings)

    assert StrelkaRendererPlugin.is_supported()
    delegate = StrelkaRendererPlugin.create_render_delegate()
    assert "Mesh" in delegate.SUPPORTED_RPRIM_TYPES
    assert "mdl" in delegate.get_material_render_contexts()
    # missing driver -> error (RenderDelegate asserts on driver)
    with pytest.raises(ValueError):
        delegate.set_drivers({})
    delegate.set_drivers({HdStrelkaDriverName: ctx})
    assert ctx.render is delegate.render

    assert delegate.populate_from_usd(str(p))
    rp = delegate.create_render_pass()
    buf = delegate.create_render_buffer(24, 24)
    rp.execute(buf)
    img = buf.map()
    assert img.shape == (24, 24, 4)
    assert not np.isnan(img).any()
    assert img[..., :3].max() > 0.0  # sun lights the floor
    assert ctx.subframe_index == 2


def test_usd_runner_cli(tmp_path):
    p = tmp_path / "stage.usda"
    p.write_text(STAGE)
    out = tmp_path / "out.png"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "strelka_tpu.app.usd_runner",
            "-s",
            str(p),
            "--width",
            "24",
            "--height",
            "24",
            "-t",
            "2",
            "-f",
            "2",
            "--cpu",
            "-o",
            str(out),
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "spp" in r.stdout
    assert out.exists()


def test_headless_display_and_settings_binding(tmp_path):
    from strelka_tpu.display import DisplayFactory, HeadlessDisplay
    from strelka_tpu.display.display import SettingsBinding
    from strelka_tpu.render.buffer import BufferFormat, ImageBuffer
    from strelka_tpu.settings import make_default_settings

    png = tmp_path / "frame.png"
    d = DisplayFactory.create_display(headless=True, png_path=str(png), png_every_n=1)
    assert isinstance(d, HeadlessDisplay)
    d.init(8, 8, None)
    img = ImageBuffer(data=np.random.rand(8, 8, 4).astype(np.float32), width=8, height=8,
                      pixel_format=BufferFormat.FLOAT4)
    d.draw_frame(img)
    assert d.last_frame is not None and png.exists()

    s = make_default_settings()
    binding = SettingsBinding(s)
    rows = binding.knobs()
    assert any(key == "render/pt/debug" for _, key, _, _, _ in rows)
    binding.set("render/pt/debug", 1)
    assert s.get_int("render/pt/debug") == 1


def test_panel_controller_hotkeys():
    """Viewer hotkeys drive the SettingsBinding knob set live (the ImGui
    debug-panel capability, Display.cpp:68-239, without a mouse UI)."""
    from strelka_tpu.app.viewer import CompositeHandler, PanelController
    from strelka_tpu.display.display import SettingsBinding
    from strelka_tpu.settings import make_default_settings

    s = make_default_settings(8, 8)
    panel = PanelController(SettingsBinding(s))
    panel.key_press("g", "press")
    assert s.get_int("render/pt/debug") == 1
    for _ in range(3):
        panel.key_press("g", "press")
    assert s.get_int("render/pt/debug") == 0  # wraps
    panel.key_press("t", "press")
    assert s.get_int("render/pt/tonemapperType") == 1
    acc0 = s.get_bool("render/pt/enableAcc")
    panel.key_press("p", "press")
    assert s.get_bool("render/pt/enableAcc") is not acc0
    d0 = s.get_int("render/pt/depth")
    panel.key_press("]", "press")
    assert s.get_int("render/pt/depth") == d0 + 1
    panel.key_press("[", "press")
    panel.key_press("[", "press")
    assert s.get_int("render/pt/depth") == d0 - 1
    panel.key_press("c", "press")
    assert panel.screenshot_requested
    # composite fans out to both handlers
    hits = []

    class Probe:
        def key_press(self, key, action):
            hits.append(key)

    CompositeHandler(Probe(), Probe()).key_press("w", "press")
    assert hits == ["w", "w"]


def test_web_display_endpoints():
    """WebDisplay (the headless ImGui/GLFW stand-in): frame served as PNG,
    knobs listed, live knob mutation writes through to settings, camera keys
    reach the InputHandler, /quit closes the window."""
    import json
    import urllib.request

    import numpy as np

    from strelka_tpu.display.web import WebDisplay
    from strelka_tpu.render.buffer import ImageBuffer
    from strelka_tpu.settings import SharedContext, make_default_settings

    ctx = SharedContext(make_default_settings(16, 16))
    disp = WebDisplay(port=0)  # auto-assign
    keys = []

    class _H:
        def key_press(self, key, action):
            keys.append(key)

    try:
        disp.init(16, 16, ctx)
        disp.set_input_handler(_H())
        frame = np.zeros((16, 16, 4), np.float32)
        frame[..., 0] = 1.0
        disp.draw_frame(ImageBuffer(frame))
        base = f"http://127.0.0.1:{disp.port}"
        png = urllib.request.urlopen(f"{base}/frame.png", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        rows = json.loads(urllib.request.urlopen(f"{base}/knobs", timeout=10).read())
        assert any(key == "render/pt/depth" for _, key, *_ in rows)
        req = urllib.request.Request(
            f"{base}/set", data=json.dumps({"key": "render/pt/depth", "value": 7}).encode(),
            method="POST")
        urllib.request.urlopen(req, timeout=10)
        assert ctx.settings.get("render/pt/depth") == 7
        req = urllib.request.Request(
            f"{base}/key", data=json.dumps({"key": "w"}).encode(), method="POST")
        urllib.request.urlopen(req, timeout=10)
        assert keys == ["w"]
        req = urllib.request.Request(f"{base}/quit", data=b"{}", method="POST")
        urllib.request.urlopen(req, timeout=10)
        assert disp.window_should_close()
        page = urllib.request.urlopen(f"{base}/", timeout=10).read()
        assert b"debug panel" in page
    finally:
        disp.destroy()
