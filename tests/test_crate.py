"""USD crate (.usdc) reader/writer: LZ4 codec, integer coding, round-trip,
and end-to-end scene loading through UsdLoader.

(No pxr exists in this environment, so fixtures are produced by our own
writer; the reader follows pxr crateFile.cpp's layout for version 0.8.)
"""

import os

import numpy as np
import pytest

from strelka_tpu.loaders.crate import (
    CrateFile,
    _decode_ints,
    _encode_ints,
    read_usdc,
    write_usdc,
)
from strelka_tpu.loaders.lz4 import (
    fast_compress,
    fast_decompress,
    lz4_block_compress,
    lz4_block_decompress,
)
from strelka_tpu.loaders.usd import UsdLoader
from strelka_tpu.loaders.usda_parser import parse_usda
from strelka_tpu.scene.scene import Scene

from test_usd import _STAGE  # reuse the text fixture


def test_lz4_roundtrip():
    rng = np.random.default_rng(0)
    cases = [
        b"",
        b"a",
        b"hello world " * 100,
        bytes(rng.integers(0, 256, 10_000, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 50_000, dtype=np.uint8)),  # compressible
        b"\x00" * 100_000,
    ]
    for data in cases:
        comp = lz4_block_compress(data)
        assert lz4_block_decompress(comp, len(data)) == data
        framed = fast_compress(data)
        assert fast_decompress(framed, len(data)) == data


def test_integer_coding_roundtrip():
    rng = np.random.default_rng(1)
    cases = [
        [],
        [0],
        [5, 5, 5, 5],
        list(range(1000)),
        list(rng.integers(-(2**30), 2**30, 500)),
        [0, 1, -1, 127, -128, 32767, -32768, 2**30, -(2**30)],
    ]
    for vals in cases:
        enc = _encode_ints(vals)
        dec = _decode_ints(enc, len(vals))
        np.testing.assert_array_equal(dec, np.asarray(vals, np.int64))
    wide = [0, 2**40, -(2**40), 7, 7, 7]
    enc = _encode_ints(wide, wide=True)
    dec = _decode_ints(enc, len(wide), wide=True)
    np.testing.assert_array_equal(dec, np.asarray(wide, np.int64))


def test_integer_coding_64bit_pxr_fixture():
    """Hand-constructed bytes per pxr Usd_IntegerCompression64
    (integerCoding.cpp): NOT produced by our own encoder, so a mirrored
    encode/decode misunderstanding cannot pass. The 64-bit codec uses
    int16/int32/int64 explicit deltas for codes 1/2/3 (one size up from the
    32-bit codec's int8/int16/int32).
    """
    import struct

    # deltas: [7, 7, 7, 300, 2**20, 2**40] -> common = 7 (repeated, so any
    # encoder must pick it); 300 fits int16 (code 1); 2**20 needs int32
    # (code 2); 2**40 needs int64 (code 3)
    vals = [7, 14, 21, 321, 321 + 2**20, 321 + 2**20 + 2**40]
    buf = struct.pack("<q", 7)  # common delta (int64 in the 64-bit codec)
    # 2-bit codes, LSB-first within each byte
    codes = [0, 0, 0, 1, 2, 3]
    nbytes = (len(codes) * 2 + 7) // 8
    cb = bytearray(nbytes)
    for i, c in enumerate(codes):
        cb[i >> 2] |= c << ((i & 3) * 2)
    buf += bytes(cb)
    buf += struct.pack("<h", 300)  # code 1 -> int16
    buf += struct.pack("<i", 2**20)  # code 2 -> int32
    buf += struct.pack("<q", 2**40)  # code 3 -> int64
    dec = _decode_ints(buf, len(vals), wide=True)
    np.testing.assert_array_equal(dec, np.asarray(vals, np.int64))
    # the native decoder must agree
    from strelka_tpu.native import native_int_decode

    nat = native_int_decode(buf, len(vals), True)
    if nat is not None:
        np.testing.assert_array_equal(nat, np.asarray(vals, np.int64))
    # and our encoder must emit exactly the widths the fixture uses
    assert _encode_ints(vals, wide=True) == buf


def test_integer_coding_32bit_pxr_fixture():
    """Same non-circular check for the 32-bit codec: int8/int16/int32."""
    import struct

    vals = [5, 10, 15, 115, 115 + 2**10, 115 + 2**10 + 2**20]
    # deltas: [5, 5, 5, 100, 2**10, 2**20] -> common=5, int8, int16, int32
    buf = struct.pack("<i", 5)  # common delta (int32)
    codes = [0, 0, 0, 1, 2, 3]
    cb = bytearray((len(codes) * 2 + 7) // 8)
    for i, c in enumerate(codes):
        cb[i >> 2] |= c << ((i & 3) * 2)
    buf += bytes(cb)
    buf += struct.pack("<b", 100)
    buf += struct.pack("<h", 2**10)
    buf += struct.pack("<i", 2**20)
    dec = _decode_ints(buf, len(vals), wide=False)
    np.testing.assert_array_equal(dec, np.asarray(vals, np.int64))
    from strelka_tpu.native import native_int_decode

    nat = native_int_decode(buf, len(vals), False)
    if nat is not None:
        np.testing.assert_array_equal(nat, np.asarray(vals, np.int64))
    assert _encode_ints(vals, wide=False) == buf


def _tree_flat(root):
    out = {}
    for p in root.walk():
        out[p.path] = (p.type, sorted(a for a in p.attrs if not a.endswith(":__interp__")))
    return out


def test_crate_roundtrip_stage(tmp_path):
    root = parse_usda(_STAGE)
    path = str(tmp_path / "stage.usdc")
    write_usdc(path, root)
    back = read_usdc(path)
    assert _tree_flat(back) == _tree_flat(root)
    # attribute values survive
    quad0 = root.find("/World/Geo/quad")
    quad1 = back.find("/World/Geo/quad")
    np.testing.assert_allclose(
        np.asarray(quad1.attrs["points"].value, np.float32),
        np.asarray(quad0.attrs["points"].value, np.float32),
    )
    assert quad1.attrs["faceVertexIndices"].value == quad0.attrs["faceVertexIndices"].value
    assert quad1.attrs["material:binding"].targets == ["/World/Materials/Red"]
    st0 = quad0.attrs["primvars:st"]
    st1 = quad1.attrs["primvars:st"]
    np.testing.assert_allclose(np.asarray(st1.value), np.asarray(st0.value))
    assert quad1.attrs.get("primvars:st:__interp__").value == "vertex"
    # shader params + connections
    shader = back.find("/World/Materials/Red/Surface")
    assert shader.attrs["info:id"].value == "UsdPreviewSurface"
    np.testing.assert_allclose(
        np.asarray(shader.attrs["inputs:diffuseColor"].value), [0.8, 0.1, 0.1]
    )
    mat = back.find("/World/Materials/Red")
    assert mat.attrs["outputs:surface"].connect == "/World/Materials/Red/Surface.outputs:surface"
    # light + camera params
    lamp = back.find("/World/lamp")
    assert lamp.attrs["inputs:intensity"].value == 10
    np.testing.assert_allclose(np.asarray(lamp.attrs["xformOp:rotateXYZ"].value), [-90, 0, 0])


def test_usdc_loads_into_scene(tmp_path):
    """End-to-end: UsdLoader consumes the crate identically to the text stage."""
    path_a = str(tmp_path / "stage.usda")
    path_c = str(tmp_path / "stage.usdc")
    with open(path_a, "w") as f:
        f.write(_STAGE)
    write_usdc(path_c, parse_usda(_STAGE))

    scene_a, scene_c = Scene(), Scene()
    assert UsdLoader().load(path_a, scene_a)
    assert UsdLoader().load(path_c, scene_c)
    assert len(scene_c.meshes) == len(scene_a.meshes)
    assert len(scene_c.lights) == len(scene_a.lights)
    assert len(scene_c.materials) == len(scene_a.materials)
    pa, *_ = scene_a.vertex_pools()
    pc, *_ = scene_c.vertex_pools()
    np.testing.assert_allclose(pc, pa, atol=1e-6)


def test_crate_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.usdc")
    with open(p, "wb") as f:
        f.write(b"NOT-USDC" + b"\x00" * 100)
    with pytest.raises(ValueError):
        read_usdc(p)


def test_coffeetable_usdc_renders(tmp_path):
    """Reference workflow parity: a BINARY .usdc stage renders end-to-end
    (README.md:66-68 `./Strelka -s misc/coffeemaker.usdc`)."""
    import jax
    import jax.numpy as jnp
    from strelka_tpu.loaders.usda_parser import parse_usda
    from strelka_tpu.ops import integrator as I
    from strelka_tpu.render.device_scene import build_device_scene

    src = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "data", "scenes", "coffeetable.usda")
    root = parse_usda(open(src).read())
    path_c = str(tmp_path / "coffeetable.usdc")
    write_usdc(path_c, root)

    scene = Scene()
    assert UsdLoader().load(path_c, scene)
    assert len(scene.meshes) > 0 and len(scene.lights) > 0
    dev = build_device_scene(scene)
    cam = scene.get_camera(0)
    cam.update_aspect_ratio(1.0)
    params = I.LaunchParams(
        subframe_index=jnp.int32(0),
        clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
        view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
        exposure=jnp.asarray([6.25e-4] * 3, jnp.float32),
        bg_color=jnp.zeros(3, jnp.float32),
    )
    state = I.make_frame_state(16, 16)
    _, img = I.render_launch(
        dev, params, state, width=16, height=16, samples_per_launch=2,
        max_sample_count=8, max_depth=2, enable_accumulation=False,
    )
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.max() > 0


def test_lz4_long_matches_and_runs():
    """Matches longer than the 15+255 extension steps decode correctly."""
    data = b"A" * 5000 + b"pattern" * 800 + b"B" * 3
    comp = lz4_block_compress(data)
    assert len(comp) < len(data) // 4
    assert lz4_block_decompress(comp, len(data)) == data


def test_crate_truncation_robustness(tmp_path):
    """Truncated/corrupted crate files raise ValueError, never crash with
    unhandled struct/index errors."""
    root = parse_usda(_STAGE)
    path = str(tmp_path / "whole.usdc")
    write_usdc(path, root)
    data = open(path, "rb").read()
    for cut in (16, 80, 88, len(data) // 3, len(data) - 7):
        p = str(tmp_path / f"cut_{cut}.usdc")
        with open(p, "wb") as f:
            f.write(data[:cut])
        try:
            read_usdc(p)
        except ValueError:
            pass


def test_crate_version_gate(tmp_path):
    data = bytearray(open_fixture := b"PXR-USDC" + bytes([0, 3, 0]) + b"\x00" * 80)
    p = str(tmp_path / "old.usdc")
    with open(p, "wb") as f:
        f.write(data)
    with pytest.raises(ValueError):
        read_usdc(p)


_ANIM_STAGE = """#usda 1.0
def Xform "World"
{
    def Mesh "box"
    {
        point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
        int[] faceVertexIndices = [0, 1, 2]
        int[] faceVertexCounts = [3]
        double3 xformOp:translate.timeSamples = {
            1: (0, 0, 0),
            2: (0, 2, 0),
            3: (0, 4, 1),
        }
        float inputs:gain.timeSamples = { 0: 0.5, 10: 1.5 }
        uniform token[] xformOpOrder = ["xformOp:translate"]
    }
}
"""


def test_usda_timesamples_full_parse():
    """usda: every (time, value) pair lands on Attr.time_samples; value is
    resolved to the first sample (static-render semantics)."""
    root = parse_usda(_ANIM_STAGE)
    box = root.find("/World/box")
    tr = box.attrs["xformOp:translate"]
    assert tr.time_samples is not None
    times, values = tr.time_samples
    assert times == [1.0, 2.0, 3.0]
    np.testing.assert_allclose(np.asarray(values[2], np.float64), [0, 4, 1])
    np.testing.assert_allclose(np.asarray(tr.value, np.float64), [0, 0, 0])
    g = box.attrs["inputs:gain"]
    assert g.time_samples == ([0.0, 10.0], [0.5, 1.5])
    assert g.value == 0.5


def test_crate_timesamples_roundtrip(tmp_path):
    """usdc: timeSamples survive write->read with the pxr v0.8 layout
    (payload -> [times ValueRep][value ValueRep xN], crateFile.cpp
    _ReadTimeSamples)."""
    root = parse_usda(_ANIM_STAGE)
    path = str(tmp_path / "anim.usdc")
    write_usdc(path, root)
    back = read_usdc(path)
    tr = back.find("/World/box").attrs["xformOp:translate"]
    assert tr.time_samples is not None
    times, values = tr.time_samples
    np.testing.assert_allclose(times, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(values[1], np.float64), [0, 2, 0])
    np.testing.assert_allclose(np.asarray(tr.value, np.float64), [0, 0, 0])
    g = back.find("/World/box").attrs["inputs:gain"]
    np.testing.assert_allclose(g.time_samples[0], [0.0, 10.0])
    np.testing.assert_allclose(g.time_samples[1], [0.5, 1.5])


_VARIANT_STAGE = """#usda 1.0
def Xform "Thing" (
    variants = {
        string look = "blue"
    }
    prepend variantSets = "look"
)
{
    float localAttr = 1.0
    variantSet "look" = {
        "red" {
            color3f primvars:displayColor = (1, 0, 0)
            def Mesh "R" { int n = 1 }
        }
        "blue" {
            color3f primvars:displayColor = (0, 0, 1)
            def Mesh "B" { int n = 2 }
            variantSet "size" = {
                "big" { float s = 2.0 }
                "small" { float s = 0.5 }
            }
        }
    }
}
"""


def test_usda_variant_resolution():
    """usda variantSet blocks parse and the `variants` selection composes
    (local-over-variant; nested sets resolve inside the selection; an
    unselected nested set takes its first variant). Reference: pxr composes
    variants natively behind UsdStage::Open (hdRunner/main.cpp:566-591)."""
    root = parse_usda(_VARIANT_STAGE)
    t = root.find("/Thing")
    assert t.attrs["primvars:displayColor"].value == (0.0, 0.0, 1.0)
    assert [c.name for c in t.children] == ["B"]
    assert t.children[0].path == "/Thing/B"  # brace paths rewritten on graft
    assert t.attrs["localAttr"].value == 1.0
    assert t.attrs["s"].value == 2.0  # nested 'size' unselected -> 'big'
    assert t.variant_sets == {}


def test_crate_variant_and_dictionary_roundtrip(tmp_path):
    """usdc: SPEC_VARIANT/SPEC_VARIANT_SET specs + variantSelection map +
    dictionary metadata survive write->read, and reading composes the
    selected variant."""
    from strelka_tpu.loaders.usda_parser import Attr, Prim

    thing = Prim(
        type="Xform", name="Thing", path="/Thing",
        metadata={
            "variants": {"look": "blue"},
            "customData": {
                "author": "fixture", "version": 3,
                "weights": [1.0, 2.0], "nested": {"flag": True},
            },
        },
    )
    red = Prim(path="/Thing{look=red}")
    red.attrs["primvars:displayColor"] = Attr(type_str="color3f", value=(1.0, 0.0, 0.0))
    red.children.append(Prim(type="Mesh", name="R", path="/Thing{look=red}/R"))
    blue = Prim(path="/Thing{look=blue}")
    blue.attrs["primvars:displayColor"] = Attr(type_str="color3f", value=(0.0, 0.0, 1.0))
    mesh = Prim(type="Mesh", name="B", path="/Thing{look=blue}/B")
    mesh.attrs["faceVertexCounts"] = Attr(type_str="int[]", value=[3])
    blue.children.append(mesh)
    thing.variant_sets["look"] = {"red": red, "blue": blue}
    root = Prim(type="PseudoRoot", name="", path="/")
    root.metadata["defaultPrim"] = "Thing"
    root.children.append(thing)

    path = str(tmp_path / "variants.usdc")
    write_usdc(path, root)
    back = read_usdc(path)
    assert back.metadata.get("defaultPrim") == "Thing"
    t = back.find("/Thing")
    cd = t.metadata["customData"]
    assert cd["author"] == "fixture" and cd["version"] == 3
    assert cd["nested"]["flag"] is True
    np.testing.assert_allclose(cd["weights"], [1.0, 2.0])
    assert tuple(t.attrs["primvars:displayColor"].value) == (0.0, 0.0, 1.0)
    assert [c.name for c in t.children] == ["B"]
    assert t.children[0].attrs["faceVertexCounts"].value[0] == 3
