"""A .usdc fixture authored byte-by-byte by an INDEPENDENT mini-encoder.

The crate reader was previously only exercised against its own writer
(write_usdc), so a mirrored misunderstanding of pxr's format would pass
every round-trip test. This fixture is constructed here from the format
spec (pxr crateFile.cpp layout, version 0.8) with encoding choices the
production writer NEVER makes:

  * integer streams use ONLY explicit widest-width deltas (code 3) with a
    deliberately unused 'common' value — a valid degenerate encoding
  * value arrays are stored UNCOMPRESSED (no compression bit)
  * the TOC lists sections in a different order, and value payloads sit
    BEFORE the structural sections in the file
  * scalar reps are inlined where possible

If the reader only understood the writer's canonical choices, every one of
these would fail. Reference anchor: the reference opens arbitrary binary
stages via pxr UsdStage::Open (/root/reference/src/hdRunner/main.cpp:566-591).
"""

from __future__ import annotations

import struct

import numpy as np

from strelka_tpu.loaders.crate import read_usdc
from strelka_tpu.loaders.lz4 import fast_compress
from strelka_tpu.loaders.usd import UsdLoader
from strelka_tpu.scene.scene import Scene

# crate value-type enums (crateDataTypes.h order) — independent of crate.py's
# constants on purpose: a transcription error there should break this test
TOKEN_T = 11
SPECIFIER_T = 42
VEC3F_T = 24
INT_T = 3
FLOAT_T = 8
DOUBLE_T = 9
TIMESAMPLES_T = 46
ARRAY = 1 << 63
INLINED = 1 << 62


def _wrap(v: int, bits: int) -> int:
    v &= (1 << bits) - 1
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


def _enc_ints_widest(values, wide: bool = False) -> bytes:
    """Usd_IntegerCompression pre-stream using ONLY code-3 (widest) deltas."""
    bits = 64 if wide else 32
    out = bytearray()
    out += struct.pack("<q" if wide else "<i", 987654321)  # 'common': unused
    n = len(values)
    codes = bytearray((n * 2 + 7) // 8)
    for i in range(n):
        codes[i >> 2] |= 3 << ((i & 3) * 2)
    out += codes
    prev = 0
    for v in values:
        out += struct.pack("<q" if wide else "<i", _wrap(int(v) - prev, bits))
        prev = int(v)
    return bytes(out)


def _comp_ints(values, wide: bool = False) -> bytes:
    blob = fast_compress(_enc_ints_widest(values, wide))
    return struct.pack("<Q", len(blob)) + blob


def build_fixture() -> bytes:
    tokens = [
        "", "Root", "Mesh", "points", "faceVertexIndices", "faceVertexCounts",
        "typeName", "specifier", "default", "Xform", "point3f[]", "int[]",
        "timeSamples", "gain", "float",
    ]
    TOK = {t: i for i, t in enumerate(tokens)}

    out = bytearray(b"\x00" * 88)  # bootstrap placeholder
    out[0:8] = b"PXR-USDC"
    out[8:11] = bytes((0, 8, 0))

    # ---- value payloads FIRST (uncompressed arrays: u64 count + raw data)
    pts = np.array(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    points_off = len(out)
    out += struct.pack("<Q", 4) + pts.tobytes()
    fvi = np.array([0, 1, 2, 0, 2, 3], np.int32)
    fvi_off = len(out)
    out += struct.pack("<Q", 6) + fvi.tobytes()
    fvc = np.array([3, 3], np.int32)
    fvc_off = len(out)
    out += struct.pack("<Q", 2) + fvc.tobytes()
    # timeSamples payload (crateFile.cpp _ReadTimeSamples layout):
    # [times ValueRep][value ValueRep x N]; times = uncompressed double array
    times_off = len(out)
    out += struct.pack("<Q", 2) + np.array([1.0, 10.0], "<f8").tobytes()
    ts_off = len(out)
    times_rep = (DOUBLE_T << 48) | ARRAY | times_off
    v_half = (FLOAT_T << 48) | INLINED | struct.unpack("<I", struct.pack("<f", 0.5))[0]
    v_three = (FLOAT_T << 48) | INLINED | struct.unpack("<I", struct.pack("<f", 3.0))[0]
    out += struct.pack("<QQQ", times_rep, v_half, v_three)

    # ---- reps
    def rep(vtype, flags=0, payload=0):
        return (vtype << 48) | flags | payload

    fields = [
        (TOK["specifier"], rep(SPECIFIER_T, INLINED, 0)),          # f0 def
        (TOK["typeName"], rep(TOKEN_T, INLINED, TOK["Xform"])),    # f1
        (TOK["typeName"], rep(TOKEN_T, INLINED, TOK["Mesh"])),     # f2
        (TOK["typeName"], rep(TOKEN_T, INLINED, TOK["point3f[]"])),  # f3
        (TOK["typeName"], rep(TOKEN_T, INLINED, TOK["int[]"])),    # f4
        (TOK["default"], rep(VEC3F_T, ARRAY, points_off)),         # f5
        (TOK["default"], rep(INT_T, ARRAY, fvi_off)),              # f6
        (TOK["default"], rep(INT_T, ARRAY, fvc_off)),              # f7
        (TOK["typeName"], rep(TOKEN_T, INLINED, TOK["float"])),    # f8
        (TOK["timeSamples"], rep(TIMESAMPLES_T, 0, ts_off)),       # f9
    ]
    NEG1 = 0xFFFFFFFF
    fieldsets = [
        NEG1,            # fs @0: pseudo-root (empty)
        0, 1, NEG1,      # fs @1: /Root        (specifier, typeName=Xform)
        0, 2, NEG1,      # fs @4: /Root/Mesh   (specifier, typeName=Mesh)
        3, 5, NEG1,      # fs @7: .points      (typeName, default)
        4, 6, NEG1,      # fs @10: .faceVertexIndices
        4, 7, NEG1,      # fs @13: .faceVertexCounts
        8, 9, NEG1,      # fs @16: .gain (typeName=float, timeSamples)
    ]

    # ---- sections (deliberately in a non-canonical order)
    sections = {}

    tok_blob = b"\x00".join(t.encode() for t in tokens)
    comp = fast_compress(tok_blob)
    sections["TOKENS"] = struct.pack("<QQQ", len(tokens), len(tok_blob), len(comp)) + comp

    sections["FIELDS"] = (
        struct.pack("<Q", len(fields))
        + _comp_ints([f[0] for f in fields])
        + (lambda blob: struct.pack("<Q", len(blob)) + blob)(
            fast_compress(np.array([f[1] for f in fields], "<u8").tobytes())
        )
    )
    sections["FIELDSETS"] = struct.pack("<Q", len(fieldsets)) + _comp_ints(fieldsets)

    # paths, DFS: /(pi0) -> Root(pi1) -> Mesh(pi2) -> [points, fvi, fvc]
    pidx = [0, 1, 2, 3, 4, 5, 6]
    etok = [0, TOK["Root"], TOK["Mesh"], -TOK["points"],
            -TOK["faceVertexIndices"], -TOK["faceVertexCounts"], -TOK["gain"]]
    jumps = [-1, -1, -1, 0, 0, 0, -2]
    sections["PATHS"] = (
        struct.pack("<QQ", 7, 7)
        + _comp_ints(pidx) + _comp_ints(etok) + _comp_ints(jumps)
    )

    # specs: pseudo-root(7), two prims(6), three attributes(1)
    sections["SPECS"] = (
        struct.pack("<Q", 7)
        + _comp_ints([0, 1, 2, 3, 4, 5, 6])     # path index
        + _comp_ints([0, 1, 4, 7, 10, 13, 16])  # fieldset start
        + _comp_ints([7, 6, 6, 1, 1, 1, 1])     # spec type
    )

    order = ["SPECS", "TOKENS", "PATHS", "FIELDS", "FIELDSETS"]
    starts = {}
    for name in order:
        starts[name] = len(out)
        out += sections[name]

    toc_offset = len(out)
    out += struct.pack("<q", len(order))
    for name in order:
        out += name.encode().ljust(16, b"\x00")
        out += struct.pack("<qq", starts[name], len(sections[name]))
    struct.pack_into("<q", out, 16, toc_offset)
    return bytes(out)


def test_hand_authored_usdc_parses(tmp_path):
    path = str(tmp_path / "fixture.usdc")
    with open(path, "wb") as f:
        f.write(build_fixture())
    root = read_usdc(path)
    (xform,) = root.children
    assert xform.name == "Root" and xform.type == "Xform"
    assert xform.specifier == "def"
    (mesh,) = xform.children
    assert mesh.name == "Mesh" and mesh.type == "Mesh" and mesh.path == "/Root/Mesh"
    pts = mesh.attrs["points"].value
    assert len(pts) == 4 and tuple(pts[2]) == (1.0, 0.0, 1.0)
    assert mesh.attrs["points"].type_str == "point3f[]"
    assert [int(v) for v in mesh.attrs["faceVertexIndices"].value] == [0, 1, 2, 0, 2, 3]
    assert [int(v) for v in mesh.attrs["faceVertexCounts"].value] == [3, 3]
    # timeSamples decoded through the independent encoder's layout
    g = mesh.attrs["gain"]
    assert g.time_samples == ([1.0, 10.0], [0.5, 3.0])
    assert g.value == 0.5  # static-render semantics: first sample


def test_hand_authored_usdc_loads_into_scene(tmp_path):
    path = str(tmp_path / "fixture.usdc")
    with open(path, "wb") as f:
        f.write(build_fixture())
    scene = Scene()
    assert UsdLoader().load(path, scene)
    # quad triangulates into 2 triangles
    total_tris = sum(m.count // 3 for m in scene.meshes)
    assert total_tris == 2


def test_crate_reader_byteflip_fuzz(tmp_path):
    """Robust ingestion contract under corruption: every single-byte flip of
    the fixture either parses (warnings allowed) or raises ValueError — the
    ONE failure path read_usdc promises — never another exception type.
    (UsdStage::Open-class robustness; crate.py converts low-level decode
    errors.)"""
    import numpy as np

    blob = bytearray(build_fixture())
    rng = np.random.default_rng(99)
    path = str(tmp_path / "fuzz.usdc")
    for _ in range(200):
        i = int(rng.integers(0, len(blob)))
        orig = blob[i]
        blob[i] ^= int(rng.integers(1, 256))
        with open(path, "wb") as f:
            f.write(blob)
        try:
            read_usdc(path)
        except ValueError:
            pass
        blob[i] = orig


STRING_T = 10
DICT_T = 31
VSMAP_T = 45
SPEC_PRIM_T, SPEC_PSEUDO_T, SPEC_VARIANT_T, SPEC_VARIANT_SET_T = 6, 7, 10, 11


def build_variant_fixture() -> bytes:
    """Independent encoding of a variant-carrying stage with dictionary
    metadata: /Root (variantSelection {look=blue}, customData {note, n})
    with variantSet 'look' = red|blue; blue adds a Mesh child. Pins the
    STRINGS section, the dictionary entry layout (u32 key-string-index,
    i64 skip, u64 ValueRep), the VariantSelectionMap pair layout, and
    "{set=sel}" path components appended without a separator."""
    tokens = [
        "", "Root", "Mesh", "B", "radius", "typeName", "specifier", "default",
        "Xform", "float", "variantSelection", "customData",
        "{look=red}", "{look=blue}", "{look=}",
        "look", "blue", "note", "hi", "n",
    ]
    TOK = {t: i for i, t in enumerate(tokens)}
    strings = [TOK["look"], TOK["blue"], TOK["note"], TOK["hi"], TOK["n"]]
    STR = {tokens[t]: i for i, t in enumerate(strings)}

    out = bytearray(b"\x00" * 88)
    out[0:8] = b"PXR-USDC"
    out[8:11] = bytes((0, 8, 0))

    def rep(vtype, flags=0, payload=0):
        return (vtype << 48) | flags | payload

    # ---- payloads
    vsmap_off = len(out)
    out += struct.pack("<Q", 1) + struct.pack("<II", STR["look"], STR["blue"])
    dict_off = len(out)
    out += struct.pack("<Q", 2)
    out += struct.pack("<IqQ", STR["note"], 8, rep(STRING_T, INLINED, STR["hi"]))
    out += struct.pack("<IqQ", STR["n"], 8, rep(INT_T, INLINED, 7))

    fields = [
        (TOK["specifier"], rep(SPECIFIER_T, INLINED, 0)),            # f0
        (TOK["typeName"], rep(TOKEN_T, INLINED, TOK["Xform"])),      # f1
        (TOK["typeName"], rep(TOKEN_T, INLINED, TOK["Mesh"])),       # f2
        (TOK["typeName"], rep(TOKEN_T, INLINED, TOK["float"])),      # f3
        (TOK["variantSelection"], rep(VSMAP_T, 0, vsmap_off)),       # f4
        (TOK["customData"], rep(DICT_T, 0, dict_off)),               # f5
        (TOK["default"], rep(FLOAT_T, INLINED,
                             struct.unpack("<I", struct.pack("<f", 1.0))[0])),  # f6
        (TOK["default"], rep(FLOAT_T, INLINED,
                             struct.unpack("<I", struct.pack("<f", 2.5))[0])),  # f7
    ]
    NEG1 = 0xFFFFFFFF
    fieldsets = [
        NEG1,                   # fs @0: pseudo-root / variantset (empty)
        0, 1, 4, 5, NEG1,       # fs @1: /Root
        0, NEG1,                # fs @6: variant scopes
        3, 6, NEG1,             # fs @8: red .radius
        3, 7, NEG1,             # fs @11: blue .radius
        0, 2, NEG1,             # fs @14: /Root{look=blue}/B
    ]

    sections = {}
    tok_blob = b"\x00".join(t.encode() for t in tokens)
    comp = fast_compress(tok_blob)
    sections["TOKENS"] = struct.pack("<QQQ", len(tokens), len(tok_blob), len(comp)) + comp
    sections["STRINGS"] = struct.pack("<Q", len(strings)) + np.asarray(strings, "<u4").tobytes()
    sections["FIELDS"] = (
        struct.pack("<Q", len(fields))
        + _comp_ints([f[0] for f in fields])
        + (lambda blob: struct.pack("<Q", len(blob)) + blob)(
            fast_compress(np.array([f[1] for f in fields], "<u8").tobytes())
        )
    )
    sections["FIELDSETS"] = struct.pack("<Q", len(fieldsets)) + _comp_ints(fieldsets)

    # DFS: / -> Root -> {look=red} -> .radius ; {look=blue} -> [.radius, B] ;
    # {look=}
    pidx = [0, 1, 2, 3, 4, 5, 6, 7]
    etok = [
        0, TOK["Root"], TOK["{look=red}"], -TOK["radius"],
        TOK["{look=blue}"], -TOK["radius"], TOK["B"], TOK["{look=}"],
    ]
    jumps = [-1, -1, 2, -2, 3, 0, -2, -2]
    sections["PATHS"] = (
        struct.pack("<QQ", 8, 8)
        + _comp_ints(pidx) + _comp_ints(etok) + _comp_ints(jumps)
    )
    sections["SPECS"] = (
        struct.pack("<Q", 8)
        + _comp_ints([0, 1, 2, 3, 4, 5, 6, 7])
        + _comp_ints([0, 1, 6, 8, 6, 11, 14, 0])
        + _comp_ints([
            SPEC_PSEUDO_T, SPEC_PRIM_T, SPEC_VARIANT_T, 1,
            SPEC_VARIANT_T, 1, SPEC_PRIM_T, SPEC_VARIANT_SET_T,
        ])
    )

    order = ["TOKENS", "STRINGS", "FIELDS", "FIELDSETS", "PATHS", "SPECS"]
    starts = {}
    for name in order:
        starts[name] = len(out)
        out += sections[name]
    toc_offset = len(out)
    out += struct.pack("<q", len(order))
    for name in order:
        out += name.encode().ljust(16, b"\x00")
        out += struct.pack("<qq", starts[name], len(sections[name]))
    struct.pack_into("<q", out, 16, toc_offset)
    return bytes(out)


def test_hand_authored_variant_usdc_parses(tmp_path):
    path = str(tmp_path / "variants.usdc")
    with open(path, "wb") as f:
        f.write(build_variant_fixture())
    root = read_usdc(path)
    (xform,) = root.children
    assert xform.name == "Root" and xform.type == "Xform"
    # the selected 'blue' variant composed: its radius + Mesh child grafted
    assert xform.attrs["radius"].value == 2.5
    assert [c.name for c in xform.children] == ["B"]
    assert xform.children[0].type == "Mesh"
    assert xform.children[0].path == "/Root/B"
    # dictionary metadata decoded through the independent layout
    assert xform.metadata["customData"] == {"note": "hi", "n": 7}
    assert xform.variant_sets == {}


def test_variant_fixture_byteflip_fuzz(tmp_path):
    """The parse-or-ValueError contract holds for the dictionary / variant
    decode paths too."""
    blob = bytearray(build_variant_fixture())
    rng = np.random.default_rng(7)
    path = str(tmp_path / "vfuzz.usdc")
    for _ in range(200):
        i = int(rng.integers(0, len(blob)))
        orig = blob[i]
        blob[i] ^= int(rng.integers(1, 256))
        with open(path, "wb") as f:
            f.write(blob)
        try:
            read_usdc(path)
        except ValueError:
            pass
        blob[i] = orig
