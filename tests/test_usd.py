"""USDA parser + USD scene building tests."""

import numpy as np
import pytest

from strelka_tpu.loaders.usd import UsdLoader, blackbody_temperature_as_rgb
from strelka_tpu.loaders.usda_parser import parse_usda
from strelka_tpu.scene.scene import InstanceType, Scene

_STAGE = """#usda 1.0
(
    defaultPrim = "World"
    metersPerUnit = 0.01
    upAxis = "Y"
)

def Xform "World"
{
    def Xform "Geo" (
        kind = "group"
    )
    {
        double3 xformOp:translate = (0, 1, 0)
        uniform token[] xformOpOrder = ["xformOp:translate"]

        def Mesh "quad"
        {
            point3f[] points = [(-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1)]
            int[] faceVertexIndices = [0, 3, 2, 1]
            int[] faceVertexCounts = [4]
            normal3f[] normals = [(0, 1, 0), (0, 1, 0), (0, 1, 0), (0, 1, 0)]
            texCoord2f[] primvars:st = [(0, 0), (0, 1), (1, 1), (1, 0)] (
                interpolation = "vertex"
            )
            rel material:binding = </World/Materials/Red>
            double3 xformOp:scale = (2, 2, 2)
            uniform token[] xformOpOrder = ["xformOp:scale"]
        }
    }

    def Camera "cam"
    {
        float focalLength = 50
        float horizontalAperture = 20.955
        float verticalAperture = 15.2908
        float2 clippingRange = (0.1, 10000)
        double3 xformOp:translate = (0, 2, 8)
        uniform token[] xformOpOrder = ["xformOp:translate"]
    }

    def RectLight "lamp"
    {
        color3f inputs:color = (1, 0.9, 0.8)
        float inputs:intensity = 10
        float inputs:exposure = 2
        float inputs:width = 2
        float inputs:height = 1
        double3 xformOp:translate = (0, 5, 0)
        double3 xformOp:rotateXYZ = (-90, 0, 0)
        uniform token[] xformOpOrder = ["xformOp:translate", "xformOp:rotateXYZ"]
    }

    def DistantLight "sun"
    {
        float inputs:intensity = 100
        float inputs:angle = 1.0
    }

    def Scope "Materials"
    {
        def Material "Red"
        {
            token outputs:surface.connect = </World/Materials/Red/Surface.outputs:surface>

            def Shader "Surface"
            {
                uniform token info:id = "UsdPreviewSurface"
                color3f inputs:diffuseColor = (0.8, 0.1, 0.1)
                float inputs:roughness = 0.3
                float inputs:metallic = 0.9
                float inputs:ior = 1.6
                token outputs:surface
            }
        }
    }
}
"""


def test_parse_usda_structure():
    root = parse_usda(_STAGE)
    assert root.metadata["defaultPrim"] == "World"
    world = root.find("/World")
    assert world is not None and world.type == "Xform"
    quad = root.find("/World/Geo/quad")
    assert quad.type == "Mesh"
    assert len(quad.attrs["points"].value) == 4
    assert quad.attrs["material:binding"].targets == ["/World/Materials/Red"]
    surf = root.find("/World/Materials/Red")
    assert surf.attrs["outputs:surface"].connect == "/World/Materials/Red/Surface.outputs:surface"
    st_interp = quad.attrs.get("primvars:st:__interp__")
    assert st_interp is not None and st_interp.value == "vertex"


def test_usd_scene_build(tmp_path):
    p = tmp_path / "stage.usda"
    p.write_text(_STAGE)
    scene = Scene()
    assert UsdLoader().load(str(p), scene)

    # mesh: quad fan-triangulated to 2 tris, xform composed (translate+scale)
    mesh_insts = [i for i in scene.instances if i.type == InstanceType.eMesh]
    assert len(mesh_insts) == 1
    xf = mesh_insts[0].transform
    assert np.allclose(xf[:3, 3], [0, 1, 0])
    assert np.allclose(np.diag(xf)[:3], [2, 2, 2])
    pos, nrm, tan, uv, idx = scene.vertex_pools()
    # light proxies add geometry; mesh contributes first 6 flat verts
    assert len(idx) >= 6

    # material: UsdPreviewSurface mapped
    mats = [m for m in scene.materials if m.name == "Red"]
    assert len(mats) == 1
    m = mats[0]
    assert np.allclose(m.params["diffuse_color_constant"], [0.8, 0.1, 0.1])
    assert m.params["reflection_roughness_constant"] == pytest.approx(0.3)
    assert m.params["metallic_constant"] == pytest.approx(0.9)

    # lights: rect with 2^exposure scaling + distant with /(pi sin^2) norm
    rect = [d for d in scene.light_descs if d.type == 0][0]
    assert rect.intensity == pytest.approx(10 * 2**2)
    assert rect.use_xform
    dist = [d for d in scene.light_descs if d.type == 3][0]
    half = 1.0 * 0.5 * np.pi / 180.0
    assert dist.half_angle == pytest.approx(half)
    assert dist.intensity == pytest.approx(100 / (np.pi * np.sin(half) ** 2), rel=1e-4)

    # rect light packed corners: width 2 x height 1 at y=5, facing -y
    light = scene.lights[[d.type for d in scene.light_descs].index(0)]
    pts = light.points[:, :3]
    assert np.allclose(pts[:, 1], 5.0, atol=1e-5)
    e1 = pts[1] - pts[0]
    e2 = pts[3] - pts[0]
    assert np.linalg.norm(np.cross(e1, e2)) == pytest.approx(2.0, rel=1e-4)

    # camera
    cam = scene.get_camera(0)
    assert cam.name == "cam"
    assert np.allclose(cam.position, [0, 2, 8])
    assert cam.fov == pytest.approx(np.degrees(2 * np.arctan(15.2908 / 100.0)), rel=1e-4)


def test_blackbody():
    # 6500K is near white
    rgb = blackbody_temperature_as_rgb(6500.0)
    assert np.all(np.abs(rgb - 1.0) < 0.15)
    # 2000K is strongly red
    warm = blackbody_temperature_as_rgb(2000.0)
    assert warm[0] > warm[1] > warm[2]
    # luma normalized
    assert rgb @ [0.2126, 0.7152, 0.0722] == pytest.approx(1.0, rel=1e-5)


def test_usd_references(tmp_path):
    geo = tmp_path / "geo.usda"
    geo.write_text("""#usda 1.0
(
    defaultPrim = "Model"
)
def Xform "Model"
{
    def Mesh "tri"
    {
        point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
        int[] faceVertexIndices = [0, 1, 2]
        int[] faceVertexCounts = [3]
    }
}
""")
    stage = tmp_path / "main.usda"
    stage.write_text("""#usda 1.0
(
    defaultPrim = "World"
)
def Xform "World"
{
    def Xform "inst1" (
        references = @./geo.usda@
    )
    {
        double3 xformOp:translate = (5, 0, 0)
        uniform token[] xformOpOrder = ["xformOp:translate"]
    }
}
""")
    scene = Scene()
    assert UsdLoader().load(str(stage), scene)
    mesh_insts = [i for i in scene.instances if i.type == InstanceType.eMesh]
    assert len(mesh_insts) == 1
    assert np.allclose(mesh_insts[0].transform[:3, 3], [5, 0, 0])


def test_usd_render_end_to_end(tmp_path):
    p = tmp_path / "stage.usda"
    p.write_text(_STAGE)
    scene = Scene()
    assert UsdLoader().load(str(p), scene)

    from strelka_tpu.render.buffer import BufferDesc, BufferFormat
    from strelka_tpu.render.render import RenderFactory
    from strelka_tpu.settings import SharedContext, make_default_settings

    s = make_default_settings(24, 24)
    s.set("render/pt/sppTotal", 2)
    s.set("render/pt/spp", 2)
    ctx = SharedContext(s)
    r = RenderFactory.create_render()
    r.set_scene(scene)
    r.set_shared_context(ctx)
    r.init()
    buf = r.create_buffer(BufferDesc(24, 24, BufferFormat.FLOAT4))
    r.render(buf)
    img = buf.map()
    assert not np.isnan(img).any()
    assert img[..., :3].max() > 0.0


def test_usd_mdl_shader_node(tmp_path):
    """Single-node MDL network (info:mdl:sourceAsset + subIdentifier)."""
    p = tmp_path / "mdl.usda"
    p.write_text("""#usda 1.0
(
    defaultPrim = "World"
)
def Xform "World"
{
    def Mesh "quad"
    {
        point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
        int[] faceVertexIndices = [0, 1, 2]
        int[] faceVertexCounts = [3]
        rel material:binding = </World/Looks/Metal>
    }
    def Scope "Looks"
    {
        def Material "Metal"
        {
            token outputs:mdl:surface.connect = </World/Looks/Metal/Shader.outputs:out>

            def Shader "Shader"
            {
                uniform token info:implementationSource = "sourceAsset"
                uniform asset info:mdl:sourceAsset = @OmniPBR.mdl@
                uniform token info:mdl:sourceAsset:subIdentifier = "OmniPBR"
                color3f inputs:diffuse_color_constant = (0.9, 0.7, 0.2)
                float inputs:metallic_constant = 1.0
                float inputs:reflection_roughness_constant = 0.15
                token outputs:out
            }
        }
    }
}
""")
    scene = Scene()
    assert UsdLoader().load(str(p), scene)
    mats = [m for m in scene.materials if m.name == "OmniPBR"]
    assert len(mats) == 1
    m = mats[0]
    assert m.type == "mdl" and m.file == "OmniPBR.mdl"
    assert m.params["metallic_constant"] == pytest.approx(1.0)
    np.testing.assert_allclose(m.params["diffuse_color_constant"], [0.9, 0.7, 0.2])
    # compiles through the MDL module pipeline
    from strelka_tpu.materials import BsdfType, MaterialManager

    compiled = MaterialManager().compile_scene_materials(scene.materials)
    target = [c for c in compiled if c.metallic == 1.0]
    assert target and target[0].bsdf_type == BsdfType.OMNI_PBR
    assert target[0].roughness == pytest.approx(0.15)


def test_scene_edit_api():
    """Instance removal / dirty tracking (scene.cpp:410-461 parity)."""
    from strelka_tpu.render.device_scene import flatten_scene_geometry
    from strelka_tpu.scene.testscenes import cornell_box
    from strelka_tpu.utils import math3d as m3

    scene = cornell_box(with_boxes=True)
    n_before = flatten_scene_geometry(scene)["p"].shape[0]
    # remove the tall box instance (instance 5: walls are 0-4, boxes 5-6)
    scene.begin_frame()
    scene.remove_instance(5)
    assert flatten_scene_geometry(scene)["p"].shape[0] < n_before
    scene.update_instance_transform(6, m3.translate([0, 0.1, 0]))
    assert 6 in scene.get_dirty_instances()
    assert scene.get_fr_mod()
    scene.end_frame()
    assert not scene.get_fr_mod()


def test_point_instancer(tmp_path):
    """UsdGeomPointInstancer: prototypes instanced with per-point TRS."""
    p = tmp_path / "pi.usda"
    p.write_text("""#usda 1.0
(
    defaultPrim = "World"
)
def Xform "World"
{
    def PointInstancer "scatter"
    {
        rel prototypes = [</World/scatter/protos/tri>]
        int[] protoIndices = [0, 0, 0]
        point3f[] positions = [(0, 0, 0), (5, 0, 0), (0, 0, 5)]
        float3[] scales = [(1, 1, 1), (2, 2, 2), (1, 1, 1)]
        def Scope "protos"
        {
            def Mesh "tri"
            {
                point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
                int[] faceVertexIndices = [0, 1, 2]
                int[] faceVertexCounts = [3]
            }
        }
    }
}
""")
    scene = Scene()
    assert UsdLoader().load(str(p), scene)
    mesh_insts = [i for i in scene.instances if i.type == InstanceType.eMesh]
    assert len(mesh_insts) == 3
    # all three share ONE mesh (prototype cached)
    assert len({i.geom_id for i in mesh_insts}) == 1
    offsets = sorted(tuple(np.round(i.transform[:3, 3], 3)) for i in mesh_insts)
    assert offsets == [(0.0, 0.0, 0.0), (0.0, 0.0, 5.0), (5.0, 0.0, 0.0)]
    scales = sorted(float(i.transform[0, 0]) for i in mesh_insts)
    assert scales == [1.0, 1.0, 2.0]


_NETWORK_STAGE = """#usda 1.0
def Xform "World"
{
    def Mesh "quad"
    {
        point3f[] points = [(-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1)]
        int[] faceVertexIndices = [0, 1, 2, 3]
        int[] faceVertexCounts = [4]
        rel material:binding = </World/Mat>
    }

    def Material "Mat"
    {
        token outputs:surface.connect = </World/Mat/Surface.outputs:surface>

        def Shader "Surface"
        {
            uniform token info:id = "UsdPreviewSurface"
            color3f inputs:diffuseColor.connect = </World/Mat/Mult.outputs:out>
            float inputs:roughness.connect = </World/Mat/RoughTex.outputs:r>
        }

        def Shader "Mult"
        {
            uniform token info:id = "ND_multiply_color3"
            color3f inputs:in1.connect = </World/Mat/DiffTex.outputs:rgb>
            color3f inputs:in2 = (0.5, 0.25, 1.0)
        }

        def Shader "DiffTex"
        {
            uniform token info:id = "UsdUVTexture"
            asset inputs:file = @textures/diffuse.png@
            float4 inputs:fallback = (0.8, 0.4, 0.2, 1)
            float2 inputs:st.connect = </World/Mat/Xf2d.outputs:result>
        }

        def Shader "Xf2d"
        {
            uniform token info:id = "UsdTransform2d"
            float2 inputs:scale = (2, 3)
            float2 inputs:translation = (0.1, 0.2)
        }

        def Shader "RoughTex"
        {
            uniform token info:id = "UsdUVTexture"
            asset inputs:file = @textures/rough.png@
            float4 inputs:fallback = (0.35, 0.35, 0.35, 1)
        }
    }
}
"""


def test_multi_node_network_translation(tmp_path):
    """texture -> multiply -> surface chains and UsdTransform2d st transforms
    translate (MaterialNetworkTranslator.cpp:79-300 capability)."""
    p = tmp_path / "net.usda"
    p.write_text(_NETWORK_STAGE)
    scene = Scene()
    assert UsdLoader().load(str(p), scene)
    desc = scene.materials[-1]
    assert desc.params.get("diffuse_texture") == "textures/diffuse.png"
    # fallback color scaled by the multiply node constant
    np.testing.assert_allclose(
        np.asarray(desc.params["diffuse_color_constant"], np.float32),
        [0.8 * 0.5, 0.4 * 0.25, 0.2 * 1.0],
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(desc.params["uv_scale"]), [2, 3])
    np.testing.assert_allclose(np.asarray(desc.params["uv_offset"]), [0.1, 0.2])
    assert desc.params.get("reflectionroughness_texture") == "textures/rough.png"
    assert abs(desc.params["reflection_roughness_constant"] - 0.35) < 1e-5


def test_nested_point_instancer(tmp_path):
    """instancer-over-instancer composes transforms recursively
    (Instancer.cpp:74-190)."""
    stage = """#usda 1.0
def Xform "World"
{
    def PointInstancer "outer"
    {
        rel prototypes = [</World/outer/protoA>]
        int[] protoIndices = [0, 0]
        point3f[] positions = [(0, 0, 0), (10, 0, 0)]

        def Xform "protoA"
        {
            def PointInstancer "inner"
            {
                rel prototypes = [</World/outer/protoA/inner/leaf>]
                int[] protoIndices = [0, 0, 0]
                point3f[] positions = [(0, 0, 0), (1, 0, 0), (2, 0, 0)]

                def Xform "leaf"
                {
                    def Mesh "tri"
                    {
                        point3f[] points = [(0, 0, 0), (0.1, 0, 0), (0, 0.1, 0)]
                        int[] faceVertexIndices = [0, 1, 2]
                        int[] faceVertexCounts = [3]
                    }
                }
            }
        }
    }
}
"""
    p = tmp_path / "nested.usda"
    p.write_text(stage)
    scene = Scene()
    assert UsdLoader().load(str(p), scene)
    # 2 outer x 3 inner = 6 instances of the leaf triangle
    n_mesh_instances = sum(1 for i in scene.instances if i.type == InstanceType.eMesh)
    assert n_mesh_instances == 6
    from strelka_tpu.render.device_scene import flatten_scene_geometry

    cat = flatten_scene_geometry(scene)
    xs = sorted(np.round(cat["p"][:, 0, 0], 4).tolist())
    assert xs == [0.0, 1.0, 2.0, 10.0, 11.0, 12.0]


def test_timesamples_first_sample():
    """timeSamples attributes resolve to the first sample for the static bake."""
    stage = """#usda 1.0
def Xform "World"
{
    def Mesh "tri"
    {
        point3f[] points.timeSamples = {
            0: [(0, 0, 0), (1, 0, 0), (0, 1, 0)],
            10: [(5, 0, 0), (6, 0, 0), (5, 1, 0)],
        }
        int[] faceVertexIndices = [0, 1, 2]
        int[] faceVertexCounts = [3]
        double3 xformOp:translate.timeSamples = { 0: (2, 0, 0), 5: (9, 9, 9) }
        uniform token[] xformOpOrder = ["xformOp:translate"]
    }
}
"""
    root = parse_usda(stage)
    tri = root.find("/World/tri")
    pts = np.asarray(tri.attrs["points"].value, np.float32)
    np.testing.assert_allclose(pts[1], [1, 0, 0])
    np.testing.assert_allclose(np.asarray(tri.attrs["xformOp:translate"].value), [2, 0, 0])
    scene = Scene()
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.usda")
        open(p, "w").write(stage)
        assert UsdLoader().load(p, scene)
    from strelka_tpu.render.device_scene import flatten_scene_geometry
    cat = flatten_scene_geometry(scene)
    assert cat["p"].shape[0] == 1
    np.testing.assert_allclose(cat["p"][0, 0], [2, 0, 0], atol=1e-6)


def test_sublayer_composition(tmp_path):
    """Root-layer subLayers compose: root opinions win, sublayers merge in
    strength order (first strongest), prims union across layers.
    Reference bar: pxr sublayer composition (hdRunner/main.cpp:566 stage
    open composes the full LIVRPS stack)."""
    (tmp_path / "base.usda").write_text(
        """#usda 1.0
(
    defaultPrim = "World"
)
def Xform "World"
{
    def Mesh "ground"
    {
        point3f[] points = [(-5, 0, -5), (5, 0, -5), (5, 0, 5), (-5, 0, 5)]
        int[] faceVertexIndices = [0, 3, 2, 1]
        int[] faceVertexCounts = [4]
        color3f[] primvars:displayColor = [(0.2, 0.2, 0.2)]
    }
    def SphereLight "lamp"
    {
        float inputs:radius = 1.0
        float inputs:intensity = 5.0
    }
}
"""
    )
    (tmp_path / "override.usda").write_text(
        """#usda 1.0
def Xform "World"
{
    def Mesh "ground"
    {
        color3f[] primvars:displayColor = [(0.9, 0.1, 0.1)]
    }
    def Mesh "extra"
    {
        point3f[] points = [(0, 1, 0), (1, 1, 0), (0, 2, 0)]
        int[] faceVertexIndices = [0, 1, 2]
        int[] faceVertexCounts = [3]
    }
}
"""
    )
    # root layer: has its own opinion on the lamp intensity; sublayers ordered
    # override (strongest) then base
    (tmp_path / "main.usda").write_text(
        """#usda 1.0
(
    defaultPrim = "World"
    subLayers = [@override.usda@, @base.usda@]
)
over "World"
{
    over "lamp"
    {
        float inputs:intensity = 42.0
    }
}
"""
    )
    scene = Scene()
    assert UsdLoader().load(str(tmp_path / "main.usda"), scene)
    # ground (from base) + extra (from override) both present (sphere lights
    # may add an emissive proxy mesh on top)
    assert len(scene.meshes) >= 2
    # root layer's local opinion beats every sublayer (GPU light record
    # packs intensity into color[3], scene.py updateLight)
    assert any(abs(float(l.color[3]) - 42.0) < 1e-5 for l in scene.lights)
    # override layer (stronger sublayer) wins displayColor on ground
    reds = [m for m in scene.materials if np.allclose(m.color, [0.9, 0.1, 0.1], atol=1e-5)]
    assert reds, [m.color for m in scene.materials]


def test_inherits_composition(tmp_path):
    """`inherits = </Class/X>` grafts class-prim opinions (weaker than local)."""
    (tmp_path / "inh.usda").write_text(
        """#usda 1.0
(
    defaultPrim = "World"
)
class Xform "Shapes"
{
    class Mesh "TriBase"
    {
        point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
        int[] faceVertexIndices = [0, 1, 2]
        int[] faceVertexCounts = [3]
        color3f[] primvars:displayColor = [(0, 0, 1)]
    }
}
def Xform "World"
{
    def Mesh "tri" (
        inherits = </Shapes/TriBase>
    )
    {
        color3f[] primvars:displayColor = [(1, 1, 0)]
    }
}
"""
    )
    scene = Scene()
    assert UsdLoader().load(str(tmp_path / "inh.usda"), scene)
    assert len(scene.meshes) == 1  # class prims themselves don't bake
    # local displayColor opinion wins over the inherited one
    assert any(np.allclose(m.color, [1, 1, 0], atol=1e-5) for m in scene.materials)


def test_pxr_adapter_without_pxr():
    """Graceful degradation contract when pxr is absent (this env)."""
    from strelka_tpu.hydra import pxr_adapter as PA

    if PA.pxr_available():
        pytest.skip("pxr present; covered by test_pxr_stage_flatten")
    assert PA.open_stage_flattened("/nonexistent.usda") is None
    assert PA.load_with_pxr("/nonexistent.usda", Scene()) is False
    assert PA.register() is True
    plugin = PA.get_renderer_plugin()
    assert plugin is not None and plugin.is_supported()


def test_pxr_stage_flatten(tmp_path):
    """Real-pxr path: full composition via Usd.Stage.Flatten feeding our own
    parser (skipped without pxr — the env has none; runs wherever pxr
    exists, making the Hydra/USD claim falsifiable; VERDICT r4 task 8)."""
    pytest.importorskip("pxr")
    from strelka_tpu.hydra import pxr_adapter as PA

    (tmp_path / "sub.usda").write_text(
        """#usda 1.0
def Mesh "tri"
{
    point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
    int[] faceVertexIndices = [0, 1, 2]
    int[] faceVertexCounts = [3]
}
"""
    )
    (tmp_path / "top.usda").write_text(
        """#usda 1.0
(
    subLayers = [@sub.usda@]
)
"""
    )
    scene = Scene()
    assert PA.load_with_pxr(str(tmp_path / "top.usda"), scene)
    assert len(scene.meshes) == 1
