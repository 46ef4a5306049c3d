"""glTF loader tests: synthesized assets exercised end-to-end."""

import base64
import json
import os
import struct

import numpy as np
import pytest

from strelka_tpu.loaders.gltf import GltfLoader
from strelka_tpu.scene.scene import InstanceType, Scene


def _quad_gltf_doc():
    """A 2-triangle quad with normals+uvs, a node TRS, camera, material."""
    positions = np.array(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 3, 2, 0, 2, 1], np.uint16)  # CCW so geometric normal = +y (matches NORMAL)
    blob = positions.tobytes() + normals.tobytes() + uvs.tobytes() + indices.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 2]}],
        "nodes": [
            {"mesh": 0, "translation": [0, 1, 0], "scale": [2, 2, 2], "name": "quad"},
            {"camera": 0, "translation": [0, 3, 5], "name": "camnode"},
            {"children": [1], "name": "camroot"},
        ],
        "cameras": [
            {"type": "perspective", "name": "cam0", "perspective": {"yfov": 0.8, "znear": 0.1, "zfar": 100}}
        ],
        "materials": [
            {
                "name": "mat0",
                "alphaMode": "OPAQUE",
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
                    "metallicFactor": 0.25,
                    "roughnessFactor": 0.6,
                },
            },
            {"name": "glassy", "alphaMode": "BLEND", "pbrMetallicRoughness": {"roughnessFactor": 0.1}},
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }
    return doc, blob


def test_load_gltf_with_data_uri(tmp_path):
    doc, blob = _quad_gltf_doc()
    doc["buffers"][0]["uri"] = "data:application/octet-stream;base64," + base64.b64encode(blob).decode()
    path = tmp_path / "quad.gltf"
    path.write_text(json.dumps(doc))
    scene = Scene()
    assert GltfLoader().load_gltf(str(path), scene)
    # 2 materials converted (OmniPBR + OmniGlass)
    assert len(scene.materials) == 2
    assert scene.materials[0].file == "OmniPBR.mdl"
    assert scene.materials[0].params["metallic_constant"] == pytest.approx(0.25)
    assert scene.materials[1].file == "OmniGlass.mdl"
    # default distant light injected (no sidecar)
    assert len(scene.lights) == 1
    assert scene.lights[0].type == 3
    # quad mesh instanced with node TRS baked
    mesh_insts = [i for i in scene.instances if i.type == InstanceType.eMesh]
    assert len(mesh_insts) == 1
    assert np.allclose(mesh_insts[0].transform[:3, 3], [0, 1, 0])
    assert np.allclose(np.diag(mesh_insts[0].transform)[:3], [2, 2, 2])
    # camera: position from node transform, fov converted to degrees
    cam = scene.get_camera(0)
    assert cam.fov == pytest.approx(0.8 * 180 / np.pi)
    assert np.allclose(cam.position, [0, 3, 5])


def test_load_glb(tmp_path):
    doc, blob = _quad_gltf_doc()
    json_bytes = json.dumps(doc).encode()
    json_bytes += b" " * ((4 - len(json_bytes) % 4) % 4)
    blob += b"\x00" * ((4 - len(blob) % 4) % 4)
    glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(json_bytes) + 8 + len(blob))
    glb += struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes
    glb += struct.pack("<II", len(blob), 0x004E4942) + blob
    path = tmp_path / "quad.glb"
    path.write_bytes(glb)
    scene = Scene()
    assert GltfLoader().load_gltf(str(path), scene)
    pos, nrm, tan, uv, idx = scene.vertex_pools()
    assert pos.shape == (4, 3)
    assert idx.tolist() == [0, 3, 2, 0, 2, 1]
    assert np.allclose(nrm[0], [0, 1, 0])


def test_light_sidecar(tmp_path):
    doc, blob = _quad_gltf_doc()
    doc["buffers"][0]["uri"] = "data:application/octet-stream;base64," + base64.b64encode(blob).decode()
    path = tmp_path / "scene.gltf"
    path.write_text(json.dumps(doc))
    (tmp_path / "scene_light.json").write_text(
        json.dumps(
            {
                "lights": [
                    {
                        "position": [0, 3, 0],
                        "orientation": [-90, 0, 0],
                        "width": 2.0,
                        "height": 1.5,
                        "color": [1, 0.9, 0.8],
                        "intensity": 500.0,
                    }
                ]
            }
        )
    )
    scene = Scene()
    assert GltfLoader().load_gltf(str(path), scene)
    assert len(scene.lights) == 1
    assert scene.lights[0].type == 0  # rect
    # light proxy instance exists
    light_insts = [i for i in scene.instances if i.type == InstanceType.eLight]
    assert len(light_insts) == 1
    # packed corners: width 2 x height 1.5 at y=3 facing -y
    pts = scene.lights[0].points[:, :3]
    assert np.allclose(pts[:, 1], 3.0, atol=1e-5)
    e1 = pts[1] - pts[0]
    e2 = pts[3] - pts[0]
    area = np.linalg.norm(np.cross(e1, e2))
    assert area == pytest.approx(3.0, rel=1e-4)


def test_render_loaded_gltf(tmp_path):
    """End-to-end: loaded glTF renders without NaNs."""
    doc, blob = _quad_gltf_doc()
    doc["buffers"][0]["uri"] = "data:application/octet-stream;base64," + base64.b64encode(blob).decode()
    path = tmp_path / "quad.gltf"
    path.write_text(json.dumps(doc))
    scene = Scene()
    assert GltfLoader().load_gltf(str(path), scene)

    from strelka_tpu.render.buffer import BufferDesc, BufferFormat
    from strelka_tpu.render.render import RenderFactory
    from strelka_tpu.settings import SharedContext, make_default_settings

    s = make_default_settings(32, 32)
    s.set("render/pt/sppTotal", 2)
    s.set("render/pt/spp", 2)
    ctx = SharedContext(s)
    r = RenderFactory.create_render()
    r.set_scene(scene)
    r.set_shared_context(ctx)
    r.init()
    buf = r.create_buffer(BufferDesc(32, 32, BufferFormat.FLOAT4))
    r.render(buf)
    img = buf.map()
    assert not np.isnan(img).any()
    assert img[..., :3].max() > 0.0  # distant light hits the quad


def test_update_animation_moves_camera_node():
    """updateAnimation ends by re-deriving the camera from its node
    (scene.cpp:303 parity) — a translation channel on the camera node must
    move the camera between frames (and the render layer's view-change
    detection then resets accumulation)."""
    import numpy as np

    from strelka_tpu.scene.camera import Camera
    from strelka_tpu.scene.scene import (
        Animation,
        AnimationChannel,
        AnimationSampler,
        Node,
        Scene,
    )

    scene = Scene()
    scene.nodes.append(Node(name="camnode"))
    cam = Camera(name="Main", fov=45.0, aspect=1.0)
    cam.node = 0
    scene.add_camera(cam)
    anim = Animation(
        samplers=[
            AnimationSampler(
                inputs=[0.0, 1.0],
                outputs_vec4=[
                    np.array([0.0, 0.0, 5.0, 0.0]),
                    np.array([3.0, 0.0, 5.0, 0.0]),
                ],
            )
        ],
        channels=[AnimationChannel(path="translation", node=0, sampler_index=0)],
        start=0.0,
        end=1.0,
    )
    scene.animations.append(anim)
    scene.update_animation(0.0)
    p0 = np.asarray(scene.get_camera(0).position).copy()
    v0 = np.asarray(scene.get_camera(0).matrices.view).copy()
    scene.update_animation(0.5)
    p1 = np.asarray(scene.get_camera(0).position)
    v1 = np.asarray(scene.get_camera(0).matrices.view)
    np.testing.assert_allclose(p0, [0.0, 0.0, 5.0], atol=1e-6)
    np.testing.assert_allclose(p1, [1.5, 0.0, 5.0], atol=1e-6)
    assert not np.allclose(v0, v1)
