"""MaterialX (.mtlx) ingestion — the MtlxMdlCodeGen capability.

The reference translates MaterialX documents to MDL source via the MaterialX
SDK (src/materialmanager/mtlxMdlCodeGen.cpp:215-257) and compiles that with
the MDL toolchain. On TPU the material destination is the dense parameter
table (strelka_tpu.materials), so the translation target is the SAME
parameter set — we parse the mtlx XML directly (stdlib xml.etree; the
environment has no MaterialX SDK) and find the single renderable
surface-shader element exactly like _FindSurfaceShaderElement
(mtlxMdlCodeGen.cpp:183-212).

Supported shading models: UsdPreviewSurface and standard_surface (the two
node types the reference's data path produces), plus <image>/<tiledimage>
file inputs and <surfacematerial> indirection.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, Optional

import numpy as np

from strelka_tpu import log
from strelka_tpu.scene.scene import MaterialDescription

# mtlx input name -> our canonical material param (materials.py tables)
_PARAM_MAP = {
    # UsdPreviewSurface
    "diffuseColor": "diffuse_color_constant",
    "roughness": "reflection_roughness_constant",
    "metallic": "metallic_constant",
    "ior": "ior",
    "opacity": "opacity",
    "emissiveColor": "emissive_color",
    # standard_surface
    "base_color": "diffuse_color_constant",
    "specular_roughness": "reflection_roughness_constant",
    "metalness": "metallic_constant",
    "specular_IOR": "ior",
    "emission_color": "emissive_color",
    "transmission": "transmission",
}

_TEXTURE_PARAM_MAP = {
    "diffuseColor": "diffuse_texture",
    "base_color": "diffuse_texture",
    "roughness": "reflectionroughness_texture",
    "specular_roughness": "reflectionroughness_texture",
    "metallic": "metallic_texture",
    "metalness": "metallic_texture",
    "normal": "normalmap_texture",
}

_SURFACE_NODE_TYPES = ("UsdPreviewSurface", "standard_surface")


def _strip_ns(tag: str) -> str:
    return tag.split("}")[-1]


def _parse_value(type_str: str, value: str):
    if type_str in ("float", "integer"):
        return float(value)
    if type_str in ("color3", "vector3", "color4", "vector2"):
        return np.asarray([float(v) for v in value.split(",")], np.float32)
    if type_str == "boolean":
        return value.strip().lower() == "true"
    return value


def _find_surface_shader(root) -> Optional[ET.Element]:
    """_FindSurfaceShaderElement (mtlxMdlCodeGen.cpp:183-212): prefer the
    shader referenced by a surfacematerial, else the first surface node."""
    nodes = {n.get("name"): n for n in root if n.get("name")}
    for n in root:
        if _strip_ns(n.tag) == "surfacematerial":
            for inp in n:
                if inp.get("name") == "surfaceshader" and inp.get("nodename") in nodes:
                    cand = nodes[inp.get("nodename")]
                    if _strip_ns(cand.tag) in _SURFACE_NODE_TYPES:
                        return cand
    for n in root:
        if _strip_ns(n.tag) in _SURFACE_NODE_TYPES:
            return n
    return None


def parse_mtlx(xml_text: str, name: str = "") -> MaterialDescription:
    """MaterialX document -> MaterialDescription with canonical params."""
    root = ET.fromstring(xml_text)
    desc = MaterialDescription(type="mtlx", name=name or root.get("name", "mtlx"), file="OmniPBR.mdl")
    shader = _find_surface_shader(root)
    if shader is None:
        log.warning("mtlx: no renderable surface shader element found")
        return desc
    desc.name = shader.get("name", desc.name)
    # image nodes by name for texture indirection
    images: Dict[str, str] = {}
    for n in root.iter():
        if _strip_ns(n.tag) in ("image", "tiledimage"):
            for inp in n:
                if inp.get("name") == "file" and inp.get("value"):
                    images[n.get("name", "")] = inp.get("value")

    for inp in shader:
        if _strip_ns(inp.tag) != "input":
            continue
        in_name = inp.get("name", "")
        if inp.get("value") is not None and in_name in _PARAM_MAP:
            val = _parse_value(inp.get("type", "float"), inp.get("value"))
            desc.params[_PARAM_MAP[in_name]] = val
            if _PARAM_MAP[in_name] == "diffuse_color_constant":
                desc.has_color = True
                desc.color = np.asarray(val, np.float32)
        elif inp.get("nodename") in images and in_name in _TEXTURE_PARAM_MAP:
            desc.params[_TEXTURE_PARAM_MAP[in_name]] = images[inp.get("nodename")]
    # transmission -> glass model
    if float(np.asarray(desc.params.get("transmission", 0.0)).reshape(-1)[0] if "transmission" in desc.params else 0.0) > 0.5:
        desc.file = "OmniGlass.mdl"
    return desc


def load_mtlx_file(path: str) -> Optional[MaterialDescription]:
    try:
        with open(path, "r", encoding="utf-8") as f:
            return parse_mtlx(f.read())
    except (OSError, ET.ParseError) as e:
        log.error("mtlx load failed for {}: {}", path, e)
        return None
