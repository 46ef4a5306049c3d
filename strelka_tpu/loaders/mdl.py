"""MDL (.mdl) source ingestion — parameter-default extraction.

The reference compiles MDL source through the NVIDIA MDL SDK (neuray ->
CLASS_COMPILATION -> PTX, src/materialmanager/mdlMaterialCompiler.cpp +
mdlPtxCodeGen.cpp). The TPU build's material destination is the analytic
BSDF table, so what it needs from a .mdl FILE is: which material model
(by name) and the declared parameter DEFAULTS (the arg-block initial
values). This module extracts `export material Name(params...)` signatures
with a small tokenizer — enough for OmniPBR/OmniGlass/default-style
materials, with unknown constructs skipped gracefully.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

from strelka_tpu import log

_MATERIAL_RE = re.compile(r"export\s+material\s+(\w+)\s*\(", re.MULTILINE)
_PARAM_RE = re.compile(
    r"""
    (?P<type>uniform\s+\w+|\w+)\s+          # type (possibly 'uniform T')
    (?P<name>\w+)\s*
    (?:=\s*(?P<default>[^,()]*(?:\([^()]*\))?[^,()]*))?  # default expr
    \s*(?:,|$)
    """,
    re.VERBOSE,
)
_COLOR_RE = re.compile(r"color\s*\(([^)]*)\)")
_FLOAT_RE = re.compile(r"^[-+]?(\d+\.?\d*|\.\d+)([eEf][-+]?\d*)?$")
_TEXTURE_RE = re.compile(r'texture_2d\s*\(\s*"([^"]*)"')


def _strip_annotations(text: str) -> str:
    """Remove [[ ... ]] annotation blocks (possibly nested brackets)."""
    out = []
    i = 0
    while i < len(text):
        if text.startswith("[[", i):
            depth = 1
            i += 2
            while i < len(text) and depth > 0:
                if text.startswith("[[", i):
                    depth += 1
                    i += 2
                elif text.startswith("]]", i):
                    depth -= 1
                    i += 2
                else:
                    i += 1
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def _strip_comments(text: str) -> str:
    text = re.sub(r"//[^\n]*", "", text)
    return re.sub(r"/\*.*?\*/", "", text, flags=re.DOTALL)


def _split_params(paramlist: str) -> List[str]:
    """Split on commas at paren depth 0."""
    parts, depth, cur = [], 0, []
    for ch in paramlist:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


def _parse_default(expr: str):
    expr = expr.strip()
    if not expr:
        return None
    m = _COLOR_RE.search(expr)
    if m:
        comps = [c.strip().rstrip("f") for c in m.group(1).split(",")]
        try:
            vals = [float(c) for c in comps if c]
        except ValueError:
            return None
        if len(vals) == 1:
            vals = vals * 3
        return vals[:3]
    m = _TEXTURE_RE.search(expr)
    if m:
        return m.group(1)
    if expr in ("true", "false"):
        return expr == "true"
    e = expr.rstrip("f")
    if _FLOAT_RE.match(e):
        return float(e)
    return None


def parse_mdl_materials(text: str) -> Dict[str, Dict[str, object]]:
    """All exported materials in an MDL module -> {name: {param: default}}."""
    text = _strip_annotations(_strip_comments(text))
    result: Dict[str, Dict[str, object]] = {}
    for m in _MATERIAL_RE.finditer(text):
        name = m.group(1)
        # find the matching close paren of the signature
        start = m.end()
        depth = 1
        i = start
        while i < len(text) and depth > 0:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        paramlist = text[start : i - 1]
        params: Dict[str, object] = {}
        for part in _split_params(paramlist):
            pm = re.match(r"(uniform\s+)?(?P<type>\w+(::\w+)*)\s+(?P<name>\w+)\s*(=\s*(?P<default>.*))?$", part, re.DOTALL)
            if not pm:
                continue
            default = _parse_default(pm.group("default") or "")
            if default is not None:
                params[pm.group("name")] = default
        result[name] = params
    return result


class MdlModule:
    """A loaded MDL module (createModule analog, mdlMaterialCompiler.cpp:40-50)."""

    def __init__(self, path: str, materials: Dict[str, Dict[str, object]], has_hair: bool = False):
        self.path = path
        self.materials = materials
        # material uses an MDL hair df — the reference switches the link unit
        # to "hair" instead of surface.scattering when the hair expression is
        # non-constant (mdlPtxCodeGen.cpp:143-158)
        self.has_hair = has_hair


def load_mdl_module(file: str, search_paths: List[str]) -> Optional[MdlModule]:
    """Resolve an .mdl file against search paths and parse its materials."""
    candidates = [file]
    for sp in search_paths:
        candidates.append(os.path.join(sp, file))
    for cand in candidates:
        if os.path.exists(cand):
            try:
                with open(cand, "r", encoding="utf-8") as f:
                    text = f.read()
                has_hair = "hair_bsdf" in text or "df::hair" in text
                return MdlModule(cand, parse_mdl_materials(text), has_hair=has_hair)
            except OSError as e:
                log.warning("mdl read failed {}: {}", cand, e)
                return None
    return None
