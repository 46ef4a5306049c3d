"""Texture system: host-side manager + device atlas with bilinear sampling.

The TPU replacement for CUDA texture objects (OptixRender::loadTextureFromFile
stb->cudaArray + filtered tex objects, OptixRender.cpp:1191-1268, and the MDL
texture runtime tex_lookup_float4_2d, texture_support_cuda.h:287-528).

Design: all textures are packed into ONE [n_layers, S, S, 4] float32 array
(layers of a fixed atlas resolution; images are resized to the atlas size at
load). A texture id indexes the layer. Sampling is a branchless bilinear
gather with wrap addressing — 4 gathers + lerp on the VPU, batched over the
whole wavefront. sRGB decode happens at LOAD time for color textures
(mirroring the reference's gamma adjust at canvas readback,
materialmanager.cpp:686-737), so device sampling is linear.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional

import numpy as np

from strelka_tpu import log


class TextureAtlas(NamedTuple):
    """Device-side texture array. data: [L, S, S, 4] f32 (linear)."""

    data: object  # jnp [L,S,S,4]
    size: int


class TextureManager:
    """Host registry: load images, dedupe by path, pack the atlas.

    The 'registerResource' analog (materialmanager.cpp:611-618): textures get
    integer ids that material params reference.
    """

    def __init__(self, atlas_size: int = 512, search_path: str = ""):
        self.atlas_size = atlas_size
        self.search_path = search_path
        self._images: List[np.ndarray] = []
        self._path_to_id = {}

    def load(self, path: str, srgb: bool = True) -> int:
        """Load (or look up) an image file; returns texture id or -1."""
        key = (path, srgb)
        if key in self._path_to_id:
            return self._path_to_id[key]
        full = path
        if not os.path.isabs(full) and self.search_path:
            cand = os.path.join(self.search_path, path)
            if os.path.exists(cand):
                full = cand
        if not os.path.exists(full):
            log.warning("Texture not found: {}", path)
            return -1
        try:
            from PIL import Image

            img = Image.open(full).convert("RGBA")
        except Exception as e:  # noqa: BLE001
            log.warning("Texture load failed for {}: {}", path, e)
            return -1
        s = self.atlas_size
        img = img.resize((s, s), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        if srgb:
            rgb = arr[..., :3]
            # exact sRGB EOTF (cuda/helpers.h toSRGB inverse)
            lin = np.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4)
            arr = np.concatenate([lin, arr[..., 3:]], axis=-1)
        tex_id = len(self._images)
        self._images.append(arr.astype(np.float32))
        self._path_to_id[key] = tex_id
        log.debug("Loaded texture {} -> id {}", path, tex_id)
        return tex_id

    def add_array(self, arr: np.ndarray, name: str = "") -> int:
        """Register an in-memory [H,W,3|4] float image (tests, procedural)."""
        s = self.atlas_size
        a = np.asarray(arr, np.float32)
        if a.shape[-1] == 3:
            a = np.concatenate([a, np.ones(a.shape[:-1] + (1,), np.float32)], -1)
        if a.shape[0] != s or a.shape[1] != s:
            # nearest resize (host, cheap)
            yi = (np.arange(s) * a.shape[0] // s).astype(np.int64)
            xi = (np.arange(s) * a.shape[1] // s).astype(np.int64)
            a = a[yi][:, xi]
        tex_id = len(self._images)
        self._images.append(a)
        if name:
            self._path_to_id[(name, False)] = tex_id
        return tex_id

    @property
    def count(self) -> int:
        return len(self._images)

    def build_atlas(self) -> Optional[TextureAtlas]:
        import jax.numpy as jnp

        if not self._images:
            return None
        data = jnp.asarray(np.stack(self._images))
        return TextureAtlas(data=data, size=self.atlas_size)


def sample_bilinear(atlas: TextureAtlas, tex_id, uv):
    """Bilinear wrap-mode lookup (tex_lookup_float4_2d equivalent).

    tex_id: [N] int32 (< 0 -> returns ones). uv: [N,2]. -> [N,4] f32.
    V is flipped (image row 0 = v 1) to match GL/CUDA texture convention.
    """
    import jax.numpy as jnp

    s = atlas.size
    layer = jnp.clip(tex_id, 0, atlas.data.shape[0] - 1)
    u = uv[..., 0]
    v = 1.0 - uv[..., 1]
    # wrap address mode (cudaAddressModeWrap)
    fu = (u % 1.0) * s - 0.5
    fv = (v % 1.0) * s - 0.5
    x0 = jnp.floor(fu)
    y0 = jnp.floor(fv)
    tx = (fu - x0)[..., None]
    ty = (fv - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), s)
    y0i = jnp.mod(y0.astype(jnp.int32), s)
    x1i = jnp.mod(x0i + 1, s)
    y1i = jnp.mod(y0i + 1, s)
    c00 = atlas.data[layer, y0i, x0i]
    c10 = atlas.data[layer, y0i, x1i]
    c01 = atlas.data[layer, y1i, x0i]
    c11 = atlas.data[layer, y1i, x1i]
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    out = top * (1 - ty) + bot * ty
    return jnp.where((tex_id >= 0)[..., None], out, jnp.ones_like(out))


def apply_normal_map(normal, tangent, binormal, tex_rgb):
    """Perturb the shading normal with a tangent-space normal map sample."""
    import jax.numpy as jnp

    n_ts = tex_rgb * 2.0 - 1.0
    out = (
        n_ts[..., 0:1] * tangent + n_ts[..., 1:2] * binormal + n_ts[..., 2:3] * normal
    )
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return jnp.where(norm > 1e-8, out / jnp.maximum(norm, 1e-8), normal)
