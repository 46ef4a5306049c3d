"""Texture system: host-side manager + device atlas with bilinear sampling.

The TPU replacement for CUDA texture objects (OptixRender::loadTextureFromFile
stb->cudaArray + filtered tex objects, OptixRender.cpp:1191-1268, and the MDL
texture runtime tex_lookup_float4_2d, texture_support_cuda.h:287-528).

Design: textures keep their NATIVE resolution (capped at MAX_DIM) and are
shelf-packed into one [H, W, 4] float32 sheet; a per-texture rect table
(x0, y0, w, h, wrap) maps texture ids to sheet regions. Sampling is a
branchless bilinear gather with per-texture wrap OR clamp addressing — 4
gathers + lerp on the VPU, batched over the whole wavefront. sRGB decode
happens at LOAD time for color textures (mirroring the reference's gamma
adjust at canvas readback, materialmanager.cpp:686-737), so device sampling
is linear.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional

import numpy as np

from strelka_tpu import log

MAX_DIM = 2048  # native detail preserved up to this edge length

ADDRESS_WRAP = 0  # cudaAddressModeWrap
ADDRESS_CLAMP = 1  # cudaAddressModeClamp


class TextureAtlas(NamedTuple):
    """Device-side texture sheet.

    data:  jnp [H, W, 4] f32 (linear)
    rects: jnp [L, 5] i32 — (x0, y0, w, h, address_mode) per texture id
    """

    data: object
    rects: object
    size: int  # sheet width (kept for back-compat introspection)


def _resize_bilinear(im: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side bilinear resize of an [H,W,C] f32 image (no PIL dependency
    for in-memory arrays)."""
    h, w = im.shape[:2]
    yy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(yy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    ty = np.clip(yy - y0, 0.0, 1.0)[:, None, None]
    tx = np.clip(xx - x0, 0.0, 1.0)[None, :, None]
    top = im[y0][:, x0] * (1 - tx) + im[y0][:, x1] * tx
    bot = im[y1][:, x0] * (1 - tx) + im[y1][:, x1] * tx
    return (top * (1 - ty) + bot * ty).astype(np.float32)


class TextureManager:
    """Host registry: load images at native size, dedupe by path, shelf-pack
    the sheet. The 'registerResource' analog (materialmanager.cpp:611-618):
    textures get integer ids that material params reference.
    """

    def __init__(self, atlas_size: int = MAX_DIM, search_path: str = ""):
        self.max_dim = atlas_size
        self.search_path = search_path
        self._images: List[np.ndarray] = []
        self._modes: List[int] = []
        self._path_to_id = {}

    def load(self, path: str, srgb: bool = True, address_mode: int = ADDRESS_WRAP) -> int:
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
        w, h = img.size
        if max(w, h) > self.max_dim:
            s = self.max_dim / max(w, h)
            img = img.resize((max(1, int(w * s)), max(1, int(h * s))), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        if srgb:
            rgb = arr[..., :3]
            # exact sRGB EOTF (cuda/helpers.h toSRGB inverse)
            lin = np.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4)
            arr = np.concatenate([lin, arr[..., 3:]], axis=-1)
        tex_id = len(self._images)
        self._images.append(arr.astype(np.float32))
        self._modes.append(address_mode)
        self._path_to_id[key] = tex_id
        log.debug("Loaded texture {} ({}x{}) -> id {}", path, arr.shape[1], arr.shape[0], tex_id)
        return tex_id

    def add_array(self, arr: np.ndarray, name: str = "", address_mode: int = ADDRESS_WRAP) -> int:
        """Register an in-memory [H,W,3|4] float image (tests, procedural)."""
        a = np.asarray(arr, np.float32)
        if a.shape[-1] == 3:
            a = np.concatenate([a, np.ones(a.shape[:-1] + (1,), np.float32)], -1)
        tex_id = len(self._images)
        self._images.append(a)
        self._modes.append(address_mode)
        if name:
            self._path_to_id[(name, False)] = tex_id
        return tex_id

    @property
    def count(self) -> int:
        return len(self._images)

    def build_atlas(self) -> Optional[TextureAtlas]:
        """Shelf-pack all textures at native size into one sheet."""
        import jax.numpy as jnp

        if not self._images:
            return None
        sheet_w = max(128, min(self.max_dim, max(im.shape[1] for im in self._images)))
        sheet_w = 1 << (sheet_w - 1).bit_length()  # pow2 lanes
        # shelves: place tallest-first rows
        # downscale (never crop) any registered image wider than the sheet —
        # loader-capped images are safe, in-memory add_array() ones may not be
        for i, im in enumerate(self._images):
            h, w = im.shape[:2]
            if w > sheet_w:
                s = sheet_w / w
                self._images[i] = _resize_bilinear(im, max(1, int(round(h * s))), sheet_w)
                log.warning(
                    "Texture {} ({}x{}) wider than sheet ({}); downscaled", i, w, h, sheet_w
                )
        order = sorted(range(len(self._images)), key=lambda i: -self._images[i].shape[0])
        rects = np.zeros((len(self._images), 5), np.int32)
        x = y = shelf_h = 0
        for i in order:
            h, w = self._images[i].shape[:2]
            if x + w > sheet_w:
                y += shelf_h
                x = shelf_h = 0
            rects[i] = (x, y, w, h, self._modes[i])
            x += w
            shelf_h = max(shelf_h, h)
        total_h = y + shelf_h
        sheet = np.zeros((total_h, sheet_w, 4), np.float32)
        for i, im in enumerate(self._images):
            x0, y0, w, h, _ = rects[i]
            sheet[y0 : y0 + h, x0 : x0 + w] = im[:h, :w]
        log.info(
            "Texture sheet: {} textures packed into {}x{} ({:.1f} MB)",
            len(self._images), sheet_w, total_h, sheet.nbytes / 1e6,
        )
        return TextureAtlas(data=jnp.asarray(sheet), rects=jnp.asarray(rects), size=sheet_w)


def sample_bilinear(atlas: TextureAtlas, tex_id, uv):
    """Bilinear lookup with per-texture wrap/clamp addressing
    (tex_lookup_float4_2d equivalent, texture_support_cuda.h:287-528).

    tex_id: [N] int32 (< 0 -> returns ones). uv: [N,2]. -> [N,4] f32.
    V is flipped (image row 0 = v 1) to match GL/CUDA texture convention.
    """
    import jax.numpy as jnp

    from strelka_tpu.ops.vec import gather_rows_t

    layer = jnp.clip(tex_id, 0, atlas.rects.shape[0] - 1)
    r = gather_rows_t(atlas.rects, layer)  # [5, N] i32
    x0, y0, w, h, mode = r[0], r[1], r[2], r[3], r[4]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    u = uv[..., 0]
    v = 1.0 - uv[..., 1]
    clamp = mode == ADDRESS_CLAMP
    uu = jnp.where(clamp, jnp.clip(u, 0.0, 1.0), u % 1.0)
    vv = jnp.where(clamp, jnp.clip(v, 0.0, 1.0), v % 1.0)
    fu = uu * wf - 0.5
    fv = vv * hf - 0.5
    xb = jnp.floor(fu)
    yb = jnp.floor(fv)
    tx = (fu - xb)[..., None]
    ty = (fv - yb)[..., None]

    def addr(i, extent):
        wrapped = jnp.mod(i, extent)
        clamped = jnp.clip(i, 0, extent - 1)
        return jnp.where(clamp, clamped, wrapped)

    x0i = addr(xb.astype(jnp.int32), w)
    y0i = addr(yb.astype(jnp.int32), h)
    x1i = addr(xb.astype(jnp.int32) + 1, w)
    y1i = addr(yb.astype(jnp.int32) + 1, h)
    c00 = atlas.data[y0 + y0i, x0 + x0i]
    c10 = atlas.data[y0 + y0i, x0 + x1i]
    c01 = atlas.data[y0 + y1i, x0 + x0i]
    c11 = atlas.data[y0 + y1i, x0 + x1i]
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
