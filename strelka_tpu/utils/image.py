"""Image IO + metrics: PNG write (screenshot path parity) and SSIM.

Reference: screenshots via stb/HioImage (hdRunner/main.cpp:407-441). Row 0 of
the framebuffer is pixel y=0 which is the BOTTOM of the view (NDC y=-1), so
PNGs are written flipped to read upright.
"""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray, flip: bool = True) -> None:
    """img: [H,W,3|4] float (0..1) or uint8."""
    from PIL import Image

    if img.dtype != np.uint8:
        img = to_uint8(img)
    if flip:
        img = img[::-1]
    Image.fromarray(img[..., :3]).save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), dtype=np.float32) / 255.0


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Mean SSIM over channels (Wang et al. 2004, 11x11 gaussian window)."""
    from scipy.ndimage import gaussian_filter

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    sig = 1.5
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mu_x = gaussian_filter(x, sig)
        mu_y = gaussian_filter(y, sig)
        sxx = gaussian_filter(x * x, sig) - mu_x**2
        syy = gaussian_filter(y * y, sig) - mu_y**2
        sxy = gaussian_filter(x * y, sig) - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / ((mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))
