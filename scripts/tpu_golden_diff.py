"""Render a scene's golden config on the CURRENT backend and write the
render + abs-diff-vs-golden images for visual inspection.

Usage: python scripts/tpu_golden_diff.py <scene> [outdir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from strelka_tpu.utils.image import read_png, ssim, write_png

name = sys.argv[1] if len(sys.argv) > 1 else "coffeetable"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp"

img = bench.render_golden_config(name)
g = read_png(os.path.join("goldens", f"{name}_golden.png"))[..., :3]
d = np.abs(img.astype(np.float64) - g.astype(np.float64))
print(f"{name}: ssim={ssim(img, g):.4f} maxdiff={d.max():.4f} meandiff={d.mean():.6f}")
ys, xs = np.unravel_index(np.argmax(d.sum(-1)), d.shape[:2])
print(f"worst pixel ({ys},{xs}): render={img[ys, xs]} golden={g[ys, xs]}")
write_png(os.path.join(outdir, f"{name}_tpu.png"), img, flip=False)
write_png(
    os.path.join(outdir, f"{name}_diff.png"),
    np.clip(d / max(d.max(), 1e-9), 0, 1).astype(np.float32),
    flip=False,
)
# 4x-upscaled diff for small goldens
big = np.repeat(np.repeat(np.clip(d * 8, 0, 1), 4, 0), 4, 1).astype(np.float32)
write_png(os.path.join(outdir, f"{name}_diff8x.png"), big, flip=False)
print("wrote", outdir, f"{name}_tpu.png / {name}_diff.png / {name}_diff8x.png")
