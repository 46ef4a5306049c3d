"""Measure how cross-backend SSIM converges with golden-config sample count.

The bench SSIM gap (cornell 0.9877, coffeetable 0.9739, BENCH_r03/r4) is MC
path divergence: bf16 MXU closest-hit picks a different prim than f32 CPU on
borderline specular bounces (NOTES fact #45), so individual firefly paths
differ while both estimators share the same expectation. If that is the whole
story, SSIM must rise ~sqrt(spp). This probe renders a scene's golden config
at 1x and Nx launches on the CURRENT backend and writes the PNG; run it once
per backend and compare.

  CPU arm:  PROBE_CPU=1 python scripts/ssim_spp_probe.py cornell 4 /tmp/c_cpu4.png
  TPU arm:            python scripts/ssim_spp_probe.py cornell 4 /tmp/c_tpu4.png
  SSIM:     python scripts/ssim_spp_probe.py --ssim /tmp/c_cpu4.png /tmp/c_tpu4.png
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


USAGE = """usage:
  ssim_spp_probe.py <scene> <launches_mult> <out.png>     render arm
  PROBE_CPU=1 ssim_spp_probe.py <scene> <mult> <out.png>  CPU arm
  ssim_spp_probe.py --ssim <a.png> <b.png>                compare"""


def main():
    argc_ok = (len(sys.argv) == 4 and sys.argv[1] == "--ssim") or (
        len(sys.argv) == 4 and sys.argv[2].isdigit()
    )
    if not argc_ok:
        print(USAGE, file=sys.stderr)
        sys.exit(2)
    if sys.argv[1] == "--ssim":
        from strelka_tpu.utils.image import read_png, ssim

        a = read_png(sys.argv[2])[..., :3]
        b = read_png(sys.argv[3])[..., :3]
        print(f"ssim {sys.argv[2]} vs {sys.argv[3]}: {ssim(a, b):.4f}", flush=True)
        return

    import jax

    if os.environ.get("PROBE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from bench import render_golden_config
    from strelka_tpu.utils.image import write_png

    name, mult, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    t0 = time.time()
    img = render_golden_config(name, launches_mult=mult)
    write_png(out, img, flip=False)
    print(f"{name} x{mult} -> {out} mean={img.mean():.5f} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
