"""Profile one launch of any bench scene; parse the perfetto trace for op
timings. Usage: python scripts/profile_scene.py <scene> [WxH] [spp] [depth]

Generalizes profile_box.py to every bench.build_host_scene config so the
kitchen/hair breakdowns come from the same harness as box_field.
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

import bench
from strelka_tpu.ops import integrator as I
from strelka_tpu.render.device_scene import build_device_scene

scene_name = sys.argv[1] if len(sys.argv) > 1 else "box_field"
wh = sys.argv[2] if len(sys.argv) > 2 else "512x512"
W, H = (int(x) for x in wh.split("x"))
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 2
depth = int(sys.argv[4]) if len(sys.argv) > 4 else 4

host = bench.build_host_scene(scene_name)
scene = build_device_scene(host)
cam = host.get_camera(0)
cam.update_aspect_ratio(W / H)
params = I.LaunchParams(
    subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([6.25e-4] * 3, jnp.float32),
    bg_color=jnp.zeros(3, jnp.float32),
)
state = I.make_frame_state(H, W)


def step(scene, params, state):
    return I.render_launch(
        scene, params, state, width=W, height=H, samples_per_launch=spp,
        max_sample_count=10000, max_depth=depth, enable_accumulation=True,
    )


fn = jax.jit(step, donate_argnums=(2,))
t0 = time.perf_counter()
state, image = fn(scene, params, state)
_ = np.asarray(image[0, 0])
print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)
os.makedirs("/tmp/jaxprof", exist_ok=True)
with jax.profiler.trace("/tmp/jaxprof"):
    state, image = fn(scene, params, state)
    _ = np.asarray(image[0, 0])
print("trace captured", flush=True)

files = sorted(glob.glob("/tmp/jaxprof/**/*.trace.json.gz", recursive=True))
print("file:", files[-1], flush=True)
with gzip.open(files[-1], "rt") as f:
    data = json.load(f)
events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X" and e.get("dur")]
agg = defaultdict(float)
for e in events:
    agg[e.get("name", "")] += e["dur"]
cat = defaultdict(float)
for name, us in agg.items():
    if name.startswith("$") or "asarray" in name or "Pjit" in name or name.startswith("jit_"):
        continue
    key = ("pallas_cones" if "cones" in name else
           "pallas_closest" if "closest" in name else
           "pallas_any" if "any" in name else
           "pallas_sampler" if "random_dims" in name else
           "pallas_open_w" if "open_w" in name else
           "pallas_gather" if "gather_rows" in name else
           "slice_reduce(transposes)" if "slice_reduce" in name else
           "sort" if "sort" in name.lower() else
           "scatter" if "scatter" in name.lower() else
           "gather" if "gather" in name.lower() else
           "copy" if name.startswith("copy") else
           "fusion(misc)" if "fusion" in name else name.split(".")[0].split("(")[0])
    cat[key] += us
print("=== categories ===")
for name, us in sorted(cat.items(), key=lambda kv: -kv[1])[:22]:
    print(f"{us/1e3:9.2f} ms  {name}")
print("=== top ops ===")
for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{us/1e3:9.2f} ms  {name[:110]}")
