"""Profile one box_field launch; parse the perfetto trace for op timings."""
import glob, gzip, json, sys, time, os
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from strelka_tpu.ops import integrator as I
from strelka_tpu.render.device_scene import build_device_scene
from strelka_tpu.scene.testscenes import box_field, cornell_box

import sys as _sys
W = H = 512; spp = 4 if "cornell" in _sys.argv else 2; depth = 4
sh = cornell_box(light_intensity=5000., metal_box=True, glass_sphere=True) if "cornell" in _sys.argv else box_field(grid=48)
scene = build_device_scene(sh)
cam = sh.get_camera(0); cam.update_aspect_ratio(1.0)
params = I.LaunchParams(subframe_index=jnp.int32(0),
    clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
    view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
    exposure=jnp.asarray([6.25e-4]*3, jnp.float32), bg_color=jnp.zeros(3, jnp.float32))
state = I.make_frame_state(H, W)
def step(scene, params, state):
    return I.render_launch(scene, params, state, width=W, height=H,
        samples_per_launch=spp, max_sample_count=10000, max_depth=depth, enable_accumulation=True)
fn = jax.jit(step, donate_argnums=(2,))
state, image = fn(scene, params, state)
_ = np.asarray(image[0, 0])
os.makedirs("/tmp/jaxprof", exist_ok=True)
with jax.profiler.trace("/tmp/jaxprof"):
    state, image = fn(scene, params, state)
    _ = np.asarray(image[0, 0])
print("trace captured", flush=True)
# parse newest trace.json.gz
files = sorted(glob.glob("/tmp/jaxprof/**/*.trace.json.gz", recursive=True))
print("files:", files[-1:], flush=True)
with gzip.open(files[-1], "rt") as f:
    data = json.load(f)
events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X" and e.get("dur")]
# keep device-lane events (TensorFlow Op / XLA Op lanes)
from collections import defaultdict
agg = defaultdict(float)
for e in events:
    name = e.get("name", "")
    agg[name] += e["dur"]
# category aggregation over ALL events (device lanes only: skip host $ frames)
cat = defaultdict(float)
for name, us in agg.items():
    if name.startswith("$") or "asarray" in name or "Pjit" in name or name.startswith("jit_"):
        continue
    key = ("pallas_closest" if "closest" in name else
           "pallas_any" if "any" in name else
           "pallas_sampler" if "random_dims" in name else
           "pallas_cones" if "cones" in name else
           "slice_reduce(transposes)" if "slice_reduce" in name else
           "sort" if "sort" in name.lower() else
           "scatter" if "scatter" in name.lower() else
           "gather" if "gather" in name.lower() else
           "copy" if name.startswith("copy") else
           "fusion(misc)" if "fusion" in name else name.split(".")[0].split("(")[0])
    cat[key] += us
print("=== categories ===")
for name, us in sorted(cat.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{us/1e3:9.2f} ms  {name}")
top = sorted(agg.items(), key=lambda kv: -kv[1])[:35]
for name, us in top:
    print(f"{us/1e3:9.2f} ms  {name[:110]}")
