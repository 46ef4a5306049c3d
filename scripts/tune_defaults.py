"""Auto-tune binary scheduling flags on the real chip -> tuned.json.

Each flag is A/B-timed in a fresh subprocess (flags are read at import/trace
time) on the scene class it affects; the winner is persisted via
strelka_tpu.tuned.write so later processes — including the driver's bench —
default to it without this session. Env vars still override everything.

A variant that CRASHES (e.g. a Mosaic compile failure on this chip) simply
loses, so an aggressive default can never sink the bench.

Usage: python scripts/tune_defaults.py           # tune all flags
       python scripts/tune_defaults.py --probe box:32   # internal timing mode
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

FLAGS = [
    # (name, scene, baked-in default). r4 hardware A/Bs settled and REMOVED
    # hit_predict / sort_once / ray_rounds (all lost e2e, r4_stage2.log);
    # phase1_fused and shadow grouping lost too and their defaults flipped
    # (r4_bisect.log) — not re-probed here.
    ("shadow_single", "box:48", False),
    ("flat_compact", "cornell", False),
    # flips big scenes to the MXU local-feats intersector; the mean-image
    # guard below rejects it if the numerics drift (oracle also checks)
    ("mxu_big", "box:48", False),
]
# integer-choice knobs: (name, scene, default, alternatives). Candidates are
# direct hardware A/Bs only — the r3 work-unit simulator's predictions were
# falsified e2e (NOTES fact #33) and the simulator was removed.
CHOICE_FLAGS = [
    # phase-1 sweeps K nearest superblocks per tile and its cost is linear
    # in K; smaller K pushes more lanes into the phase-2 work list. Scan
    # directly on the bench config (box:48 — r3 tuned on box:32 and its
    # "wins" did not transfer, VERDICT r3 weak #1/#2).
    ("residual_k", "box:48", 16, [8, 12, 24]),
    ("p2_tile", "box:48", 1024, [256, 512]),
    ("p1_tile", "box:48", 1024, [512]),
]
POST_FLAGS = []
MARGIN = 0.98  # challenger must be >=2% faster than the incumbent default


def probe(scene_name: str) -> None:
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    from strelka_tpu.ops import integrator as I
    from strelka_tpu.render.device_scene import build_device_scene
    from strelka_tpu.scene import testscenes as TS

    if scene_name == "cornell":
        sh = TS.cornell_box(light_intensity=5000.0, metal_box=True, glass_sphere=True)
        spp = 4
        width = height = 512
    elif scene_name.startswith("box:"):
        sh = TS.box_field(grid=int(scene_name.split(":")[1]))
        spp = 2
        width = height = 512
    else:  # any bench scene (kitchen, hair_patch, ...) at its bench config
        import bench

        sh = bench.build_host_scene(scene_name)
        spp = 2
        width = height = 384 if scene_name.startswith("hair") else 512
    scene = build_device_scene(sh)
    cam = sh.get_camera(0)
    cam.update_aspect_ratio(1.0)

    def params_at(sub):
        return I.LaunchParams(
            subframe_index=jnp.int32(sub),
            clip_to_view=jnp.asarray(cam.clip_to_view(), jnp.float32),
            view_to_world=jnp.asarray(cam.view_to_world(), jnp.float32),
            exposure=jnp.asarray([6.25e-4] * 3, jnp.float32),
            bg_color=jnp.full(3, 0.1, jnp.float32),
        )

    def step(scene, params, state):
        return I.render_launch(
            scene, params, state, width=width, height=height,
            samples_per_launch=spp, max_sample_count=10000, max_depth=4,
            enable_accumulation=True,
        )

    fn = jax.jit(step, donate_argnums=(2,))
    state = I.make_frame_state(height, width)
    state, image = fn(scene, params_at(0), state)
    np.asarray(image[0, 0])  # hard sync (block_until_ready unreliable on axon)
    times = []
    for i in range(1, 5):  # launch 1 warms caches; steady = launches 2-4
        t0 = time.perf_counter()
        state, image = fn(scene, params_at(i * spp), state)
        np.asarray(image[0, 0])
        times.append(time.perf_counter() - t0)
    img = np.asarray(image)
    assert np.isfinite(img).all(), "non-finite image in tuning probe"
    print(f"MS {float(np.mean(times[1:])) * 1e3:.2f} MEAN {float(img.mean()):.6f}",
          flush=True)


def run_variant(flag: str, value, scene: str):
    env = dict(os.environ)
    env["STRELKA_" + flag.upper()] = (
        ("1" if value else "0") if isinstance(value, bool) else str(value)
    )
    try:
        out = subprocess.run(
            [sys.executable, "-u", __file__, "--probe", scene],
            env=env, capture_output=True, text=True, timeout=2400,
        )
    except subprocess.TimeoutExpired:
        print(f"  {flag}={int(value)}: TIMEOUT", flush=True)
        return None
    for line in out.stdout.splitlines():
        if line.startswith("MS "):
            parts = line.split()
            ms = float(parts[1])
            mean = float(parts[3]) if len(parts) > 3 else None
            print(f"  {flag}={value}: {ms:.1f} ms mean={mean}", flush=True)
            return ms, mean
    tail = (out.stdout + out.stderr).strip().splitlines()[-3:]
    print(f"  {flag}={value}: FAILED rc={out.returncode} {' | '.join(tail)}", flush=True)
    return None


def tune_bool(flag, scene, default, decisions, tuned):
        if tuned._load().get(flag + "_pinned"):
            print(f"tuning {flag}: PINNED by a prior correctness gate — skipping",
                  flush=True)
            return
        print(f"tuning {flag} on {scene} (default {default})", flush=True)
        res = {v: run_variant(flag, v, scene) for v in (default, not default)}
        base, chall = res[default], res[not default]
        if base is None and chall is not None:
            print(f"  {flag}: baseline failed — retrying once", flush=True)
            base = run_variant(flag, default, scene)
        if base is None and chall is None:
            print(f"  {flag}: both variants failed — leaving default", flush=True)
            return
        if base is None:
            winner = not default
        elif chall is None:
            winner = default
        else:
            same_image = (
                base[1] is None or chall[1] is None
                or abs(chall[1] - base[1]) <= 0.02 * max(abs(base[1]), 1e-6)
            )
            winner = (
                (not default)
                if (chall[0] < base[0] * MARGIN and same_image)
                else default
            )
            if not same_image:
                print(f"  {flag}: challenger image mean drifted "
                      f"({base[1]:.6f} -> {chall[1]:.6f}) — rejected", flush=True)
        decisions[flag] = bool(winner)
        tuned.write({flag: bool(winner)})  # later flags tune WITH this winner
        print(f"  -> {flag} = {winner}", flush=True)


def main() -> None:
    from strelka_tpu import tuned

    decisions = {}
    for flag, scene, default in FLAGS:
        tune_bool(flag, scene, default, decisions, tuned)
    for flag, scene, default, alts in CHOICE_FLAGS:
        print(f"tuning {flag} on {scene} (default {default})", flush=True)
        res = {v: run_variant(flag, v, scene) for v in [default] + alts}
        base = res[default]
        winner = default
        best = base[0] if base is not None else float("inf")
        bmean = base[1] if base is not None else None
        for v in alts:
            if res[v] is None:
                continue
            same_image = (
                bmean is None or res[v][1] is None
                or abs(res[v][1] - bmean) <= 0.02 * max(abs(bmean), 1e-6)
            )
            if res[v][0] < best * MARGIN and same_image:
                winner, best = v, res[v][0]
        if base is None and winner == default:
            print(f"  {flag}: default failed and no challenger won — skipping",
                  flush=True)
            continue
        decisions[flag] = int(winner)
        tuned.write({flag: int(winner)})
        print(f"  -> {flag} = {winner}", flush=True)
    for flag, scene, default in POST_FLAGS:
        tune_bool(flag, scene, default, decisions, tuned)
    print("tuned.json:", json.dumps(decisions), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--probe":
        probe(sys.argv[2])
    else:
        main()
