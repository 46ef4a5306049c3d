"""Self-tuned default flags, persisted per host.

The unattended TPU A/B chain (scripts/r3_tpu_ab.sh -> scripts/tune_defaults.py)
measures each binary scheduling flag on the real chip and records the winner
in tuned.json at the repo root. Library modules read their defaults from here
so a flag validated after this session still takes effect in later runs
(e.g. the driver's bench) — environment variables always win, tuned.json is
only consulted when the variable is unset.

This replaces hand-maintained per-host constants; the reference has no
equivalent (OptiX tunes its own BVH/launch parameters inside the driver).

The committed tuned.json is a cross-host BASELINE (the last hardware-validated
winner set); scripts/tune_defaults.py overwrites it locally with this host's
own measurements. Reads are memoized on the file's mtime — get_bool sits on
per-trace paths (e.g. intersect_any), so uncached reads would do file I/O per
sweep.
"""

from __future__ import annotations

import json
import os

_PATH = os.environ.get(
    "STRELKA_TUNED",
    os.path.join(os.path.dirname(__file__), "..", "tuned.json"),
)

_cache: tuple[float, dict] | None = None  # (mtime, parsed contents)


def _load() -> dict:
    global _cache
    try:
        mtime = os.stat(_PATH).st_mtime
    except OSError:
        _cache = (-1.0, {})
        return {}
    if _cache is not None and _cache[0] == mtime:
        return _cache[1]
    try:
        with open(_PATH) as f:
            data = json.load(f)
        data = data if isinstance(data, dict) else {}
    except Exception:  # noqa: BLE001 — missing/corrupt file = no tuning
        data = {}
    _cache = (mtime, data)
    return data


def get_bool(name: str, default: bool) -> bool:
    """Flag resolution order: STRELKA_<NAME> env var -> tuned.json -> default."""
    env = os.environ.get("STRELKA_" + name.upper())
    if env is not None and env != "":
        return env == "1"
    v = _load().get(name, default)
    return bool(v)


def get_int(name: str, default: int) -> int:
    """Same resolution order as get_bool, for integer-choice knobs."""
    env = os.environ.get("STRELKA_" + name.upper())
    if env is not None and env != "":
        return int(env)
    v = _load().get(name, default)
    return int(v)


def get_str(name: str, default: str) -> str:
    """Same resolution order as get_bool, for string-choice knobs."""
    env = os.environ.get("STRELKA_" + name.upper())
    if env is not None and env != "":
        return env
    v = _load().get(name, default)
    return str(v)


def write(updates: dict) -> None:
    data = _load()
    data.update(updates)
    tmp = _PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, _PATH)
