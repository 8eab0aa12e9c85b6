"""Runtime environment check — the TPU analog of the reference's
`nvidia_runtime_check.check_nvidia_python_runtime` (:54-142): validate the
accelerator Python runtime and the external tool belt without compiling a
full engine, returning ``{ok, issues, details}`` for the CLI / startup gate.
"""

from __future__ import annotations

import os
import shutil
from typing import Any


def _bounded_device_probe(issues: list[str]) -> dict[str, Any]:
    """Device query in a budgeted subprocess: ``jax.devices()`` blocks for
    minutes against a wedged relay, and a diagnostics command must never
    hang (bench.py's relay probe, same discipline). Budget:
    HDRTV_DOCTOR_PROBE_TIMEOUT_S (default 120 s)."""
    import json as _json
    import subprocess
    import sys

    from hdrtv_tpu.utils.env import env_int

    budget = env_int("HDRTV_DOCTOR_PROBE_TIMEOUT_S", 120, lo=5)
    # Propagate a parent-side jax.config platform override (tests force CPU
    # via jax.config, which a child process cannot see — and the axon plugin
    # ignores the JAX_PLATFORMS env var). Reading the config value does NOT
    # initialize the backend — that's the hang being avoided.
    import jax

    platforms = getattr(jax.config, "jax_platforms", None) or ""
    force = (
        f"jax.config.update('jax_platforms', {platforms!r})\n" if platforms else ""
    )
    script = (
        "import json, jax\n"
        + force
        + "d = jax.devices()\n"
        "print('DOCTOR ' + json.dumps({'platform': d[0].platform if d else 'none',"
        " 'device_kind': getattr(d[0], 'device_kind', '?') if d else '',"
        " 'device_count': len(d)}))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=budget,
        )
    except subprocess.TimeoutExpired:
        issues.append(
            f"device probe exceeded {budget}s (wedged relay?) — "
            "rerun with --no-device to skip"
        )
        return {"device_probe": "timeout"}
    for line in r.stdout.splitlines():
        if line.startswith("DOCTOR "):
            out = _json.loads(line[len("DOCTOR "):])
            if not out.get("device_count"):
                issues.append("jax reports no devices.")
            return out
    issues.append(
        f"device probe failed rc={r.returncode}: {(r.stderr or r.stdout).strip()[-200:]}"
    )
    return {"device_probe": "failed"}


def check_tpu_runtime(*, probe_device: bool = True) -> dict[str, Any]:
    """Validate jax/TPU, binaries, weights, and the engine cache.

    ``probe_device=False`` skips touching jax devices (the device query can
    block for minutes on a wedged dev relay; the reference likewise keeps
    its driver probe cheap).
    """
    issues: list[str] = []
    details: dict[str, Any] = {}

    try:
        import jax

        details["jax"] = jax.__version__
        import jaxlib

        details["jaxlib"] = getattr(jaxlib, "__version__", "unknown")
        if probe_device:
            details.update(_bounded_device_probe(issues))
    except Exception as exc:  # noqa: BLE001 — report, never crash the check
        issues.append(f"jax import/device query failed: {type(exc).__name__}: {exc}")

    # External tool belt (each absence degrades a documented feature, never
    # crashes: exact GT decode, mpv display, HDR-VDP3 — the sink/reader
    # ladders fall back).
    for tool, role in (
        ("ffmpeg", "exact GT decode + ProRes export"),
        ("ffprobe", "media probing"),
        ("mpv", "HDR display sink + audio attach"),
        ("octave", "HDR-VDP3 bridge"),
    ):
        present = shutil.which(tool) is not None
        details[tool] = present
        if not present:
            details.setdefault("degraded", []).append(f"{tool} absent → {role} unavailable")

    # Weights inventory (the required-clone-assets gate).
    try:
        from hdrtv_tpu.utils.assets import required_assets

        assets = required_assets()
        ok_n = sum(1 for a in assets if a.status == "ok")
        details["weights"] = f"{ok_n}/{len(assets)}"
        if ok_n == 0:
            issues.append("no preset weight files found (set HDRTVNET_WEIGHTS_ROOT).")
    except Exception as exc:  # noqa: BLE001
        issues.append(f"weights inventory failed: {type(exc).__name__}: {exc}")

    # Engine cache root must be writable for warm startups.
    try:
        from hdrtv_tpu.runtime.engine import EngineRegistry, default_cache_root

        root = default_cache_root()
        os.makedirs(root, exist_ok=True)
        probe = os.path.join(root, ".doctor_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
        details["engine_cache"] = root
        details["engines_recorded"] = len(EngineRegistry().list())
    except OSError as exc:
        issues.append(f"engine cache root not writable: {exc}")

    return {"ok": not issues, "issues": issues, "details": details}
