"""Runtime environment check — the TPU analog of the reference's
`nvidia_runtime_check.check_nvidia_python_runtime` (:54-142): validate the
accelerator Python runtime and the external tool belt without compiling a
full engine, returning ``{ok, issues, details}`` for the CLI / startup gate.
"""

from __future__ import annotations

import os
import shutil
from typing import Any


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
            devices = jax.devices()
            details["platform"] = devices[0].platform if devices else "none"
            details["device_kind"] = getattr(devices[0], "device_kind", "?") if devices else ""
            details["device_count"] = len(devices)
            if not devices:
                issues.append("jax reports no devices.")
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
