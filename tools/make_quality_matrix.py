"""Generate QUALITY.md — the per-preset quality matrix (VERDICT r2 item 6).

Runs every shipped reference checkpoint (config.PRECISIONS presets whose
files exist) through the precision sweep: PSNR / SSIM / ΔEITP vs the FP32
reference output on device (ops/metrics.py — the reference's
validate_tensorrt_sources.py:381 methodology) plus the temporal-stability
probe (probe_trt_temporal_stability.py role).

Run on-chip:  python tools/make_quality_matrix.py [--out QUALITY.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUALITY.md"))
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    from hdrtv_tpu.runtime.engine import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from hdrtv_tpu.bench.sweep import precision_sweep
    from hdrtv_tpu.bench.validate import temporal_stability_probe
    from hdrtv_tpu.config import PRECISIONS
    from hdrtv_tpu.models.import_torch import load_checkpoint

    # FP32 reference: the shipped HR.pt eager checkpoint.
    fp32_path = PRECISIONS["FP32"].model_nohg
    if not os.path.isfile(fp32_path):
        print(f"missing FP32 checkpoint {fp32_path}", file=sys.stderr)
        sys.exit(1)
    fp32_params, cfg = load_checkpoint(fp32_path, use_hg=False)

    presets: dict[str, dict] = {}
    loaded: dict[str, str] = {}
    for key, preset in PRECISIONS.items():
        path = preset.model_nohg
        if not os.path.isfile(path):
            continue
        if key == "FP32":
            presets["FP32 (reference)"] = {"params": fp32_params, "precision": "fp32"}
            loaded["FP32 (reference)"] = path
            continue
        try:
            p, _ = load_checkpoint(path, use_hg=False)
        except Exception as exc:  # noqa: BLE001 — report and continue the matrix
            print(f"skip {key}: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        presets[key] = {"params": p, "precision": "fp16" if key == "FP16" else "bf16"}
        loaded[key] = path

    print(f"presets: {list(presets)}", flush=True)
    t0 = time.time()
    entries = precision_sweep(fp32_params, cfg, presets=presets, frame_count=args.frames)
    temporal = {}
    for name in presets:
        temporal[name] = temporal_stability_probe(presets[name]["params"], cfg)
    dt = time.time() - t0

    dev = jax.devices()[0].device_kind
    lines = [
        "# QUALITY — per-preset quality matrix (no-HG model family)",
        "",
        f"Measured on `{dev}` ({time.strftime('%Y-%m-%d')}), eager bit-faithful W8A8/FP8",
        "emulation of each shipped reference checkpoint (`models/layers.py` fake-quant path),",
        "PSNR/SSIM/ΔEITP computed on device against the FP32 reference output on the",
        "deterministic sweep frames (`bench/sweep.py`; reference methodology:",
        "`/root/reference/scripts/validate_tensorrt_sources.py:381`). Temporal stability:",
        "output-delta amplification on a panning sequence with a highlight band",
        "(`/root/reference/scripts/models/probe_trt_temporal_stability.py` role) —",
        "values near 1.0 and highlight deltas close to the FP32 row mean no added flicker.",
        "",
        "| Preset | PSNR (dB) | SSIM | ΔEITP | temporal amp | highlight Δ | checkpoint |",
        "|---|---|---|---|---|---|---|",
    ]
    for e in entries:
        t = temporal.get(e.preset, {})
        ck = os.path.basename(loaded.get(e.preset, ""))
        psnr = "∞ (ref)" if e.psnr > 90 else f"{e.psnr:.2f}"
        lines.append(
            f"| {e.preset} | {psnr} | {e.ssim:.4f} | {e.delta_e_itp:.3f} "
            f"| {t.get('amplification', '—')} | {t.get('highlight_delta_mae', t.get('output_delta_mae', '—'))} | `{ck}` |"
        )
    lines += [
        "",
        f"Sweep wall time: {dt:.0f}s for {len(entries)} presets × {args.frames} frames.",
        "",
        "Reference quality bars (author's TensorRT measurements, README.md quality",
        "sections): INT8 QAT presets sit within ~0.5 dB of FP16 with no visible",
        "banding/flicker; the table above is the TPU build's equivalent evidence —",
        "the eager W8A8 path here is the same math the TensorRT engines execute.",
        "",
        "Regenerate: `python tools/make_quality_matrix.py` (on-chip).",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")
    print(json.dumps([e.__dict__ for e in entries], indent=2))


if __name__ == "__main__":
    main()
