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


def _fixture_hg_trunk() -> dict:
    """The golden-tested HG UNet fixture (reference architecture, nf=16),
    shared verbatim across every preset row.

    The real HG.pt ships in NEITHER repo (the reference downloads it at app
    start — required_clone_assets.py; zero egress here), and the shipped
    hr_hg checkpoints carry only the AGCM+LE base retrained for composite
    use. A fixed deterministic trunk therefore isolates exactly what the HG
    table can honestly measure: each preset's base-model quantization error
    propagated through the full composite (mask + hallucination blend)."""
    import numpy as np

    from hdrtv_tpu.models.import_torch import convert_state

    fx_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "hg_mid.npz",
    )
    fx = np.load(fx_path)
    return convert_state({k: fx[k] for k in fx.files if k.startswith("hg.")})


def _load_family(use_hg: bool):
    """(fp32_params, cfg, presets, loaded-paths) for one model family."""
    from hdrtv_tpu.config import PRECISIONS
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_checkpoint

    hg_trunk = _fixture_hg_trunk() if use_hg else {}

    def load_one(path):
        if not use_hg:
            return load_checkpoint(path, use_hg=False)
        base, _ = load_checkpoint(path, use_hg=False)  # hr_hg carry base only
        params = {f"base.{k}": v for k, v in base.items()}
        params.update(hg_trunk)
        return params, ModelConfig(use_hg=True, hg_nf=16)

    fp32_preset = PRECISIONS["FP32"]
    fp32_path = fp32_preset.model if use_hg else fp32_preset.model_nohg
    if not os.path.isfile(fp32_path):
        print(f"missing FP32 checkpoint {fp32_path}", file=sys.stderr)
        sys.exit(1)
    fp32_params, cfg = load_one(fp32_path)

    presets: dict[str, dict] = {}
    loaded: dict[str, str] = {}
    for key, preset in PRECISIONS.items():
        path = preset.model if use_hg else preset.model_nohg
        if not path or not os.path.isfile(path):
            continue
        if key == "FP32":
            presets["FP32 (reference)"] = {"params": fp32_params, "precision": "fp32"}
            loaded["FP32 (reference)"] = path
            continue
        try:
            p, _ = load_one(path)
        except Exception as exc:  # noqa: BLE001 — report and continue the matrix
            print(f"skip {key}: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        presets[key] = {"params": p, "precision": "fp16" if key == "FP16" else "bf16"}
        loaded[key] = path
    return fp32_params, cfg, presets, loaded


def _family_table(use_hg: bool, frames: int, *, temporal_probe: bool,
                  size: tuple[int, int] = (720, 1280), only_presets=None):
    import time as _t

    from hdrtv_tpu.bench.sweep import natural_frames, precision_sweep
    from hdrtv_tpu.bench.validate import temporal_stability_probe

    fp32_params, cfg, presets, loaded = _load_family(use_hg)
    if only_presets:
        presets = {k: v for k, v in presets.items()
                   if k in only_presets or k == "FP32 (reference)"}
    print(f"{'HG' if use_hg else 'no-HG'} presets: {list(presets)} "
          f"@ {size[1]}x{size[0]} × {frames} frames", flush=True)
    t0 = _t.time()
    # Natural-statistics content at production resolution (VERDICT r4 item
    # 5): skin tones, near-clip speculars, deep shadows, film grain, slow
    # pan. HG's /32 padding is internal to the composite, so any size works.
    frame_list = natural_frames(frames, size)
    entries = precision_sweep(fp32_params, cfg, presets=presets, frames=frame_list)
    temporal = {}
    if temporal_probe:
        for name in presets:
            temporal[name] = temporal_stability_probe(presets[name]["params"], cfg)
    dt = _t.time() - t0

    lines = [
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
    return lines, entries, dt


HEADLINE_PRESETS = ("FP16", "INT8 Mixed (QAT)", "INT8 Full (QAT)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUALITY.md"))
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", default="1280x720", help="WxH of the matrix frames")
    ap.add_argument("--headline-size", default="1920x1080",
                    help="WxH for the extra headline-preset table ('' = skip)")
    ap.add_argument("--headline-frames", type=int, default=8)
    ap.add_argument("--skip-hg", action="store_true", help="no-HG table only")
    args = ap.parse_args()

    from hdrtv_tpu.runtime.engine import enable_persistent_cache

    enable_persistent_cache()
    import jax

    def _wh(s: str) -> tuple[int, int]:
        w, h = (int(p) for p in s.lower().split("x"))
        return h, w

    size = _wh(args.size)
    t_all = time.time()
    nohg_lines, nohg_entries, nohg_dt = _family_table(
        False, args.frames, temporal_probe=True, size=size)
    head_lines, head_entries, head_dt = ([], [], 0.0)
    if args.headline_size:
        head_lines, head_entries, head_dt = _family_table(
            False, args.headline_frames, temporal_probe=False,
            size=_wh(args.headline_size), only_presets=set(HEADLINE_PRESETS))
    hg_lines, hg_entries, hg_dt = ([], [], 0.0)
    if not args.skip_hg:
        hg_lines, hg_entries, hg_dt = _family_table(
            True, args.frames, temporal_probe=False, size=size)

    dev = jax.devices()[0].device_kind
    lines = [
        "# QUALITY — per-preset quality matrix",
        "",
        "## Methodology (read first — two different anchors exist)",
        "",
        "Every number in the tables below is **vs the FP32 model's own output**",
        "(a numerical-parity matrix: how much each quantized/precision preset",
        "deviates from the shipped FP32 checkpoint on identical inputs — the",
        "reference's `validate_tensorrt_sources.py:381` methodology). These are",
        "NOT scores against real HDR ground truth: the reference additionally",
        "publishes GT-referenced quality on private HDR pairs",
        "(`/root/reference/README.md:560-566`) which ship with neither repo.",
        "The GT-anchored equivalent here is the teacher-pseudo-GT delivery-path",
        "table (§3), which scores each preset's *delivered u16 PQ output*",
        "through the full quality pipeline (`bench/quality.py`: alignment,",
        "QC-gated frame selection, device metrics) against pseudo-GT rendered",
        "by the FP32 teacher — the two tables answer different questions and",
        "must not be compared row-to-row.",
        "",
        f"Measured on `{dev}` ({time.strftime('%Y-%m-%d')}): "
        f"**{args.frames} natural-statistics frames at {args.size}**"
        + (f" (+{args.headline_frames} at {args.headline_size} for the headline presets)"
           if args.headline_size else "")
        + " — skin tones, near-clip speculars, deep shadows, film grain, slow pan"
        " (`bench/sweep.py natural_frames`); eager bit-faithful W8A8/FP8",
        *([
            "(CPU fallback run during a TPU-relay outage: the sweep is pure jax",
            "math in fp32 — quality metrics are platform-agnostic to float",
            "tolerance; the on-chip regeneration is queued in tools/chip_sweep.py)",
        ] if "cpu" in dev.lower() else []),
        "emulation of each shipped reference checkpoint (`models/layers.py` fake-quant path),",
        "PSNR/SSIM/ΔEITP computed on device on the deterministic sweep frames",
        "(`bench/sweep.py`). Temporal stability: output-delta amplification on a",
        "panning sequence with a highlight band",
        "(`/root/reference/scripts/models/probe_trt_temporal_stability.py` role) —",
        "values near 1.0 and highlight deltas close to the FP32 row mean no added flicker.",
        "",
        "## 1. no-HG model family (vs FP32 output)",
        "",
        *nohg_lines,
        "",
        f"Sweep wall time: {nohg_dt:.0f}s for {len(nohg_entries)} presets × {args.frames} frames.",
    ]
    if head_lines:
        lines += [
            "",
            f"### 1b. Headline presets at {args.headline_size}",
            "",
            "The production-default resolution (reference default preset:",
            "INT8 Mixed QAT at 1080p, gui_config.py:162-164) for the three",
            "headline rows — quality at the delivered pixel count.",
            "",
            *head_lines,
            "",
            f"Sweep wall time: {head_dt:.0f}s for {len(head_entries)} presets × {args.headline_frames} frames.",
        ]
    if hg_lines:
        lines += [
            "",
            "## 2. HG composite family (vs FP32 HG output)",
            "",
            "Full hallucination composite (base + HG UNet + mask composite,",
            "`models/hdrtvnet.py` HG_Composite). Base weights: the shipped",
            "`hr_hg` checkpoints (reference `gui_config.py` trt_model field —",
            "they carry the AGCM+LE base retrained for composite use). HG",
            "trunk: the real `HG.pt` ships in neither repo (downloaded at app",
            "start there; zero egress here), so every row shares the same",
            "golden-tested deterministic trunk (`tests/fixtures/hg_mid.npz`,",
            "reference architecture) — the table isolates each preset's",
            "base-model quantization error through the full composite path",
            "(mask + hallucination blend), which is exactly what differs",
            "between presets.",
            "",
            *hg_lines,
            "",
            f"Sweep wall time: {hg_dt:.0f}s for {len(hg_entries)} presets × {args.frames} frames.",
        ]
    lines += [
        "",
        "## 3. Teacher-pseudo-GT delivery-path quality",
        "",
        "See `tools/make_gt_quality.py` — scores delivered u16 PQ outputs",
        "against FP32-teacher pseudo-GT through the full benchmark pipeline;",
        "its table is appended below when regenerated on-chip.",
        "",
        "Reference quality bars (author's TensorRT measurements, README.md quality",
        "sections): INT8 QAT presets sit within ~0.5 dB of FP16 *against GT* with",
        "no visible banding/flicker — a vs-GT claim, anchored here by §3, not by",
        "the parity tables above.",
        "",
        "Regenerate: `python tools/make_quality_matrix.py` (on-chip).",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} in {time.time() - t_all:.0f}s")
    print(json.dumps([e.__dict__ for e in nohg_entries + head_entries + hg_entries], indent=2))


if __name__ == "__main__":
    main()
