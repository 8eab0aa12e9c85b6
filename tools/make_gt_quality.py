"""GT-anchored quality rows via teacher pseudo-GT (VERDICT r3 item 4).

The parity matrix (tools/make_quality_matrix.py) scores each preset against
the FP32 model's float output. The reference ALSO publishes quality against
real HDR ground-truth pairs (/root/reference/README.md:560-566,
gui_objective_metrics.py) — no such pairs ship with either repo, so this
tool builds the closest honest anchor: **teacher pseudo-GT** — the FP32
model's *delivered* u16 PQ output (the full product path incl. RGB48
quantization) on a deterministic synthetic clip — and scores every preset's
delivered output against it through the FULL benchmark pipeline
(bench/quality.py: GT alignment, device metric kernels, session artifacts),
exactly how a user would benchmark against a real GT file.

What this measures that the parity matrix cannot:
- the delivery-path error (float → u16 PQ code rounding) per preset;
- the complete benchmark machinery end-to-end (alignment + metrics + CSVs).

What it cannot measure: absolute fidelity to real mastered HDR — pseudo-GT
is the teacher's own rendition, so FP32 scores ~∞ by construction and every
other row reads as "distance from the teacher through the product pipeline".

Run on-chip:  python tools/make_gt_quality.py [--frames 4] [--size 256x192]
Appends its table to QUALITY.md §3 (or --out for a standalone file).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ArraySource:
    """Minimal sdr_source over in-memory BGR u8 frames (source API subset
    used by bench/quality.py: seek / read_with_meta / frame_count / fps)."""

    def __init__(self, frames_bgr: list[np.ndarray], fps: float = 30.0):
        self._frames = frames_bgr
        self.fps = fps
        self.frame_count = len(frames_bgr)
        self._pos = 0

    def seek(self, idx: int) -> None:
        self._pos = int(idx)

    def read_with_meta(self):
        if not (0 <= self._pos < len(self._frames)):
            return None
        f = self._frames[self._pos]
        idx = self._pos
        self._pos += 1
        return f, idx, idx / self.fps


def synth_clip(n: int, w: int, h: int) -> list[np.ndarray]:
    """Deterministic natural-statistics SDR clip (round 5): skin tones,
    near-clip speculars, deep shadows, film grain, slow pan — the same
    content classes the quality matrix now uses (bench/sweep.py
    natural_frames), BGR u8 for the product pipeline. Passes the QC gates'
    dark/flat screens (full-range, textured)."""
    from hdrtv_tpu.bench.sweep import natural_frames

    return [
        (f[..., ::-1] * 255).astype(np.uint8)  # RGB float → BGR u8
        for f in natural_frames(n, (h, w))
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", default="256x192", help="WxH (both /32 for HG)")
    ap.add_argument("--include-hg", action="store_true",
                    help="also score the HG composite presets")
    ap.add_argument("--out", default=None,
                    help="standalone output file (default: splice into QUALITY.md §3)")
    ap.add_argument("--presets", nargs="*", default=None,
                    help="subset of PRECISIONS keys (default: all available)")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.lower().split("x"))

    from hdrtv_tpu.config import PRECISIONS, select_model_path
    from hdrtv_tpu.runtime.engine import enable_persistent_cache
    from hdrtv_tpu.runtime.processor import HDRTVNetTPU

    enable_persistent_cache()

    clip = synth_clip(max(args.frames + 2, 6), w, h)
    frame_ids = list(range(1, 1 + args.frames))

    import tempfile

    def _composite_npz(base_ckpt: str, tmpdir: str, tag: str) -> str:
        """base checkpoint + the golden-tested fixture HG trunk (the real
        HG.pt ships in neither repo — see tools/make_quality_matrix.py)."""
        from hdrtv_tpu.models.import_torch import convert_state, load_checkpoint, save_npz

        base, _ = load_checkpoint(base_ckpt, use_hg=False)
        comp = {f"base.{k}": np.asarray(v) for k, v in base.items()}
        fx = np.load(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                  "tests", "fixtures", "hg_mid.npz"))
        comp.update({k: np.asarray(v) for k, v in
                     convert_state({k: fx[k] for k in fx.files if k.startswith("hg.")}).items()})
        path = os.path.join(tmpdir, f"{tag}.npz")
        save_npz(path, comp, {"architecture": {"use_hg": True, "hg_nf": 16}})
        return path

    families = [(False, "no-HG")] + ([(True, "HG composite")] if args.include_hg else [])
    sections = []
    tmpdir = tempfile.mkdtemp(prefix="hdrtv_gtq_")
    for use_hg, family in families:
        teacher_path = select_model_path("FP32", use_hg)
        if use_hg:
            teacher_path = _composite_npz(teacher_path, tmpdir, "fp32")
        teacher = HDRTVNetTPU(teacher_path, precision="fp32", use_hg=use_hg)
        pseudo_gt = {
            i: teacher.process_rgb48(clip[i]).astype(np.float32) / 65535.0
            for i in frame_ids
        }

        def gt_reader(idx: int):
            return pseudo_gt.get(int(idx))

        gt_reader.decode_method = "teacher-pseudo-gt (FP32 delivered u16 PQ)"

        rows = []
        keys = args.presets or list(PRECISIONS)
        for key in keys:
            preset = PRECISIONS.get(key)
            if preset is None:
                continue
            path = preset.model if use_hg else preset.model_nohg
            if not path or not os.path.isfile(path):
                continue
            try:
                if use_hg:
                    path = _composite_npz(path, tmpdir, key.replace(" ", "_").replace("(", "").replace(")", ""))
                proc = HDRTVNetTPU(
                    path,
                    precision={"fp32": "fp32", "fp16": "fp16"}.get(preset.precision, "bf16"),
                    use_hg=use_hg,
                )
            except Exception as exc:  # noqa: BLE001 — report and continue
                print(f"skip {key}: {type(exc).__name__}: {exc}", file=sys.stderr)
                continue
            from hdrtv_tpu.bench.quality import QualityRunConfig, run_quality_benchmark

            summary = run_quality_benchmark(
                QualityRunConfig(precision_key=key, frame_count=args.frames, use_hg=use_hg),
                proc,
                ArraySource(clip),
                gt_reader,
                os.path.join("logs", "benchmark_sessions"),
                source_name=f"pseudo_gt_{'hg' if use_hg else 'nohg'}",
                post_verify=False,  # identity alignment by construction
                save_artifacts=False,
                frame_ids=frame_ids,
            )
            psnr = summary["mean_psnr"]
            if psnr is None or summary["mean_ssim"] is None:
                # zero scored frames (run_quality_benchmark returns None
                # means) — skip the row rather than abort the whole sweep
                print(f"skip {key}: benchmark scored no frames", file=sys.stderr)
                continue
            rows.append(
                f"| {key} | {'∞ (teacher)' if psnr > 90 else f'{psnr:.2f}'} "
                f"| {summary['mean_ssim']:.4f} | {summary['mean_delta_e_itp']:.3f} |"
            )
            print(f"{family} {key}: psnr={psnr} ssim={summary['mean_ssim']}", flush=True)
        if rows:
            sections += [
                f"### {family} (delivered u16 output vs teacher pseudo-GT)",
                "",
                "| Preset | PSNR (dB) | SSIM | ΔEITP |",
                "|---|---|---|---|",
                *rows,
                "",
            ]

    import jax
    import time

    header = [
        f"Measured on `{jax.devices()[0].device_kind}` ({time.strftime('%Y-%m-%d')});",
        f"{args.frames} frames at {w}x{h}, full `bench/quality.py` pipeline",
        "(alignment disabled — pseudo-GT is frame-exact by construction).",
        "FP32 ≈ ∞ by construction; other rows = distance from the teacher",
        "through the delivered u16 PQ path. Not comparable to the §1/§2",
        "float-domain parity rows.",
        "",
    ]
    block = "\n".join(header + sections)

    if not sections:
        # Nothing measured (missing checkpoints, every preset skipped): do
        # NOT splice — that would erase a previously measured table and
        # replace it with a dated header claiming a measurement.
        print("no rows measured; leaving QUALITY.md untouched", file=sys.stderr)
        sys.exit(1)

    if args.out:
        with open(args.out, "w") as f:
            f.write(block + "\n")
        print(f"wrote {args.out}")
        return

    qpath = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUALITY.md")
    with open(qpath) as f:
        text = f.read()
    marker = "## 3. Teacher-pseudo-GT delivery-path quality"
    if marker in text:
        head, _, tail = text.partition(marker)
        # keep anything after the next "## " heading (none today), drop the stub body
        m = re.search(r"\nReference quality bars", tail)
        rest = tail[m.start():] if m else ""
        text = head + marker + "\n\n" + block + rest
    else:
        text += "\n" + marker + "\n\n" + block + "\n"
    with open(qpath, "w") as f:
        f.write(text)
    print(f"spliced §3 into {qpath}")


if __name__ == "__main__":
    main()
