"""Model quality benchmark — gui_benchmark.py equivalent.

Per selected frame: read SDR + mapped ground-truth HDR, letterbox/crop the
pair, run the model, compute the full-reference metric set on device
(PSNR/SSIM linear, ΔEITP plain + grade-normalized), write per-frame artifacts
and JSON/CSV session summaries in the reference layout
(logs/benchmark_sessions/<source>/<ts>__<precision>__<resolution>__n<count>/,
gui_benchmark.py:1830-1945).

Deterministic distinct-frame selection mirrors the reference's
visual-interest scoring intent (:746-1006) with a simpler luminance-variance
ranker; GT alignment hooks accept an offset search callback (the content
similarity search of gui_media_probe.py:809-1121 is in bench/gt_sync.py).
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
import time

import numpy as np

from hdrtv_tpu.ops.metrics import crop_shared_black_borders, full_reference_metrics


# bounded queued-benchmark alignment cache (the reference bounds its
# queue task cache the same way — FIFO once full;
# HDRTVNET_BENCHMARK_QUEUE_TASK_CACHE_MAX, gui_benchmark.py:278-284)


def _verify_cache_max() -> int:
    from hdrtv_tpu.utils.env import env_int

    return env_int("HDRTVNET_BENCHMARK_QUEUE_TASK_CACHE_MAX", 512, lo=1)

# the reference's one-click "main set" queue (README.md: FP32/FP16/
# Mixed QAT/Full QAT); "all" expands to every registered preset
QUEUE_MAIN_SET = ("FP32", "FP16", "INT8 Mixed (QAT)", "INT8 Full (QAT)")


@dataclasses.dataclass
class QualityRunConfig:
    precision_key: str = "FP16"
    resolution_key: str = "1080p"
    use_hg: bool = False
    frame_count: int = 10
    peak_nits: float = 1000.0


def _ffmpeg_candidate_scan(source, count: int, lo: int, hi: int):
    """Evenly-spaced candidate previews via batched FFmpeg exact decode —
    the movie-scale probe path (gui_benchmark.py:1310-1468): KB-sized
    previews instead of decoding the whole head region sequentially.
    Returns [(idx, small_bgr_u8)] or None when unavailable/disabled
    (HDRTVNET_FRAME_DETECT_FFMPEG, default on)."""
    from hdrtv_tpu.bench import hdr_io
    from hdrtv_tpu.utils.env import env_bool, env_int

    path = getattr(source, "path", None)
    if (
        not path
        or not env_bool("HDRTVNET_FRAME_DETECT_FFMPEG", True)
        or not hdr_io.ffmpeg_available()
        or hi <= lo
    ):
        return None
    max_scan = env_int("HDRTVNET_BENCHMARK_FRAME_DETECT_MAX_SCAN", 240, lo=8, hi=240)
    n = min(hi - lo + 1, max(8, min(max_scan, max(count * 8, 48))))
    idxs = sorted({int(v) for v in np.linspace(lo, hi, n)})
    previews = hdr_io.read_preview_frames(path, idxs, max_side=320)
    if len(previews) < max(2, n // 4):
        return None  # decode failed/too few frames — fall back to sequential
    # previews decode as RGB; QC/interest expect BGR like the cv2 readers
    return [(i, previews[i][..., ::-1]) for i in sorted(previews)]


def select_distinct_frames(
    source, count: int, *, probe_stride: int = 24, max_probes: int = 400
) -> list[int]:
    """Deterministic visually-distinct frame selection with QC.

    Probe frames are restricted to the movie's credit-free region
    (frame_select.movie_frame_bounds), filtered through the per-frame QC
    gates (too-dark/too-bright/flat/logo-or-credits,
    gui_benchmark.py:831-919), scored by the visual-interest proxy, and
    greedily deduplicated against already-chosen frames (content-ranked
    deterministic selection, gui_benchmark.py:746-1006). QC never empties
    the pool: if every probe is rejected, the rejected set is used so a
    pathological source still benchmarks.
    """
    from hdrtv_tpu.bench.frame_select import frame_qc, movie_frame_bounds, visual_interest

    total = getattr(source, "frame_count", None) or 0
    fps = getattr(source, "fps", None)
    lo, hi = movie_frame_bounds(total, fps) if total else (0, 1 << 62)
    probes: list[tuple[int, np.ndarray, float]] = []
    rejected: list[tuple[int, np.ndarray, float]] = []

    scanned = _ffmpeg_candidate_scan(source, count, lo, min(hi, max(total - 1, 0)))
    if scanned is not None:
        for fidx, frame in scanned:
            small = frame[::4, ::4].astype(np.float32) / 255.0
            ok, _reason = frame_qc(frame)
            (probes if ok else rejected).append((fidx, small, visual_interest(frame)))
    else:
        # sequential scan: always from a deterministic position (lo is a pure
        # function of the source geometry) no matter where a previous
        # (queued) run left the source positioned
        seek = getattr(source, "seek", None)
        if seek is not None:
            seek(lo if total else 0)
        # Bound the TOTAL in-region scan, not just accepted probes: a source
        # whose credit-free region mostly fails QC must not decode the whole
        # movie (nor hold every rejected thumbnail in memory). Head frames
        # below lo (seek-less sources only) don't count against the budget —
        # otherwise a long head exhausts it before the region is reached and
        # the selection comes back empty.
        reads, max_reads = 0, max_probes * probe_stride * 2
        while len(probes) < max_probes and reads < max_reads:
            meta = source.read_with_meta()
            if meta is None:
                break
            frame, fidx, _ = meta
            if fidx >= lo:
                reads += 1
            if fidx > hi:
                break
            if fidx % probe_stride == 0 and fidx >= lo:
                small = frame[::8, ::8].astype(np.float32) / 255.0
                ok, _reason = frame_qc(frame)
                if ok:
                    probes.append((fidx, small, visual_interest(frame)))
                elif len(rejected) < max_probes:
                    rejected.append((fidx, small, visual_interest(frame)))
    if not probes:
        probes = rejected
    probes.sort(key=lambda t: -t[2])
    chosen: list[tuple[int, np.ndarray]] = []
    for fidx, small, _ in probes:
        if len(chosen) >= count:
            break
        if all(float(np.abs(small - s).mean()) > 0.03 for _, s in chosen):
            chosen.append((fidx, small))
    if len(chosen) < count:  # pad with remaining probes
        seen = {f for f, _ in chosen}
        for fidx, small, _ in probes:
            if fidx not in seen:
                chosen.append((fidx, small))
                if len(chosen) >= count:
                    break
    return sorted(f for f, _ in chosen)


@dataclasses.dataclass
class FrameResult:
    frame: int
    gt_frame: int
    psnr: float
    ssim: float
    delta_e_itp: float
    psnr_gn: float
    delta_e_itp_gn: float
    gt_alignment_offset_frames: int = 0
    gt_alignment_score: float = 0.0
    verify_reasons: tuple = ()


def evaluate_pair(
    pred_rgb01: np.ndarray, gt_rgb01: np.ndarray, *, peak_nits: float = 1000.0, max_side: int = 512
) -> dict[str, float]:
    """Metric-pair preparation + on-device metrics.

    Pipeline mirrors _prepare_metric_pair + _crop_shared_black_borders +
    _compute_full_reference_metrics (gui_objective_metrics.py:294-384,
    617-677): shared border crop, ≤512 max-side INTER_AREA downscale, then
    one fused device computation.
    """
    import jax.numpy as jnp

    from hdrtv_tpu.ops.resize import resize_area

    pred = np.asarray(pred_rgb01)
    gt = np.asarray(gt_rgb01)
    if pred.shape[:2] != gt.shape[:2]:
        # Differing-res SDR/GT pairing is the normal case (the GT master is
        # usually full-res): bring GT to the prediction's pixel grid FIRST —
        # crop_shared_black_borders no-ops on mismatched shapes and the
        # device metrics would broadcast-error (reference _prepare_metric_pair
        # resizes to common dims before the border crop).
        gt = np.asarray(resize_area(jnp.asarray(gt[None]), pred.shape[0], pred.shape[1]))[0]
    pred, gt, _ = crop_shared_black_borders(pred, gt)
    h, w = pred.shape[:2]
    if max(h, w) > max_side:
        s = max_side / max(h, w)
        nh, nw = max(2, round(h * s)), max(2, round(w * s))
        pred = np.asarray(resize_area(jnp.asarray(pred[None]), nh, nw))[0]
        gt = np.asarray(resize_area(jnp.asarray(gt[None]), nh, nw))[0]
    m = full_reference_metrics(jnp.asarray(pred), jnp.asarray(gt), peak_nits=peak_nits)
    return {k: float(v) for k, v in m.items()}


def _structure_similarity(a_rgb01: np.ndarray, b_rgb01: np.ndarray) -> float:
    """Normalized luminance cross-correlation between two decodes of the
    same nominal frame — the `_frame_structure_similarity` role
    (gui_benchmark.py GT_DIFF_SCORE gate input): 1.0 = same structure."""
    a = a_rgb01.mean(axis=-1).astype(np.float64)
    b = b_rgb01.mean(axis=-1).astype(np.float64)
    a -= a.mean()
    b -= b.mean()
    denom = float(np.sqrt((a * a).sum() * (b * b).sum()))
    if denom <= 1e-12:
        return 1.0  # both flat → structurally identical
    return float((a * b).sum() / denom)


def _alignment_score(sdr_rgb01: np.ndarray, gt_rgb01: np.ndarray) -> float:
    """Content-similarity score between an SDR frame and a GT candidate
    (normalized luminance-signature correlation — gui_hdr_gt_fast_path.py)."""
    from hdrtv_tpu.bench.gt_sync import _signature

    a = _signature(sdr_rgb01)
    b = _signature(gt_rgb01)
    hh = min(a.shape[0], b.shape[0])
    ww = min(a.shape[1], b.shape[1])
    return float((a[:hh, :ww] * b[:hh, :ww]).sum())


def post_verify_alignment(
    sdr_rgb01: np.ndarray, gt_read, gt_idx: int, *, window: int = 2,
    min_gain: float | None = None,
) -> tuple[int, float]:
    """Local ±window alignment re-search around the mapped GT frame
    (gui_benchmark.py:2320-2439): returns (offset, score). A nonzero offset
    is accepted only when it beats the mapped frame's own score by
    ``HDRTVNET_BENCHMARK_GT_LOCAL_SEARCH_MIN_GAIN`` (default 0.035,
    gui_benchmark.py:718-731) — near-ties keep the timing-derived mapping
    instead of flapping between neighbors."""
    from hdrtv_tpu.utils.env import env_float

    if min_gain is None:
        min_gain = env_float("HDRTVNET_BENCHMARK_GT_LOCAL_SEARCH_MIN_GAIN", 0.035, lo=0.0)
    base = gt_read(gt_idx)
    base_score = _alignment_score(sdr_rgb01, base) if base is not None else None
    best_off, best_score = 0, -2.0
    for off in range(-window, window + 1):
        cand = base if off == 0 else gt_read(gt_idx + off)
        if cand is None:
            continue
        score = _alignment_score(sdr_rgb01, cand)
        if score > best_score:
            best_off, best_score = off, score
    if best_off != 0 and base_score is not None and best_score < base_score + min_gain:
        return 0, base_score
    return best_off, best_score


def run_quality_benchmark(
    cfg: QualityRunConfig,
    processor,
    sdr_source,
    gt_reader,
    out_root: str,
    *,
    source_name: str = "source",
    gt_frame_map=None,
    post_verify: bool | None = None,
    verify_window: int | None = None,
    save_artifacts: bool = True,
    verify_cache: dict | None = None,
    frame_ids: list[int] | None = None,
) -> dict:
    """Run the benchmark; returns the session summary dict.

    ``gt_reader`` is either a callable ``(frame_idx) -> [0,1] RGB HWC float``
    or an ``HDRGroundTruthReader``; ``gt_frame_map(sdr_idx) -> gt_idx``
    handles frame-rate-aware mapping (gui_media_probe.py:1137).

    ``post_verify`` re-searches GT alignment ±``verify_window`` frames per
    row and recomputes metrics at the best offset (gui_benchmark.py
    :2320-2439); ``save_artifacts`` writes per-frame ``sdr.png`` /
    ``hdr_gt.tiff`` / ``hdr_convert.tiff`` (:2128-2309).
    """
    from hdrtv_tpu.bench import hdr_io
    from hdrtv_tpu.utils.env import env_bool, env_float, env_int

    # reference benchmark env family (README.md:271-317 benchmark section)
    if post_verify is None:
        post_verify = env_bool("HDRTVNET_BENCHMARK_AUTO_POST_VERIFY", True)
    if verify_window is None:
        verify_window = env_int("HDRTVNET_BENCHMARK_GT_LOCAL_SEARCH_FRAMES", 2, lo=0, hi=30)
    verify_max_items = env_int("HDRTVNET_BENCHMARK_AUTO_POST_VERIFY_MAX_ITEMS", 0, lo=0)
    verified_items = 0

    ts = time.strftime("%Y%m%d_%H%M%S")
    session_dir = os.path.join(
        out_root,
        source_name,
        f"{ts}__{cfg.precision_key.replace(' ', '_')}__{cfg.resolution_key}__n{cfg.frame_count}",
    )
    os.makedirs(session_dir, exist_ok=True)

    if callable(gt_reader):
        gt_read = gt_reader
        gt_decode = getattr(gt_reader, "decode_method", "caller")
    else:
        gt_read = gt_reader.read_unit_rgb
        gt_decode = getattr(gt_reader, "decode_method", "unknown")

    if frame_ids is None:
        frame_ids = select_distinct_frames(sdr_source, cfg.frame_count)
    results: list[FrameResult] = []
    for fidx in frame_ids:
        sdr_source.seek(fidx)
        meta = sdr_source.read_with_meta()
        if meta is None:
            continue
        frame_bgr = meta[0]
        sdr_rgb01 = frame_bgr[..., ::-1].astype(np.float32) / 255.0
        gt_idx = gt_frame_map(fidx) if gt_frame_map else fidx

        offset, score = 0, 0.0
        cache_key = (fidx, gt_idx, verify_window)
        if verify_cache is not None and cache_key in verify_cache:
            # queued-benchmark reuse: same SDR/GT/frame pair was already
            # aligned by an earlier run in this queue (the reference's
            # bounded in-memory post-verify GT cache, README.md benchmark
            # queue notes) — skip the exact re-decode/re-search
            offset, score = verify_cache[cache_key]
        elif post_verify and (verify_max_items == 0 or verified_items < verify_max_items):
            # Batch the known-upfront ±window candidates into ONE exact
            # decode pass (prefetch_exact) instead of one ffmpeg spawn per
            # candidate frame inside the search loop.
            pf = getattr(gt_reader, "prefetch_exact", None)
            if pf is not None and getattr(gt_reader, "exact", False):
                try:
                    pf(range(gt_idx - verify_window, gt_idx + verify_window + 1))
                except Exception:
                    pass  # per-frame reads below remain the fallback
            offset, score = post_verify_alignment(
                sdr_rgb01, gt_read, gt_idx, window=verify_window
            )
            verified_items += 1
            if verify_cache is not None:
                if len(verify_cache) >= _verify_cache_max():
                    verify_cache.pop(next(iter(verify_cache)))
                verify_cache[cache_key] = (offset, score)
        gt = gt_read(gt_idx + offset)
        if gt is None:
            continue
        # Post-verify replace reasons (gui_benchmark.py:2570-2640): a nonzero
        # local offset, and — when a fast decode exists alongside the exact
        # one — the fast/strict GT divergence gates (structure similarity
        # below GT_DIFF_SCORE; mean |Δ| above GT_DIFF_MEAN). Recorded per
        # row so sessions expose *why* exact verification mattered.
        reasons: list[str] = []
        if offset:
            reasons.append(f"local GT alignment {offset:+d} frame(s)")
        fast_fn = getattr(gt_reader, "read_unit_rgb_fast", None)
        if post_verify and fast_fn is not None and str(gt_decode).startswith("ffmpeg"):
            fast_gt = fast_fn(gt_idx + offset)
            if fast_gt is not None and fast_gt.shape == gt.shape:
                sim = _structure_similarity(fast_gt, gt)
                mean_abs = float(np.abs(fast_gt - gt).mean())
                if sim < env_float("HDRTVNET_BENCHMARK_AUTO_POST_VERIFY_GT_DIFF_SCORE",
                                   0.985, lo=0.0, hi=1.0):
                    reasons.append(f"GT frame changed (similarity {sim:.4f})")
                if mean_abs >= env_float("HDRTVNET_BENCHMARK_AUTO_POST_VERIFY_GT_DIFF_MEAN",
                                         0.0025, lo=0.0):
                    reasons.append(f"GT pixel delta {mean_abs:.4f}")
        out_rgb48 = processor.process_rgb48(frame_bgr)
        pred01 = out_rgb48.astype(np.float32) / 65535.0
        m = evaluate_pair(pred01, gt, peak_nits=cfg.peak_nits)
        results.append(
            FrameResult(
                frame=fidx,
                gt_frame=gt_idx + offset,
                psnr=round(m["psnr"], 4),
                ssim=round(m["ssim"], 5),
                delta_e_itp=round(m["delta_e_itp"], 4),
                psnr_gn=round(m["psnr_gn"], 4),
                delta_e_itp_gn=round(m["delta_e_itp_gn"], 4),
                gt_alignment_offset_frames=offset,
                gt_alignment_score=round(score, 5),
                verify_reasons=tuple(reasons),
            )
        )
        if save_artifacts:
            fdir = os.path.join(session_dir, "frames", f"{fidx:06d}")
            os.makedirs(fdir, exist_ok=True)
            hdr_io.write_png8(os.path.join(fdir, "sdr.png"), frame_bgr[..., ::-1])
            hdr_io.write_tiff16(os.path.join(fdir, "hdr_gt.tiff"), hdr_io.float01_to_u16(gt))
            hdr_io.write_tiff16(os.path.join(fdir, "hdr_convert.tiff"), out_rgb48)

    summary = {
        "source": source_name,
        "precision": cfg.precision_key,
        "resolution": cfg.resolution_key,
        "use_hg": cfg.use_hg,
        "frame_selection": "QC-gated visual-interest greedy distinct (gui_benchmark.py:746-1060)",
        "gt_decode": gt_decode,
        "post_verify": {"enabled": post_verify, "window_frames": verify_window},
        "frames": [dataclasses.asdict(r) for r in results],
        "mean_psnr": round(float(np.mean([r.psnr for r in results])), 4) if results else None,
        "mean_ssim": round(float(np.mean([r.ssim for r in results])), 5) if results else None,
        "mean_delta_e_itp": round(float(np.mean([r.delta_e_itp for r in results])), 4) if results else None,
    }
    with open(os.path.join(session_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    with open(os.path.join(session_dir, "results.csv"), "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow([
            "frame", "gt_frame", "psnr", "ssim", "delta_e_itp", "psnr_gn",
            "delta_e_itp_gn", "gt_alignment_offset_frames", "gt_alignment_score",
            "verify_reasons",
        ])
        for r in results:
            wr.writerow([
                r.frame, r.gt_frame, r.psnr, r.ssim, r.delta_e_itp, r.psnr_gn,
                r.delta_e_itp_gn, r.gt_alignment_offset_frames, r.gt_alignment_score,
                "; ".join(r.verify_reasons),
            ])
    summary["session_dir"] = session_dir
    return summary


def run_quality_queue(
    base_cfg: QualityRunConfig,
    precision_keys,
    make_processor,
    sdr_source,
    gt_reader,
    out_root: str,
    *,
    source_name: str = "source",
    gt_frame_map=None,
    save_artifacts: bool = True,
    progress=None,
) -> list[dict]:
    """Run the quality benchmark for each precision preset in sequence.

    The reference's benchmark queue (gui_benchmark.py queue + the
    one-click precision-sweep actions): every run scores the same
    SDR/GT/frame set, and the exact-GT post-verify alignment results are
    shared across runs through a bounded cache, so only the first run pays
    the exact decode + local search — later presets recompute only their
    own HDR Convert outputs and metrics. ``make_processor(precision_key)``
    builds the per-preset model runtime.
    """
    verify_cache: dict = {}
    # score the frame pool once and reuse it for every preset (the
    # reference caches its scored pool for repeated runs the same way)
    frame_ids = select_distinct_frames(sdr_source, base_cfg.frame_count)
    summaries = []
    for key in precision_keys:
        if progress:
            progress(key)
        cfg = dataclasses.replace(base_cfg, precision_key=key)
        proc = make_processor(key)
        summaries.append(
            run_quality_benchmark(
                cfg,
                proc,
                sdr_source,
                gt_reader,
                out_root,
                source_name=source_name,
                gt_frame_map=gt_frame_map,
                save_artifacts=save_artifacts,
                verify_cache=verify_cache,
                frame_ids=frame_ids,
            )
        )
    return summaries
