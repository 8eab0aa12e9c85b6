"""Command-line interface — reference ``main.py`` + tool CLIs equivalent.

Subcommands:
  convert   play/convert a video (realtime or flat-out) to a sink
  export    HDR10 export via FFmpeg (ProRes chain — pipeline/export.py)
  bench     playback performance benchmark (bench/playback.py)
  quality   model quality benchmark vs HDR ground truth (bench/quality.py)
  engines   engine cache tooling: list / clear / warm (runtime/engine.py)
  quantize  PTQ quantization: full/mixed W8A8 portable checkpoints
  live      live capture (x11/v4l2/synthetic) → realtime HDR display
  info      model/checkpoint inspection

Flags mirror the reference CLI surface (``--video --precision --resolution
--use-hg ...`` — gui_app_entry.py:38, main.py:142-280).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _add_model_args(p: argparse.ArgumentParser, *, prefs_defaults: bool = False) -> None:
    # prefs_defaults=True (convert): unset flags restore the last-used
    # settings from prefs.json — the reference's .gui_prefs.json startup
    # restore (gui_settings_preview.py); explicit flags always win.
    p.add_argument("--model", default=None, help="checkpoint path (.pt or .npz); default: preset table")
    p.add_argument("--precision", default=None if prefs_defaults else "FP16",
                   help="precision preset key (config.PRECISIONS)")
    p.add_argument("--resolution", default=None if prefs_defaults else "1080p",
                   choices=["540p", "720p", "1080p", "4K"])
    p.add_argument("--use-hg", action="store_true", default=None if prefs_defaults else False,
                   help="enable highlight generation composite")
    p.add_argument("--hg-weights", default=None)


def _apply_prefs(args) -> None:
    """Fill convert's unset model/display flags from prefs.json."""
    from hdrtv_tpu.utils.prefs import load_prefs

    prefs = load_prefs()
    if args.precision is None:
        args.precision = prefs.get("precision") or "FP16"
    if args.resolution is None:
        args.resolution = prefs.get("resolution") or "1080p"
    if args.use_hg is None:
        args.use_hg = bool(prefs.get("use_hg", False))
    if getattr(args, "display", None) is None:
        args.display = prefs.get("display") or "null"
    if getattr(args, "upscale", None) is None:
        args.upscale = prefs.get("upscale") or None
    if getattr(args, "film_grain", None) is None:
        args.film_grain = bool(prefs.get("film_grain", False))


def _make_processor(args):
    from hdrtv_tpu.config import (
        PRECISIONS, processing_dims, resolve_precision_key, select_model_path,
    )
    from hdrtv_tpu.runtime.processor import HDRTVNetTPU
    from hdrtv_tpu.utils.assets import require_assets_or_raise

    require_assets_or_raise()  # HDRTVNET_REQUIRE_CLONE_ASSETS fail-fast gate
    # accept the reference CLI's short run names (fp16, int8-mixed-qat, …)
    args.precision = resolve_precision_key(args.precision)

    model_path = args.model
    if model_path is None:
        if args.precision in PRECISIONS and os.path.isfile(select_model_path(args.precision, args.use_hg)):
            model_path = select_model_path(args.precision, args.use_hg)
        else:
            model_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights", "hr_fp32.npz")
    precision_token = PRECISIONS[args.precision].precision if args.precision in PRECISIONS else args.precision
    # The resolution preset governs *processing*: frames letterbox on device
    # to these dims (gui_scaling.py:228 applied per frame in the reference
    # worker, gui_pipeline_worker_frame_processing.py:168-331).
    proc_res = processing_dims(args.resolution) if getattr(args, "resolution", None) else None
    mesh = None
    if getattr(args, "mesh", None) == "spatial":
        import jax

        from hdrtv_tpu.parallel.mesh import spatial_mesh

        if len(jax.devices()) > 1:
            mesh = spatial_mesh()
            print(f"mesh: spatial W-sharding over {len(jax.devices())} devices")
        else:
            print("--mesh spatial requested but only one device is visible; running single-chip")
    return HDRTVNetTPU(
        model_path,
        precision=precision_token,
        use_hg=args.use_hg or None,
        hg_path=args.hg_weights,
        proc_resolution=proc_res,
        mesh=mesh,
    )


def cmd_convert(args) -> int:
    from hdrtv_tpu.config import processing_dims
    from hdrtv_tpu.pipeline.runner import PipelineRunner
    from hdrtv_tpu.pipeline.sinks import make_sink
    from hdrtv_tpu.pipeline.source import SyntheticSource, VideoSource
    from hdrtv_tpu.utils.env import env_bool

    if not env_bool("HDRTVNET_IGNORE_PLAYBACK_LOCK", False):
        from hdrtv_tpu.bench.wrapper import is_playback_locked

        if is_playback_locked():
            # The reference locks playback interactions while a benchmark
            # runs (gui_playback_runtime.py:274-411); one TPU job at a time.
            print("a supervised benchmark holds the playback lock; "
                  "HDRTVNET_IGNORE_PLAYBACK_LOCK=1 overrides", file=sys.stderr)
            return 2

    _apply_prefs(args)
    proc = _make_processor(args)
    w, h = processing_dims(args.resolution)
    bypass = False
    if args.video:
        from hdrtv_tpu.runtime.probe import probe_media, should_bypass_processing

        info = probe_media(args.video)
        if should_bypass_processing(info):
            # Reference GUI rejects HDR input for playback (gui_media_probe.py:178);
            # --hdr-input bypass feeds it through untouched instead.
            if args.hdr_input == "reject":
                print("input is already HDR (PQ/BT.2020); refusing to convert "
                      "(use --hdr-input bypass to pass it through)")
                return 2
            bypass = True
        src = VideoSource(args.video, prefetch=max(0, args.prefetch))
    else:
        src = SyntheticSource(w, h, fps=30, frames=args.frames or 300)
    if getattr(args, "start_frame", None):
        src.seek(max(0, int(args.start_frame)))  # gui_app_entry.py --start-frame
    if bypass:
        class _Bypass:
            def __init__(self, p):
                self._p = p
                self.model_path = getattr(p, "model_path", "")

            def warmup_compile(self, *a, **k):
                return 0.0

            def process_rgb48_device(self, frame):
                return self._p.passthrough_rgb48_device(frame)

        proc = _Bypass(proc)
    out_size = None
    if getattr(args, "display_size", None):
        try:
            ow, oh = (int(v) for v in str(args.display_size).lower().split("x"))
            out_size = (ow, oh)
        except ValueError:
            print(f"ignoring malformed --display-size {args.display_size!r} (want WxH)")
    sink = make_sink(
        args.display, w, h, getattr(src, "fps", 30.0), path=args.output,
        out_size=out_size, upscaler=getattr(args, "upscale", None),
        film_grain=bool(getattr(args, "film_grain", False)),
    )
    print(f"compiling {w}x{h} ({args.precision})...", flush=True)
    dt = proc.warmup_compile(w, h)
    print(f"engine ready in {dt:.1f}s", flush=True)
    # Audio attach with the auto-mute fade policy (gui_audio_playback/_mute).
    audio = attach = on_metrics = None
    if getattr(args, "audio", False) and args.video:
        from hdrtv_tpu.pipeline.audio import AudioAttachment, AudioPlayer, AutoMutePolicy

        try:
            from hdrtv_tpu.utils.env import env_float

            delay_ms = args.audio_delay_ms
            if delay_ms is None:
                delay_ms = env_float("HDRTVNET_AUDIO_DELAY_MS", 0.0)
            audio = AudioPlayer(args.video, track=args.audio_track, delay_ms=delay_ms)
            attach = AudioAttachment(
                AutoMutePolicy(target_fps=getattr(src, "fps", 30.0)), audio.set_gain
            )
            on_metrics = lambda snap: attach.on_metrics(snap.fps)  # noqa: E731
        except RuntimeError as exc:
            print(f"audio attach unavailable: {exc}")
    interactive = bool(getattr(args, "interactive", False)) and sys.stdout.isatty()
    shell_metrics = on_metrics
    controller = None
    if interactive:
        from hdrtv_tpu.pipeline.shell import ShellController

    def _factory(precision=None, proc_resolution=None):
        import copy

        a = copy.copy(args)
        if precision is not None:
            a.precision = precision
        p2 = _make_processor(a)
        if proc_resolution is not None and hasattr(p2, "with_proc_resolution"):
            p2 = p2.with_proc_resolution(proc_resolution)
        return p2

    runner = PipelineRunner(
        src, proc, sink, realtime=not args.no_realtime, max_frames=args.frames,
        on_metrics=None,  # set below (may fan out to shell + audio)
        processor_factory=_factory,
        target_fps=(args.target_fps or None),
        warmup_frames=max(0, getattr(args, "warmup", 0) or 0),
    )
    interval = max(0, getattr(args, "timing_interval", 0) or 0)
    if interval:
        # periodic `[timing]` reports every N frames (main.py --timing-interval)
        prev_cb = shell_metrics
        state = {"next": interval}

        def _timing_cb(snap, _prev=prev_cb, _r=runner, _s=state):
            if _prev is not None:
                _prev(snap)
            if snap.frames >= _s["next"]:
                _s["next"] = snap.frames + interval
                print(_r.timers.timing_line(
                    snap.frames, snap.fps, snap.fps_1pct_low,
                    target_fps=args.target_fps or 0.0, late_frames=snap.dropped,
                ), flush=True)

        shell_metrics = _timing_cb
    if interactive:
        controller = ShellController(
            runner, src, audio=audio,
            precision=args.precision, resolution=args.resolution,
        )

        def fan_out(snap, _audio_cb=on_metrics, _ctl=controller):
            if _audio_cb is not None:
                _audio_cb(snap)
            _ctl.on_metrics(snap)

        shell_metrics = fan_out
    runner.on_metrics = shell_metrics
    if interactive:
        import threading as _threading

        from hdrtv_tpu.pipeline.shell import run_shell

        result: dict = {}
        t = _threading.Thread(target=lambda: result.update(m=runner.run()), daemon=True)
        t.start()
        try:
            run_shell(controller)
        finally:
            runner.stop()
            t.join(timeout=30)
        m = result.get("m") or runner.metrics
    else:
        m = runner.run()
    src.close()
    sink.close()
    if audio is not None:
        audio.close()
    # persist last-used settings (.gui_prefs.json role); the shell may have
    # hot-swapped precision/resolution — save what the session ended with
    from hdrtv_tpu.utils.prefs import save_prefs

    save_prefs(
        precision=(controller.precision if controller else args.precision),
        resolution=(controller.resolution if controller else args.resolution),
        use_hg=bool(args.use_hg),
        display=args.display,
        upscale=getattr(args, "upscale", None),
        film_grain=bool(getattr(args, "film_grain", False)),
    )
    print(
        f"frames={m.frames} dropped={m.dropped} fps={m.fps:.2f} "
        f"1%low={m.fps_1pct_low:.2f} model={m.model_ms:.2f}ms rt×={m.realtime_factor:.2f} "
        f"dev_mem={m.device_mem_mb}MB rss={m.host_rss_mb}MB"
    )
    if args.stages:
        # per-stage host timing table (reference CLI stage report,
        # main.py:282-331)
        print(runner.timers.report())
    if args.log_session:
        # Log Session artifact layout (gui_playback_logging.py:276-534).
        import time as _time

        from hdrtv_tpu.bench.playback import PlaybackResult, write_session

        ts = _time.strftime("%Y%m%d_%H%M%S")
        name = os.path.splitext(os.path.basename(args.video or "synthetic"))[0]
        out_dir = os.path.join(args.log_session, f"{ts}_{name}")
        write_session(
            out_dir,
            PlaybackResult(
                config={"video": args.video, "precision": args.precision, "resolution": args.resolution},
                fps=round(m.fps, 2),
                fps_1pct_low=round(m.fps_1pct_low, 2),
                model_ms=round(m.model_ms, 2),
                frames=m.frames,
                dropped=m.dropped,
                realtime_factor=round(m.realtime_factor, 3),
                artifact_mb=0.0,
                wall_s=0.0,
            ),
        )
        print(f"session logged to {out_dir}")
    return 0


def cmd_bench(args) -> int:
    import contextlib

    if getattr(args, "supervised", False):
        # GUI bench-dialog contract (gui_playback_benchmark.py role): the
        # benchmark runs in an isolated child, output streams live, playback
        # is locked machine-wide, and the batch CSV renders as the result
        # table at completion.
        import sys as _sys

        from hdrtv_tpu.bench.wrapper import PlaybackBenchmarkWrapper

        raw = getattr(args, "_raw_argv", None) or _sys.argv[1:]
        child = [a for a in raw if a != "--supervised"]
        w = PlaybackBenchmarkWrapper(
            argv=[_sys.executable, "-m", "hdrtv_tpu.cli", *child],
            on_line=lambda line: print(f"  | {line}", flush=True),
            out_dir=args.out,
        )
        rc = w.run()
        table = w.render_table()
        if table != "(no batch results)":
            print(table)
        print(f"[wrapper] child rc={rc}" + (" (canceled)" if w.canceled else ""))
        return rc

    from hdrtv_tpu.bench.playback import PlaybackRunConfig, run_batch, run_playback_benchmark

    if getattr(args, "resolutions", None) or getattr(args, "runs", None):
        # batch matrix: resolutions × precision presets, one session dir per
        # run + batch.csv (cli_playback_benchmark.py:1295-1308 --resolutions
        # / --runs recipes, README.md:768-777 one-liners)
        import copy

        from hdrtv_tpu.config import resolve_precision_key

        resolutions = args.resolutions or [args.resolution]
        runs = [resolve_precision_key(r) for r in (args.runs or [args.precision])]
        cfgs = [
            PlaybackRunConfig(
                video=args.video, precision_key=pk, resolution_key=rk,
                use_hg=args.use_hg, realtime=not args.no_realtime,
                duration_s=args.duration,
                loop_source=bool(getattr(args, "loop_source", False)),
                wall_clock=bool(getattr(args, "wall_clock", False)),
                sample_interval=max(1, getattr(args, "sample_interval", 120)),
            )
            for rk in resolutions for pk in runs
        ]

        def make_proc(cfg):
            a = copy.copy(args)
            a.precision, a.resolution = cfg.precision_key, cfg.resolution_key
            if args.model is None:
                a.model = None  # resolve per preset from the table
            return _make_processor(a)

        root = args.out or os.path.join("logs", "playback_sessions", "batch")
        trace_cm = contextlib.nullcontext()
        if args.trace:
            from hdrtv_tpu.utils.profiling import device_trace

            trace_cm = device_trace(args.trace)
        with trace_cm:
            results = run_batch(cfgs, make_proc, root)
        for r in results:
            c = r.config
            print(f"{c['resolution_key']:6s} {c['precision_key']:24s} "
                  f"fps={r.fps:7.2f} 1%low={r.fps_1pct_low:7.2f} model={r.model_ms:.2f}ms")
        print(f"batch CSV: {os.path.join(root, 'batch.csv')}")
        return 0

    proc = _make_processor(args)
    if getattr(args, "device_resident", False) or getattr(args, "device_resident_only", False):
        # Honest sustained-throughput projection on tunneled runners: the
        # pipelined number below measures host<->device transfers too; this
        # one measures only the chip (bench.py methodology).
        from hdrtv_tpu.bench.playback import run_device_resident

        dr = run_device_resident(proc, args.resolution,
                                 frames=max(1, int(args.duration * 30)))
        print(json.dumps(dr, indent=2))
        if getattr(args, "device_resident_only", False):
            return 0
    cfg = PlaybackRunConfig(
        video=args.video,
        precision_key=args.precision,
        resolution_key=args.resolution,
        use_hg=args.use_hg,
        realtime=not args.no_realtime,
        duration_s=args.duration,
        loop_source=bool(getattr(args, "loop_source", False)),
        wall_clock=bool(getattr(args, "wall_clock", False)),
        sample_interval=max(1, getattr(args, "sample_interval", 120)),
    )
    out_dir = args.out or os.path.join("logs", "playback_sessions", "cli")
    trace_cm = contextlib.nullcontext()
    if args.trace:
        # device-level op timeline for offline xprof inspection (the engine
        # inspector role, utils/profiling.device_trace)
        from hdrtv_tpu.utils.profiling import device_trace

        trace_cm = device_trace(args.trace)
    with trace_cm:
        res = run_playback_benchmark(cfg, proc, out_dir)
    if args.trace:
        print(f"device trace written to {args.trace}")
    print(json.dumps(res.__dict__, default=str, indent=2))
    return 0


def cmd_quality(args) -> int:
    from hdrtv_tpu.bench.quality import QualityRunConfig, run_quality_benchmark
    from hdrtv_tpu.pipeline.source import VideoSource
    from hdrtv_tpu.bench.gt_sync import HDRGroundTruthReader, make_frame_map

    sync_offset = 0
    if not args.no_validate_gt:
        # The reference validates the GT pair before enabling metrics
        # (gui_ground_truth.py:36-158); same gate here, skippable for
        # synthetic/test material.
        from hdrtv_tpu.bench.gt_validate import validate_gt_pair

        res = validate_gt_pair(args.gt, args.video)
        if not res.ok:
            print(f"GT validation failed: {res.message}")
            return 2
        print(f"GT validated: {res.message}")
        # Feed the measured sync offset into the frame map — post-verify's
        # ±2-frame local search cannot recover a larger offset on its own.
        sync_offset = int(getattr(res, "offset_frames", 0) or 0)
    sdr = VideoSource(args.video)
    gt = HDRGroundTruthReader(args.gt)
    fmap = make_frame_map(sdr.fps, gt.fps, sync_offset)
    cfg = QualityRunConfig(
        precision_key=args.precision,
        resolution_key=args.resolution,
        use_hg=args.use_hg,
        frame_count=args.frames or 10,
    )
    out_root = args.out or os.path.join("logs", "benchmark_sessions")
    source_name = os.path.splitext(os.path.basename(args.video))[0]
    if args.queue:
        # benchmark queue — the reference's one-click precision sweep
        # (gui_benchmark.py queue actions): "main" = the FP32/FP16/
        # Mixed QAT/Full QAT set, "all" = every registered preset,
        # else a comma list of preset keys. GT post-verify alignment is
        # shared across runs via the bounded cache.
        from hdrtv_tpu.bench.quality import QUEUE_MAIN_SET, run_quality_queue
        from hdrtv_tpu.config import PRECISIONS

        if args.queue.strip().lower() == "main":
            keys = [k for k in QUEUE_MAIN_SET if k in PRECISIONS]
        elif args.queue.strip().lower() == "all":
            keys = list(PRECISIONS)
        else:
            from hdrtv_tpu.config import resolve_precision_key

            keys = [resolve_precision_key(k.strip()) for k in args.queue.split(",") if k.strip()]
        unknown = [k for k in keys if k not in PRECISIONS]
        if unknown:
            print(f"unknown precision presets: {unknown}; known: {list(PRECISIONS)}")
            return 2

        def make_proc(key):
            import copy

            a = copy.copy(args)
            a.precision = key
            return _make_processor(a)

        summaries = run_quality_queue(
            cfg, keys, make_proc, sdr, gt, out_root,
            source_name=source_name, gt_frame_map=fmap,
            progress=lambda k: print(f"queue: {k}", flush=True),
        )
        sdr.close()
        gt.close()
        for s in summaries:
            print(json.dumps({
                "precision": s["precision"],
                "mean_psnr": s["mean_psnr"],
                "mean_ssim": s["mean_ssim"],
                "mean_delta_e_itp": s["mean_delta_e_itp"],
                "session_dir": s["session_dir"],
            }))
        return 0
    proc = _make_processor(args)
    summary = run_quality_benchmark(
        cfg,
        proc,
        sdr,
        gt,  # the reader object: surfaces decode_method + the fast
        # first-pass read for post-verify (gui_benchmark.py GT split)
        out_root,
        source_name=source_name,
        gt_frame_map=fmap,
    )
    sdr.close()
    gt.close()
    print(json.dumps({k: v for k, v in summary.items() if k != "frames"}, indent=2))
    return 0


def cmd_build_engines(args) -> int:
    """Batch engine prebuild over resolutions × precisions — the
    build_tensorrt_engines.py role (/root/reference/src/build_tensorrt_engines.py:260)."""
    import time as _time

    from hdrtv_tpu.config import processing_dims

    resolutions = args.resolutions.split(",")
    precisions = args.precisions.split(",")
    for precision in precisions:
        a = argparse.Namespace(**{**vars(args), "precision": precision})
        proc = _make_processor(a)
        for res in resolutions:
            w, h = processing_dims(res.strip())
            dt = proc.warmup_compile(w, h)
            line = f"{precision} {res}: engine ready in {dt:.1f}s"
            if args.benchmark_runs:
                frame = (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8)
                t0 = _time.perf_counter()
                for _ in range(args.benchmark_runs):
                    proc.process_rgb48(frame)
                ms = (_time.perf_counter() - t0) / args.benchmark_runs * 1e3
                line += f"; {ms:.1f} ms/frame over {args.benchmark_runs} runs"
            print(line, flush=True)
    return 0


def cmd_engines(args) -> int:
    from hdrtv_tpu.runtime.engine import EngineRegistry

    reg = EngineRegistry()
    if args.action == "list":
        for rec in reg.list():
            print(
                f"{rec.key}  {rec.precision}{' hg' if rec.use_hg else ''}  "
                f"compile={rec.compile_seconds:.1f}s  jax={rec.jax_version}  {rec.device_kind}"
            )
        if not reg.list():
            print("(no engines recorded)")
    elif args.action == "clear":
        n = reg.clear()
        print(f"cleared {n} cache files")
    elif args.action == "warm":
        from hdrtv_tpu.config import processing_dims

        proc = _make_processor(args)
        w, h = processing_dims(args.resolution)
        dt = proc.warmup_compile(w, h)
        print(f"warmed {w}x{h} in {dt:.1f}s")
    return 0


def cmd_assets(args) -> int:
    """Required-asset inventory: every preset weight file, its validation
    status, and the presets that need it (required_clone_assets.py role —
    no downloads here; the report tells the user what to populate)."""
    from hdrtv_tpu.utils.assets import missing_assets, required_assets

    assets = required_assets()
    for a in assets:
        mb = a.size_bytes / (1 << 20)
        size = f"{mb:8.1f} MB" if a.size_bytes else "      —   "
        used = ", ".join(a.used_by[:3]) + ("…" if len(a.used_by) > 3 else "")
        print(f"{a.status:9s} {size}  {a.path}  [{used}]")
    missing = [a for a in assets if a.status != "ok"]
    print(f"{len(assets) - len(missing)}/{len(assets)} present")
    if missing and args.require:
        return 3
    return 0


def cmd_doctor(args) -> int:
    """Runtime environment check (nvidia_runtime_check.py role)."""
    from hdrtv_tpu.runtime.doctor import check_tpu_runtime

    report = check_tpu_runtime(probe_device=not args.no_device)
    print(json.dumps(report, indent=2))
    return 0 if report["ok"] else 3


def cmd_presets(args) -> int:
    """Precision-preset table with availability — the GUI precision
    dropdown's data (gui_config.py:19-160 + :260-278 availability)."""
    from hdrtv_tpu.config import (
        PRECISIONS, RESOLUTION_SCALES, DEFAULT_PRECISION_KEY, precision_is_available,
    )

    from hdrtv_tpu.config import show_fp8

    for key, p in PRECISIONS.items():
        mark = "*" if key == DEFAULT_PRECISION_KEY else " "
        if p.requires_fp8 and not show_fp8():
            state = "hidden (HDRTVNET_SHOW_FP8=0)"
        elif precision_is_available(key):
            state = "available"
        else:
            state = "weights missing"
        print(f"{mark} {key:28s} {p.precision:12s} {state}")
    print(f"resolutions: {', '.join(RESOLUTION_SCALES)}   (* = default preset)")
    return 0


def cmd_split_sources(args) -> int:
    """Split a composite HR+HG checkpoint into HR/HG source checkpoints
    (scripts/quantize/split_tensorrt_sources.py role)."""
    from hdrtv_tpu.models.import_torch import split_source_checkpoint

    hr_keys, hg_keys = split_source_checkpoint(args.model, args.out_hr, args.out_hg)
    print(f"HR: {len(hr_keys)} tensors → {args.out_hr}")
    print(f"HG: {len(hg_keys)} tensors → {args.out_hg}")
    return 0


def cmd_layout(args) -> int:
    """Generate a mixed-quant layout from the stability probe
    (scripts/quantize/quantize_int8_mixed.py role)."""
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_checkpoint, load_npz
    from hdrtv_tpu.quant.mixed import generate_mixed_layout

    if args.model.endswith(".npz"):
        params = load_npz(args.model)
        cfg = ModelConfig(use_hg=args.use_hg)
    else:
        params, cfg = load_checkpoint(args.model, use_hg=args.use_hg)
    if args.probe_video:
        from hdrtv_tpu.pipeline.source import VideoSource

        frames = []
        with VideoSource(args.probe_video) as src:
            step = max(1, (src.frame_count or 300) // args.probe_frames)
            for i in range(args.probe_frames):
                src.seek(i * step)
                meta = src.read_with_meta()
                if meta is None:
                    break
                frames.append(meta[0][..., ::-1].astype(np.float32) / 255.0)
    else:
        frames = [
            np.random.RandomState(i).rand(144, 192, 3).astype(np.float32)
            for i in range(args.probe_frames)
        ]
    chosen = generate_mixed_layout(params, frames, cfg, count=args.count, out_path=args.out)
    print(f"wrote {args.out}: {len(chosen)} W8A8 layers")
    return 0


def cmd_quantize(args) -> int:
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_checkpoint, load_npz, save_npz
    from hdrtv_tpu.quant.calibrate import calibrate
    from hdrtv_tpu.quant.int8 import load_mixed_layout, quantize_params, quantized_layer_summary

    if args.model.endswith(".npz"):
        params = load_npz(args.model)
        cfg = ModelConfig(use_hg=args.use_hg)
    else:
        params, cfg = load_checkpoint(args.model, use_hg=args.use_hg)
    layers = load_mixed_layout(args.layout) if args.layout else None
    qp = quantize_params(params, layers, mode=args.mode, asymmetric=args.asymmetric)

    if args.mode == "w8a8":
        if args.calib_video:
            from hdrtv_tpu.pipeline.source import VideoSource

            frames = []
            with VideoSource(args.calib_video) as src:
                step = max(1, (src.frame_count or 300) // args.calib_frames)
                for i in range(args.calib_frames):
                    src.seek(i * step)
                    meta = src.read_with_meta()
                    if meta is None:
                        break
                    frames.append(meta[0][..., ::-1].astype(np.float32) / 255.0)
        else:  # synthetic calibration source (hdrtvnet_torch.py:7981-8017 role)
            frames = [np.random.RandomState(i).rand(256, 384, 3).astype(np.float32) for i in range(args.calib_frames)]
        qp = calibrate(qp, frames, cfg, method=args.calib_method)

    save_npz(args.out, qp)
    summary = quantized_layer_summary(qp)
    counts: dict[str, int] = {}
    for v in summary.values():
        counts[v] = counts.get(v, 0) + 1
    print(f"wrote {args.out}; layer mix: {counts}")
    return 0


def cmd_sweep(args) -> int:
    """Precision sweep with ΔEITP quality bench vs the fp32 reference output."""
    from hdrtv_tpu.bench.sweep import precision_sweep
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_checkpoint, load_npz

    if args.model.endswith(".npz"):
        params, cfg = load_npz(args.model), ModelConfig(use_hg=args.use_hg)
    else:
        params, cfg = load_checkpoint(args.model, use_hg=args.use_hg)

    presets = None
    if args.preset_checkpoints:
        presets = {}
        for spec in args.preset_checkpoints:
            name, _, path = spec.partition("=")
            p = load_npz(path) if path.endswith(".npz") else load_checkpoint(path, use_hg=args.use_hg)[0]
            presets[name] = {"params": p, "precision": "bf16"}
    entries = precision_sweep(params, cfg, presets=presets, frame_count=args.frames)
    print(json.dumps([e.__dict__ for e in entries], indent=2))
    return 0


def cmd_qat(args) -> int:
    """Teacher-distilled QAT fine-tune → calibrated portable int8 checkpoint
    (quantize_int8_mixed_qat.py / quantize_int8_full_qat.py roles)."""
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_checkpoint, load_npz, save_npz
    from hdrtv_tpu.quant.int8 import (
        DEFAULT_EXCLUDE_SUFFIXES,
        load_mixed_layout,
        quantizable_layers,
        quantized_layer_summary,
    )
    from hdrtv_tpu.quant.qat import run_qat

    if args.model.endswith(".npz"):
        params, cfg = load_npz(args.model), ModelConfig(use_hg=args.use_hg)
    else:
        params, cfg = load_checkpoint(args.model, use_hg=args.use_hg)
    if args.layout:
        layers = load_mixed_layout(args.layout)
    else:
        layers = [l for l in quantizable_layers(params) if not l.endswith(DEFAULT_EXCLUDE_SUFFIXES)]

    if args.frames_video:
        from hdrtv_tpu.pipeline.source import VideoSource

        frames = []
        with VideoSource(args.frames_video) as src:
            step = max(1, (src.frame_count or 300) // args.num_frames)
            for i in range(args.num_frames):
                src.seek(i * step)
                meta = src.read_with_meta()
                if meta is None:
                    break
                frames.append(meta[0][..., ::-1].astype(np.float32) / 255.0)
    else:
        frames = [
            np.random.RandomState(i).rand(args.crop, args.crop * 2, 3).astype(np.float32)
            for i in range(args.num_frames)
        ]

    qp, losses = run_qat(
        params, cfg, layers, frames,
        steps=args.steps, lr=args.lr, asymmetric=not args.symmetric,
    )
    save_npz(args.out, qp)
    counts: dict[str, int] = {}
    for v in quantized_layer_summary(qp).values():
        counts[v] = counts.get(v, 0) + 1
    print(json.dumps({
        "out": args.out,
        "layers_quantized": len(layers),
        "layer_mix": counts,
        "loss_first": round(losses[0], 6),
        "loss_last": round(losses[-1], 6),
    }, indent=2))
    return 0


def cmd_validate(args) -> int:
    """Checkpoint parity validation vs an fp32 teacher
    (validate_tensorrt_sources.py role, SURVEY.md §4)."""
    from hdrtv_tpu.bench.validate import temporal_stability_probe, validate_checkpoint
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_checkpoint, load_npz

    def load(path):
        if path.endswith(".npz"):
            return load_npz(path), ModelConfig(use_hg=args.use_hg)
        return load_checkpoint(path, use_hg=args.use_hg)

    student, cfg = load(args.model)
    teacher, _ = load(args.teacher)
    expected = None
    if args.expect_w8a8 is not None:
        expected = {"w8a8": args.expect_w8a8} if not args.asymmetric else {"w8a8-asym": args.expect_w8a8}
    report = validate_checkpoint(
        student, teacher, cfg, frame_count=args.frames, expected_mix=expected, out_dir=args.out
    )
    result = report.as_dict()
    if args.temporal:
        result["temporal"] = temporal_stability_probe(student, cfg)
    print(json.dumps(result, indent=2))
    return 0


def cmd_info(args) -> int:
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_checkpoint, load_npz
    from hdrtv_tpu.quant.int8 import quantized_layer_summary

    if args.model.endswith(".npz"):
        params, cfg = load_npz(args.model), None
    else:
        params, cfg = load_checkpoint(args.model, use_hg=args.use_hg)
    summary = quantized_layer_summary(params)
    counts: dict[str, int] = {}
    for v in summary.values():
        counts[v] = counts.get(v, 0) + 1
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    print(json.dumps({"tensors": len(params), "params": n_params, "layer_mix": counts, "config": str(cfg)}, indent=2))
    return 0


def cmd_export(args) -> int:
    from hdrtv_tpu.pipeline.export import ExportConfig, export_video, export_video_multihost
    from hdrtv_tpu.utils.env import env_int

    proc = _make_processor(args)
    cfg = ExportConfig(
        output=args.output or "export.mov",
        resolution_key=args.resolution,
        codec=args.codec,
        batch=args.batch,
        use_mesh=args.mesh,
    )
    hosts = args.hosts or env_int("HDRTV_EXPORT_HOSTS", 1)
    if hosts > 1:
        # Export farm: this process renders its frame range; host 0 also
        # reassembles (gui_export.py:796 worker semantics, scaled out).
        host_id = args.host_id if args.host_id is not None else env_int("HDRTV_EXPORT_HOST_ID", 0)
        from hdrtv_tpu.parallel.multihost import initialize_distributed

        initialize_distributed()  # no-op single-host; wires jax.distributed when env set
        stats = export_video_multihost(args.video, proc, cfg, hosts=hosts, host_id=host_id)
    else:
        stats = export_video(args.video, proc, cfg)
    print(json.dumps(stats, indent=2))
    return 0


def cmd_live(args) -> int:
    """Live capture → SDR→HDR → display (WindowCaptureSource mode analog,
    reference window_capture_source.py:1132 + live-feeder drop-to-latest)."""
    from hdrtv_tpu.config import processing_dims
    from hdrtv_tpu.pipeline.capture import make_grabber
    from hdrtv_tpu.pipeline.live import LiveSource
    from hdrtv_tpu.pipeline.runner import PipelineRunner
    from hdrtv_tpu.pipeline.sinks import make_sink

    try:
        grabber = make_grabber(args.capture)
    except (RuntimeError, ValueError) as exc:
        print(f"capture source unavailable: {exc}")
        return 2
    proc = _make_processor(args)
    w, h = processing_dims(args.resolution)
    src = LiveSource(grabber, process_fps=args.fps)
    sink = make_sink(args.display, w, h, src.display_fps, path=args.output, live=True)
    print(f"compiling {w}x{h} ({args.precision})...", flush=True)
    dt = proc.warmup_compile(w, h)
    print(f"engine ready in {dt:.1f}s; capturing (observe {src.observe_fps:.0f} fps, "
          f"process {src.fps:.0f} fps)", flush=True)
    runner = PipelineRunner(src, proc, sink, realtime=True, max_frames=args.frames)
    m = runner.run()
    src.close()
    sink.close()
    # Recommend the extension's local audio delay from the measured pipeline
    # latency (the live-audio delay targeting, gui_state_init.py:123-139)
    from hdrtv_tpu.pipeline.audio import live_audio_delay_target_ms

    latency_hint = (m.model_ms + 1000.0 / max(src.display_fps, 1.0)) if m.frames else None
    delay = live_audio_delay_target_ms(latency_hint, tab_audio=True)
    print(
        f"frames={m.frames} observed={src.frames_observed} dropped={m.dropped} "
        f"fps={m.fps:.2f} model={m.model_ms:.2f}ms audio_delay_target={delay:.0f}ms"
    )
    return 0


def cmd_compare(args) -> int:
    """3-way compare snapshot at a frame: SDR | HDR convert | HDR GT with
    per-pair metrics (the modal compare tool, gui_compare.py role)."""
    from hdrtv_tpu.pipeline.compare import compare_frame, write_compare_sheet
    from hdrtv_tpu.pipeline.source import VideoSource

    proc = _make_processor(args)
    src = VideoSource(args.video)
    try:
        src.seek(args.frame)
        meta = src.read_with_meta()
        if meta is None:
            print(f"cannot decode frame {args.frame}")
            return 1
        frame_bgr = meta[0]
    finally:
        src.close()
    gt01 = None
    if args.gt:
        from hdrtv_tpu.bench.gt_sync import HDRGroundTruthReader, make_frame_map

        gt = HDRGroundTruthReader(args.gt)
        try:
            gt01 = gt.read_unit_rgb(make_frame_map(src.fps, gt.fps)(args.frame))
        finally:
            gt.close()
    result = compare_frame(proc, frame_bgr, frame_idx=args.frame, gt_rgb01=gt01)
    path = write_compare_sheet(result, args.out or "compare")
    print(json.dumps({"sheet": path, "metrics": result.metrics}, indent=2))
    return 0


def cmd_preview(args) -> int:
    """Exact-seek scrub thumbnails → contact sheet PNG — the
    MpvFilePreviewWidget role (gui_mpv_widget.py:1524: exact scrub previews;
    here a headless strip for timeline inspection)."""
    import cv2

    from hdrtv_tpu.pipeline.scaling import letterbox_bgr
    from hdrtv_tpu.pipeline.source import VideoSource

    src = VideoSource(args.video)
    try:
        total = src.frame_count or 1
        n = max(1, args.frames)
        idxs = [int(i) for i in np.linspace(0, max(0, total - 1), n)]
        tw, th = args.thumb_width, args.thumb_width * 9 // 16
        thumbs = []
        for idx in idxs:
            src.seek(idx)  # exact seek (backtrack + decode-forward)
            meta = src.read_with_meta()
            if meta is None:
                continue
            thumb = letterbox_bgr(meta[0], tw, th)
            t_s = idx / max(1e-6, src.fps)
            cv2.putText(thumb, f"#{idx} {t_s:6.2f}s", (4, th - 6),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.35, (255, 255, 255), 1)
            thumbs.append(thumb)
    finally:
        src.close()
    if not thumbs:
        print("no frames decoded")
        return 1
    cols = min(len(thumbs), args.columns)
    rows = (len(thumbs) + cols - 1) // cols
    sheet = np.zeros((rows * th, cols * tw, 3), np.uint8)
    for k, thumb in enumerate(thumbs):
        r, c = divmod(k, cols)
        sheet[r * th : (r + 1) * th, c * tw : (c + 1) * tw] = thumb
    out = args.out or "preview.png"
    cv2.imwrite(out, sheet)
    print(json.dumps({"out": out, "thumbs": len(thumbs), "grid": [rows, cols]}))
    return 0


def cmd_sessions(args) -> int:
    """Benchmark-session viewer (CLI form of the reference's result viewer:
    run metadata + summary reloading; previews come from ``cli figures``).
    Scans quality ``summary.json`` and playback ``session.json`` files."""
    rows = []
    for root in args.roots:
        for dirpath, _dirs, files in os.walk(root):
            if "summary.json" in files:
                try:
                    with open(os.path.join(dirpath, "summary.json")) as f:
                        s = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue
                if "mean_psnr" in s:  # quality session
                    rows.append({
                        "kind": "quality",
                        "dir": dirpath,
                        "source": s.get("source"),
                        "precision": s.get("precision"),
                        "resolution": s.get("resolution"),
                        "frames": len(s.get("frames", [])),
                        "mean_psnr": s.get("mean_psnr"),
                        "mean_ssim": s.get("mean_ssim"),
                        "mean_delta_e_itp": s.get("mean_delta_e_itp"),
                        "gt_decode": s.get("gt_decode"),
                    })
            if "session.json" in files:
                try:
                    with open(os.path.join(dirpath, "session.json")) as f:
                        s = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue
                if "fps" in s:  # playback session
                    cfgd = s.get("config", {})
                    rows.append({
                        "kind": "playback",
                        "dir": dirpath,
                        "precision": cfgd.get("precision_key"),
                        "resolution": cfgd.get("resolution_key"),
                        "frames": s.get("frames"),
                        "fps": s.get("fps"),
                        "fps_1pct_low": s.get("fps_1pct_low"),
                        "model_ms": s.get("model_ms"),
                        "dropped": s.get("dropped"),
                    })
    rows.sort(key=lambda r: r["dir"], reverse=True)
    if args.limit:
        rows = rows[: args.limit]
    if args.json:
        print(json.dumps(rows, indent=2))
        return 0
    if not rows:
        print("no sessions found")
        return 1
    for r in rows:
        if r["kind"] == "quality":
            print(
                f"quality  {r['precision']:<22} {r['resolution']:<6} "
                f"n={r['frames']:<3} psnr={r['mean_psnr']} ssim={r['mean_ssim']} "
                f"dEitp={r['mean_delta_e_itp']}  {r['dir']}"
            )
        else:
            print(
                f"playback {str(r['precision']):<22} {str(r['resolution']):<6} "
                f"n={r['frames']:<4} fps={r['fps']} 1%low={r['fps_1pct_low']} "
                f"model={r['model_ms']}ms drop={r['dropped']}  {r['dir']}"
            )
    return 0


def cmd_figures(args) -> int:
    """Benchmark-artifact figure renderer — the
    scripts/render_mpv_preview_figures.py role: walk a benchmark session
    for sdr.png/hdr_gt.tiff/hdr_convert.tiff frame dirs, replay each
    through the numeric display path (BT.2390 tone-map + scale policy),
    and save presentation PNGs + labeled contact sheets + a manifest."""
    from hdrtv_tpu.bench.figures import render_session

    render_size = None
    if args.render_size:
        try:
            w, h = args.render_size.lower().split("x")
            render_size = (int(w), int(h))
        except ValueError:
            print(f"render size must look like 1920x1080: {args.render_size!r}")
            return 2
        if render_size[0] <= 0 or render_size[1] <= 0:
            print("render size must be positive")
            return 2
    kinds = [k.strip() for k in args.kinds.split(",") if k.strip()]
    manifest = render_session(
        args.input,
        args.out,
        kinds=kinds,
        render_size=render_size,
        scale=args.scale,
        png_depth=args.png_depth,
        sheet=not args.no_sheet,
        target_nits=args.target_nits,
        source_peak_nits=args.source_peak,
    )
    print(json.dumps({
        "out": args.out,
        "frames": len(manifest["frames"]),
        "kinds": manifest["kinds"],
    }))
    return 0 if manifest["frames"] else 1


def cmd_mine_hard_frames(args) -> int:
    from hdrtv_tpu.data.curate import mine_hard_frames

    manifest = mine_hard_frames(
        args.sdr_dir, args.hdr_dir, args.out,
        top=args.top, max_repeat=args.max_repeat, max_long_edge=args.max_long_edge,
    )
    print(json.dumps({k: v for k, v in manifest.items() if k != "replay"}, indent=2))
    return 0


def cmd_teacher_pairs(args) -> int:
    from hdrtv_tpu.data.curate import make_teacher_pairs

    proc = _make_processor(args)
    manifest = make_teacher_pairs(
        args.video, proc, args.out,
        num_frames=args.num_frames, start_frame=args.start_frame,
        end_frame=args.end_frame, max_long_edge=args.max_long_edge,
        frames=[int(x) for x in args.frames.split(",")] if args.frames else None,
    )
    print(json.dumps({"video": manifest["video"], "count": manifest["count"]}, indent=2))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hdrtv_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="play/convert video")
    _add_model_args(c, prefs_defaults=True)
    c.add_argument("--video", default=None)
    c.add_argument("--display", default=None, choices=["mpv", "side-by-side", "file", "null"])
    c.add_argument("--output", default=None)
    c.add_argument("--frames", type=int, default=None)
    c.add_argument("--no-realtime", action="store_true")
    c.add_argument("--prefetch", type=int, default=4,
                   help="reader prefetch queue size, 0 disables (main.py --prefetch)")
    c.add_argument("--start-frame", type=int, default=None,
                   help="initial frame index to seek to (gui_app_entry.py --start-frame)")
    c.add_argument("--target-fps", type=float, default=0.0,
                   help="pacing FPS override; 0 = source rate (main.py --target-fps)")
    c.add_argument("--warmup", type=int, default=0,
                   help="frames excluded from final timing stats (main.py --warmup)")
    c.add_argument("--timing-interval", type=int, default=0,
                   help="print a [timing] report every N frames; 0 = off (main.py --timing-interval)")
    c.add_argument("--log-session", default=None, help="write a Log Session dir (summary/json/csv)")
    c.add_argument("--hdr-input", default="reject", choices=["reject", "bypass"])
    c.add_argument("--audio", action="store_true", help="attach source audio (mpv, auto-mute on slow FPS)")
    c.add_argument("--audio-track", type=int, default=None, help="audio stream ordinal (probe_audio_streams)")
    c.add_argument("--audio-delay-ms", type=float, default=None,
                   help="audio delay 0-2000 ms (the reference's slider; env HDRTVNET_AUDIO_DELAY_MS)")
    c.add_argument("--interactive", action="store_true",
                   help="terminal shell: pause/seek/precision/resolution hot-keys + live metrics")
    c.add_argument("--stages", action="store_true", help="print the per-stage timing table")
    c.add_argument("--upscale", default=None,
                   choices=["ewa_lanczossharp", "fsr", "ssim_superres"],
                   help="display upscaler when --display-size exceeds the processing "
                        "resolution (gui_scaling.py policy; default FSR via prefs)")
    c.add_argument("--film-grain", action="store_true", default=None,
                   help="append the film-grain GLSL shader to the HDR pane chain "
                        "(gui_app_entry.py --film-grain)")
    c.add_argument("--display-size", default=None, metavar="WxH",
                   help="display output size for the mpv scale policy "
                        "(the reference GUI's output preset / window size)")
    c.add_argument("--mesh", default=None, choices=["spatial"],
                   help="shard each frame's W over all devices (single-frame latency scale-out)")
    c.set_defaults(fn=cmd_convert)

    lv = sub.add_parser("live", help="live capture → HDR display (x11/v4l2/synthetic)")
    _add_model_args(lv)
    lv.add_argument("--capture", default=None,
                    help="grabber spec: x11[:title] | v4l2[:/dev/videoN] | synthetic | auto")
    lv.add_argument("--fps", type=float, default=24.0, help="process FPS budget")
    lv.add_argument("--display", default="mpv", choices=["mpv", "side-by-side", "file", "null"])
    lv.add_argument("--output", default=None)
    lv.add_argument("--frames", type=int, default=None)
    lv.set_defaults(fn=cmd_live)

    b = sub.add_parser("bench", help="playback performance benchmark")
    _add_model_args(b)
    b.add_argument("--video", default=None)
    b.add_argument("--duration", type=float, default=30.0)
    b.add_argument("--no-realtime", action="store_true")
    b.add_argument("--out", default=None)
    b.add_argument("--trace", default=None, help="write a jax.profiler device trace to this dir")
    b.add_argument("--loop-source", action="store_true",
                   help="loop the video at EOF so short clips sustain the duration")
    b.add_argument("--wall-clock", action="store_true",
                   help="measure for true wall-clock duration instead of duration×fps frames")
    b.add_argument("--sample-interval", type=int, default=120,
                   help="runtime sample CSV cadence in frames")
    b.add_argument("--device-resident", action="store_true",
                   help="also report sustained device-resident model throughput "
                        "(chained dispatches + one fetch — excludes host<->device "
                        "frame copies; the honest projection on tunneled runners)")
    b.add_argument("--device-resident-only", action="store_true",
                   help="skip the pipelined run; report only the device-resident number")
    b.add_argument("--resolutions", nargs="+", default=None,
                   choices=["540p", "720p", "1080p", "4K"],
                   help="batch matrix: run every resolution × --runs preset")
    b.add_argument("--runs", nargs="+", default=None, metavar="PRESET",
                   help="batch matrix: precision preset keys (config.PRECISIONS)")
    b.add_argument("--supervised", action="store_true",
                   help="run the benchmark in a supervised child process "
                        "(the reference's GUI bench-dialog contract: process "
                        "isolation, live output streaming, playback lock, "
                        "cancel-safe, batch-CSV result table — bench/wrapper.py)")
    b.set_defaults(fn=cmd_bench)

    q = sub.add_parser("quality", help="model quality benchmark")
    _add_model_args(q)
    q.add_argument("--video", required=True, help="SDR source")
    q.add_argument("--gt", required=True, help="HDR ground-truth video")
    q.add_argument("--frames", type=int, default=10)
    q.add_argument("--out", default=None)
    q.add_argument("--no-validate-gt", action="store_true",
                   help="skip the GT pair validation gate (synthetic/test material)")
    q.add_argument("--queue", default=None, metavar="PRESETS",
                   help="benchmark queue: 'main' (FP32/FP16/Mixed QAT/Full QAT), "
                        "'all', or a comma list of precision presets; GT alignment "
                        "is computed once and shared across runs")
    q.set_defaults(fn=cmd_quality)

    pr = sub.add_parser("presets", help="precision presets with availability")
    pr.set_defaults(fn=cmd_presets)

    dr = sub.add_parser("doctor", help="runtime environment check (jax/TPU, tools, weights, cache)")
    dr.add_argument("--no-device", action="store_true",
                    help="skip the jax device query (safe on a wedged relay)")
    dr.set_defaults(fn=cmd_doctor)

    sp = sub.add_parser("split-sources",
                        help="split a composite HR+HG checkpoint into HR/HG source files")
    sp.add_argument("--model", required=True, help="composite checkpoint (base.*/hg.* keys)")
    sp.add_argument("--out-hr", required=True)
    sp.add_argument("--out-hg", required=True)
    sp.set_defaults(fn=cmd_split_sources)

    aa = sub.add_parser("assets", help="required weight files: presence + validation report")
    aa.add_argument("--require", action="store_true",
                    help="exit nonzero when any asset is missing/invalid")
    aa.set_defaults(fn=cmd_assets)

    e = sub.add_parser("engines", help="engine cache tools")
    _add_model_args(e)
    e.add_argument("action", choices=["list", "clear", "warm"])
    e.set_defaults(fn=cmd_engines)

    be = sub.add_parser("build-engines", help="batch engine prebuild (resolutions × precisions)")
    _add_model_args(be)
    be.add_argument("--resolutions", default="1080p,720p")
    be.add_argument("--precisions", default="FP16")
    be.add_argument("--benchmark-runs", type=int, default=0)
    be.set_defaults(fn=cmd_build_engines)

    z = sub.add_parser("quantize", help="PTQ quantization")
    z.add_argument("--model", required=True)
    z.add_argument("--out", required=True)
    z.add_argument("--mode", default="w8a8", choices=["w8", "w8a8"])
    z.add_argument("--asymmetric", action="store_true")
    z.add_argument("--layout", default=None, help="mixed layer list (qat_layouts txt)")
    z.add_argument("--use-hg", action="store_true")
    z.add_argument("--calib-video", default=None)
    z.add_argument("--calib-frames", type=int, default=16)
    z.add_argument("--calib-method", default="max", choices=["max", "percentile", "kl"])
    z.set_defaults(fn=cmd_quantize)

    lo = sub.add_parser(
        "layout", help="generate a mixed W8A8 layout via per-layer sensitivity probe"
    )
    lo.add_argument("--model", required=True)
    lo.add_argument("--out", required=True)
    lo.add_argument("--count", type=int, default=29, help="W8A8 layer budget (reference no-HG recipe: 29)")
    lo.add_argument("--use-hg", action="store_true")
    lo.add_argument("--probe-video", default=None)
    lo.add_argument("--probe-frames", type=int, default=4)
    lo.set_defaults(fn=cmd_layout)

    s = sub.add_parser("sweep", help="precision sweep with ΔEITP quality bench")
    s.add_argument("--model", required=True, help="fp32 reference checkpoint")
    s.add_argument("--frames", type=int, default=3)
    s.add_argument("--use-hg", action="store_true")
    s.add_argument(
        "--preset-checkpoints", nargs="*", default=None,
        help="name=path pairs (e.g. 'int8-mixed-qat=/path.pt'); default: PTQ ladder",
    )
    s.set_defaults(fn=cmd_sweep)

    t = sub.add_parser("qat", help="QAT fine-tune to int8 (teacher-distilled)")
    t.add_argument("--model", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--layout", default=None, help="mixed layer list (qat_layouts txt)")
    t.add_argument("--use-hg", action="store_true")
    t.add_argument("--steps", type=int, default=50)
    t.add_argument("--lr", type=float, default=2e-6)  # mixed recipe (README.md:1174)
    t.add_argument("--symmetric", action="store_true")
    t.add_argument("--frames-video", default=None)
    t.add_argument("--num-frames", type=int, default=8)
    t.add_argument("--crop", type=int, default=128)
    t.set_defaults(fn=cmd_qat)

    v = sub.add_parser("validate", help="checkpoint parity vs fp32 teacher")
    v.add_argument("--model", required=True)
    v.add_argument("--teacher", required=True)
    v.add_argument("--frames", type=int, default=4)
    v.add_argument("--use-hg", action="store_true")
    v.add_argument("--expect-w8a8", type=int, default=None, help="assert quantized-layer contract")
    v.add_argument("--asymmetric", action="store_true")
    v.add_argument("--temporal", action="store_true", help="run the temporal stability probe")
    v.add_argument("--out", default=None, help="write ×8 diff contact sheets + report.json")
    v.set_defaults(fn=cmd_validate)

    cp = sub.add_parser("compare", help="3-way compare snapshot (SDR | convert | GT) + metrics")
    _add_model_args(cp)
    cp.add_argument("--video", required=True)
    cp.add_argument("--gt", default=None)
    cp.add_argument("--frame", type=int, default=0)
    cp.add_argument("--out", default=None)
    cp.set_defaults(fn=cmd_compare)

    pv = sub.add_parser("preview", help="exact-seek scrub thumbnails → contact sheet PNG")
    pv.add_argument("--video", required=True)
    pv.add_argument("--frames", type=int, default=12)
    pv.add_argument("--columns", type=int, default=4)
    pv.add_argument("--thumb-width", type=int, default=320)
    pv.add_argument("--out", default=None)
    pv.set_defaults(fn=cmd_preview)

    ss = sub.add_parser(
        "sessions",
        help="list past benchmark sessions (quality + playback) with summaries",
    )
    ss.add_argument("--roots", nargs="*", default=["logs"])
    ss.add_argument("--limit", type=int, default=0)
    ss.add_argument("--json", action="store_true")
    ss.set_defaults(fn=cmd_sessions)

    fg = sub.add_parser(
        "figures",
        help="render benchmark session frames to presentation PNGs + contact sheets",
    )
    fg.add_argument("--input", required=True, help="benchmark session dir (or one frame dir)")
    fg.add_argument("--out", default="docs/images/figures")
    fg.add_argument("--kinds", default="sdr,hdr_convert,hdr_gt")
    fg.add_argument("--render-size", default=None, metavar="WxH")
    fg.add_argument("--scale", default=None, help="presentation scaler (fsr/ssim_superres)")
    fg.add_argument("--png-depth", type=int, default=8, choices=[8, 16])
    fg.add_argument("--no-sheet", action="store_true")
    fg.add_argument("--target-nits", type=float, default=203.0)
    fg.add_argument("--source-peak", type=float, default=1000.0)
    fg.set_defaults(fn=cmd_figures)

    mh = sub.add_parser(
        "mine-hard-frames",
        help="rank SDR/HDR image pairs by int8-hardness (bright/flat/clipped) for QAT replay",
    )
    mh.add_argument("--sdr-dir", required=True)
    mh.add_argument("--hdr-dir", required=True)
    mh.add_argument("--out", required=True)
    mh.add_argument("--top", type=int, default=256)
    mh.add_argument("--max-repeat", type=int, default=4)
    mh.add_argument("--max-long-edge", type=int, default=384)
    mh.set_defaults(fn=cmd_mine_hard_frames)

    tp = sub.add_parser(
        "teacher-pairs", help="generate SDR/fp32-teacher PNG pairs from movie frames (Film QAT)"
    )
    _add_model_args(tp)
    tp.add_argument("--video", required=True)
    tp.add_argument("--out", required=True)
    tp.add_argument("--num-frames", type=int, default=160)
    tp.add_argument("--start-frame", type=int, default=0)
    tp.add_argument("--end-frame", type=int, default=0)
    tp.add_argument("--frames", default=None, help="explicit comma-separated frame indices")
    tp.add_argument("--max-long-edge", type=int, default=0)
    tp.set_defaults(fn=cmd_teacher_pairs)

    i = sub.add_parser("info", help="checkpoint inspection")
    i.add_argument("--model", required=True)
    i.add_argument("--use-hg", action="store_true")
    i.set_defaults(fn=cmd_info)

    x = sub.add_parser("export", help="HDR10 video export")
    _add_model_args(x)
    x.add_argument("--video", required=True)
    x.add_argument("--output", default=None)
    x.add_argument("--codec", default="prores", choices=["prores", "hevc", "raw", "png16", "y4m"])
    x.add_argument("--batch", type=int, default=1, help="frames per dispatch (DP when >1)")
    x.add_argument("--mesh", action="store_true", help="shard batches over the device mesh")
    x.add_argument("--hosts", type=int, default=None,
                   help="export-farm width: total hosts splitting the frame range (env HDRTV_EXPORT_HOSTS)")
    x.add_argument("--host-id", type=int, default=None,
                   help="this host's index in the farm (env HDRTV_EXPORT_HOST_ID; host 0 reassembles)")
    x.set_defaults(fn=cmd_export)

    return p


def main(argv=None) -> int:
    # CPU e2e drives / supervised children: the axon TPU plugin ignores
    # JAX_PLATFORMS, so fresh CLI processes honor this env via jax.config
    # (the HDRTV_BENCH_PLATFORM pattern, bench.py).
    plat = os.environ.get("HDRTV_CLI_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = build_parser().parse_args(argv)
    # Raw argv for commands that re-invoke the CLI in a child process
    # (bench --supervised); works for programmatic main([...]) callers too.
    args._raw_argv = list(sys.argv[1:] if argv is None else argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
