"""Production-runner benchmark: the full PipelineRunner path, transfers
included (VERDICT r2 item 8).

Unlike bench.py (device-resident loop — the framework's sustained device
throughput), this drives decode → H2D → infer → D2H → sink through
`pipeline/runner.py` with the null sink, so every host↔device transfer is
in the measurement. On this dev runner the tunnel moves ~50 MB/s H2D /
~37 MB/s D2H, so the number is tunnel-dominated (a 1080p frame pair is
~18 MB ≈ 0.45 s of wire time); on real hardware the same path rides
PCIe/DMA at GB/s and the gap to bench.py collapses to the decode cost.
Both numbers ship in PERF_NOTES with this explanation.

Usage: python tools/bench_runner.py [--frames 40] [--height 1080]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--ring", type=int, default=3)
    args = ap.parse_args()

    from hdrtv_tpu.runtime.engine import enable_persistent_cache

    enable_persistent_cache()
    from hdrtv_tpu.pipeline.runner import PipelineRunner
    from hdrtv_tpu.pipeline.sinks import NullSink
    from hdrtv_tpu.pipeline.source import SyntheticSource
    from hdrtv_tpu.runtime.processor import HDRTVNetTPU

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = HDRTVNetTPU(
        os.path.join(here, "weights", "hr_fp32.npz"), precision="bf16"
    )
    print("compiling...", flush=True)
    proc.warmup_compile(args.width, args.height)
    src = SyntheticSource(args.width, args.height, fps=30.0, frames=args.frames + 2)
    runner = PipelineRunner(
        src, proc, NullSink(), realtime=False, ring=args.ring, max_frames=args.frames
    )
    m = runner.run()
    print(
        json.dumps(
            {
                "path": "PipelineRunner (decode→H2D→infer→D2H→sink)",
                "resolution": f"{args.width}x{args.height}",
                "frames": m.frames,
                "fps": round(m.fps, 2),
                "fps_1pct_low": round(m.fps_1pct_low, 2),
                "model_ms": round(m.model_ms, 2),
                "ring_ms": round(m.ring_ms, 2),
                "device_mem_mb": m.device_mem_mb,
                "host_rss_mb": m.host_rss_mb,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
