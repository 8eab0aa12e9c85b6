"""Headline benchmark: 1080p SDR→HDR10 frames/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": "1080p_nohg_bf16_fps", "value": N, "unit": "fps", "vs_baseline": R}

Baseline: the reference's best comparable number — 1080p no-HG FP16 TensorRT
at 34.23 ms/frame ≈ 29.2 FPS on an RTX 5060 Ti (BASELINE.md). The measured
path is the same work: uint8 BGR 1080p frame in → ¼-res AA-bicubic cond →
AGCM→LE forward (bf16) → clamp → u16 RGB48 pack, per frame, output fetched
to host (the mpv-feed boundary).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 1000.0 / 34.23  # reference 1080p no-HG FP16 (README.md:67)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hdrtv_tpu.runtime.processor import HDRTVNetTPU

    here = os.path.dirname(os.path.abspath(__file__))
    proc = HDRTVNetTPU(os.path.join(here, "weights", "hr_fp32.npz"), precision="fp16")

    h, w = 1080, 1920
    rng = np.random.RandomState(0)
    frame = (rng.rand(h, w, 3) * 255).astype(np.uint8)

    # Engine build (compile) — excluded from the timed window, like the
    # reference's warmup before its 30-second stress runs.
    proc.warmup_compile(w, h)
    for _ in range(5):
        proc.process_rgb48(frame)

    # Timed window: host->device, full fused pipeline, device->host fetch.
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = proc.process_rgb48(frame)
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "1080p_nohg_bf16_fps",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
