"""Device-resident batch/export throughput (VERDICT r2 item 10).

Measures the async-chained per-frame flat program (the shipped batch-export
design, runtime/processor.py) with device-resident inputs: K distinct frames
pre-staged on device, all K dispatched back-to-back, one fetch at the end.
This is the device-side throughput of `cli export --batch K` with host IO
removed — through this runner's dev tunnel the D2H fetch (~37 MB/s for
12.4 MB frames) would otherwise dominate and measure nothing (PERF_NOTES
round 2); on production hardware host IO overlaps via the double-buffered
feeder.

Usage: python tools/bench_batch.py [--batch 8] [--rounds 6]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    from hdrtv_tpu.runtime.engine import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_npz
    from hdrtv_tpu.models.layers import BF16
    from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48_flat, s2d_transform_params

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_npz(os.path.join(here, "weights", "hr_fp32.npz"))
    sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(params).items()}
    cfg = ModelConfig()

    @jax.jit
    def step(p, frame2d_u8):
        return ensemble_s2d_rgb48_flat(p, frame2d_u8, None, cfg, policy=BF16)

    rng = np.random.RandomState(0)
    frames = [
        jax.device_put(jnp.asarray(rng.randint(0, 256, (args.height, args.width * 3), dtype=np.uint8)))
        for _ in range(args.batch)
    ]
    out = step(sp, frames[0])
    _ = np.asarray(out[:2, :2])  # compile + warm

    t0 = time.perf_counter()
    total = 0
    for _ in range(args.rounds):
        outs = [step(sp, f) for f in frames]  # async chain: all dispatched
        total += len(outs)
        _ = np.asarray(outs[-1][:2, :2])  # drain the chain
    dt = time.perf_counter() - t0
    fps = total / dt
    print(json.dumps({
        "metric": "batch_export_device_fps",
        "batch": args.batch,
        "frames": total,
        "value": round(fps, 2),
        "unit": "frames/s",
        "ms_per_frame": round(1000.0 / fps, 2),
    }))


if __name__ == "__main__":
    main()
