"""On-TPU smoke test: end-to-end drive of the flagship paths on the real chip.

Usage:  PYTHONPATH="/root/repo:$PYTHONPATH" python tools/tpu_smoke.py [--full]

Runs (with the persistent engine cache enabled so re-runs are warm):
  1. s2d turbo forward at 720p — correctness vs the natural path (bf16);
  2. sustained 1080p rate via the chained-dispatch + final-fetch method
     (the only measurement that reflects true throughput on the axon relay —
     see PERF_NOTES.md);
  3. int8 mixed-QAT checkpoint inference quality vs fp32.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


import os as _os
import sys as _sys

# PYTHONPATH can break axon plugin discovery on this runner; append the repo
# root at runtime instead (same fix as tools/profile_frame.py).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="include 4K measurement")
    args = ap.parse_args()

    import jax

    from hdrtv_tpu.runtime.engine import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_npz
    from hdrtv_tpu.models.layers import BF16
    from hdrtv_tpu.models.s2d import ensemble_s2d, s2d_transform_params
    from hdrtv_tpu.models.hdrtvnet import ensemble_agcm_le
    from hdrtv_tpu.ops.pack import pack_rgb48
    from hdrtv_tpu.ops.resize import downsample_quarter_aa

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_npz(os.path.join(here, "weights", "hr_fp32.npz"))
    sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(params).items()}
    pj = {k: jnp.asarray(v) for k, v in params.items()}
    cfg = ModelConfig()
    print(f"device: {jax.devices()[0]}", flush=True)

    # 1. correctness: turbo vs natural at small size (bf16 tolerance)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    cond = downsample_quarter_aa(img)
    a = np.asarray(jax.jit(lambda p, i, c: ensemble_s2d(p, i, c, cfg, policy=BF16))(sp, img, cond))
    b = np.asarray(jax.jit(lambda p, i, c: ensemble_agcm_le(p, i, c, cfg, policy=BF16))(pj, img, cond))
    err = float(np.abs(a.astype(np.float32) - b.astype(np.float32)).max())
    print(f"1. turbo vs natural (bf16): max diff {err:.5f} {'OK' if err < 0.05 else 'FAIL'}", flush=True)

    # 2. sustained 1080p rate
    @jax.jit
    def step(p, frame_u8):
        x = frame_u8[None].astype(jnp.float32) * (1.0 / 255.0)
        c = downsample_quarter_aa(x)
        o = ensemble_s2d(p, x, c, cfg, policy=BF16)
        packed = pack_rgb48(o[0])
        return packed, (packed % 256).astype(jnp.uint8)

    frame = jax.device_put(jnp.asarray((rng.rand(1080, 1920, 3) * 255).astype(np.uint8)))
    t0 = time.perf_counter()
    packed, fi = step(sp, frame)
    _ = np.asarray(packed[:2, :2, 0])
    print(f"2. 1080p compile/warm: {time.perf_counter() - t0:.0f}s", flush=True)
    n = 60
    t0 = time.perf_counter()
    for _ in range(n):
        packed, fi = step(sp, fi)
    _ = np.asarray(packed[:2, :2, 0])
    dt = (time.perf_counter() - t0) / n
    print(f"   1080p sustained: {dt * 1e3:.2f} ms/frame = {1 / dt:.1f} fps", flush=True)

    # 3. int8 mixed-QAT quality (when the reference tree is present)
    ref_ckpt = "/root/reference/src/models/weights/original/pytorch_int8/hr/HR_original_int8_mixed_qat.pt"
    if os.path.isfile(ref_ckpt):
        from hdrtv_tpu.models.import_torch import load_checkpoint
        from hdrtv_tpu.ops.metrics import psnr

        p8, cfg8 = load_checkpoint(ref_ckpt, use_hg=False)
        p8j = {k: jnp.asarray(v) for k, v in p8.items()}
        o8 = jax.jit(lambda p, i, c: ensemble_agcm_le(p, i, c, cfg8, policy=BF16))(p8j, img, cond)
        q = float(psnr(jnp.clip(o8, 0, 1), jnp.clip(jnp.asarray(b), 0, 1)))
        print(f"3. int8-mixed-QAT vs fp32: {q:.1f} dB {'OK' if q > 25 else 'FAIL'}", flush=True)

    if args.full:
        frame4k = jax.device_put(jnp.asarray((rng.rand(2160, 3840, 3) * 255).astype(np.uint8)))
        packed, fi = step(sp, frame4k)
        _ = np.asarray(packed[:2, :2, 0])
        t0 = time.perf_counter()
        for _ in range(20):
            packed, fi = step(sp, fi)
        _ = np.asarray(packed[:2, :2, 0])
        dt = (time.perf_counter() - t0) / 20
        print(f"4. 4K sustained: {dt * 1e3:.2f} ms/frame = {1 / dt:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
