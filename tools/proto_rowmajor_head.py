"""Prototype: can the head kernel consume raw (H, 3W) u8 rows directly?

The flat program pays ~0.8 ms @1080p (~3 ms @4K) for the XLA-side
(H,3W)→(Hb,2,Wb,6) reshape — minor dim 6 lane-pads to 128 (PERF_NOTES
round-3 trace: reshape.88).  This measures a kernel that takes the raw
(H, 3W) byte-row tile and does the row-pair regroup *in VMEM*:

    tile (2t, 3W) u8 → reshape (t, 2, Wb, 6) → lane-concat parities
    → (t·Wb, 12) f32 → K=12 matmul (the AGCM first conv shape).

vs the current form where XLA materializes (Hb,2,Wb,6) first.  If Mosaic
lowers the minor-split reshape acceptably, the production head kernel can
switch its input contract to (H, 3W) and the XLA reshape disappears.

Usage:  python tools/proto_rowmajor_head.py [--height 1080 --width 1920]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_raw(x_ref, w_ref, o_ref, *, t, wb):
    # x_ref: (2t, 3W) u8 rows; regroup in VMEM.
    x = x_ref[:]
    g = x.reshape(t, 2, wb, 6)
    x12 = jnp.concatenate([g[:, 0], g[:, 1]], axis=-1)  # (t, wb, 12)
    v = x12.reshape(t * wb, 12).astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    y = jnp.dot(v.astype(jnp.bfloat16), w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(t, wb, -1).astype(jnp.bfloat16)


def _kernel_pre(x_ref, w_ref, o_ref, *, t, wb):
    # x_ref: (t, 2, wb, 6) u8 (XLA already materialized the padded layout).
    x = x_ref[:]
    x12 = jnp.concatenate([x[:, 0], x[:, 1]], axis=-1)
    v = x12.reshape(t * wb, 12).astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    y = jnp.dot(v.astype(jnp.bfloat16), w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(t, wb, -1).astype(jnp.bfloat16)


def run(h: int, w: int, n: int, co: int = 256) -> None:
    hb, wb, w3 = h // 2, w // 2, 3 * w
    # raw-rows blocks are (2t, 3W): sublane dim must be a multiple of 8
    t = 8
    while t >= 4 and (hb % t or (2 * t) % 8):
        t -= 1
    if hb % t or (2 * t) % 8:
        raise SystemExit(f"no eligible tile rows for hb={hb}")
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.randint(0, 256, (h, w3), dtype=np.uint8))
    wmat = jnp.asarray(rng.randn(12, co).astype(np.float32) * 0.1, jnp.bfloat16)

    raw = pl.pallas_call(
        functools.partial(_kernel_raw, t=t, wb=wb),
        out_shape=jax.ShapeDtypeStruct((hb, wb, co), jnp.bfloat16),
        grid=(hb // t,),
        in_specs=[
            pl.BlockSpec((2 * t, w3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )

    pre = pl.pallas_call(
        functools.partial(_kernel_pre, t=t, wb=wb),
        out_shape=jax.ShapeDtypeStruct((hb, wb, co), jnp.bfloat16),
        grid=(hb // t,),
        in_specs=[
            pl.BlockSpec((t, 2, wb, 6), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )

    def _next_frame(out):
        # cheap data-dependent u8 frame derived from the output (chains the
        # dispatches so the relay can't overlap them; identical for both
        # variants so it cancels in the comparison)
        r = (out.astype(jnp.float32).reshape(hb, wb * co)[:, :w3] * 255.0).astype(
            jnp.uint8
        )
        return jnp.stack([r, r], axis=1).reshape(h, w3)

    @jax.jit
    def f_raw(fr):
        o = raw(fr, wmat)
        return o, _next_frame(o)

    @jax.jit
    def f_pre(fr):
        o = pre(fr.reshape(hb, 2, wb, 6), wmat)
        return o, _next_frame(o)

    for name, f in [("raw_rows", f_raw), ("pre_reshaped", f_pre)]:
        t0 = time.time()
        try:
            out, cur = f(frame)
            _ = np.asarray(out[0, 0, :4])
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        t1 = time.time()
        t2 = time.time()
        for _ in range(n):
            out, cur = f(cur)
        val = np.asarray(out[0, 0, 0])  # fetch = the only real sync point
        t3 = time.time()
        print(
            f"{name}: compile+first {t1 - t0:.1f}s, {n} steps {(t3 - t2) / n * 1e3:.3f} ms/step"
            f" (v {float(val):.3f})"
        )
    # parity
    a = np.asarray(f_raw(frame)[0], np.float32)
    b = np.asarray(f_pre(frame)[0], np.float32)
    print("parity max|diff|:", float(np.abs(a - b).max()))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--n", type=int, default=30)
    args = ap.parse_args()
    run(args.height, args.width, args.n)
