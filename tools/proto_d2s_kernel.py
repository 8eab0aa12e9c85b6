"""Probe: in-kernel d2s via supported-class reshapes.

The up-path d2s + add costs ~1.0 ms @1080p (add.530 + d2s copies, round-3
trace). Plan: consuming kernels read the coarse (hbc, wbc, 4C) tensor and
rebuild fine rows in VMEM:

    A = cu[:, :, :2C]            (lane slice, 128-aligned)
    A = A.reshape(rows, 2*wbc, C)  (minor split, inner C = 128-multiple)
    fine = stack([A, B], 1).reshape(2*rows, wb, C)  (leading restructure)

This script compiles that exact op sequence on the real chip at a small
shape — if Mosaic accepts it, the fused_tail / fused_resblock integration
is safe; if it rejects the minor split, fall back to paired-column layout.

Usage: python tools/proto_d2s_kernel.py
"""

from __future__ import annotations

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


def _kernel(c_ref, f_ref, o_ref, *, tc, wbc, c):
    cu = c_ref[:]  # (tc, wbc, 4C)
    a = cu[:, :, : 2 * c].reshape(tc, 2 * wbc, c)
    b = cu[:, :, 2 * c :].reshape(tc, 2 * wbc, c)
    fine = jnp.stack([a, b], axis=1).reshape(2 * tc, 2 * wbc, c)
    o_ref[:] = (fine.astype(jnp.float32) + f_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def run() -> None:
    tc, wbc, c = 8, 64, 128
    hbc = 4 * tc
    rng = np.random.RandomState(0)
    coarse = jnp.asarray(rng.randn(hbc, wbc, 4 * c).astype(np.float32), jnp.bfloat16)
    fea = jnp.asarray(rng.randn(2 * hbc, 2 * wbc, c).astype(np.float32), jnp.bfloat16)

    f = pl.pallas_call(
        functools.partial(_kernel, tc=tc, wbc=wbc, c=c),
        out_shape=jax.ShapeDtypeStruct((2 * hbc, 2 * wbc, c), jnp.bfloat16),
        grid=(hbc // tc,),
        in_specs=[
            pl.BlockSpec((tc, wbc, 4 * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * tc, 2 * wbc, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * tc, 2 * wbc, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )

    t0 = time.time()
    try:
        y = jax.jit(f)(coarse, fea)
        val = np.asarray(y)
    except Exception as e:  # noqa: BLE001
        print(f"FAILED {type(e).__name__}: {str(e)[:400]}")
        return
    print(f"compiled+ran in {time.time() - t0:.1f}s")

    # parity vs XLA d2s + add
    c4 = np.asarray(coarse, np.float32)
    x = c4.reshape(hbc, wbc, 2, 2, c).transpose(0, 2, 1, 3, 4).reshape(2 * hbc, 2 * wbc, c)
    want = (x + np.asarray(fea, np.float32)).astype(np.float32)
    got = np.asarray(val, np.float32)
    print("parity max|diff|:", float(np.abs(got - want).max()))


if __name__ == "__main__":
    run()
