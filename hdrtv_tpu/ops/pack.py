"""Fused per-pixel output slice — Pallas TPU kernels.

Two output paths, mirroring the reference's delivery contract:

1. ``pack_rgb48``: the network output [0,1] RGB *is* the BT.2020/PQ signal
   (SURVEY.md §2.1 model I/O contract); delivery is
   ``clamp(0,1)·65535 + 0.5 → uint16`` RGB48LE
   (gui_pipeline_worker_feeders.py:193-235).

2. ``colorimetric_pq_pack``: the explicit color-managed slice — SDR
   linearization (gamma 2.4), BT.709→BT.2020 gamut map, scale to display
   nits, ST-2084 PQ encode, u16 pack — used by the metric/GT path and as a
   reference-grade output option. One Pallas kernel over row tiles: a single
   HBM round-trip for five elementwise stages plus a 3×3 matrix.

Both have jnp fallbacks (`*_ref`) used on CPU and as parity oracles in tests.
The kernels flatten (H, W, 3) → (H, 3W) so the lane dimension is a multiple
of 128 for common video widths (1280·3, 1920·3, 3840·3 are all 128-aligned).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hdrtv_tpu.ops.color import PQ_C1, PQ_C2, PQ_C3, PQ_M1, PQ_M2, BT709_TO_BT2020


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pick_row_block(h: int, row_bytes: int, budget: int = 2 * 1024 * 1024) -> int:
    """Rows per grid step: a multiple of 8 (sublane tile) dividing h, sized to
    keep in+out tiles well under VMEM. Falls back to the whole array."""
    limit = max(8, min(h, budget // max(1, row_bytes)))
    best = 0
    for cand in range(8, limit + 1, 8):
        if h % cand == 0:
            best = cand
    return best if best else h


# ---------------------------------------------------------------------------
# 1. Passthrough PQ-signal pack
# ---------------------------------------------------------------------------


def _to_u16(v: jax.Array) -> jax.Array:
    # Mosaic has no direct f32→u16 cast; round-trip through int32 (values
    # are pre-clamped to [0, 65535.5] so the truncating chain is exact).
    return v.astype(jnp.int32).astype(jnp.uint16)


def _pack_kernel(x_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    v = jnp.clip(x, 0.0, 1.0) * 65535.0 + 0.5
    out_ref[:] = _to_u16(v)


def pack_rgb48_ref(x: jax.Array) -> jax.Array:
    v = jnp.clip(x.astype(jnp.float32), 0.0, 1.0) * 65535.0 + 0.5
    return v.astype(jnp.uint16)


def pack_rgb48(x: jax.Array) -> jax.Array:
    """[0,1] RGB (N,H,W,3 or H,W,3) → uint16 RGB48 code values."""
    shape = x.shape
    # Flatten all leading dims with H into rows; lanes = W*3.
    rows = 1
    for d in shape[:-2]:
        rows *= d
    lanes = shape[-2] * shape[-1]
    if lanes % 128 != 0 or not _on_tpu():
        return pack_rgb48_ref(x)
    flat = x.reshape(rows, lanes)
    block_rows = _pick_row_block(rows, lanes * (x.dtype.itemsize + 2))
    out = pl.pallas_call(
        _pack_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.uint16),
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(flat)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# 2. Explicit colorimetric slice: linearize → gamut map → PQ → pack
# ---------------------------------------------------------------------------


def _pq_oetf_f32(y: jax.Array) -> jax.Array:
    y = jnp.clip(y, 0.0, 1.0)
    y_m1 = jnp.power(y, PQ_M1)
    return jnp.power((PQ_C1 + PQ_C2 * y_m1) / jnp.maximum(1.0 + PQ_C3 * y_m1, 1e-12), PQ_M2)


def _colorimetric_kernel(x_ref, out_ref, *, peak_norm: float, gamma: float):
    """Interleaved-RGB colorimetric slice on a (rows, 3W) block.

    A trailing dim of 3 would pad to 128 lanes (42× VMEM blowup), so the
    block keeps RGB interleaved along lanes and the 3×3 gamut matrix becomes
    five lane-rolled terms with per-position (lane % 3) coefficient masks.
    Roll wrap-around at row edges only touches terms whose mask is 0 there.
    """
    m = BT709_TO_BT2020  # host numpy → trace-time scalars, not a captured const
    x = jnp.clip(x_ref[:].astype(jnp.float32), 0.0, 1.0)
    lin = jnp.power(x, gamma)  # BT.1886 display-referred linearization

    rows, lanes = lin.shape
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1) % 3

    def sel(v0, v1, v2):
        return jnp.where(c == 0, v0, jnp.where(c == 1, v1, v2)).astype(jnp.float32)

    # pltpu.roll needs non-negative shifts: roll(L-k) ≡ roll(-k).
    xp1 = pltpu.roll(lin, shift=lanes - 1, axis=1)  # next component
    xp2 = pltpu.roll(lin, shift=lanes - 2, axis=1)
    xm1 = pltpu.roll(lin, shift=1, axis=1)  # previous component
    xm2 = pltpu.roll(lin, shift=2, axis=1)

    out = (
        sel(m[0, 0], m[1, 1], m[2, 2]) * lin
        + sel(m[0, 1], m[1, 2], 0.0) * xp1
        + sel(m[0, 2], 0.0, 0.0) * xp2
        + sel(0.0, m[1, 0], m[2, 1]) * xm1
        + sel(0.0, 0.0, m[2, 0]) * xm2
    )
    pq = _pq_oetf_f32(out * peak_norm)
    out_ref[:] = _to_u16(pq * 65535.0 + 0.5)


def colorimetric_pq_pack_ref(x: jax.Array, *, peak_nits: float = 1000.0, gamma: float = 2.4) -> jax.Array:
    lin = jnp.power(jnp.clip(x.astype(jnp.float32), 0.0, 1.0), gamma)
    lin2020 = jnp.einsum("...c,rc->...r", lin, jnp.asarray(BT709_TO_BT2020))
    pq = _pq_oetf_f32(lin2020 * (peak_nits / 10000.0))
    return (pq * 65535.0 + 0.5).astype(jnp.uint16)


def colorimetric_pq_pack(x: jax.Array, *, peak_nits: float = 1000.0, gamma: float = 2.4) -> jax.Array:
    """SDR [0,1] RGB (…,H,W,3) → BT.2020/PQ uint16 code values, fused."""
    shape = x.shape
    rows = 1
    for d in shape[:-2]:
        rows *= d
    lanes = shape[-2] * shape[-1]
    if lanes % 128 != 0 or not _on_tpu():
        return colorimetric_pq_pack_ref(x, peak_nits=peak_nits, gamma=gamma)
    flat = x.reshape(rows, lanes)
    block_rows = _pick_row_block(rows, lanes * (x.dtype.itemsize + 2) * 6)
    kernel = functools.partial(
        _colorimetric_kernel, peak_norm=float(peak_nits) / 10000.0, gamma=float(gamma)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.uint16),
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(flat)
    return out.reshape(shape)
