"""L0-section megakernels — the round-2 performance core.

Device profiling (tools/profile_frame.py) showed the 1080p frame time is
dominated by the *L0-resolution* section of the s2d ensemble: the AGCM 1×1
chain, the LE input conv, the condition 1×1 chain, and the output
SFT/HR_conv2/conv_last/pack slice together cost ~30 ms of the 49 ms step —
almost all of it lax convs that XLA runs as separate HBM round-trips over
132 MB tensors, plus the layout copies between them. The three kernels here
replace those sections with one HBM pass each:

- ``fused_agcm_head``: AGCM (three modulated 1×1 convs, Condition_arch.py
  :552-585 semantics in the s2d domain) + the fused LE input conv
  (conv_first‖cond_first.0) + relu/lrelu epilogues. Reads the 12-channel s2d
  frame once, writes fea0‖c0 (256ch) and the AGCM output (the LE long-skip).
- ``fused_cond_chain``: the five pointwise 1×1s (cond_first.2/.4 +
  CondNet1.0/.2/.4, HDRUNet3T1_arch.py:118-137) as one pass: c0 → (c, cond1).
- ``fused_tail``: SFT_layer2 + HR_conv2 + conv_last + long-skip add
  (HDRUNet3T1_arch.py:196-206) + the RGB48 PQ-signal pack
  (clamp·65535+0.5→u16, gui_pipeline_worker_feeders.py:193-235) — the whole
  output slice in one pass, emitting uint16 in the s2d layout (d2s on uint16
  is a cheap XLA epilogue).

Halo handling: instead of manual DMA (whose serial start/wait cost ~15-20%
of kernel time in round 1, and whose ANY-space streams Mosaic constrains to
128-multiple lanes), each halo input is passed as THREE overlapping
row-block views of the same array (prev/cur/next, edge-clamped index maps).
The Pallas pipeline double-buffers the block fetches automatically, and the
kernel masks out-of-image halo rows to reproduce 'same'-conv zero padding.

All kernels accumulate matmuls in fp32 and carry activations in the caller's
compute dtype (bf16 on the hot path). jnp reference implementations
(``*_ref``) are the parity oracles used by tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_rows(hb: int, limit: int = 12, minimum: int = 4) -> int:
    """Rows per grid step: the largest divisor of ``hb`` ≤ limit."""
    for cand in range(min(limit, hb), minimum - 1, -1):
        if hb % cand == 0:
            return cand
    return hb


def _halo_specs(hb: int, th: int, wb: int, c: int):
    """Three overlapping row-block views (prev/cur/next) of an (hb,wb,c)
    array; edge blocks clamp so every fetch is in-bounds (the kernel masks
    out-of-image halo rows itself)."""
    n = hb // th
    return [
        pl.BlockSpec((th, wb, c), lambda i: (jnp.maximum(i - 1, 0), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((th, wb, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((th, wb, c), lambda i: (jnp.minimum(i + 1, n - 1), 0, 0), memory_space=pltpu.VMEM),
    ]


def _gather_halo(prev, cur, nxt, h: int):
    """(th+2h, wb, c) rows [r0-h, r0+th+h) from the 3 overlapping blocks."""
    th = cur.shape[0]
    return jnp.concatenate([prev[th - h :], cur[:], nxt[:h]], axis=0)


def _row_mask(vals, r0, hb: int, wb: int):
    """Zero rows whose global index falls outside [0, hb) — 'same'-conv
    padding semantics for halo rows (vals: (rows*wb, c) flat)."""
    rows = vals.shape[0] // wb
    g = jax.lax.broadcasted_iota(jnp.int32, (rows * wb, 1), 0) // wb + r0
    return jnp.where(jnp.logical_and(g >= 0, g < hb), vals, 0.0)


def _taps_conv(t, w9_ref, th: int, wb: int, c: int, co: int):
    """9-tap 3×3 'same' conv: t (th+2, wb, c) → (th*wb, co) fp32 acc."""
    acc = jnp.zeros((th * wb, co), jnp.float32)
    for dI in range(3):
        for dJ in (-1, 0, 1):
            r = t[dI : dI + th]
            if dJ == 1:
                r = jnp.pad(r[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
            elif dJ == -1:
                r = jnp.pad(r[:, : wb - 1, :], ((0, 0), (1, 0), (0, 0)))
            acc = acc + jnp.dot(
                r.reshape(th * wb, c), w9_ref[dI * 3 + (dJ + 1)],
                preferred_element_type=jnp.float32,
            )
    return acc


def _lrelu(v):
    return jnp.where(v >= 0, v, v * 0.1)


# ---------------------------------------------------------------------------
# 1. AGCM + LE input conv
# ---------------------------------------------------------------------------


def _agcm_head_kernel(
    xp, xc, xn, mods_ref, aw1, ab1, aw2, ab2, aw3, ab3, w9, b9,
    fc_ref, agcm_ref, *, th, wb, cin, cf, hb,
):
    i = pl.program_id(0)
    r0 = i * th
    rows = th + 2

    x = _gather_halo(xp, xc, xn, 1).reshape(rows * wb, cin).astype(jnp.float32)

    def mod(v, row, width):
        s = mods_ref[row, :width].astype(jnp.float32)
        sh = mods_ref[row + 1, :width].astype(jnp.float32)
        return v * (s + 1.0) + sh

    a = jnp.maximum(mod(jnp.dot(x, aw1[:].astype(jnp.float32), preferred_element_type=jnp.float32) + ab1[0], 0, aw1.shape[1]), 0.0)
    a = a.astype(xc.dtype).astype(jnp.float32)
    b = jnp.maximum(mod(jnp.dot(a, aw2[:].astype(jnp.float32), preferred_element_type=jnp.float32) + ab2[0], 2, aw2.shape[1]), 0.0)
    b = b.astype(xc.dtype).astype(jnp.float32)
    g = mod(jnp.dot(b, aw3[:].astype(jnp.float32), preferred_element_type=jnp.float32) + ab3[0], 4, cin)

    g = _row_mask(g, r0 - 1, hb, wb)
    agcm = g.astype(xc.dtype).reshape(rows, wb, cin)
    agcm_ref[:] = agcm[1 : th + 1]

    acc = _taps_conv(agcm, w9, th, wb, cin, fc_ref.shape[-1]) + b9[0].astype(jnp.float32)
    fea = jnp.maximum(acc[:, :cf], 0.0)
    c0 = _lrelu(acc[:, cf:])
    out = jnp.concatenate([fea, c0], axis=-1)
    fc_ref[:] = out.reshape(th, wb, -1).astype(fc_ref.dtype)


def fused_agcm_head(
    xs: jax.Array, mods: jax.Array,
    aw1, ab1, aw2, ab2, aw3, ab3, w_in, b_in,
    *, n_first: int, out_dtype=None,
):
    """s2d frame (Hb,Wb,12) → (fea0‖c0 (Hb,Wb,256), agcm_out (Hb,Wb,12)).

    ``mods``: (6, 4·nf) fp32 — AGCM scale/shift vectors (first, HR, last),
    already tiled over the 4 s2d sub-positions (conv_last rows use the
    first 12 lanes). ``w_in``: (3,3,12,256) fused conv_first‖cond_first.0.
    """
    hb, wb, cin = xs.shape
    co = w_in.shape[-1]
    out_dtype = out_dtype or xs.dtype
    th = pick_rows(hb)
    w9 = w_in.reshape(9, cin, co).astype(xs.dtype)

    kernel = functools.partial(
        _agcm_head_kernel, th=th, wb=wb, cin=cin, cf=n_first, hb=hb
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb, co), out_dtype),
            jax.ShapeDtypeStruct((hb, wb, cin), out_dtype),
        ),
        grid=(hb // th,),
        in_specs=_halo_specs(hb, th, wb, cin) + [wspec] * 9,
        out_specs=(
            pl.BlockSpec((th, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, wb, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        xs, xs, xs,
        mods.astype(jnp.float32),
        aw1.astype(xs.dtype), ab1.reshape(1, -1).astype(jnp.float32),
        aw2.astype(xs.dtype), ab2.reshape(1, -1).astype(jnp.float32),
        aw3.astype(xs.dtype), ab3.reshape(1, -1).astype(jnp.float32),
        w9, b_in.reshape(1, -1).astype(jnp.float32),
    )


def fused_agcm_head_ref(xs, mods, aw1, ab1, aw2, ab2, aw3, ab3, w_in, b_in, *, n_first, out_dtype=None):
    """jnp oracle (same math, unfused)."""
    out_dtype = out_dtype or xs.dtype
    hb, wb, cin = xs.shape
    x = xs.astype(jnp.float32).reshape(-1, cin)

    def mod(v, row, width):
        return v * (mods[row, :width].astype(jnp.float32) + 1.0) + mods[row + 1, :width].astype(jnp.float32)

    a = jnp.maximum(mod(x @ aw1.astype(jnp.float32) + ab1.astype(jnp.float32), 0, aw1.shape[1]), 0.0)
    a = a.astype(out_dtype).astype(jnp.float32)
    b = jnp.maximum(mod(a @ aw2.astype(jnp.float32) + ab2.astype(jnp.float32), 2, aw2.shape[1]), 0.0)
    b = b.astype(out_dtype).astype(jnp.float32)
    agcm = mod(b @ aw3.astype(jnp.float32) + ab3.astype(jnp.float32), 4, cin).reshape(hb, wb, cin)
    y = jax.lax.conv_general_dilated(
        agcm.astype(out_dtype).astype(jnp.float32)[None], w_in.astype(jnp.float32),
        (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + b_in.astype(jnp.float32)
    fea = jnp.maximum(y[..., :n_first], 0.0)
    c0 = jnp.where(y[..., n_first:] >= 0, y[..., n_first:], y[..., n_first:] * 0.1)
    return (
        jnp.concatenate([fea, c0], axis=-1).astype(out_dtype),
        agcm.astype(out_dtype),
    )


# ---------------------------------------------------------------------------
# 2. Condition 1×1 chain (pointwise — no halo)
# ---------------------------------------------------------------------------


def _cond_chain_kernel(c0_ref, w2, b2, w4, b4, wa, ba, wb_, bb, wc, bc, c_ref, cond1_ref):
    th, wb, c = c0_ref.shape
    v = c0_ref[:].reshape(th * wb, c).astype(jnp.float32)

    def step(v, w, b, act):
        y = jnp.dot(v.astype(w.dtype), w, preferred_element_type=jnp.float32) + b[0].astype(jnp.float32)
        return _lrelu(y) if act else y

    v = step(v, w2[:], b2, True)
    cc = step(v, w4[:], b4, True)
    c_ref[:] = cc.reshape(th, wb, -1).astype(c_ref.dtype)
    v = step(cc, wa[:], ba, True)
    v = step(v, wb_[:], bb, True)
    v = step(v, wc[:], bc, False)
    cond1_ref[:] = v.reshape(th, wb, -1).astype(cond1_ref.dtype)


def fused_cond_chain(c0: jax.Array, weights, *, out_dtype=None):
    """c0 (Hb,Wb,C) → (c, cond1): lrelu(cond_first.2), lrelu(cond_first.4),
    then CondNet1.0/.2/.4 (HDRUNet3T1_arch.py:118-137 in the s2d domain).

    ``weights``: five (w (C,C'), b (C',)) pairs.
    """
    hb, wb, c = c0.shape
    out_dtype = out_dtype or c0.dtype
    th = pick_rows(hb)
    flat = []
    for w, b in weights:
        flat.append(w.astype(c0.dtype))
        flat.append(b.reshape(1, -1).astype(jnp.float32))
    co_c = weights[1][0].shape[1]
    co_1 = weights[4][0].shape[1]
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _cond_chain_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb, co_c), out_dtype),
            jax.ShapeDtypeStruct((hb, wb, co_1), out_dtype),
        ),
        grid=(hb // th,),
        in_specs=[pl.BlockSpec((th, wb, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + [wspec] * 10,
        out_specs=(
            pl.BlockSpec((th, wb, co_c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, wb, co_1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(c0, *flat)


def fused_cond_chain_ref(c0, weights, *, out_dtype=None):
    out_dtype = out_dtype or c0.dtype
    v = c0.astype(jnp.float32)
    outs = []
    for idx, (w, b) in enumerate(weights):
        v = v @ w.astype(jnp.float32) + b.astype(jnp.float32)
        if idx != 4:
            v = jnp.where(v >= 0, v, v * 0.1)
        if idx == 1:
            outs.append(v.astype(out_dtype))
    outs.append(v.astype(out_dtype))
    return outs[0], outs[1]


# ---------------------------------------------------------------------------
# 3. Output slice: SFT2 + HR_conv2 + conv_last + skip (+ RGB48 pack)
# ---------------------------------------------------------------------------


def _tail_kernel(
    sp, sc, sn, cp, cc_, cn, skip_ref,
    w0, b0, w1, b1, w2, b2, w3, b3, w9h, bh, w9l, bl,
    out_ref, *, th, wb, c, cc, cl, hb, pack,
):
    i = pl.program_id(0)
    r0 = i * th
    rows = th + 4

    s = _gather_halo(sp, sc, sn, 2).reshape(rows * wb, c)
    cond = _gather_halo(cp, cc_, cn, 2).reshape(rows * wb, cc)

    def mix(v, w, b):
        return jnp.dot(v.astype(w.dtype), w[:], preferred_element_type=jnp.float32) + b[0].astype(jnp.float32)

    h = _lrelu(mix(cond, w0, b0)).astype(sc.dtype)
    scale = mix(h, w1, b1)
    g = _lrelu(mix(cond, w2, b2)).astype(sc.dtype)
    shift = mix(g, w3, b3)
    t = s.astype(jnp.float32) * (scale + 1.0) + shift
    t = _row_mask(t, r0 - 2, hb, wb).astype(sc.dtype).reshape(rows, wb, c)

    hacc = _taps_conv(t, w9h, th + 2, wb, c, c) + bh[0].astype(jnp.float32)
    hval = jnp.maximum(hacc, 0.0)
    hval = _row_mask(hval, r0 - 1, hb, wb).astype(sc.dtype).reshape(th + 2, wb, c)

    y = _taps_conv(hval, w9l, th, wb, c, cl) + bl[0].astype(jnp.float32)
    y = y + skip_ref[:].reshape(th * wb, cl).astype(jnp.float32)
    if pack:
        v = jnp.clip(y, 0.0, 1.0) * 65535.0 + 0.5
        out_ref[:] = v.astype(jnp.int32).astype(jnp.uint16).reshape(th, wb, cl)
    else:
        out_ref[:] = y.reshape(th, wb, cl).astype(out_ref.dtype)


def fused_tail(
    s: jax.Array, cond1: jax.Array, skip: jax.Array,
    sft_small, w_hr, b_hr, w_last, b_last,
    *, pack: bool = True, out_dtype=None,
):
    """LE output slice over s2d tensors:

        t   = SFT_layer2(s, cond1)          (x·(scale+1)+shift)
        h   = relu(HR_conv2(t))             3×3 'same'
        y   = conv_last(h) + skip           3×3 'same' + long skip
        out = pack ? u16(clip(y)·65535+.5) : y

    ``s`` = up3+fea0 (Hb,Wb,128); ``skip`` = agcm_out (Hb,Wb,12).
    ``sft_small``: four (w,b) pairs, block-diag packed to full lanes.
    """
    hb, wb, c = s.shape
    cc = cond1.shape[-1]
    cl = w_last.shape[-1]
    th = pick_rows(hb)
    w9h = w_hr.reshape(9, c, c).astype(s.dtype)
    w9l = w_last.reshape(9, c, cl).astype(s.dtype)
    consts = []
    for w, b in sft_small:
        consts.append(w.astype(s.dtype))
        consts.append(b.reshape(1, -1).astype(jnp.float32))
    out_dtype = jnp.uint16 if pack else (out_dtype or s.dtype)

    kernel = functools.partial(_tail_kernel, th=th, wb=wb, c=c, cc=cc, cl=cl, hb=hb, pack=pack)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hb, wb, cl), out_dtype),
        grid=(hb // th,),
        in_specs=_halo_specs(hb, th, wb, c)
        + _halo_specs(hb, th, wb, cc)
        + [pl.BlockSpec((th, wb, cl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + [wspec] * 12,
        out_specs=pl.BlockSpec((th, wb, cl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        s, s, s, cond1, cond1, cond1, skip,
        *consts,
        w9h, b_hr.reshape(1, -1).astype(jnp.float32),
        w9l, b_last.reshape(1, -1).astype(jnp.float32),
    )


def fused_tail_ref(s, cond1, skip, sft_small, w_hr, b_hr, w_last, b_last, *, pack=True, out_dtype=None):
    (w0, b0), (w1, b1), (w2, b2), (w3, b3) = sft_small
    cf = cond1.astype(jnp.float32)
    dt = s.dtype

    def mix(v, w, b):
        return v.astype(dt).astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(jnp.float32)

    h = mix(cf, w0, b0)
    h = jnp.where(h >= 0, h, h * 0.1)
    scale = mix(h, w1, b1)
    g = mix(cf, w2, b2)
    g = jnp.where(g >= 0, g, g * 0.1)
    shift = mix(g, w3, b3)
    t = (s.astype(jnp.float32) * (scale + 1.0) + shift).astype(dt)

    def conv(x, w, b):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32)[None], w.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0] + b.astype(jnp.float32)

    hv = jnp.maximum(conv(t, w_hr, b_hr), 0.0).astype(dt)
    y = conv(hv, w_last, b_last) + skip.astype(jnp.float32)
    if pack:
        return (jnp.clip(y, 0.0, 1.0) * 65535.0 + 0.5).astype(jnp.uint16)
    return y.astype(out_dtype or dt)
