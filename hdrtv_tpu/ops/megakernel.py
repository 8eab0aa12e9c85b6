"""L0-section megakernels — the round-2 performance core.

Device profiling (tools/profile_frame.py) showed the 1080p frame time is
dominated by the *L0-resolution* section of the s2d ensemble: the AGCM 1×1
chain, the LE input conv, the condition 1×1 chain, the stride-2 down convs
and the output SFT/HR_conv2/conv_last/pack slice together cost ~40 ms of the
49 ms round-1 step — almost all of it lax convs that XLA runs as separate
HBM round-trips over 132 MB tensors, plus the layout copies between them.
The kernels here replace those sections with one HBM pass each:

- ``fused_agcm_head``: AGCM (three modulated 1×1 convs, Condition_arch.py
  :552-585 semantics in the s2d domain) + the fused LE input conv
  (conv_first‖cond_first.0) + relu/lrelu epilogues. Reads the 12-channel s2d
  frame once (uint8 ok — the /255 scale fuses in), writes fea0, c0 and the
  AGCM output (the LE long-skip). The 9 conv taps are lane-concatenated into
  one K=108 matmul — at 12 input channels, nine K=12 MXU passes would waste
  ~90% of the contraction.
- ``fused_cond_chain``: the five pointwise 1×1s (cond_first.2/.4 +
  CondNet1.0/.2/.4, HDRUNet3T1_arch.py:118-137) as one pass: c0 → (c, cond1).
- ``fused_tail``: SFT_layer2 + HR_conv2 + conv_last + long-skip add
  (HDRUNet3T1_arch.py:196-206) + the RGB48 PQ-signal pack
  (clamp·65535+0.5→u16, gui_pipeline_worker_feeders.py:193-235). The packed
  variant writes uint16 in a (Hb,2,Wb,6) layout that is a *pure metadata
  reshape* of the natural (H,W,3) RGB48 frame — the d2s transpose (an
  expensive lane-interleave on TPU) disappears entirely.
- ``fused_down2``: dense-s2d stride-2 3×3 block conv ((1,0) pad — the
  weight-transformed down convs, models/s2d.py w_s2d_s2). The W-dimension
  stride-2 access is eliminated by pre-pairing adjacent columns in XLA
  (``x.reshape(hb, wb//2, 2c)`` — a free bitcast), so the kernel needs only
  sublane shifts and leading-dim splits; H stride-2 reads come from
  even-position rows of a leading-split reshape. This replaces the single
  worst op in the round-1 profile (the fused CondNet down conv: 12.9 ms as
  an XLA conv) and avoids the whole-tile sublane-split reshape that made the
  round-1 stride-2 kernel OOM the remote compile helper.

Halo handling: each halo input is passed as THREE overlapping row-block
views of the same array (prev/cur/next, edge-clamped index maps) instead of
manual DMA — the Pallas pipeline double-buffers the block fetches, and the
kernel masks out-of-image halo rows to reproduce conv padding semantics.

All kernels accumulate matmuls in fp32 and carry activations in the compute
dtype (bf16 on the hot path). jnp reference implementations (``*_ref``) are
the parity oracles used by tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_rows(hb: int, limit: int = 12, minimum: int = 3) -> int:
    """Rows per grid step: the largest divisor of ``hb`` ≤ limit."""
    for cand in range(min(limit, hb), minimum - 1, -1):
        if hb % cand == 0:
            return cand
    return hb


def pick_rows_even(hb: int, limit: int = 12) -> int:
    """Largest even divisor of ``hb`` ≤ limit (0 if none) — required by
    kernels using 2-row halo blocks."""
    for cand in range(min(limit, hb) // 2 * 2, 1, -2):
        if hb % cand == 0:
            return cand
    return 0


def _row_limit(wb: int, ref_limit: int, ref_wb: int = 960, minimum: int = 4) -> int:
    """Scale a per-kernel row limit inversely with width so tile VMEM stays
    constant across resolutions (the limits are tuned at 1080p: wb=960 —
    v5e VMEM is 128 MB and 4K tiles at 1080p row counts exceed it)."""
    return max(minimum, (ref_limit * ref_wb) // wb)


def _halo_specs(hb: int, th: int, wb: int, c: int, h: int = 1):
    """Center row-block plus thin h-row top/bottom halo views of the same
    (hb,wb,c) array (h must divide th). Total fetch traffic is (th+2h)/th of
    the array — the halo rows are re-read, nothing else. Edge blocks clamp
    so every fetch is in-bounds; the kernel masks out-of-image halo rows."""
    assert th % h == 0
    nh = hb // h
    k = th // h
    return [
        pl.BlockSpec((h, wb, c), lambda i: (jnp.maximum(i * k - 1, 0), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((th, wb, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, wb, c), lambda i: (jnp.minimum(i * k + k, nh - 1), 0, 0), memory_space=pltpu.VMEM),
    ]


def _gather_halo(top, cur, bot, h: int):
    """(th+2h, wb, c) rows [r0-h, r0+th+h): full top/bottom halo blocks
    around the center block."""
    return jnp.concatenate([top[:], cur[:], bot[:]], axis=0)


def _halo_specs4(hb: int, th: int, wb: int, half: int):
    """Halo specs over a (hb, 2, wb, half) row-pair-plane array (the raw
    frame bitcast) — leading-dim blocks, same clamping as _halo_specs."""
    return [
        pl.BlockSpec((1, 2, wb, half), lambda i: (jnp.maximum(i * th - 1, 0), 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((th, 2, wb, half), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, wb, half), lambda i: (jnp.minimum(i * th + th, hb - 1), 0, 0, 0), memory_space=pltpu.VMEM),
    ]


def _row_mask(vals, r0, hb: int, wb: int):
    """Zero rows whose global index falls outside [0, hb) — 'same'-conv
    padding semantics for halo rows (vals: (rows*wb, c) flat)."""
    rows = vals.shape[0] // wb
    g = jax.lax.broadcasted_iota(jnp.int32, (rows * wb, 1), 0) // wb + r0
    return jnp.where(jnp.logical_and(g >= 0, g < hb), vals, 0.0)


def _tap_views(t, th: int, wb: int):
    """The 9 shifted views of t (th+2, wb, c), ordered (dI, dJ) row-major —
    matching ``w.reshape(9, C, Co)``."""
    views = []
    for dI in range(3):
        for dJ in (-1, 0, 1):
            r = t[dI : dI + th]
            if dJ == 1:
                r = jnp.pad(r[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
            elif dJ == -1:
                r = jnp.pad(r[:, : wb - 1, :], ((0, 0), (1, 0), (0, 0)))
            views.append(r)
    return views


def _taps_conv(t, w9_ref, th: int, wb: int, c: int, co: int):
    """9-tap 3×3 'same' conv: t (th+2, wb, c) → (th*wb, co) fp32 acc."""
    acc = jnp.zeros((th * wb, co), jnp.float32)
    for i, r in enumerate(_tap_views(t, th, wb)):
        acc = acc + jnp.dot(
            r.reshape(th * wb, c), w9_ref[i], preferred_element_type=jnp.float32
        )
    return acc


def _taps_conv_cat(t, wcat_ref, th: int, wb: int, c: int):
    """3×3 conv with the 9 taps lane-concatenated into one K=9·C matmul —
    the MXU-efficient form for narrow C (the 12-channel input conv)."""
    cat = jnp.concatenate(_tap_views(t, th, wb), axis=-1)  # (th, wb, 9C)
    return jnp.dot(
        cat.reshape(th * wb, 9 * c), wcat_ref[:], preferred_element_type=jnp.float32
    )


def _lrelu(v):
    return jnp.where(v >= 0, v, v * 0.1)


def _apply_act(v, act):
    if act == "relu":
        return jnp.maximum(v, 0.0)
    if act == "lrelu":
        return _lrelu(v)
    return v


# ---------------------------------------------------------------------------
# 1. AGCM + LE input conv
# ---------------------------------------------------------------------------


def _agcm_head_kernel(
    xp, xc, xn, mods_ref, aw1, ab1, aw2, ab2, aw3, ab3, wcat, b9,
    fea_ref, c0_ref, agcm_ref, *, th, wb, cin, cf, hb, scale, cdtype,
):
    i = pl.program_id(0)
    r0 = i * th
    rows = th + 2

    x = _gather_halo(xp, xc, xn, 1)
    if x.ndim == 4:
        # (rows, 2, wb, cin/2) row-pair planes (the raw frame bitcast —
        # s2d is a lane concat of the two row parities, models/s2d.py:43).
        x = jnp.concatenate([x[:, 0], x[:, 1]], axis=-1)
    x = x.reshape(rows * wb, cin)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.int32)  # Mosaic has no u8→f32 cast; hop via i32
    x = x.astype(jnp.float32)
    if scale != 1.0:
        x = x * scale

    def mod(v, row, width):
        s = mods_ref[row, :width].astype(jnp.float32)
        sh = mods_ref[row + 1, :width].astype(jnp.float32)
        return v * (s + 1.0) + sh

    a = jnp.maximum(mod(jnp.dot(x.astype(cdtype), aw1[:], preferred_element_type=jnp.float32) + ab1[0], 0, aw1.shape[1]), 0.0)
    b = jnp.maximum(mod(jnp.dot(a.astype(cdtype), aw2[:], preferred_element_type=jnp.float32) + ab2[0], 2, aw2.shape[1]), 0.0)
    g = mod(jnp.dot(b.astype(cdtype), aw3[:], preferred_element_type=jnp.float32) + ab3[0], 4, cin)

    g = _row_mask(g, r0 - 1, hb, wb)
    agcm = g.astype(cdtype).reshape(rows, wb, cin)
    agcm_ref[:] = agcm[1 : th + 1]

    acc = _taps_conv_cat(agcm, wcat, th, wb, cin) + b9[0].astype(jnp.float32)
    fea_ref[:] = jnp.maximum(acc[:, :cf], 0.0).reshape(th, wb, cf).astype(fea_ref.dtype)
    c0 = _lrelu(acc[:, cf:])
    c0_ref[:] = c0.reshape(th, wb, -1).astype(c0_ref.dtype)


def fused_agcm_head(
    xs: jax.Array, mods: jax.Array,
    aw1, ab1, aw2, ab2, aw3, ab3, w_in, b_in,
    *, n_first: int, scale: float = 1.0, out_dtype=jnp.bfloat16,
):
    """s2d frame (Hb,Wb,12) → (fea0, c0, agcm_out).

    ``xs`` may be uint8 (pass ``scale=1/255``), either (Hb,Wb,12) s2d layout
    or (Hb,2,Wb,6) row-pair planes (a pure bitcast of the raw (H,3W) frame;
    the kernel lane-concats the parities — s2d needs no W transpose).
    ``mods``: (6, 4·nf) fp32 — AGCM scale/shift vectors (first, HR, last),
    tiled over the 4 s2d sub-positions (conv_last rows use the first 12
    lanes). ``w_in``: (3,3,12,Cf+Cc) fused conv_first‖cond_first.0;
    relu/lrelu split at Cf.
    """
    if xs.ndim == 4:
        hb, _, wb, half = xs.shape
        cin = 2 * half
        halo = _halo_specs4(hb, pick_rows(hb, limit=_row_limit(wb, 12)), wb, half)
    else:
        hb, wb, cin = xs.shape
        halo = None
    co = w_in.shape[-1]
    th = pick_rows(hb, limit=_row_limit(wb, 12))
    wcat = w_in.reshape(9 * cin, co).astype(out_dtype)

    kernel = functools.partial(
        _agcm_head_kernel, th=th, wb=wb, cin=cin, cf=n_first, hb=hb,
        scale=float(scale), cdtype=out_dtype,
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb, n_first), out_dtype),
            jax.ShapeDtypeStruct((hb, wb, co - n_first), out_dtype),
            jax.ShapeDtypeStruct((hb, wb, cin), out_dtype),
        ),
        grid=(hb // th,),
        in_specs=(halo if halo is not None else _halo_specs(hb, th, wb, cin)) + [wspec] * 9,
        out_specs=(
            pl.BlockSpec((th, wb, n_first), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, wb, co - n_first), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, wb, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        xs, xs, xs,
        mods.astype(jnp.float32),
        aw1.astype(out_dtype), ab1.reshape(1, -1).astype(jnp.float32),
        aw2.astype(out_dtype), ab2.reshape(1, -1).astype(jnp.float32),
        aw3.astype(out_dtype), ab3.reshape(1, -1).astype(jnp.float32),
        wcat, b_in.reshape(1, -1).astype(jnp.float32),
    )


def fused_agcm_head_ref(xs, mods, aw1, ab1, aw2, ab2, aw3, ab3, w_in, b_in, *, n_first, scale=1.0, out_dtype=jnp.float32):
    """jnp oracle (same math, unfused)."""
    hb, wb, cin = xs.shape
    x = xs.astype(jnp.float32).reshape(-1, cin) * scale

    def mod(v, row, width):
        return v * (mods[row, :width].astype(jnp.float32) + 1.0) + mods[row + 1, :width].astype(jnp.float32)

    def dot(v, w):
        return v.astype(out_dtype).astype(jnp.float32) @ w.astype(out_dtype).astype(jnp.float32)

    a = jnp.maximum(mod(dot(x, aw1) + ab1.astype(jnp.float32), 0, aw1.shape[1]), 0.0)
    b = jnp.maximum(mod(dot(a, aw2) + ab2.astype(jnp.float32), 2, aw2.shape[1]), 0.0)
    agcm = mod(dot(b, aw3) + ab3.astype(jnp.float32), 4, cin).reshape(hb, wb, cin)
    y = jax.lax.conv_general_dilated(
        agcm.astype(out_dtype).astype(jnp.float32)[None],
        w_in.astype(out_dtype).astype(jnp.float32),
        (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + b_in.astype(jnp.float32)
    fea = jnp.maximum(y[..., :n_first], 0.0)
    c0 = jnp.where(y[..., n_first:] >= 0, y[..., n_first:], y[..., n_first:] * 0.1)
    return fea.astype(out_dtype), c0.astype(out_dtype), agcm.astype(out_dtype)


# ---------------------------------------------------------------------------
# 2. Condition 1×1 chain (pointwise — no halo)
# ---------------------------------------------------------------------------


def _cond_chain_kernel(c0_ref, *refs, qflags, wb):
    c_ref, cond1_ref = refs[-2:]
    wrefs = refs[:-2]
    th = c0_ref.shape[0]
    c = c0_ref.shape[-1]
    v = c0_ref[:].reshape(th * wb, c).astype(jnp.float32)

    def step(v, w, b, act, qm=None):
        if qm is None:
            y = jnp.dot(v.astype(w.dtype), w[:], preferred_element_type=jnp.float32) + b[0].astype(jnp.float32)
        else:
            # native int8 W8A8: quantize the running activation in VMEM
            # (zero extra HBM traffic), int8 MXU dot in int32, rescale.
            ysc, s_ref, z_ref, has_z = qm
            q, _ = _quantize_act(v, s_ref, z_ref if has_z else None, wb)
            y = (
                jnp.dot(q, w[:], preferred_element_type=jnp.int32).astype(jnp.float32)
                * ysc[0].astype(jnp.float32)
                + b[0].astype(jnp.float32)
            )
        return _lrelu(y) if act else y

    pos = 0
    outs = []
    for idx, qf in enumerate(qflags):
        w, b = wrefs[pos], wrefs[pos + 1]
        pos += 2
        qm = None
        if qf:
            qm = (*wrefs[pos : pos + 3], qf == 2)  # 2 = asymmetric (has x_zero)
            pos += 3
        v = step(v, w, b, idx != 4, qm)
        if idx == 1:
            outs.append(v)
    c_ref[:] = outs[0].reshape(th, wb, -1).astype(c_ref.dtype)
    cond1_ref[:] = v.reshape(th, wb, -1).astype(cond1_ref.dtype)


def _pack_qargs_1x1(qargs):
    """(w int8 (C,Co), yscale (1,Co), s (1,1), z (1,1), has_z, b_corr)."""
    wq = qargs["w_int8"]
    if wq.ndim == 4:
        wq = wq[0, 0]
    ws = jnp.asarray(qargs["w_scale"], jnp.float32)
    s = jnp.asarray(qargs["x_scale"], jnp.float32)
    xz = qargs.get("x_zero")
    has_z = xz is not None
    co = wq.shape[-1]
    yscale = (s * ws).reshape(1, co)
    b_corr = jnp.zeros((co,), jnp.float32)
    if has_z:
        zf = jnp.asarray(xz, jnp.float32)
        wsum = (wq.astype(jnp.float32) * ws).sum(axis=0)
        b_corr = (zf + 128.0 * s) * wsum
    z = (jnp.asarray(xz, jnp.float32) if has_z else jnp.float32(0.0)).reshape(1, 1)
    return wq, yscale, s.reshape(1, 1), z, has_z, b_corr


def fused_cond_chain(c0: jax.Array, weights, *, out_dtype=None, qargs=None):
    """c0 (Hb,Wb,C) → (c, cond1): lrelu(cond_first.2), lrelu(cond_first.4),
    then CondNet1.0/.2/.4 (HDRUNet3T1_arch.py:118-137 in the s2d domain).

    ``weights``: five (w (C,C'), b (C',)) pairs. ``qargs``: optional list of
    five per-layer native-int8 dicts (or None entries) — quantized layers
    re-quantize the running activation in VMEM (no HBM cost) and take the
    int8 MXU dot; the chain is MXU-bound at 1080p (round-3 trace, 1.59 ms).
    """
    hb, wb, c = c0.shape
    out_dtype = out_dtype or c0.dtype
    th = pick_rows(hb, limit=_row_limit(wb, 12))
    qargs = qargs or [None] * len(weights)
    flat = []
    qflags = []
    for (w, b), qa in zip(weights, qargs):
        if qa is not None:
            wq, yscale, s_q, z_q, has_z, b_corr = _pack_qargs_1x1(qa)
            flat.append(wq)
            flat.append((b.astype(jnp.float32) + b_corr).reshape(1, -1))
            flat += [yscale, s_q, z_q]
            qflags.append(2 if has_z else 1)
        else:
            flat.append(w.astype(c0.dtype))
            flat.append(b.reshape(1, -1).astype(jnp.float32))
            qflags.append(0)
    co_c = weights[1][0].shape[1]
    co_1 = weights[4][0].shape[1]
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_cond_chain_kernel, qflags=tuple(qflags), wb=wb),
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb, co_c), out_dtype),
            jax.ShapeDtypeStruct((hb, wb, co_1), out_dtype),
        ),
        grid=(hb // th,),
        in_specs=[pl.BlockSpec((th, wb, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + [wspec] * len(flat),
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


def _d2s_fine(cu, c: int, wb: int):
    """In-VMEM d2s of a coarse row block: (rows_c, wbc, 4C) → (2·rows_c, wb, C).

    fine[2i+a, 2j+b, k] = coarse[i, j, (2a+b)·C+k] (models/s2d.py d2s) — a
    128-aligned lane slice per a-half, a minor split whose inner extent is a
    128-multiple, and a leading-dim row interleave: all Mosaic-supported
    (compile-probed on v5e, tools/proto_d2s_kernel.py). This keeps the
    up-path d2s transpose and the +skip pass out of HBM entirely.
    """
    rows_c, wbc = cu.shape[0], cu.shape[1]
    a = cu[:, :, : 2 * c].reshape(rows_c, 2 * wbc, c)
    b = cu[:, :, 2 * c :].reshape(rows_c, 2 * wbc, c)
    return jnp.stack([a, b], axis=1).reshape(2 * rows_c, wb, c)


def _tail_kernel(
    sp, sc, sn, cp, cc_, cn, skip_ref,
    w0, b0, w1, b1, w2, b2, w3, b3, w9h, bh, w9l, bl,
    *refs, th, wb, c, cc, cl, hb, pack, quant, has_z, coarse=False,
):
    if coarse:
        up_p, up_c, up_n, *refs = refs
    if quant:
        ysh, sh_, zh_, out_ref = refs
    else:
        out_ref = refs[0]
    i = pl.program_id(0)
    r0 = i * th
    rows = th + 4

    s = _gather_halo(sp, sc, sn, 2).reshape(rows * wb, c)
    if coarse:
        # s input is the fine skip (fea0); rebuild d2s(up_conv3) in VMEM and
        # add — the coarse halo rows [r0/2-1, r0/2+th/2+1) unfold to exactly
        # the fine halo [r0-2, r0+th+2).
        cu = _gather_halo(up_p, up_c, up_n, 1)
        s = (
            s.astype(jnp.float32)
            + _d2s_fine(cu, c, wb).reshape(rows * wb, c).astype(jnp.float32)
        ).astype(sc.dtype).reshape(rows * wb, c)
    cond = _gather_halo(cp, cc_, cn, 2).reshape(rows * wb, cc)

    def mix(v, w, b):
        return jnp.dot(v.astype(w.dtype), w[:], preferred_element_type=jnp.float32) + b[0].astype(jnp.float32)

    h = _lrelu(mix(cond, w0, b0)).astype(sc.dtype)
    scale = mix(h, w1, b1)
    g = _lrelu(mix(cond, w2, b2)).astype(sc.dtype)
    shift = mix(g, w3, b3)
    t = s.astype(jnp.float32) * (scale + 1.0) + shift

    if quant:
        hacc = _taps_conv_q(t, w9h, ysh, sh_, zh_ if has_z else None, r0 - 2, wb, c, c, hb) + bh[0].astype(jnp.float32)
    else:
        tm = _row_mask(t, r0 - 2, hb, wb).astype(sc.dtype).reshape(rows, wb, c)
        hacc = _taps_conv(tm, w9h, th + 2, wb, c, c) + bh[0].astype(jnp.float32)
    hval = jnp.maximum(hacc, 0.0)
    hval = _row_mask(hval, r0 - 1, hb, wb).astype(sc.dtype).reshape(th + 2, wb, c)

    y = _taps_conv(hval, w9l, th, wb, c, cl) + bl[0].astype(jnp.float32)
    y = y + skip_ref[:].reshape(th * wb, cl).astype(jnp.float32)
    if pack:
        v = jnp.clip(y, 0.0, 1.0) * 65535.0 + 0.5
        u = v.astype(jnp.int32).astype(jnp.uint16).reshape(th, wb, cl)
        # (th,2,wb,6): a metadata reshape of the natural (2·th, wb·2, 3)
        # RGB48 rows — even rows are s2d channels [:6], odd rows [6:].
        out_ref[:, 0] = u[..., : cl // 2]
        out_ref[:, 1] = u[..., cl // 2 :]
    else:
        out_ref[:] = y.reshape(th, wb, cl).astype(out_ref.dtype)


def fused_tail(
    s: jax.Array, cond1: jax.Array, skip: jax.Array,
    sft_small, w_hr, b_hr, w_last, b_last,
    *, pack: bool = True, out_dtype=None, qargs_hr: dict | None = None,
    up_coarse: jax.Array | None = None,
):
    """LE output slice over s2d tensors:

        t   = SFT_layer2(s, cond1)          (x·(scale+1)+shift)
        h   = relu(HR_conv2(t))             3×3 'same'
        y   = conv_last(h) + skip           3×3 'same' + long skip
        out = pack ? u16(clip(y)·65535+.5) : y

    ``s`` = up3+fea0 (Hb,Wb,128); ``skip`` = agcm_out (Hb,Wb,12).
    With ``pack`` the result is (Hb,2,Wb,6) uint16 whose flat layout equals
    the natural (2Hb, 2Wb, 3) RGB48 frame — reshape, don't d2s.
    With ``up_coarse`` (Hb/2, Wb/2, 4C — the pre-d2s up_conv3 output), ``s``
    is the fine skip (fea0) alone and the kernel computes
    s = d2s(up_coarse) + fea0 in VMEM (_d2s_fine) — the d2s transpose and
    the add pass never touch HBM.
    """
    hb, wb, c = s.shape
    cc = cond1.shape[-1]
    cl = w_last.shape[-1]
    th = pick_rows_even(hb, limit=_row_limit(wb, 12))
    if not th:
        raise ValueError(f"fused_tail needs an even row divisor of {hb}")
    coarse = up_coarse is not None
    if coarse and up_coarse.shape != (hb // 2, wb // 2, 4 * c):
        raise ValueError(f"up_coarse {up_coarse.shape} != {(hb // 2, wb // 2, 4 * c)}")
    quant = qargs_hr is not None
    extra = []
    if quant:
        w9h, ysh, sh_, zh_, has_z, bch = _pack_qargs(qargs_hr, c)
        bh_in = (b_hr.astype(jnp.float32) + bch).reshape(1, -1)
        extra = [ysh, sh_, zh_]
    else:
        has_z = False
        w9h = w_hr.reshape(9, c, c).astype(s.dtype)
        bh_in = b_hr.reshape(1, -1).astype(jnp.float32)
    w9l = w_last.reshape(9, c, cl).astype(s.dtype)
    consts = []
    for w, b in sft_small:
        consts.append(w.astype(s.dtype))
        consts.append(b.reshape(1, -1).astype(jnp.float32))

    kernel = functools.partial(
        _tail_kernel, th=th, wb=wb, c=c, cc=cc, cl=cl, hb=hb, pack=pack,
        quant=quant, has_z=has_z, coarse=coarse,
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if pack:
        out_shape = jax.ShapeDtypeStruct((hb, 2, wb, cl // 2), jnp.uint16)
        out_spec = pl.BlockSpec((th, 2, wb, cl // 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((hb, wb, cl), out_dtype or s.dtype)
        out_spec = pl.BlockSpec((th, wb, cl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    coarse_specs, coarse_args = [], []
    if coarse:
        coarse_specs = _halo_specs(hb // 2, th // 2, wb // 2, 4 * c, h=1)
        coarse_args = [up_coarse, up_coarse, up_coarse]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(hb // th,),
        in_specs=_halo_specs(hb, th, wb, c, h=2)
        + _halo_specs(hb, th, wb, cc, h=2)
        + [pl.BlockSpec((th, wb, cl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + [wspec] * 12
        + coarse_specs
        + [wspec] * len(extra),
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        s, s, s, cond1, cond1, cond1, skip,
        *consts,
        w9h, bh_in,
        w9l, b_last.reshape(1, -1).astype(jnp.float32),
        *coarse_args,
        *extra,
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
        u = (jnp.clip(y, 0.0, 1.0) * 65535.0 + 0.5).astype(jnp.uint16)
        cl = u.shape[-1]
        return jnp.stack([u[..., : cl // 2], u[..., cl // 2 :]], axis=1)
    return y.astype(out_dtype or dt)


# ---------------------------------------------------------------------------
# 4. Stride-2 dense-s2d block conv (the weight-transformed down convs)
# ---------------------------------------------------------------------------


def _down2_kernel(xp, xc, xn, wcat_ref, wr_ref, b_ref, *refs, th, wb, c, hb, act, quant, has_z, a_sub, nb=1):
    """Out rows [r0, r0+th) ← natural input rows [2r0-1, 2r0+2th+1).

    Blocks arrive in the producer's natural (hb, wb, C) layout — pairing
    adjacent W columns into lanes (wb/2, 2C) happens *inside* the kernel as
    a VMEM reshape, so XLA never materializes the 132-265 MB retiling copy
    the old host-side ``x.reshape(hb, wb/2, 2C)`` required (round-2 profile:
    reshape.110/.118 were the largest movement ops in the frame program).

    For output col p and natural tap dJ∈{0,1,2} (pad (1,0)): input col
    2p+dJ-1 → dJ∈{1,2} hit paired col p (both halves — one K=2C matmul);
    dJ=0 hits paired col p-1's upper half (a sublane shift + K=C matmul).
    Row taps dI read even-position rows of a leading-split reshape.

    With ``quant``, weights are int8 (yscale/s/z refs follow) and the dots
    run on the MXU's int8 path with int32 accumulation.
    """
    if quant:
        yscale_ref, s_ref, z_ref, out_ref = refs
    else:
        out_ref = refs[0]
    i = pl.program_id(0)
    r0 = i * th
    co = out_ref.shape[-1]
    n2 = 2 * th
    wbo = wb // 2

    g = jnp.concatenate([xp[1:], xc[:], xn[:1]], axis=0)  # (2th+2, wb, c)
    # pad (1,0): only global input row -1 needs zeroing (first tile, dI=0).
    gf = _row_mask(g.reshape((n2 + 2) * wb, c), 2 * r0 - 1, hb, wb)

    def tap_views(gq, pad_val):
        rows_d, sh_d = [], []
        for dI in range(3):
            rows = gq[dI : dI + n2].reshape(th, 2, wbo, 2 * c)[:, 0]  # (th, wbo, 2c)
            sh = jnp.pad(rows[:, : wbo - 1, :], ((0, 0), (1, 0), (0, 0)), constant_values=pad_val)
            rows_d.append(rows.reshape(th * wbo, 2 * c))
            sh_d.append(sh[..., c:].reshape(th * wbo, c))
        return rows_d, sh_d

    if quant:
        # One quantized copy per consolidated *branch* (nb > 1 = the fused
        # CondNet down conv: shared input, per-branch calibration — the VPU
        # re-quantizes in VMEM instead of XLA re-reading the input from HBM
        # once per branch). nb == 1: single calibration for all sub-blocks.
        gq32 = gf.astype(jnp.float32)
        views = []
        for bi in range(nb):
            q, qpad = _quantize_act(
                gq32,
                s_ref[0, bi],
                z_ref[0, bi] if has_z else None,
                wb,
            )
            views.append(tap_views(q.reshape(n2 + 2, wbo, 2 * c), qpad.astype(jnp.int8)))
        acc_t = jnp.int32
    else:
        views = [tap_views(gf.astype(xc.dtype).reshape(n2 + 2, wbo, 2 * c), 0)]
        acc_t = jnp.float32

    # s2d-transformed stride-2 weights are block-zero on the output-row
    # sub-position axis (w_s2d_s2: di = 2δ + a_in − 2·a_out ∈ [−1,1] →
    # a_out=0 rows use δ∈{−1,0}, a_out=1 rows δ∈{0,1}). Each consolidated
    # sub-block of co (a_sub of them) is laid out [a0-half | a1-half], so
    # each half contracts only 2 of the 3 row taps — skipping the MXU work
    # the structural zeros would otherwise burn (1/3 of the kernel's FLOPs).
    if a_sub == 0:
        # Dense path: no structural-zero assumption — all 3 row taps for the
        # full co extent (fallback for untransformed / oddly-laid-out weights).
        rows_d, sh_d = views[0]
        acc = jnp.zeros((th * wbo, co), acc_t)
        for dI in range(3):
            acc = acc + jnp.dot(rows_d[dI], wcat_ref[dI], preferred_element_type=acc_t)
            acc = acc + jnp.dot(sh_d[dI], wr_ref[dI], preferred_element_type=acc_t)
    else:
        m = co // (2 * a_sub)
        chunks = []
        for s_i in range(a_sub):
            rows_d, sh_d = views[s_i if len(views) > 1 else 0]
            for hf in range(2):
                lo = (2 * s_i + hf) * m
                taps = (0, 1) if hf == 0 else (1, 2)
                accc = jnp.zeros((th * wbo, m), acc_t)
                for dI in taps:
                    accc = accc + jnp.dot(
                        rows_d[dI], wcat_ref[dI, :, lo : lo + m], preferred_element_type=acc_t
                    )
                    accc = accc + jnp.dot(
                        sh_d[dI], wr_ref[dI, :, lo : lo + m], preferred_element_type=acc_t
                    )
                chunks.append(accc)
        acc = jnp.concatenate(chunks, axis=-1)
    if quant:
        acc = acc.astype(jnp.float32) * yscale_ref[0].astype(jnp.float32)
    acc = _apply_act(acc + b_ref[0].astype(jnp.float32), act)
    out_ref[:] = acc.reshape(th, wbo, co).astype(out_ref.dtype)


def fused_down2(
    x: jax.Array, w: jax.Array, b: jax.Array, *, act: str | None = None,
    out_dtype=None, qargs: dict | None = None, a_sub: int = 1,
    cin: int | None = None, ch0: int = 0,
):
    """Stride-2 3×3 block conv, (1,0) pad: (Hb,Wb,C) → (Hb/2,Wb/2,Co).

    ``w``: (3,3,C,Co) — the s2d-transformed stride-2 weight (w_s2d_s2).
    **Required**: the kernel exploits w_s2d_s2's structural zeros on the
    output-row sub-position axis (see _down2_kernel); arbitrary dense weights
    would compute incorrectly. ``a_sub`` = number of consolidated w_s2d_s2
    sub-blocks concatenated along co (1 for a plain transformed conv, 3 for
    LE.__cond_down).
    ``act``: None | 'relu' | 'lrelu' fused epilogue.
    ``qargs``: native-int8 W8A8 execution — dict with ``w_int8`` (3,3,C,Co),
    ``w_scale`` (Co,), ``x_scale`` (float), optional ``x_zero``; dots run
    int8×int8→int32 on the MXU with the affine zero-point correction folded
    into the bias (zero-block skipping stays exact: skipped blocks quantize
    to code 0, so they contribute nothing to either dot or correction).
    ``cin``/``ch0``: consume the ``[ch0:ch0+cin]`` channel window of a wider
    ``x`` via the input BlockSpecs (``ch0`` a multiple of ``cin``) — the
    caller's channel slice never materializes in HBM.
    """
    hb, wb, cf = x.shape
    c = cin if cin is not None else cf
    if ch0 % c:
        raise ValueError(f"ch0 {ch0} must be a multiple of the window {c}")
    kb = ch0 // c
    co = w.shape[-1]
    hbo, wbo = hb // 2, wb // 2
    out_dtype = out_dtype or x.dtype
    th = pick_rows(hbo, limit=_row_limit(wbo, 8, ref_wb=480, minimum=3))

    quant = qargs is not None
    extra = []
    nb = 1
    if quant:
        wq = qargs["w_int8"]
        ws = jnp.asarray(qargs["w_scale"], jnp.float32)
        # Multi-branch consolidation (the fused CondNet down conv): per-branch
        # activation scales/zeros under "x_scales"/"x_zeros" — one branch per
        # a_sub sub-block; the kernel quantizes the shared input once per
        # branch *in VMEM* instead of splitting back into 3 HBM passes.
        if "x_scales" in qargs:
            xs_v = jnp.asarray(qargs["x_scales"], jnp.float32).reshape(-1)
            nb = xs_v.shape[0]
            if nb != a_sub or co % nb:
                raise ValueError(f"x_scales ({nb}) must match a_sub ({a_sub})")
            xz_v = qargs.get("x_zeros")
            has_z = xz_v is not None
            xs_per_co = jnp.repeat(xs_v, co // nb)
            xz_per_co = None if xz_v is None else jnp.repeat(
                jnp.asarray(xz_v, jnp.float32).reshape(-1), co // nb
            )
        else:
            xs_v = jnp.asarray(qargs["x_scale"], jnp.float32).reshape(-1)
            xz = qargs.get("x_zero")
            has_z = xz is not None
            xs_per_co = xs_v[0]
            xz_per_co = None if xz is None else jnp.asarray(xz, jnp.float32)
            xz_v = None if xz is None else jnp.asarray(xz, jnp.float32).reshape(-1)
        wcat = jnp.concatenate([wq[:, 1], wq[:, 2]], axis=1)  # int8 (3,2C,Co)
        wr = wq[:, 0]
        yscale = (xs_per_co * ws).reshape(1, co)
        bq = b.astype(jnp.float32)
        if has_z:
            wsum = (wq.astype(jnp.float32) * ws).sum(axis=(0, 1, 2))
            bq = bq + (xz_per_co + 128.0 * xs_per_co) * wsum
        b_in = bq.reshape(1, -1)
        extra = [
            yscale,
            xs_v.reshape(1, nb),
            (xz_v if has_z else jnp.zeros((nb,), jnp.float32)).reshape(1, nb),
        ]
    else:
        has_z = False
        wcat = jnp.concatenate([w[:, 1], w[:, 2]], axis=1).astype(x.dtype)  # (3, 2C, Co)
        wr = w[:, 0].astype(x.dtype)
        b_in = b.reshape(1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _down2_kernel, th=th, wb=wb, c=c, hb=hb, act=act, quant=quant, has_z=has_z,
        a_sub=a_sub, nb=nb,
    )
    n = hbo // th
    # center = 2th input rows; halos are 2-row views (one row used each).
    specs = [
        pl.BlockSpec((2, wb, c), lambda i: (jnp.maximum(i * th - 1, 0), 0, kb), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * th, wb, c), lambda i: (i, 0, kb), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, wb, c), lambda i: (jnp.minimum((i + 1) * th, hbo - 1), 0, kb), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hbo, wbo, co), out_dtype),
        grid=(n,),
        in_specs=specs,
        out_specs=pl.BlockSpec((th, wbo, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, x, wcat, wr, b_in, *extra)


def fused_down2_ref(x, w, b, *, act=None, out_dtype=None):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32)[None], w.astype(jnp.float32), (2, 2), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + b.astype(jnp.float32)
    y = _apply_act(y, act)
    return y.astype(out_dtype or x.dtype)


# ---------------------------------------------------------------------------
# 5. SFT + 3×3 conv, and the full SFT resblock (arch_util.py:60-95 semantics)
# ---------------------------------------------------------------------------


def _sft_mix(cond_flat, w0, b0, w1, b1, dt):
    """scale/shift branch: conv1(lrelu(conv0(cond))) on flat (M, Cc)."""
    h = jnp.dot(cond_flat.astype(dt), w0[:], preferred_element_type=jnp.float32) + b0[0].astype(jnp.float32)
    h = _lrelu(h).astype(dt)
    return jnp.dot(h, w1[:], preferred_element_type=jnp.float32) + b1[0].astype(jnp.float32)


def _sft_conv_kernel(
    xt, xc, xb, ct, cc_, cb, skip_ref,
    w0, b0, w1, b1, w2, b2, w3, b3, w9, b9,
    *refs, th, wb, c, cc, hb, fuse_relu, has_skip, quant, has_z,
):
    if quant:
        yscale, s_ref, z_ref, out_ref = refs
    else:
        out_ref = refs[0]
    i = pl.program_id(0)
    r0 = i * th
    rows = th + 2
    dt = xc.dtype

    x = _gather_halo(xt, xc, xb, 1).reshape(rows * wb, c)
    cond = _gather_halo(ct, cc_, cb, 1).reshape(rows * wb, cc)

    scale = _sft_mix(cond, w0, b0, w1, b1, dt)
    shift = _sft_mix(cond, w2, b2, w3, b3, dt)
    t = x.astype(jnp.float32) * (scale + 1.0) + shift

    if quant:
        acc = _taps_conv_q(
            t, w9, yscale, s_ref, z_ref if has_z else None, r0 - 1, wb, c, out_ref.shape[-1], hb
        ) + b9[0].astype(jnp.float32)
    else:
        t = _row_mask(t, r0 - 1, hb, wb).astype(dt).reshape(rows, wb, c)
        acc = _taps_conv(t, w9, th, wb, c, out_ref.shape[-1]) + b9[0].astype(jnp.float32)
    if has_skip:
        acc = acc + skip_ref[:].reshape(th * wb, -1).astype(jnp.float32)
    if fuse_relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.reshape(th, wb, -1).astype(out_ref.dtype)


def fused_sft_conv3_v2(
    x: jax.Array, cond: jax.Array, sft4, w: jax.Array, b: jax.Array,
    *, relu: bool = False, skip: jax.Array | None = None, out_dtype=None,
    qargs: dict | None = None,
):
    """y = conv3x3(sft(x, cond)) (+skip)(relu) over s2d tensors.

    Successor of ops/sft_conv.py:130 — x and cond arrive as separate halo
    block views instead of a lane-concatenated stream, killing the concat
    materialization pass (~0.8 ms/call at L0). ``sft4``: four (w,b) pairs
    (scale0, scale1, shift0, shift1) — the s2d block-diag dense 1×1 kernels.
    ``qargs`` switches the conv to native int8 W8A8 (see _taps_conv_q).
    """
    hb, wb, c = x.shape
    cc = cond.shape[-1]
    co = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    th = pick_rows(hb, limit=_row_limit(wb, 12))
    consts = []
    for ws, bs in sft4:
        consts.append(ws.astype(x.dtype))
        consts.append(bs.reshape(1, -1).astype(jnp.float32))

    quant = qargs is not None
    extra = []
    if quant:
        w9, yscale, s_q, z_q, has_z, b_corr = _pack_qargs(qargs, co)
        b_in = (b.astype(jnp.float32) + b_corr).reshape(1, -1)
        extra = [yscale, s_q, z_q]
    else:
        has_z = False
        w9 = w.reshape(9, c, co).astype(x.dtype)
        b_in = b.reshape(1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _sft_conv_kernel, th=th, wb=wb, c=c, cc=cc, hb=hb,
        fuse_relu=relu, has_skip=skip is not None, quant=quant, has_z=has_z,
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = _halo_specs(hb, th, wb, c) + _halo_specs(hb, th, wb, cc)
    args = [x, x, x, cond, cond, cond]
    if skip is not None:
        in_specs.append(pl.BlockSpec((th, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
        args.append(skip)
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1, 1), jnp.float32))
    in_specs += [wspec] * (10 + len(extra))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hb, wb, co), out_dtype),
        grid=(hb // th,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((th, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args, *consts, w9, b_in, *extra)


def fused_sft_conv3_v2_ref(x, cond, sft4, w, b, *, relu=False, skip=None, out_dtype=None):
    (w0, b0), (w1, b1), (w2, b2), (w3, b3) = sft4
    dt = x.dtype
    cf = cond.astype(dt).astype(jnp.float32)

    def mix(v, ws, bs):
        h = v @ ws.astype(jnp.float32) + bs.astype(jnp.float32)
        return h

    h = mix(cf, w0, b0)
    scale = mix(jnp.where(h >= 0, h, h * 0.1).astype(dt).astype(jnp.float32), w1, b1)
    g = mix(cf, w2, b2)
    shift = mix(jnp.where(g >= 0, g, g * 0.1).astype(dt).astype(jnp.float32), w3, b3)
    t = (x.astype(jnp.float32) * (scale + 1.0) + shift).astype(dt)
    y = jax.lax.conv_general_dilated(
        t.astype(jnp.float32)[None], w.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + b.astype(jnp.float32)
    if skip is not None:
        y = y + skip.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype or x.dtype)


def _resblock_kernel(
    xt, xc, xb, ct, cc_, cb,
    s1w0, s1b0, s1w1, s1b1, s1w2, s1b2, s1w3, s1b3, w1_, b1_,
    s2w0, s2b0, s2w1, s2b1, s2w2, s2b2, s2w3, s2b3, w2_, b2_,
    *refs, th, wb, c, cc, hb, quant, has_z1, has_z2, coarse=False, add2=False,
):
    if coarse:
        up_p, up_c, up_n, *refs = refs
    elif add2:
        a_t, a_c, a_b, *refs = refs
    if quant:
        ys1, s1_, z1_, ys2, s2_, z2_, out_ref = refs
    else:
        out_ref = refs[0]
    i = pl.program_id(0)
    r0 = i * th
    rows = th + 4
    dt = xc.dtype

    x = _gather_halo(xt, xc, xb, 2).reshape(rows * wb, c)
    if coarse:
        # x is the fine skip; the resblock input (and its residual) is
        # x + d2s(up_coarse), rebuilt per tile in VMEM (_d2s_fine).
        cu = _gather_halo(up_p, up_c, up_n, 1)
        x = (
            x.astype(jnp.float32)
            + _d2s_fine(cu, c, wb).reshape(rows * wb, c).astype(jnp.float32)
        ).astype(dt)
    elif add2:
        x = (
            x.astype(jnp.float32)
            + _gather_halo(a_t, a_c, a_b, 2).reshape(rows * wb, c).astype(jnp.float32)
        ).astype(dt)
    cond = _gather_halo(ct, cc_, cb, 2).reshape(rows * wb, cc)

    scale = _sft_mix(cond, s1w0, s1b0, s1w1, s1b1, dt)
    shift = _sft_mix(cond, s1w2, s1b2, s1w3, s1b3, dt)
    t1 = x.astype(jnp.float32) * (scale + 1.0) + shift

    if quant:
        h1 = jnp.maximum(
            _taps_conv_q(t1, w1_, ys1, s1_, z1_ if has_z1 else None, r0 - 2, wb, c, c, hb)
            + b1_[0].astype(jnp.float32),
            0.0,
        )
    else:
        t1m = _row_mask(t1, r0 - 2, hb, wb).astype(dt).reshape(rows, wb, c)
        h1 = jnp.maximum(_taps_conv(t1m, w1_, th + 2, wb, c, c) + b1_[0].astype(jnp.float32), 0.0)

    cond_in = cond.reshape(rows, wb, cc)[1 : th + 3].reshape((th + 2) * wb, cc)
    scale2 = _sft_mix(cond_in, s2w0, s2b0, s2w1, s2b1, dt)
    shift2 = _sft_mix(cond_in, s2w2, s2b2, s2w3, s2b3, dt)
    t2 = h1 * (scale2 + 1.0) + shift2

    if quant:
        y = _taps_conv_q(t2, w2_, ys2, s2_, z2_ if has_z2 else None, r0 - 1, wb, c, c, hb) + b2_[0].astype(jnp.float32)
    else:
        t2m = _row_mask(t2, r0 - 1, hb, wb).astype(dt).reshape(th + 2, wb, c)
        y = _taps_conv(t2m, w2_, th, wb, c, c) + b2_[0].astype(jnp.float32)
    y = y + x.reshape(rows, wb, c)[2 : th + 2].reshape(th * wb, c).astype(jnp.float32)
    out_ref[:] = y.reshape(th, wb, c).astype(out_ref.dtype)


def fused_resblock(
    x: jax.Array, cond: jax.Array, sft1, w1, b1, sft2, w2, b2,
    *, out_dtype=None, qargs1: dict | None = None, qargs2: dict | None = None,
    up_coarse: jax.Array | None = None, x_add: jax.Array | None = None,
):
    """ResBlock_with_SFT (arch_util.py:75-95) as one kernel:

        out = x + conv2( sft2( relu(conv1( sft1(x, cond) )), cond ) )

    Two 3×3 'same' convs chained in-VMEM with a 2-row halo; SFT scale/shift
    branches recomputed per tile (pointwise, cheap) instead of materialized.
    ``qargs1``/``qargs2`` switch the convs to native int8 W8A8 (both or
    neither — one program per quant configuration).
    ``up_coarse`` (Hb/2, Wb/2, 4C): the block input (and residual) becomes
    x + d2s(up_coarse), unfolded per tile in VMEM (trunk5's up_conv2 path —
    the d2s transpose and skip-add pass never touch HBM). ``x_add`` is the
    same for an already-fine second input (trunk4's up_conv1 path).
    """
    hb, wb, c = x.shape
    cc = cond.shape[-1]
    out_dtype = out_dtype or x.dtype
    th = pick_rows_even(hb, limit=_row_limit(wb, 12))
    if not th:
        raise ValueError(f"fused_resblock needs an even row divisor of {hb}")
    coarse = up_coarse is not None
    if coarse and up_coarse.shape != (hb // 2, wb // 2, 4 * c):
        raise ValueError(f"up_coarse {up_coarse.shape} != {(hb // 2, wb // 2, 4 * c)}")
    if coarse and x_add is not None:
        raise ValueError("up_coarse and x_add are mutually exclusive")
    add2 = x_add is not None
    quant = qargs1 is not None and qargs2 is not None
    extra = []
    if quant:
        w91, ys1, s1_, z1_, has_z1, bc1 = _pack_qargs(qargs1, c)
        w92, ys2, s2_, z2_, has_z2, bc2 = _pack_qargs(qargs2, c)
        b1_in = (b1.astype(jnp.float32) + bc1).reshape(1, -1)
        b2_in = (b2.astype(jnp.float32) + bc2).reshape(1, -1)
        extra = [ys1, s1_, z1_, ys2, s2_, z2_]
    else:
        has_z1 = has_z2 = False
        w91 = w1.reshape(9, c, c).astype(x.dtype)
        w92 = w2.reshape(9, c, c).astype(x.dtype)
        b1_in = b1.reshape(1, -1).astype(jnp.float32)
        b2_in = b2.reshape(1, -1).astype(jnp.float32)
    consts = []
    for ws, bs in (*sft1, *sft2):
        consts.append(ws.astype(x.dtype))
        consts.append(bs.reshape(1, -1).astype(jnp.float32))
    c1 = consts[:8] + [w91, b1_in]
    c2 = consts[8:] + [w92, b2_in]

    kernel = functools.partial(
        _resblock_kernel, th=th, wb=wb, c=c, cc=cc, hb=hb,
        quant=quant, has_z1=has_z1, has_z2=has_z2, coarse=coarse, add2=add2,
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    second_specs, second_args = [], []
    if coarse:
        second_specs = _halo_specs(hb // 2, th // 2, wb // 2, 4 * c, h=1)
        second_args = [up_coarse, up_coarse, up_coarse]
    elif add2:
        second_specs = _halo_specs(hb, th, wb, c, h=2)
        second_args = [x_add, x_add, x_add]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hb, wb, c), out_dtype),
        grid=(hb // th,),
        in_specs=_halo_specs(hb, th, wb, c, h=2)
        + _halo_specs(hb, th, wb, cc, h=2)
        + [wspec] * 20
        + second_specs
        + [wspec] * len(extra),
        out_specs=pl.BlockSpec((th, wb, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, x, cond, cond, cond, *c1, *c2, *second_args, *extra)


def fused_resblock_ref(x, cond, sft1, w1, b1, sft2, w2, b2, *, out_dtype=None):
    h = fused_sft_conv3_v2_ref(x, cond, sft1, w1, b1, relu=True)
    return fused_sft_conv3_v2_ref(h, cond, sft2, w2, b2, skip=x, out_dtype=out_dtype)


# ---------------------------------------------------------------------------
# 5b. The whole natural trunk3 stage (4 SFT resblocks + skip + up_conv1)
# ---------------------------------------------------------------------------


def _trunk3_kernel(
    ft, fc, fb, ct, cm, cb, w0s, b0s, w1s, b1s, wcs, bcs, wup, bup, out_ref,
    *, th, wb, hb, cin, cc4, co,
):
    i = pl.program_id(0)
    r0g = (i - 1) * th  # global row index of gathered[0] (full-tile halos)
    R = 3 * th
    dt = fc.dtype

    def mask(v):
        return _row_mask(v, r0g, hb, wb)

    x = _gather_halo(ft, fc, fb, th).reshape(R * wb, cin)
    cond = mask(_gather_halo(ct, cm, cb, th).reshape(R * wb, cc4).astype(jnp.float32)).astype(dt)

    def mix(k):
        h = jnp.dot(cond, w0s[k], preferred_element_type=jnp.float32) + b0s[k][0].astype(jnp.float32)
        return (
            jnp.dot(_lrelu(h).astype(dt), w1s[k], preferred_element_type=jnp.float32)
            + b1s[k][0].astype(jnp.float32)
        )

    def conv3(tf, w3t, b3t):
        """'same' 3×3 over the full gathered window (validity shrinks one row
        per conv from the window edges — th covers the 9-conv chain depth)."""
        t3 = tf.astype(dt).reshape(R, wb, cin)
        zrow = jnp.zeros((1, wb, cin), dt)
        acc = jnp.zeros((R * wb, w3t.shape[-1]), jnp.float32)
        for di_idx, dI in enumerate((-1, 0, 1)):
            if dI == -1:
                rows = jnp.concatenate([zrow, t3[: R - 1]], axis=0)
            elif dI == 1:
                rows = jnp.concatenate([t3[1:], zrow], axis=0)
            else:
                rows = t3
            left = jnp.pad(rows[:, : wb - 1, :], ((0, 0), (1, 0), (0, 0)))
            right = jnp.pad(rows[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
            cat = jnp.concatenate([left, rows, right], axis=-1).reshape(R * wb, 3 * cin)
            acc = acc + jnp.dot(cat, w3t[di_idx], preferred_element_type=jnp.float32)
        return acc + b3t[0].astype(jnp.float32)

    # chain storage in the compute dtype (the lax path also stores bf16
    # between ops); f32 only inside the dot accumulators — halves the
    # lane-padded VMEM footprint (the 4K tiles OOMed the f32 form)
    fea_init = mask(x.astype(jnp.float32)).astype(dt)
    xf = fea_init
    for b in range(4):
        t = mask(
            xf.astype(jnp.float32) * (mix(4 * b + 0) + 1.0) + mix(4 * b + 1)
        ).astype(dt)
        h1 = jnp.maximum(conv3(t, wcs[2 * b], bcs[2 * b]), 0.0).astype(dt)
        t2 = mask(
            h1.astype(jnp.float32) * (mix(4 * b + 2) + 1.0) + mix(4 * b + 3)
        ).astype(dt)
        xf = (xf.astype(jnp.float32) + conv3(t2, wcs[2 * b + 1], bcs[2 * b + 1])).astype(dt)
    out = mask(xf.astype(jnp.float32) + fea_init.astype(jnp.float32)).astype(dt)

    up = jnp.maximum(conv3(out, wup, bup), 0.0)
    up3 = up.reshape(R, wb, co)[th : 2 * th]
    out_ref[:] = up3.astype(out_ref.dtype)


def fused_trunk3(
    fea3: jax.Array, cond4: jax.Array, blocks, w_up: jax.Array, b_up: jax.Array,
    *, out_dtype=None,
):
    """The L3 natural stage in one pass: 4 ResBlock_with_SFT (natural-layout
    HDRUNet3T1_arch.py trunk3), the trailing `out + fea3` skip, and the
    up_conv1 PS-folded conv+ReLU — all over the tiny (H/8, W/8, 32) tensors
    that otherwise cost ~1 ms of lane-padded lax convs at 1080p (the nine
    0.106 ms fusions in the round-3 trace; ~4× that at 4K).

    ``blocks``: 4 tuples (sft1 (4 (w,b) pairs), w1, b1, sft2 (4), w2, b2).
    Returns relu(up_conv1(out)) — the only tensor downstream consumes.
    Tiling: full-tile halos (prev/cur/next whole-tile views) — the chain is
    9 convs deep, so the th-row halo must cover it (th ≥ 9); the redundant
    halo compute is ~2 extra MB-scale tiles, noise at these sizes.
    """
    hb, wb, cin = fea3.shape
    cc4 = cond4.shape[-1]
    co = w_up.shape[-1]
    out_dtype = out_dtype or fea3.dtype
    # th ≥ 9 covers the 9-conv chain depth; cap by VMEM: ~8 live gathered-
    # window tensors, each lane-padded to 128 (narrow 32/16-lane values
    # occupy full vregs), 2 B/elt compute dtype (4K tiles OOMed at th=30).
    # envelope proven on-chip at 1080p (th=27, wb=240 ≈ 40 MB scoped); the
    # 60 MB guess OOMed the 4K compile at th=18 (111 M scoped, wb=480)
    budget = 40 * 1024 * 1024
    per_row = 3 * wb * 128 * 2 * 8
    th = 0
    for cand in range(min(hb, 32, max(9, budget // per_row)), 8, -1):
        if hb % cand == 0:
            th = cand
            break
    if not th:
        raise ValueError(f"no tile rows ≥9 divide hb={hb}")

    w0l, b0l, w1l, b1l, wcl, bcl = [], [], [], [], [], []
    for sft1, w1, b1, sft2, w2, b2 in blocks:
        for (w0, b0), (wS1, bS1) in (sft1[:2], sft1[2:], sft2[:2], sft2[2:]):
            w0l.append(w0)
            b0l.append(b0.reshape(1, -1))
            w1l.append(wS1)
            b1l.append(bS1.reshape(1, -1))
        for w, b in ((w1, b1), (w2, b2)):
            wcl.append(_w3tap(w))
            bcl.append(b.reshape(1, -1))
    dt = fea3.dtype
    w0s = jnp.stack(w0l).astype(dt)
    b0s = jnp.stack(b0l).astype(jnp.float32)
    w1s = jnp.stack(w1l).astype(dt)
    b1s = jnp.stack(b1l).astype(jnp.float32)
    wcs = jnp.stack(wcl).astype(dt)
    bcs = jnp.stack(bcl).astype(jnp.float32)

    kernel = functools.partial(
        _trunk3_kernel, th=th, wb=wb, hb=hb, cin=cin, cc4=cc4, co=co,
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hb, wb, co), out_dtype),
        grid=(hb // th,),
        in_specs=_halo_specs(hb, th, wb, cin, h=th)
        + _halo_specs(hb, th, wb, cc4, h=th)
        + [wspec] * 8,
        out_specs=pl.BlockSpec((th, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        fea3, fea3, fea3, cond4, cond4, cond4,
        w0s, b0s, w1s, b1s, wcs, bcs,
        _w3tap(w_up).astype(dt), b_up.reshape(1, -1).astype(jnp.float32),
    )


def _w3tap(w: jax.Array) -> jax.Array:
    """(3,3,C,Co) HWIO → (3, 3C, Co): per H-tap, the W taps lane-concatenated
    (matching the [left‖center‖right] operand order in _trunk3_kernel)."""
    return jnp.stack([
        jnp.concatenate([w[dI, 0], w[dI, 1], w[dI, 2]], axis=0) for dI in range(3)
    ])


# ---------------------------------------------------------------------------
# 6. Generic pointwise 1×1 chain (the small CondNet tails at L1/L2)
# ---------------------------------------------------------------------------


def _mix_chain_kernel(x_ref, *refs, acts):
    out_ref = refs[-1]
    wrefs = refs[:-1]
    th, wb, c = x_ref.shape
    v = x_ref[:].reshape(th * wb, c)
    for k, act in enumerate(acts):
        w, b = wrefs[2 * k], wrefs[2 * k + 1]
        v = jnp.dot(v.astype(w.dtype), w[:], preferred_element_type=jnp.float32) + b[0].astype(jnp.float32)
        v = _apply_act(v, act)
    out_ref[:] = v.reshape(th, wb, -1).astype(out_ref.dtype)


def fused_mix_chain(x: jax.Array, steps, *, out_dtype=None, cin: int | None = None, ch0: int = 0):
    """Chain of 1×1 convs (+activations) in one HBM pass.

    ``steps``: list of (w (C,C'), b (C',), act ∈ {None,'relu','lrelu'}).
    Used for the short CondNet tails (HDRUNet3T1_arch.py:123-131) that XLA
    otherwise runs as separate matmul round-trips.

    ``cin``/``ch0``: consume the ``[ch0:ch0+cin]`` channel window of a wider
    ``x`` directly via the input BlockSpec (``ch0`` must be a multiple of
    ``cin``) — the caller's channel slice never materializes in HBM (the
    consolidated cond-down split cost ~0.6 ms/frame at 1080p as an XLA
    slice fusion, round-5 profile).
    """
    hb, wb, cf = x.shape
    c = cin if cin is not None else cf
    if ch0 % c:
        raise ValueError(f"ch0 {ch0} must be a multiple of the window {c}")
    kb = ch0 // c
    out_dtype = out_dtype or x.dtype
    th = pick_rows(hb, limit=_row_limit(wb, 12))
    acts = tuple(act for _, _, act in steps)
    flat = []
    for w, b, _ in steps:
        flat.append(w.astype(x.dtype))
        flat.append(b.reshape(1, -1).astype(jnp.float32))
    co = steps[-1][0].shape[1]
    kernel = functools.partial(_mix_chain_kernel, acts=acts)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hb, wb, co), out_dtype),
        grid=(hb // th,),
        in_specs=[pl.BlockSpec((th, wb, c), lambda i: (i, 0, kb), memory_space=pltpu.VMEM)]
        + [wspec] * (2 * len(steps)),
        out_specs=pl.BlockSpec((th, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, *flat)


def fused_mix_chain_ref(x, steps, *, out_dtype=None):
    v = x.astype(jnp.float32)
    for w, b, act in steps:
        v = v @ w.astype(jnp.float32) + b.astype(jnp.float32)
        v = _apply_act(v, act)
    return v.astype(out_dtype or x.dtype)


# ---------------------------------------------------------------------------
# 7. Native int8 (W8A8) conv support — MXU int8×int8→int32 dots
# ---------------------------------------------------------------------------
#
# The QAT checkpoints quantize conv inputs with a per-tensor scale (and zero
# point when asymmetric) and weights per-out-channel (W8A8Conv2d semantics,
# hdrtvnet_torch.py:296-365). In-kernel:
#
#   u  = clamp(round((t - z)/s), 0, 255)            (asym; sym: ±128 direct)
#   q  = u - 128  (int8, MXU-signed)
#   y  = (Σ_taps q @ w_q) · (s·w_scale) + b'        (int32 accumulation)
#
# where b' folds the affine constant (z + 128·s)·Σw into the bias at load
# (models/s2d.py attach_native_int8). Halo rows are zeroed *before*
# quantization and W-edge pads use the quantized-zero code, so padding
# contributes the same affine form as real zeros (within s/2 — the eager
# path pads exact zeros after fake-quant; sub-quantum border difference).


def _quantize_act(t_f32, s: float | jax.Array, z, wb: int):
    """Flat activations → (int8 codes, pad code). s/z are (1,1) refs,
    traced scalars, or python floats."""

    def scal(v):
        if hasattr(v, "shape") and getattr(v, "ndim", 0) == 2:
            return v[0, 0].astype(jnp.float32)
        return jnp.asarray(v, jnp.float32)

    sf = scal(s)
    if z is None:
        q = jnp.clip(jnp.round(t_f32 / sf), -128.0, 127.0)
        return q.astype(jnp.int8), jnp.int32(0)
    zf = scal(z)
    u = jnp.clip(jnp.round((t_f32 - zf) / sf), 0.0, 255.0)
    upad = jnp.clip(jnp.round(-zf / sf), 0.0, 255.0)
    return (u - 128.0).astype(jnp.int8), (upad - 128.0).astype(jnp.int32)


def _tap_views_q(q, qpad, th: int, wb: int):
    """Shifted int8 tap views with quantized-zero W-edge padding."""
    views = []
    for dI in range(3):
        for dJ in (-1, 0, 1):
            r = q[dI : dI + th]
            if dJ == 1:
                r = jnp.pad(r[:, 1:, :], ((0, 0), (0, 1), (0, 0)), constant_values=qpad.astype(jnp.int8))
            elif dJ == -1:
                r = jnp.pad(r[:, : wb - 1, :], ((0, 0), (1, 0), (0, 0)), constant_values=qpad.astype(jnp.int8))
            views.append(r)
    return views


def _taps_conv_q(t_f32, w9q_ref, yscale_ref, s_ref, z_ref, mask_r0, wb: int, c: int, co: int, hb: int):
    """Quantized 3×3 'same' conv: t (rows·wb, c) flat f32 (unmasked) →
    ((rows-2)·wb, co) f32 = int32 tap accumulation rescaled per out channel.

    Rows outside the image (global index from ``mask_r0``) are zeroed before
    quantization so they carry the quantized-zero code — the same affine
    contribution as the eager path's zero pad; W-edge tap pads use the same
    code. 9 int8 MXU dots accumulated in int32."""
    rows = t_f32.shape[0] // wb
    th = rows - 2
    t = _row_mask(t_f32, mask_r0, hb, wb)
    q, qpad = _quantize_act(t, s_ref, z_ref, wb)
    q = q.reshape(rows, wb, c)
    acc = jnp.zeros((th * wb, co), jnp.int32)
    for i, r in enumerate(_tap_views_q(q, qpad, th, wb)):
        acc = acc + jnp.dot(
            r.reshape(th * wb, c), w9q_ref[i], preferred_element_type=jnp.int32
        )
    return acc.astype(jnp.float32) * yscale_ref[0].astype(jnp.float32)


def _pack_qargs(qargs, dtype_co: int):
    """(w9q int8 (9,C,Co), yscale (1,Co), s (1,1), z (1,1), has_z, b_corr)."""
    wq = qargs["w_int8"]
    ws = jnp.asarray(qargs["w_scale"], jnp.float32)
    s = jnp.asarray(qargs["x_scale"], jnp.float32)
    xz = qargs.get("x_zero")
    has_z = xz is not None
    co = wq.shape[-1]
    w9q = wq.reshape(9, wq.shape[-2], co)
    yscale = (s * ws).reshape(1, co)
    b_corr = jnp.zeros((co,), jnp.float32)
    if has_z:
        zf = jnp.asarray(xz, jnp.float32)
        wsum = (wq.astype(jnp.float32) * ws).sum(axis=(0, 1, 2))
        b_corr = (zf + 128.0 * s) * wsum
    z = (jnp.asarray(xz, jnp.float32) if has_z else jnp.float32(0.0)).reshape(1, 1)
    return w9q, yscale, s.reshape(1, 1), z, has_z, b_corr


# ---------------------------------------------------------------------------
# 7. HG composite tail: concat-free 1×1 mixes + mask composite + RGB48 pack
# ---------------------------------------------------------------------------


def _hg_tail_kernel(
    up_ref, c1_ref, img_ref, mask_ref,
    w10u, w10c, b10, wlu, wli, bl,
    out_ref, *, th, wb,
):
    # mask_ref arrives pre-repeated to 12 lanes: Mosaic can't shape-cast a
    # 4-lane-minor block, but the 12-lane merge (like fused_tail's skip) is
    # supported.
    m = th * wb
    up = up_ref[:].reshape(m, up_ref.shape[-1])
    c1 = c1_ref[:].reshape(m, c1_ref.shape[-1])
    img = img_ref[:].reshape(m, 12).astype(jnp.float32)

    u10 = (
        jnp.dot(up, w10u[:], preferred_element_type=jnp.float32)
        + jnp.dot(c1, w10c[:], preferred_element_type=jnp.float32)
        + b10[0].astype(jnp.float32)
    )
    out = (
        jnp.dot(u10.astype(up.dtype), wlu[:], preferred_element_type=jnp.float32)
        + jnp.dot(img.astype(up.dtype), wli[:], preferred_element_type=jnp.float32)
        + bl[0].astype(jnp.float32)
    )
    mask = mask_ref[:].reshape(m, 12).astype(jnp.float32)
    comp = mask * out + img
    v = jnp.clip(comp, 0.0, 1.0) * 65535.0 + 0.5
    u = v.astype(jnp.int32).astype(jnp.uint16).reshape(th, wb, 12)
    # (th,2,wb,6): metadata reshape of the natural RGB48 rows (tail trick)
    out_ref[:, 0] = u[..., :6]
    out_ref[:, 1] = u[..., 6:]


def fused_hg_tail(
    up5: jax.Array, c1: jax.Array, img_s2d: jax.Array, mask4: jax.Array,
    w10: jax.Array, b10: jax.Array, wlast: jax.Array, blast: jax.Array,
) -> jax.Array:
    """HG composite output slice over s2d tensors, one HBM pass:

        u10  = conv10([up5 ‖ c1])            (1×1, concat-permuted weights)
        out  = conv_last([u10 ‖ img])        (1×1)
        comp = mask·out + img                (HG_Composite_arch.py:86-107)
        pack = u16(clip(comp)·65535+.5)      (RGB48 delivery contract)

    Replaces the profiled concat pad/max fusion + relayout copy (~5.5 ms at
    1080p) and the pack transpose (~1.9 ms) with in-kernel dots and the
    (Hb,2,Wb,6) metadata-reshape pack. ``w10``/``wlast`` are the
    concat-permuted block-diagonal 1×1 weights (hg_s2d_transform).
    Returns (Hb,2,Wb,6) u16 ≡ the natural (2Hb,2Wb,3) RGB48 frame.
    """
    hb, wb, cu = up5.shape
    cc = c1.shape[-1]
    mask12 = jnp.repeat(mask4, 3, axis=-1)  # fuses into the mask producer
    th = pick_rows(hb, limit=_row_limit(wb, 8))
    w10 = w10.astype(jnp.float32)
    wlast = wlast.astype(jnp.float32)
    dt = up5.dtype
    args = [
        up5, c1, img_s2d, mask12,
        w10[:cu].astype(dt), w10[cu : cu + cc].astype(dt), b10.reshape(1, -1).astype(jnp.float32),
        wlast[:12].astype(dt), wlast[12:].astype(dt), blast.reshape(1, -1).astype(jnp.float32),
    ]
    row = lambda i: (i, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((th, wb, cu), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((th, wb, cc), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((th, wb, 12), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((th, wb, 12), row, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
    return pl.pallas_call(
        functools.partial(_hg_tail_kernel, th=th, wb=wb),
        out_shape=jax.ShapeDtypeStruct((hb, 2, wb, 6), jnp.uint16),
        grid=(hb // th,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((th, 2, wb, 6), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def fused_hg_tail_ref(up5, c1, img_s2d, mask4, w10, b10, wlast, blast):
    cu = up5.shape[-1]
    f = jnp.float32
    u10 = (
        up5.astype(f) @ w10[:cu].astype(f)
        + c1.astype(f) @ w10[cu:].astype(f)
        + b10.astype(f)
    )
    out = (
        u10 @ wlast[:12].astype(f)
        + img_s2d.astype(f) @ wlast[12:].astype(f)
        + blast.astype(f)
    )
    comp = jnp.repeat(mask4.astype(f), 3, axis=-1) * out + img_s2d.astype(f)
    u = (jnp.clip(comp, 0.0, 1.0) * 65535.0 + 0.5).astype(jnp.uint16)
    return jnp.stack([u[..., :6], u[..., 6:]], axis=1)
