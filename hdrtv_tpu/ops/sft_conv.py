"""Fused SFT + 3×3 block conv — the resblock building block as one kernel.

The s2d model applies SFT (two 2-deep 1×1 stacks on the condition + an
affine modulate) before most 3×3 convs. Profiling shows the SFT's lax 1×1
convs, the modulate elementwise pass and the layout copies around the conv
kernel boundary cost more than the conv itself. This kernel computes

    y = conv3x3( mask(x · (scale(cond)+1) + shift(cond)) ) + bias [+skip][relu]

in one HBM pass. ``mask`` zeroes the conv's halo rows outside the image —
the reference zero-pads the SFT *output* ('same' conv on fea,
arch_util.py:89-95), so halo SFT values must not leak in.

The caller passes x and cond concatenated on channels: one input stream,
one halo DMA — the exact memory pattern of the proven conv3 kernel
(dual-tile DMA tripped a Mosaic verifier bug). Module-count neutral: call
sites swap conv-kernel modules for sft-conv modules.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hdrtv_tpu.ops.conv_kernels import _pick_th


def _sft_conv3_kernel(
    xc_hbm, w_ref, b_ref,
    w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    skip_ref, out_ref, xc_tile, sem,
    *, th, wb, c, cc, co, hb, fuse_relu, has_skip,
):
    i = pl.program_id(0)
    r0 = i * th
    rows = th + 2
    ctot = c + cc + (-(c + cc)) % 128  # lane-padded (Mosaic slice constraint)

    @pl.when(i == 0)
    def _():
        xc_tile[0, :, :] = jnp.zeros((wb, ctot), xc_tile.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        xc_tile[rows - 1, :, :] = jnp.zeros((wb, ctot), xc_tile.dtype)

    n_tiles = hb // th
    if n_tiles == 1:
        cp = pltpu.make_async_copy(xc_hbm.at[pl.ds(0, th), :, :], xc_tile.at[pl.ds(1, th), :, :], sem)
        cp.start()
        cp.wait()
    else:
        is_top = r0 == 0
        is_bottom = r0 + th == hb

        @pl.when(jnp.logical_and(jnp.logical_not(is_top), jnp.logical_not(is_bottom)))
        def _():
            cp = pltpu.make_async_copy(xc_hbm.at[pl.ds(r0 - 1, th + 2), :, :], xc_tile.at[pl.ds(0, th + 2), :, :], sem)
            cp.start()
            cp.wait()

        @pl.when(is_top)
        def _():
            cp = pltpu.make_async_copy(xc_hbm.at[pl.ds(0, th + 1), :, :], xc_tile.at[pl.ds(1, th + 1), :, :], sem)
            cp.start()
            cp.wait()

        @pl.when(is_bottom)
        def _():
            cp = pltpu.make_async_copy(xc_hbm.at[pl.ds(r0 - 1, th + 1), :, :], xc_tile.at[pl.ds(0, th + 1), :, :], sem)
            cp.start()
            cp.wait()

    # --- SFT over (th+2) rows: packed block-diag 1×1 mixes -----------------
    def mix(src, w_r, b_r):
        k = w_r.shape[0]
        nrep = src.shape[-1] // k
        outs = []
        for r in range(nrep):
            y = jnp.dot(
                src[:, r * k : (r + 1) * k],
                w_r[:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            outs.append(y + b_r[0].astype(jnp.float32))
        return outs[0] if nrep == 1 else jnp.concatenate(outs, axis=-1)

    flat = xc_tile[:].reshape(rows * wb, ctot)
    xflat = flat[:, :c].astype(jnp.float32)
    cflat = flat[:, c : c + cc].astype(jnp.float32)
    h = mix(cflat, w0_ref, b0_ref)
    h = jnp.where(h >= 0, h, h * 0.1)
    scale = mix(h, w1_ref, b1_ref)
    g = mix(cflat, w2_ref, b2_ref)
    g = jnp.where(g >= 0, g, g * 0.1)
    shift = mix(g, w3_ref, b3_ref)

    t = xflat * (scale + 1.0) + shift
    # Halo rows outside the image must be the conv's zero padding.
    grow = jax.lax.broadcasted_iota(jnp.int32, (rows * wb, 1), 0) // wb + (r0 - 1)
    t = jnp.where(jnp.logical_and(grow >= 0, grow < hb), t, 0.0)
    t = t.astype(xc_tile.dtype).reshape(rows, wb, c)

    # --- 9-tap conv --------------------------------------------------------
    def tap_view(dI, dJ):
        r = t[dI : dI + th]
        if dJ == 0:
            return r
        if dJ == 1:
            return jnp.pad(r[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
        return jnp.pad(r[:, : wb - 1, :], ((0, 0), (1, 0), (0, 0)))

    acc = jnp.zeros((th * wb, co), jnp.float32)
    for dI in range(3):
        for dJ in (-1, 0, 1):
            xs = tap_view(dI, dJ).reshape(th * wb, c)
            acc = acc + jnp.dot(xs, w_ref[dI * 3 + (dJ + 1)], preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    if has_skip:
        acc = acc + skip_ref[:].reshape(th * wb, co).astype(jnp.float32)
    if fuse_relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.reshape(th, wb, co).astype(out_ref.dtype)


def fused_sft_conv3(
    x: jax.Array,
    cond: jax.Array,
    w: jax.Array,
    b: jax.Array,
    sft_small,
    *,
    relu: bool = False,
    skip: jax.Array | None = None,
    out_dtype=None,
) -> jax.Array:
    """y = conv3x3(sft(x, cond)) (+skip)(relu) over (Hb, Wb, C) s2d tensors.

    ``sft_small``: four (w_small (Ci,Co), b_small (Co,)) pairs for
    scale0, scale1, shift0, shift1 — the ORIGINAL 1×1 kernels; block-diag
    packed here for full MXU contraction.
    """
    from hdrtv_tpu.ops.tilewise import best_pack, pack_bd

    hb, wb, c = x.shape
    cc = cond.shape[-1]
    co = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    th = _pick_th(hb, wb, max(c + cc, co), budget=7 * 1024 * 1024)
    w9 = w.reshape(9, c, co).astype(x.dtype)
    b2 = b.reshape(1, co).astype(jnp.float32)
    pad = (-(c + cc)) % 128  # lane-pad the stream to a 128 multiple
    parts = [x, cond.astype(x.dtype)]
    if pad:
        parts.append(jnp.zeros((hb, wb, pad), x.dtype))
    xc = jnp.concatenate(parts, axis=-1)

    consts = []
    for w_s, b_s in sft_small:
        pack = best_pack(w_s.shape[0])
        consts.append(pack_bd(w_s, pack).astype(x.dtype))
        consts.append(jnp.tile(b_s.astype(jnp.float32), pack).reshape(1, -1))

    kernel = functools.partial(
        _sft_conv3_kernel, th=th, wb=wb, c=c, cc=cc, co=co, hb=hb,
        fuse_relu=relu, has_skip=skip is not None,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # x‖cond in HBM; manual halo DMA
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
    args = [xc, w9, b2, *consts]
    if skip is not None:
        in_specs.append(pl.BlockSpec((th, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
        args.append(skip)
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1, 1), jnp.float32))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hb, wb, co), out_dtype),
        grid=(hb // th,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((th, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wb, c + cc + pad), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def fused_sft_conv3_ref(x, cond, w, b, sft_small, *, relu=False, skip=None, out_dtype=None):
    """lax oracle: per-group SFT then 'same' conv (+skip)(relu)."""
    (w0, b0), (w1, b1), (w2, b2), (w3, b3) = sft_small
    ci = w0.shape[0]
    cc = cond.shape[-1]
    groups = cc // ci
    xs = x.astype(jnp.float32)
    cs = cond.astype(jnp.float32)
    scale_parts, shift_parts = [], []
    for g_i in range(groups):
        cg = cs[..., g_i * ci : (g_i + 1) * ci]
        hcs = cg @ w0.astype(jnp.float32) + b0.astype(jnp.float32)
        hcs = jnp.where(hcs >= 0, hcs, hcs * 0.1)
        scale_parts.append(hcs @ w1.astype(jnp.float32) + b1.astype(jnp.float32))
        gg = cg @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
        gg = jnp.where(gg >= 0, gg, gg * 0.1)
        shift_parts.append(gg @ w3.astype(jnp.float32) + b3.astype(jnp.float32))
    scale = jnp.concatenate(scale_parts, axis=-1)
    shift = jnp.concatenate(shift_parts, axis=-1)
    t = xs * (scale + 1.0) + shift
    y = jax.lax.conv_general_dilated(
        t[None], w.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + b.astype(jnp.float32)
    if skip is not None:
        y = y + skip.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype or x.dtype)
