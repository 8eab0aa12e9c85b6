"""Pallas fused block-convolution kernels for the s2d execution mode.

The s2d model's hot op is a 3×3 'same' conv over (Hb, Wb, 128) bf16 tensors
(models/s2d.py). XLA runs it at ~40 TFLOP/s with separate elementwise passes
for bias/ReLU/skip. This kernel:

- streams row-tiles of the input through VMEM with a 1-row halo (manual DMA,
  predicated zero-fill at the image borders);
- builds the 9 tap views by in-VMEM shifts (W taps are sublane shifts —
  no extra HBM traffic);
- accumulates 9 MXU matmuls (TH·Wb, 128) @ (128, 128) into an fp32 register
  accumulator;
- fuses bias + ReLU + optional residual-skip add into the same pass.

One HBM read of x + one write of y per conv instead of XLA's conv + 2-3
elementwise round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _db_dma(wb: int = 0) -> bool:
    """Double-buffered input halo DMA (round-1 lever, measured round 5):
    prefetch tile i+1 while computing tile i instead of a synchronous
    copy-then-compute per grid step.

    On-chip A/B (chip_sweep r5): 1080p 19.44 vs 19.97 ms — ON wins 2.7%
    where tiles are wide; 960×544 5.57 vs 5.43 ms — OFF wins where tiles
    are small (the second buffer halves the tile rows before the overlap
    can pay). Default: on for wb ≥ 512 (720p+); HDRTV_DB_DMA=0/1 forces."""
    import os

    v = os.environ.get("HDRTV_DB_DMA")
    if v is not None and v != "":
        return v.strip().lower() not in ("0", "false", "no", "off")
    return wb >= 512


def _pick_th(hb: int, wb: int, c: int, budget: int = 10 * 1024 * 1024, max_th: int = 16,
             db: bool = False) -> int:
    """Rows per tile: multiple of 8 dividing hb, sized for VMEM.

    Capped: huge per-kernel matmul M extents (th·wb) blow up the Mosaic
    remote compile (memory), not just VMEM. Double-buffering doubles the
    input-tile footprint, so it prices x twice — tiles stay inside the
    1080p/4K-proven scoped-vmem envelope.
    """
    x_mult = 2 if db else 1
    row_bytes = wb * c * 2 * x_mult + wb * c * 4 + wb * c * 2  # x(+prefetch) + acc + out
    limit = max(8, min(max_th, budget // max(1, row_bytes)))
    best = 0
    for cand in range(8, min(hb, limit) + 1, 8):
        if hb % cand == 0:
            best = cand
    if best:
        return best
    for cand in range(min(hb, limit), 0, -1):
        if hb % cand == 0:
            return cand
    return hb


def _conv3_kernel(x_hbm, w_ref, b_ref, skip_ref, *refs, th, wb, c, co, hb, fuse_relu, has_skip, a_sub, pool_out, quant=False, has_z=False, db=False):
    if quant:
        yscale_ref, s_ref, z_ref, out_ref, x_buf, sem = refs
    else:
        out_ref, x_buf, sem = refs
    i = pl.program_id(0)
    n_rows = th + 2
    n_tiles = hb // th

    # Interior: rows r0-1 .. r0+th (th+2 rows). Top: r0 .. r0+th (th+1 rows
    # into offset 1). Bottom: r0-1 .. hb (th+1 rows into offset 0). The DMA
    # extent must be static per branch; which branches exist is static too
    # (single-tile grids only ever run the top∧bottom case).
    if db:
        # Double-buffered: tile j lands in slot j%2; step i starts the copy
        # for tile i+1 before waiting on tile i, overlapping the next tile's
        # HBM fetch with this tile's MXU work (round-1 lever, PERF_NOTES).
        def issue(j, s, go):
            r0j = j * th

            @pl.when(jnp.logical_and(j > 0, j < n_tiles - 1))
            def _():
                go(pltpu.make_async_copy(
                    x_hbm.at[pl.ds(r0j - 1, th + 2), :, :],
                    x_buf.at[s, pl.ds(0, th + 2), :, :], sem.at[s]))

            @pl.when(j == 0)
            def _():
                go(pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, th + 1), :, :],
                    x_buf.at[s, pl.ds(1, th + 1), :, :], sem.at[s]))

            @pl.when(jnp.logical_and(j == n_tiles - 1, j > 0))
            def _():
                go(pltpu.make_async_copy(
                    x_hbm.at[pl.ds(r0j - 1, th + 1), :, :],
                    x_buf.at[s, pl.ds(0, th + 1), :, :], sem.at[s]))

        slot = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _():
            issue(0, 0, lambda cp: cp.start())

        @pl.when(i + 1 < n_tiles)
        def _():
            issue(i + 1, jax.lax.rem(i + 1, 2), lambda cp: cp.start())

        issue(i, slot, lambda cp: cp.wait())
        x_tile = x_buf.at[slot]
    else:
        x_tile = x_buf
        r0 = i * th
        if n_tiles == 1:
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, th), :, :], x_tile.at[pl.ds(1, th), :, :], sem
            )
            cp.start()
            cp.wait()
        else:
            is_top = r0 == 0
            is_bottom = r0 + th == hb

            @pl.when(jnp.logical_and(jnp.logical_not(is_top), jnp.logical_not(is_bottom)))
            def _():
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(r0 - 1, th + 2), :, :], x_tile.at[pl.ds(0, th + 2), :, :], sem
                )
                cp.start()
                cp.wait()

            @pl.when(is_top)
            def _():
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, th + 1), :, :], x_tile.at[pl.ds(1, th + 1), :, :], sem
                )
                cp.start()
                cp.wait()

            @pl.when(is_bottom)
            def _():
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(r0 - 1, th + 1), :, :], x_tile.at[pl.ds(0, th + 1), :, :], sem
                )
                cp.start()
                cp.wait()

    # Zero the halo rows (after the wait: disjoint from the DMA'd rows, but
    # slot reuse means a stale interior copy may occupy them before it).
    @pl.when(i == 0)
    def _():
        x_tile[0, :, :] = jnp.zeros((wb, c), x_buf.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        x_tile[n_rows - 1, :, :] = jnp.zeros((wb, c), x_buf.dtype)

    r0 = i * th

    # 9-tap accumulation. W-shifts via static slices with zero pad columns.
    def tap_view(dI, dJ):
        rows = x_tile[pl.ds(dI, th), :, :]  # (th, wb, c)
        if dJ == 0:
            return rows
        if dJ == 1:
            shifted = rows[:, 1:, :]
            return jnp.pad(shifted, ((0, 0), (0, 1), (0, 0)))
        shifted = rows[:, : wb - 1, :]
        return jnp.pad(shifted, ((0, 0), (1, 0), (0, 0)))

    if quant:
        # Native int8 W8A8: quantize the gathered tile once in VMEM, then
        # int8 MXU dots accumulated in int32 (same contract as megakernel.py
        # _taps_conv_q; W-edge tap pads carry the quantized-zero code).
        from hdrtv_tpu.ops.megakernel import _quantize_act, _row_mask, _tap_views_q

        t = _row_mask(
            x_tile[:].reshape(n_rows * wb, c).astype(jnp.float32), r0 - 1, hb, wb
        )
        q, qpad = _quantize_act(t, s_ref, z_ref if has_z else None, wb)
        qviews = [
            v.reshape(th * wb, c) for v in _tap_views_q(q.reshape(n_rows, wb, c), qpad, th, wb)
        ]
        ysc = yscale_ref[0].astype(jnp.float32)
        if a_sub:
            m = co // (2 * a_sub)
            chunks = []
            for s_i in range(a_sub):
                for hf in range(2):
                    lo = (2 * s_i + hf) * m
                    acci = jnp.zeros((th * wb, m), jnp.int32)
                    for dI in ((0, 1) if hf == 0 else (1, 2)):
                        for j in range(3):
                            acci = acci + jnp.dot(
                                qviews[dI * 3 + j], w_ref[dI * 3 + j, :, lo : lo + m],
                                preferred_element_type=jnp.int32,
                            )
                    chunks.append(acci.astype(jnp.float32) * ysc[lo : lo + m])
            acc = jnp.concatenate(chunks, axis=-1)
        else:
            acci = jnp.zeros((th * wb, co), jnp.int32)
            for t_i in range(9):
                acci = acci + jnp.dot(qviews[t_i], w_ref[t_i], preferred_element_type=jnp.int32)
            acc = acci.astype(jnp.float32) * ysc
        acc = acc + b_ref[0].astype(jnp.float32)
        if has_skip:
            acc = acc + skip_ref[:].reshape(th * wb, co).astype(jnp.float32)
        if fuse_relu:
            acc = jnp.maximum(acc, 0.0)
        if pool_out:
            y = acc.reshape(th // 2, 2, wb // 2, 2, co)
            out_ref[:] = jnp.maximum(
                jnp.maximum(y[:, 0, :, 0], y[:, 0, :, 1]),
                jnp.maximum(y[:, 1, :, 0], y[:, 1, :, 1]),
            ).astype(out_ref.dtype)
        else:
            out_ref[:] = acc.reshape(th, wb, co).astype(out_ref.dtype)
        return

    views = [tap_view(dI, dJ).reshape(th * wb, c) for dI in range(3) for dJ in (-1, 0, 1)]
    if a_sub:
        # w_s2d_s1 structural zeros on the output-row sub-position axis
        # (di = 2δ + a_in − a_out ∈ [−1,1]): the a0-half of each co sub-block
        # only uses row taps δ∈{−1,0}, the a1-half δ∈{0,1} — skip the zero
        # third of the tap dots. Only profitable when the half is ≥128 lanes
        # (callers gate on that).
        m = co // (2 * a_sub)
        chunks = []
        for s_i in range(a_sub):
            for hf in range(2):
                lo = (2 * s_i + hf) * m
                accc = jnp.zeros((th * wb, m), jnp.float32)
                for dI in ((0, 1) if hf == 0 else (1, 2)):
                    for j in range(3):
                        accc = accc + jnp.dot(
                            views[dI * 3 + j], w_ref[dI * 3 + j, :, lo : lo + m],
                            preferred_element_type=jnp.float32,
                        )
                chunks.append(accc)
        acc = jnp.concatenate(chunks, axis=-1)
    else:
        acc = jnp.zeros((th * wb, co), jnp.float32)
        for t in range(9):
            acc = acc + jnp.dot(views[t], w_ref[t], preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    if has_skip:
        acc = acc + skip_ref[:].reshape(th * wb, co).astype(jnp.float32)
    if fuse_relu:
        acc = jnp.maximum(acc, 0.0)
    if pool_out:
        # 2×2 max pool fused into the epilogue: the full-res conv output
        # never round-trips HBM (the HG encoder's conv_block → maxpool pairs).
        y = acc.reshape(th // 2, 2, wb // 2, 2, co)
        out_ref[:] = jnp.maximum(
            jnp.maximum(y[:, 0, :, 0], y[:, 0, :, 1]),
            jnp.maximum(y[:, 1, :, 0], y[:, 1, :, 1]),
        ).astype(out_ref.dtype)
    else:
        out_ref[:] = acc.reshape(th, wb, co).astype(out_ref.dtype)


def fused_block_conv3(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    relu: bool = False,
    skip: jax.Array | None = None,
    out_dtype=None,
    a_sub: int = 0,
    pool_out: bool = False,
    qargs: dict | None = None,
) -> jax.Array:
    """3×3 'same' conv over (Hb, Wb, C) with fused bias/ReLU/skip.

    ``w``: (3,3,C,Co) HWIO. Requires C, Co multiples of 128 and Wb·C lane
    alignment; callers fall back to lax.conv otherwise.
    ``a_sub`` > 0 declares the weight w_s2d_s1-structured with that many
    consolidated co sub-blocks — the kernel then skips the structurally-zero
    row-tap dots (exact only for transformed weights). Auto-disabled when the
    half-block is under 128 lanes (no MXU win below one lane register).
    ``qargs`` switches to native int8 W8A8 (W8A8Conv2d semantics,
    hdrtvnet_torch.py:296-365): dict with ``w_int8`` (3,3,C,Co) codes,
    ``w_scale`` (Co,), ``x_scale`` scalar, optional ``x_zero``.
    """
    hb, wb, c = x.shape
    co = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    if a_sub and (co % (2 * a_sub) or co // (2 * a_sub) < 128):
        a_sub = 0
    db = _db_dma(wb)
    th = _pick_th(hb, wb, max(c, co), db=db)
    if pool_out and th % 2:  # pooled tiles need even rows
        for cand in range(th - 1, 1, -1):
            if cand % 2 == 0 and hb % cand == 0:
                th = cand
                break
    if pool_out and (th % 2 or hb % 2 or wb % 2):
        raise ValueError(f"pool_out needs even tile/input dims (th={th}, {hb}x{wb})")
    quant = qargs is not None
    extra = []
    if quant:
        from hdrtv_tpu.ops.megakernel import _pack_qargs

        w9, yscale, s_q, z_q, has_z, b_corr = _pack_qargs(qargs, co)
        b2 = (b.astype(jnp.float32) + b_corr).reshape(1, co)
        extra = [yscale, s_q, z_q]
    else:
        has_z = False
        w9 = w.reshape(9, c, co).astype(x.dtype)
        b2 = b.reshape(1, co).astype(jnp.float32)

    db = db and hb // th >= 2  # single-tile grids have nothing to overlap
    kernel = functools.partial(
        _conv3_kernel, th=th, wb=wb, c=c, co=co, hb=hb, fuse_relu=relu, has_skip=skip is not None,
        a_sub=a_sub, pool_out=pool_out, quant=quant, has_z=has_z, db=db,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (9,C,Co)
        pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w9, b2]
    if skip is not None:
        in_specs.append(pl.BlockSpec((th, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
        args.append(skip)
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1, 1), jnp.float32))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra)
    args += extra

    if pool_out:
        out_shape = jax.ShapeDtypeStruct((hb // 2, wb // 2, co), out_dtype)
        out_specs = pl.BlockSpec((th // 2, wb // 2, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((hb, wb, co), out_dtype)
        out_specs = pl.BlockSpec((th, wb, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(hb // th,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wb, c) if db else (th + 2, wb, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)) if db else pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def fused_block_conv3_ref(x, w, b, *, relu=False, skip=None, out_dtype=None):
    """lax reference implementation (used on CPU and as the parity oracle)."""
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),
        w.astype(jnp.float32),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + b.astype(jnp.float32)
    if skip is not None:
        y = y + skip.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype or x.dtype)
