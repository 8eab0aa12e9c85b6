"""Generic fused tile-map — pointwise/1×1-conv chain fusion on TPU.

Many hot ops in the s2d model are *chains of per-pixel channel mixes*:
SFT layers (two 2-deep 1×1 stacks + modulate), the whole AGCM body (three
1×1 convs + global modulates), CondNet heads (1×1 chains with LeakyReLU).
XLA executes each as its own HBM round-trip; here they run as ONE Pallas
kernel: row-tiles of every input stream through VMEM (standard BlockSpec
pipelining, double-buffered by Mosaic), the user-supplied traced function
computes the whole chain on the tile (channel mixes become MXU matmuls),
and a single output tile goes back.

``tile_map(fn, tensors, consts, out_channels)``:
- ``tensors``: (H, W, Ci) arrays, tiled over rows;
- ``consts``: small arrays (weights, modulation vectors) resident in VMEM;
- ``fn(*tiles, *consts) -> (th, W, out_channels)`` — plain jnp code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h: int, per_row_bytes: int, budget: int = 8 * 1024 * 1024, max_th: int = 24) -> int:
    """Rows per tile. Capped small: Mosaic compile cost grows super-linearly
    with the per-kernel matmul M extent (th·W rows), and tiles beyond ~20k
    rows blow up the remote compile helper."""
    limit = max(8, min(max_th, budget // max(1, per_row_bytes)))
    best = 0
    for cand in range(8, min(h, limit) + 1, 8):
        if h % cand == 0:
            best = cand
    if best:
        return best
    for cand in range(min(h, limit), 0, -1):
        if h % cand == 0:
            return cand
    return h


def tile_map(fn, tensors, consts, out_channels: int, *, out_dtype=None, th: int | None = None):
    """Apply ``fn`` over row tiles of ``tensors`` with ``consts`` in VMEM."""
    h, w = tensors[0].shape[0], tensors[0].shape[1]
    out_dtype = out_dtype or tensors[0].dtype
    per_row = sum(t.shape[-1] * t.dtype.itemsize for t in tensors) * w
    per_row += out_channels * w * 4  # epilogue accumulator headroom
    th = th or _pick_th(h, per_row)
    n_t = len(tensors)

    def kernel(*refs):
        tensor_refs = refs[:n_t]
        const_refs = refs[n_t:-1]
        out_ref = refs[-1]
        tiles = [r[:] for r in tensor_refs]
        cs = [r[:] for r in const_refs]
        out_ref[:] = fn(*tiles, *cs).astype(out_ref.dtype)

    in_specs = [
        pl.BlockSpec((th, w, t.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for t in tensors
    ]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w, out_channels), out_dtype),
        grid=(h // th,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((th, w, out_channels), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*tensors, *consts)


# ---------------------------------------------------------------------------
# Chain builders used by the s2d forward
# ---------------------------------------------------------------------------


def _mix(tile, w, b=None):
    """Per-pixel channel mix: (th,W,Ci) @ (Ci,Co) on the MXU."""
    th, wd, ci = tile.shape
    y = jnp.dot(
        tile.reshape(th * wd, ci).astype(jnp.float32),
        w.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.reshape(th, wd, w.shape[-1])


def fused_sft(x, cond, w_sc0, b_sc0, w_sc1, b_sc1, w_sh0, b_sh0, w_sh1, b_sh1):
    """Whole SFTLayer in one kernel: scale/shift 1×1 stacks + modulate."""

    def fn(x_t, c_t, wsc0, bsc0, wsc1, bsc1, wsh0, bsh0, wsh1, bsh1):
        h = _mix(c_t, wsc0, bsc0)
        h = jnp.where(h >= 0, h, h * 0.1)
        scale = _mix(h, wsc1, bsc1)
        g = _mix(c_t, wsh0, bsh0)
        g = jnp.where(g >= 0, g, g * 0.1)
        shift = _mix(g, wsh1, bsh1)
        return x_t.astype(jnp.float32) * (scale + 1.0) + shift

    return tile_map(
        fn,
        [x, cond],
        [w_sc0, b_sc0, w_sc1, b_sc1, w_sh0, b_sh0, w_sh1, b_sh1],
        out_channels=w_sc1.shape[-1],
        out_dtype=x.dtype,
    )


def fused_agcm_body(x, w1, b1, w2, b2, w3, b3, mods):
    """AGCM body (three modulated 1×1 convs) in one kernel.

    ``mods``: (6, C?) stacked [scale_first, shift_first, scale_HR, shift_HR,
    scale_last(3ch→padded), shift_last] — modulation is
    y*(scale+1)+shift (Condition_arch.py:571-584). Channel dims differ per
    stage so mods are passed as separate rows of matching width.
    """

    def fn(x_t, w1c, b1c, w2c, b2c, w3c, b3c, m_first, m_hr, m_last):
        y = _mix(x_t, w1c, b1c)
        y = y * (m_first[0] + 1.0) + m_first[1]
        y = jnp.maximum(y, 0.0)
        y = _mix(y, w2c, b2c)
        y = y * (m_hr[0] + 1.0) + m_hr[1]
        y = jnp.maximum(y, 0.0)
        y = _mix(y, w3c, b3c)
        return y * (m_last[0] + 1.0) + m_last[1]

    m_first, m_hr, m_last = mods
    return tile_map(
        fn,
        [x],
        [w1, b1, w2, b2, w3, b3, m_first, m_hr, m_last],
        out_channels=w3.shape[-1],
        out_dtype=x.dtype,
    )


def fused_pointwise_chain(x, steps):
    """Chain of (w, b, act) 1×1 stages; act ∈ {None, 'relu', 'lrelu'}."""
    consts = []
    acts = []
    for w, b, act in steps:
        consts.extend([w, b])
        acts.append(act)
    n = len(steps)

    def fn(x_t, *cs):
        y = x_t.astype(jnp.float32)
        for i in range(n):
            y = _mix(y, cs[2 * i], cs[2 * i + 1])
            if acts[i] == "relu":
                y = jnp.maximum(y, 0.0)
            elif acts[i] == "lrelu":
                y = jnp.where(y >= 0, y, y * 0.1)
        return y

    return tile_map(fn, [x], consts, out_channels=steps[-1][0].shape[-1], out_dtype=x.dtype)
