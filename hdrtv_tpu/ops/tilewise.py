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
    """Rows per tile: the largest divisor of h within the cap.

    Only the last two block dims carry TPU tiling constraints; the row dim is
    free. Capped small: Mosaic compile cost grows super-linearly with the
    per-kernel matmul M extent (th·W rows)."""
    limit = max(1, min(max_th, budget // max(1, per_row_bytes)))
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


def pack_bd(w_small: jax.Array, pack: int) -> jax.Array:
    """Block-diagonal packing: (Ci,Co) → (pack·Ci, pack·Co).

    The s2d 1×1 convs are 4-way block-diagonal with *shared* weights (the
    four sub-positions apply the same channel mix). Executing the full 4-way
    block-diag densely wastes 4× MACs; executing per-group leaves the MXU
    half-empty (K=Ci≤64). Packing `pack` groups per matmul fills the 128-wide
    contraction at only `4/pack`× redundancy — e.g. Ci=64 → pack 2 → K=128
    at 2× instead of 4×.
    """
    import numpy as _np

    ci, co = w_small.shape
    eye = jnp.asarray(_np.eye(pack, dtype=_np.float32))
    return jnp.kron(eye, w_small.astype(jnp.float32))


def best_pack(ci: int) -> int:
    """Largest pack p ∈ {1,2,4} with p·Ci ≤ 128 (p divides the 4 groups)."""
    for p in (4, 2, 1):
        if p * ci <= 128:
            return p
    return 1


def _mix_bd(tile, w_bd, b_bd):
    """Packed block-diag channel mix over an s2d tile (th, W, 4·Ci).

    Mosaic can't reshape rows↔lanes, so replication over the unpacked groups
    runs as lane-sliced matmuls: (th·W, k)@(k, k') per group-pair, concat on
    lanes. k = pack·Ci fills the MXU contraction.
    """
    th, wd, ctot = tile.shape
    k = w_bd.shape[0]
    nrep = ctot // k
    flat = tile.reshape(th * wd, ctot).astype(jnp.float32)
    outs = []
    for r in range(nrep):
        y = jnp.dot(
            flat[:, r * k : (r + 1) * k],
            w_bd.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        outs.append(y + b_bd.astype(jnp.float32))
    y = outs[0] if nrep == 1 else jnp.concatenate(outs, axis=-1)
    return y.reshape(th, wd, nrep * w_bd.shape[-1])


def _prep_bd(w_small: jax.Array, b_small: jax.Array):
    """(w_small (Ci,Co), b_small (Co,)) → packed (w_bd, b_bd)."""
    pack = best_pack(w_small.shape[0])
    return pack_bd(w_small, pack), jnp.tile(b_small.astype(jnp.float32), pack)


def fused_sft(x, cond, w_sc0, b_sc0, w_sc1, b_sc1, w_sh0, b_sh0, w_sh1, b_sh1):
    """Whole SFTLayer in one kernel: scale/shift 1×1 stacks + modulate.

    Weights are the *original* small (Ci,Co) 1×1 kernels; packing happens
    here (pack_bd) so the in-kernel matmuls run at full MXU contraction.
    """
    consts = []
    for w, b in ((w_sc0, b_sc0), (w_sc1, b_sc1), (w_sh0, b_sh0), (w_sh1, b_sh1)):
        consts.extend(_prep_bd(w, b))

    def fn(x_t, c_t, wsc0, bsc0, wsc1, bsc1, wsh0, bsh0, wsh1, bsh1):
        h = _mix_bd(c_t, wsc0, bsc0)
        h = jnp.where(h >= 0, h, h * 0.1)
        scale = _mix_bd(h, wsc1, bsc1)
        g = _mix_bd(c_t, wsh0, bsh0)
        g = jnp.where(g >= 0, g, g * 0.1)
        shift = _mix_bd(g, wsh1, bsh1)
        return x_t.astype(jnp.float32) * (scale + 1.0) + shift

    return tile_map(
        fn, [x, cond], consts, out_channels=4 * w_sc1.shape[-1], out_dtype=x.dtype
    )


def fused_agcm_body(x, w1, b1, w2, b2, w3, b3, mods):
    """AGCM body (three modulated 1×1 convs) in one kernel.

    ``w*``/``b*`` are the original small 1×1 kernels; ``mods`` are stacked
    (2, 4·C) [scale; shift] rows — modulation is y·(scale+1)+shift
    (Condition_arch.py:571-584).
    """
    consts = []
    for w, b in ((w1, b1), (w2, b2), (w3, b3)):
        consts.extend(_prep_bd(w, b))

    def fn(x_t, w1c, b1c, w2c, b2c, w3c, b3c, m_first, m_hr, m_last):
        y = _mix_bd(x_t, w1c, b1c)
        y = y * (m_first[0] + 1.0) + m_first[1]
        y = jnp.maximum(y, 0.0)
        y = _mix_bd(y, w2c, b2c)
        y = y * (m_hr[0] + 1.0) + m_hr[1]
        y = jnp.maximum(y, 0.0)
        y = _mix_bd(y, w3c, b3c)
        return y * (m_last[0] + 1.0) + m_last[1]

    m_first, m_hr, m_last = mods
    return tile_map(
        fn,
        [x],
        consts + [m_first, m_hr, m_last],
        out_channels=4 * w3.shape[-1],
        out_dtype=x.dtype,
    )


def fused_pointwise_chain(x, steps):
    """Chain of (w_small, b_small, act) 1×1 stages; act ∈ {None,'relu','lrelu'}."""
    consts = []
    acts = []
    for w, b, act in steps:
        consts.extend(_prep_bd(w, b))
        acts.append(act)
    n = len(steps)

    def fn(x_t, *cs):
        y = x_t.astype(jnp.float32)
        for i in range(n):
            y = _mix_bd(y, cs[2 * i], cs[2 * i + 1])
            if acts[i] == "relu":
                y = jnp.maximum(y, 0.0)
            elif acts[i] == "lrelu":
                y = jnp.where(y >= 0, y, y * 0.1)
        return y

    return tile_map(fn, [x], consts, out_channels=4 * steps[-1][0].shape[-1], out_dtype=x.dtype)
