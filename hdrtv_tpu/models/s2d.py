"""Space-to-depth execution mode — the TPU performance core.

The HDRTVNet++ LE UNet runs at nf=32 channels; on TPU, 32-channel NHWC
tensors waste 3/4 of every 128-lane vector register and the MXU contraction,
and measured conv throughput at 1080p is ~8× below the same FLOPs expressed
at 128 channels. This module runs the *entire ensemble in the s2d(2) domain*:
every activation is stored as (H/2, W/2, 4C) blocks (block-major channel
order), so the working channel count is 128 — full lanes — and spatial dims
halve.

The transform is **exact**: weights are rewritten at load time so the block-
domain convolutions compute the same math as the reference layers:

- stride-1 3×3  → 3×3 'same' block conv over the plain s2d tensor whose
  (4C,4C') kernel encodes the sub-position routing (9 of 36 slots nonzero;
  stored dense — measured faster than materializing a shifted neighborhood);
- stride-2 3×3  → 3×3 stride-2 block conv with (1,0) padding (output lands
  in the next level's s2d layout) or 2×2 stride-1 (1,0)-padded block conv
  for a natural-layout output (the /8 level, whose odd dims stay normal);
- 1×1           → block-diagonal (1,1,4C,4C');
- conv+PixelShuffle up-sampling → the same conv with its output channels
  permuted — in the s2d domain pixel-shuffle is free (a reshape), the
  classic TPU result that depth-to-space commutes with convolution.

Golden tests assert s2d mode ≡ normal mode to float tolerance.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hdrtv_tpu.models.agcm import classifier_apply
from hdrtv_tpu.models.hdrtvnet import ModelConfig
from hdrtv_tpu.models.layers import F32, Params, Policy, leaky_relu, relu
from hdrtv_tpu.parallel import halo as _halo

# ---------------------------------------------------------------------------
# Data movement: s2d / d2s / pad-shifted neighborhoods (block-major channels)
# ---------------------------------------------------------------------------


def s2d(x: jax.Array) -> jax.Array:
    """(N,H,W,C) → (N,H/2,W/2,4C); channel index = (a*2+b)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # N, Hb, Wb, a, b, C
    return x.reshape(n, h // 2, w // 2, 4 * c)


def d2s(x: jax.Array) -> jax.Array:
    """Inverse of :func:`s2d`."""
    n, hb, wb, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, hb, wb, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hb * 2, wb * 2, c)




# ---------------------------------------------------------------------------
# Weight transforms (host numpy, applied once at load)
# ---------------------------------------------------------------------------


def _blk(ci: int, i: int) -> slice:
    return slice(i * ci, (i + 1) * ci)


def w_s2d_s1(w: np.ndarray) -> np.ndarray:
    """(3,3,Ci,Co) stride-1 'same' → (3,3,4Ci,4Co) 'same' over plain s2d.

    Block tap δ with input sub-position a maps to natural offset
    di = 2δ + a_in − a_out; only |di| ≤ 1 slots are populated.
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for dI in (-1, 0, 1):
        for dJ in (-1, 0, 1):
            for ai in range(2):
                for bi in range(2):
                    for ao in range(2):
                        for bo in range(2):
                            di = 2 * dI + ai - ao
                            dj = 2 * dJ + bi - bo
                            if -1 <= di <= 1 and -1 <= dj <= 1:
                                out[dI + 1, dJ + 1, _blk(ci, ai * 2 + bi), _blk(co, ao * 2 + bo)] = w[di + 1, dj + 1]
    return out


def w_s2d_s2(w: np.ndarray) -> np.ndarray:
    """(3,3,Ci,Co) stride-2 'same' → (3,3,4Ci,4Co), stride-2 with (1,0) pad
    over plain s2d; output lands in the next level's s2d layout.

    di = 2δ + a_in − 2·a_out.
    """
    kh, kw, ci, co = w.shape
    out = np.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for dI in (-1, 0, 1):
        for dJ in (-1, 0, 1):
            for ai in range(2):
                for bi in range(2):
                    for ao in range(2):
                        for bo in range(2):
                            di = 2 * dI + ai - 2 * ao
                            dj = 2 * dJ + bi - 2 * bo
                            if -1 <= di <= 1 and -1 <= dj <= 1:
                                out[dI + 1, dJ + 1, _blk(ci, ai * 2 + bi), _blk(co, ao * 2 + bo)] = w[di + 1, dj + 1]
    return out


def w_s2d_s2_nat(w: np.ndarray) -> np.ndarray:
    """(3,3,Ci,Co) stride-2 'same' → (2,2,4Ci,Co) stride-1 with (1,0) pad
    over plain s2d; output in the natural layout of the next level.

    di = 2δ + a_in, δ ∈ {−1, 0}.
    """
    kh, kw, ci, co = w.shape
    out = np.zeros((2, 2, 4 * ci, co), w.dtype)
    for dI in (-1, 0):
        for dJ in (-1, 0):
            for ai in range(2):
                for bi in range(2):
                    di = 2 * dI + ai
                    dj = 2 * dJ + bi
                    if -1 <= di <= 1 and -1 <= dj <= 1:
                        out[dI + 1, dJ + 1, _blk(ci, ai * 2 + bi), :] = w[di + 1, dj + 1]
    return out


def w_s2d_1x1(w: np.ndarray) -> np.ndarray:
    """(1,1,Ci,Co) → (1,1,4Ci,4Co) block-diagonal."""
    _, _, ci, co = w.shape
    out = np.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for s in range(4):
        out[0, 0, _blk(ci, s), _blk(co, s)] = w[0, 0]
    return out


def b_s2d(b: np.ndarray) -> np.ndarray:
    """Bias tiled over the 4 sub-positions (block-major)."""
    return np.tile(b, 4)


def w_ps_permute(w: np.ndarray, r: int = 2) -> np.ndarray:
    """Fold PixelShuffle(r) + s2d into the conv's output channels.

    Output channel c*r² + i*r + j (torch PS order) → (i*2+j)*C + c
    (block-major s2d order). After this permutation the conv output *is* the
    next level's s2d tensor.
    """
    kh, kw, ci, co4 = w.shape
    c = co4 // (r * r)
    perm = np.empty(co4, np.int64)
    for cc in range(c):
        for i in range(r):
            for j in range(r):
                perm[(i * 2 + j) * c + cc] = cc * r * r + i * r + j
    return w[..., perm]


def w_s2d_s1_ps(w: np.ndarray) -> np.ndarray:
    """Stride-1 conv whose (4C) output feeds PixelShuffle: s2d-transform the
    conv, then fold PS ordering so the runtime d2s over sub-positions yields
    the next (finer) level's s2d tensor directly.

    Output channel layout after transform: (a*2+b)*4C + (i*2+j)*C + c, i.e.
    sub-position major then PS offset then channel — d2s over the outer 4
    doubles the block grid; the inner (i*2+j)*C+c is already s2d order.
    """
    t = w_s2d_s1(w)  # (3,3,4Ci, 4*(4C))
    kh, kw, ci4, co4 = t.shape
    co = co4 // 4  # = 4C (the PS channels per sub-position)
    out = np.empty_like(t)
    for s in range(4):
        out[..., _blk(co, s)] = w_ps_permute(t[..., _blk(co, s)])
    return out


def d2s_blocks(x: jax.Array) -> jax.Array:
    """d2s over the *outer* sub-position factor: (N,Hb,Wb,4K) → (N,2Hb,2Wb,K).

    Used after the PS-folded up-convs: the inner K channels are already in
    s2d order for the finer level.
    """
    return d2s(x)


# ---------------------------------------------------------------------------
# Parameter transform
# ---------------------------------------------------------------------------

# Per-layer transform roles for the release architecture (AGCM color_condition
# + LE sft UNet). Classifier weights pass through untouched (natural ¼-res).
_S1 = "s1"
_S2 = "s2"  # stride-2, s2d output
_S2N = "s2nat"  # stride-2, natural output
_P11 = "1x1"
_NAT = "nat"
_PSL = "ps"  # stride-1 conv feeding PixelShuffle (s2d domain)
_NATPS = "natps"  # natural conv feeding PixelShuffle whose output enters s2d


def _le_layer_roles(prefix: str = "LE.") -> dict[str, str]:
    r: dict[str, str] = {}
    r[f"{prefix}conv_first"] = _S1
    r[f"{prefix}HR_conv1"] = _S1
    r[f"{prefix}HR_conv2"] = _S1
    r[f"{prefix}conv_last"] = _S1
    for sft in ("SFT_layer1", "SFT_layer2"):
        for cv in ("SFT_scale_conv0", "SFT_scale_conv1", "SFT_shift_conv0", "SFT_shift_conv1"):
            r[f"{prefix}{sft}.{cv}"] = _P11
    r[f"{prefix}cond_first.0"] = _S1
    r[f"{prefix}cond_first.2"] = _P11
    r[f"{prefix}cond_first.4"] = _P11
    for i in (0, 2, 4):
        r[f"{prefix}CondNet1.{i}"] = _P11
    r[f"{prefix}CondNet2.0"] = _S2
    r[f"{prefix}CondNet2.2"] = _P11
    r[f"{prefix}CondNet2.4"] = _P11
    r[f"{prefix}CondNet3.0"] = _S2
    r[f"{prefix}CondNet3.2"] = _S2
    r[f"{prefix}CondNet3.4"] = _P11
    r[f"{prefix}CondNet4.0"] = _S2
    r[f"{prefix}CondNet4.2"] = _S2
    r[f"{prefix}CondNet4.4"] = _S2N
    r[f"{prefix}down_conv1"] = _S2
    r[f"{prefix}down_conv2"] = _S2
    r[f"{prefix}down_conv3"] = _S2N
    # trunks 1/2/4/5 live in s2d levels; trunk3 stays natural (odd /8 dims).
    for trunk in ("recon_trunk1", "recon_trunk2", "recon_trunk4", "recon_trunk5"):
        r[f"{prefix}{trunk}.0.conv1"] = _S1
        r[f"{prefix}{trunk}.0.conv2"] = _S1
        for sft in ("sft1", "sft2"):
            for cv in ("SFT_scale_conv0", "SFT_scale_conv1", "SFT_shift_conv0", "SFT_shift_conv1"):
                r[f"{prefix}{trunk}.0.{sft}.{cv}"] = _P11
    for i in range(4):
        r[f"{prefix}recon_trunk3.{i}.conv1"] = _NAT
        r[f"{prefix}recon_trunk3.{i}.conv2"] = _NAT
        for sft in ("sft1", "sft2"):
            for cv in ("SFT_scale_conv0", "SFT_scale_conv1", "SFT_shift_conv0", "SFT_shift_conv1"):
                r[f"{prefix}recon_trunk3.{i}.{sft}.{cv}"] = _NAT
    r[f"{prefix}up_conv1.0"] = _NATPS
    r[f"{prefix}up_conv2.0"] = _PSL
    r[f"{prefix}up_conv3.0"] = _PSL
    return r


def _agcm_layer_roles(prefix: str = "AGCM.") -> dict[str, str]:
    return {
        f"{prefix}conv_first": _P11,
        f"{prefix}HRconv": _P11,
        f"{prefix}conv_last": _P11,
    }


def s2d_transform_params(params: dict, cfg: ModelConfig | None = None) -> dict:
    """Host-side weight rewrite for s2d execution (fp32; cacheable).

    Composite (HG) checkpoints arrive with ``base.``-prefixed ensemble keys
    plus ``hg.*``: the base transforms with the standard roles (prefix
    stripped — the s2d forward uses unprefixed names), the HG level-1 layers
    via :func:`hdrtv_tpu.models.hg_s2d.hg_s2d_transform`.
    """
    if any(k.startswith("base.") for k in params):
        from hdrtv_tpu.models.hg_s2d import hg_s2d_transform

        base = {k[len("base."):]: v for k, v in params.items() if k.startswith("base.")}
        rest = {k: v for k, v in params.items() if not k.startswith("base.")}
        out = s2d_transform_params(base, cfg)
        out.update(hg_s2d_transform(rest))
        return out
    roles = {**_le_layer_roles(), **_agcm_layer_roles()}
    out: dict[str, np.ndarray] = {}
    handled: set[str] = set()
    for layer, role in roles.items():
        wk, bk = f"{layer}.weight", f"{layer}.bias"
        if wk not in params:
            continue
        w = np.asarray(params[wk], np.float32)
        b = params.get(bk)
        b = None if b is None else np.asarray(b, np.float32)
        if role == _NAT:
            out[wk] = w
            if b is not None:
                out[bk] = b
        elif role == _S1:
            out[wk] = w_s2d_s1(w)
            if b is not None:
                out[bk] = b_s2d(b)
        elif role == _S2:
            out[wk] = w_s2d_s2(w)
            if b is not None:
                out[bk] = b_s2d(b)
        elif role == _S2N:
            out[wk] = w_s2d_s2_nat(w)
            if b is not None:
                out[bk] = b
        elif role == _P11:
            out[wk] = w_s2d_1x1(w)
            if b is not None:
                out[bk] = b_s2d(b)
        elif role == _NATPS:
            out[wk] = w_ps_permute(w)
            if b is not None:
                out[bk] = w_ps_permute(b.reshape(1, 1, 1, -1))[0, 0, 0]
        elif role == _PSL:
            out[wk] = w_s2d_s1_ps(w)
            if b is not None:
                bb = w_ps_permute(b.reshape(1, 1, 1, -1))[0, 0, 0]
                out[bk] = np.tile(bb, 4)
        handled.add(wk)
        handled.add(bk)
    # pass through everything else (classifier, linears, scales, ...)
    for k, v in params.items():
        if k not in handled and k not in out:
            out[k] = np.asarray(v)

    # Exact consolidations: convs sharing one input fuse into a single wider
    # conv (one pass over the input instead of N) — outputs split afterwards.
    if "LE.conv_first.weight" in out and "LE.cond_first.0.weight" in out:
        out["LE.__in_fused.weight"] = np.concatenate(
            (out["LE.conv_first.weight"], out["LE.cond_first.0.weight"]), axis=-1
        )
        out["LE.__in_fused.bias"] = np.concatenate(
            (out["LE.conv_first.bias"], out["LE.cond_first.0.bias"])
        )
    down_keys = [f"LE.CondNet{i}.0" for i in (2, 3, 4)]
    if all(f"{k}.weight" in out for k in down_keys):
        out["LE.__cond_down.weight"] = np.concatenate(
            [out[f"{k}.weight"] for k in down_keys], axis=-1
        )
        out["LE.__cond_down.bias"] = np.concatenate([out[f"{k}.bias"] for k in down_keys])
    return out


# ---------------------------------------------------------------------------
# Block-domain conv helpers
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(p: Params, name: str, x: jax.Array, *, stride=1, padding="VALID", policy: Policy) -> jax.Array:
    w = policy.cast(p[f"{name}.weight"])
    y = jax.lax.conv_general_dilated(
        policy.cast(x), w, (stride, stride), padding,
        dimension_numbers=_DN, precision=policy.precision,
        preferred_element_type=policy.compute_dtype,
    )
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + policy.cast(b)
    return y


def _use_fused_kernel(x: jax.Array, w: jax.Array) -> bool:
    """Route to the Pallas fused conv when shapes fit its constraints."""
    from hdrtv_tpu.utils.env import env_bool

    if env_bool("HDRTV_DISABLE_PALLAS", False):
        return False
    if jax.default_backend() != "tpu" and not env_bool("HDRTV_FORCE_FUSED_TRACE", False):
        # HDRTV_FORCE_FUSED_TRACE: recorder-only escape for AOT tooling that
        # TRACES (never executes) the fused path off-TPU to capture kernel
        # call shapes (tools/multichip_bringup.py record). Deliberately a
        # separate flag from HDRTV_MEGAKERNEL_INTERPRET: tests that EXECUTE
        # under that env rely on these kernels staying lax (interpret-mode
        # Pallas under multi-device shard_map deadlocks in jax — PERF_NOTES
        # round 4).
        return False
    if x.shape[0] != 1:
        return False
    c, co = w.shape[2], w.shape[3]
    # 128-multiples only: narrow-channel variants were measured neutral-to-
    # worse on v5e across rounds 1-2 (PERF_NOTES) and their opt-in flag was
    # removed in round 3 — the megakernels own the narrow L0 sections now.
    return c % 128 == 0 and co % 128 == 0 and x.shape[2] % 8 == 0


def conv_s1(p, name, x, *, policy, relu_fused: bool = False, skip: jax.Array | None = None):
    """Stride-1 3×3 in block domain: 3×3 'same' over plain s2d.

    On TPU, 128-channel-multiple layers run the Pallas fused kernel
    (ops/conv_kernels.py) with bias/ReLU/residual-skip folded in; everything
    else takes the lax path and applies the epilogue separately.
    """
    if _halo.active():
        return _halo.run_stage(
            lambda xx, sk: conv_s1(p, name, xx, policy=policy, relu_fused=relu_fused, skip=sk),
            [x, skip], [2, 2], need=1, mod=8, out_axis=2,
        )
    w = p[f"{name}.weight"]
    if _use_fused_kernel(x, w):
        from hdrtv_tpu.ops.conv_kernels import fused_block_conv3

        # Every conv_s1 weight comes from a w_s2d_s1(/PS-fold) transform
        # (role table above), so the kernel may skip the structural zero
        # row-taps; __in_fused concatenates two transformed blocks.
        # Native int8 attaches where calibration exists (the PS up-convs are
        # the big stride-1 wins: .18/.19 in the round-3 trace, 1.59 ms each
        # float — the int8 MXU path engages on these clean stride-1 dots).
        y = fused_block_conv3(
            policy.cast(x[0]),
            policy.cast(w),
            p[f"{name}.bias"],
            relu=relu_fused,
            skip=None if skip is None else policy.cast(skip[0]),
            a_sub=2 if name.endswith("__in_fused") else 1,
            qargs=_qargs_for(p, name),
        )[None]
        return y
    y = _conv(p, name, x, padding=[(1, 1), (1, 1)], policy=policy)
    if skip is not None:
        y = y + policy.cast(skip)
    if relu_fused:
        y = relu(y)
    return y


def conv_s2(p, name, x, *, policy, relu_fused: bool = False, act: str | None = None, a_sub: int = 1, cin: int | None = None, ch0: int = 0):
    """Stride-2 3×3, s2d output: 3×3 stride-2, (1,0) pad over plain s2d.

    On TPU this routes to the fused_down2 Pallas kernel (ops/megakernel.py)
    with the activation folded in — XLA's stride-2 conv on the dense-s2d
    weights was the single worst op in the round-1 device profile.

    ``cin``/``ch0``: consume the ``[ch0:ch0+cin]`` channel window of a
    wider ``x`` — the fused kernel reads the window via its BlockSpecs
    (no HBM slice); the lax/halo fallbacks slice explicitly.
    """
    from hdrtv_tpu.utils.env import env_bool

    if relu_fused:
        act = "relu"
    if _halo.active():
        if cin is not None:
            x = x[..., ch0 : ch0 + cin]  # shard_map path keeps the slice
        # mod 16: the extended width must keep fused_down2's (wb/2) % 8.
        return _halo.run_stage(
            lambda xx: conv_s2(p, name, xx, policy=policy, act=act, a_sub=a_sub),
            [x], [2], need=2, mod=16, out_axis=2, out_stride=2,
        )
    w = p[f"{name}.weight"]
    hb, wb = x.shape[1], x.shape[2]
    if (
        env_bool("HDRTV_DOWN2_KERNEL", True)
        and _use_fused_kernel(x, w)
        and hb % 2 == 0
        and wb % 2 == 0
        and (wb // 2) % 8 == 0
    ):
        from hdrtv_tpu.ops.megakernel import fused_down2, pick_rows

        if pick_rows(hb // 2, limit=8) <= 16:
            # Stride-2 int8 is the documented W8-only fallback class: every
            # measured form runs SLOWER than bf16 on v5e (round-3 traces —
            # down_conv1 0.97 vs 0.52 ms; down2/3 0.36 vs 0.26 ms; the
            # consolidated cond-down 3.57 vs 2.09 ms even with per-branch
            # VMEM quantization). The sublane-shifted stride-2 operand views
            # miss the packed int8 MXU path, so the quantize VPU cost is pure
            # overhead. HDRTV_INT8_DOWN2=1 re-enables for kernel validation.
            qa = _qargs_for(p, name) if env_bool("HDRTV_INT8_DOWN2", False) else None
            if qa is not None and w.shape[-1] // (2 * a_sub) < 128:
                qa = None
            return fused_down2(
                policy.cast(x[0]), policy.cast(w), p[f"{name}.bias"], act=act,
                qargs=qa, a_sub=a_sub, cin=cin, ch0=ch0,
            )[None]
    if cin is not None:
        x = x[..., ch0 : ch0 + cin]
    y = _conv(p, name, x, stride=2, padding=[(1, 0), (1, 0)], policy=policy)
    if act == "relu":
        return relu(y)
    if act == "lrelu":
        return leaky_relu(y, 0.1)
    return y


def conv_s2_nat(p, name, x, *, policy):
    """Stride-2 3×3, natural output: 2×2 stride-1, (1,0) pad over plain s2d."""
    if _halo.active():
        return _halo.run_stage(
            lambda xx: conv_s2_nat(p, name, xx, policy=policy),
            [x], [2], need=1, mod=2, out_axis=2,
        )
    return _conv(p, name, x, padding=[(1, 0), (1, 0)], policy=policy)


def conv_1x1(p, name, x, *, policy):
    return _conv(p, name, x, policy=policy)


def conv_nat(p, name, x, *, pad=1, policy):
    if pad > 0 and _halo.active():
        return _halo.run_stage(
            lambda xx: conv_nat(p, name, xx, pad=pad, policy=policy),
            [x], [2], need=pad, mod=2, out_axis=2,
        )
    return _conv(p, name, x, padding=[(pad, pad), (pad, pad)], policy=policy)


# ---------------------------------------------------------------------------
# Forward (release arch: AGCM color_condition + LE sft, no HG)
# ---------------------------------------------------------------------------


def _w11(p, name, policy):
    return policy.cast(p[f"{name}.weight"][0, 0]), policy.cast(p[f"{name}.bias"])


def _sft(p, name, fea, cond, conv, *, policy):
    scale = conv(p, f"{name}.SFT_scale_conv1", leaky_relu(conv(p, f"{name}.SFT_scale_conv0", cond, policy=policy), 0.1), policy=policy)
    shift = conv(p, f"{name}.SFT_shift_conv1", leaky_relu(conv(p, f"{name}.SFT_shift_conv0", cond, policy=policy), 0.1), policy=policy)
    return fea * (scale + 1.0) + shift


def _sft4_bd(p, sft_name):
    """The four SFT 1×1s as s2d block-diag dense (C,C') matrices + biases."""
    return [
        (p[f"{sft_name}.{cv}.weight"][0, 0], p[f"{sft_name}.{cv}.bias"])
        for cv in ("SFT_scale_conv0", "SFT_scale_conv1", "SFT_shift_conv0", "SFT_shift_conv1")
    ]


def _sft_conv_ok(p, conv_name, x, cond, *, policy) -> bool:
    from hdrtv_tpu.utils.env import env_bool

    return (
        policy.compute_dtype == jnp.bfloat16
        and env_bool("HDRTV_SFT_CONV", True)
        and _use_fused_kernel(x, p[f"{conv_name}.weight"])
        and cond.shape[-1] % 8 == 0
    )


def _sft_conv(p, sft_name, conv_name, x, cond, *, policy, relu_fused=False, skip=None):
    """SFT + 3×3 conv, fused into one Pallas pass when eligible
    (ops/megakernel.py fused_sft_conv3_v2); SFT-then-conv otherwise."""
    if _halo.active():
        # One exchange covers the whole fused stage (SFT is pointwise).
        return _halo.run_stage(
            lambda xx, cc, sk: _sft_conv(
                p, sft_name, conv_name, xx, cc, policy=policy, relu_fused=relu_fused, skip=sk
            ),
            [x, cond, skip], [2, 2, 2], need=1, mod=8, out_axis=2,
        )
    if _sft_conv_ok(p, conv_name, x, cond, policy=policy):
        from hdrtv_tpu.ops.megakernel import fused_sft_conv3_v2

        return fused_sft_conv3_v2(
            policy.cast(x[0]),
            policy.cast(cond[0]),
            _sft4_bd(p, sft_name),
            policy.cast(p[f"{conv_name}.weight"]),
            p[f"{conv_name}.bias"],
            relu=relu_fused,
            skip=None if skip is None else policy.cast(skip[0]),
            qargs=_qargs_for(p, conv_name),
        )[None]
    out = _sft(p, sft_name, x, cond, conv_1x1, policy=policy)
    return conv_s1(p, conv_name, out, policy=policy, relu_fused=relu_fused, skip=skip)


def _resblock(p, name, fea, cond, conv3, conv1, *, policy, up_coarse=None, x_add=None):
    """``up_coarse``/``x_add``: optional second block input (the up-path
    skip), added to ``fea`` — fused into the resblock kernel when eligible
    (with the d2s un-fold for the coarse form), materialized otherwise."""
    if _halo.active():
        # Two convs per resblock → radius 2; up_coarse rides at r/2 (half-res
        # window stays start-aligned with the fine window, incl. at edges).
        return _halo.run_stage(
            lambda f, c, uc, xa: _resblock(
                p, name, f, c, conv3, conv1, policy=policy, up_coarse=uc, x_add=xa
            ),
            [fea, cond, up_coarse, x_add], [2, 2, 2, 2],
            need=2, mod=8, out_axis=2, coarse_idx=(2,),
        )
    if conv3 is conv_s1:
        if _sft_conv_ok(p, f"{name}.conv1", fea, cond, policy=policy):
            from hdrtv_tpu.ops.megakernel import fused_resblock, pick_rows_even

            coarse_ok = up_coarse is None or (
                fea.shape[1] % 2 == 0
                and fea.shape[2] % 2 == 0
                and up_coarse.shape[1:] == (fea.shape[1] // 2, fea.shape[2] // 2, 4 * fea.shape[3])
            )
            if pick_rows_even(fea.shape[1]) >= 4 and coarse_ok:
                q1 = _qargs_for(p, f"{name}.conv1")
                q2 = _qargs_for(p, f"{name}.conv2")
                both = q1 is not None and q2 is not None
                return fused_resblock(
                    policy.cast(fea[0]), policy.cast(cond[0]),
                    _sft4_bd(p, f"{name}.sft1"),
                    policy.cast(p[f"{name}.conv1.weight"]), p[f"{name}.conv1.bias"],
                    _sft4_bd(p, f"{name}.sft2"),
                    policy.cast(p[f"{name}.conv2.weight"]), p[f"{name}.conv2.bias"],
                    qargs1=q1 if both else None,
                    qargs2=q2 if both else None,
                    up_coarse=None if up_coarse is None else policy.cast(up_coarse[0]),
                    x_add=None if x_add is None else policy.cast(x_add[0]),
                )[None]
        fea = _materialize_up(fea, up_coarse, x_add, policy=policy)
        up_coarse = x_add = None
        out = _sft_conv(p, f"{name}.sft1", f"{name}.conv1", fea, cond, policy=policy, relu_fused=True)
        # conv2 + residual add fused into the same pass
        return _sft_conv(p, f"{name}.sft2", f"{name}.conv2", out, cond, policy=policy, skip=fea)
    fea = _materialize_up(fea, up_coarse, x_add, policy=policy)
    out = _sft(p, f"{name}.sft1", fea, cond, conv1, policy=policy)
    out = conv3(p, f"{name}.conv1", out, policy=policy, relu_fused=True)
    out = _sft(p, f"{name}.sft2", out, cond, conv1, policy=policy)
    return conv3(p, f"{name}.conv2", out, policy=policy, skip=fea)


def _trunk3_up_fused(p, fea3, cond4, *, policy):
    """Whole trunk3 stage + up_conv1 as one Pallas pass (fused_trunk3) when
    eligible; None → caller runs the lax fallback. The narrow (32/16-lane)
    L3 tensors are exactly where XLA's lane padding hurts most (nine
    0.106 ms convs at 1080p, round-3 trace) and small enough that the whole
    stage streams through VMEM."""
    from hdrtv_tpu.utils.env import env_bool

    if env_bool("HDRTV_DISABLE_PALLAS", False) or not env_bool("HDRTV_TRUNK3_KERNEL", True):
        return None
    if jax.default_backend() != "tpu" and not env_bool("HDRTV_MEGAKERNEL_INTERPRET", False):
        return None
    if _halo.active():
        # 4 resblocks (8 convs) + up_conv1 → radius 9 in the natural /8
        # domain. Small-mesh shards narrower than 2r take run_stage's
        # gather-replicate-slice path (the L3 tensor is tiny). Flag/backend
        # ineligibility returns None ABOVE this hook so an unused stage
        # never emits its halo exchange into the traced graph.
        return _halo.run_stage(
            lambda f, c: _trunk3_up_fused(p, f, c, policy=policy),
            [fea3, cond4], [2, 2], need=9, mod=8, out_axis=2,
        )
    if fea3.shape[0] != 1 or fea3.shape[2] % 8 != 0:
        return None
    hb3 = fea3.shape[1]
    if not any(hb3 % cand == 0 for cand in range(min(hb3, 32), 8, -1)):
        return None
    if "LE.recon_trunk3.0.conv1.weight" not in p or "LE.up_conv1.0.weight" not in p:
        return None
    from hdrtv_tpu.ops.megakernel import fused_trunk3

    blocks = []
    for i in range(4):
        name = f"LE.recon_trunk3.{i}"
        if f"{name}.conv1.weight" not in p:
            return None
        blocks.append((
            _sft4_bd(p, f"{name}.sft1"),
            policy.cast(p[f"{name}.conv1.weight"]), p[f"{name}.conv1.bias"],
            _sft4_bd(p, f"{name}.sft2"),
            policy.cast(p[f"{name}.conv2.weight"]), p[f"{name}.conv2.bias"],
        ))
    return fused_trunk3(
        policy.cast(fea3[0]), policy.cast(cond4[0]), blocks,
        policy.cast(p["LE.up_conv1.0.weight"]), p["LE.up_conv1.0.bias"],
    )[None]


def _materialize_up(fea, up_coarse, x_add, *, policy):
    """Fallback form of the fused up-skip add (lax path / ineligible tiles)."""
    if up_coarse is not None:
        return d2s_blocks(up_coarse) + fea
    if x_add is not None:
        return x_add + fea
    return fea


def _tile4(v: jax.Array) -> jax.Array:
    """(N,C) modulation vector → (N,1,1,4C) for block-major s2d tensors."""
    n, c = v.shape
    return jnp.tile(v, (1, 4)).reshape(n, 1, 1, 4 * c)


def agcm_s2d(p: Params, xs: jax.Array, cond_nat: jax.Array, *, policy: Policy) -> jax.Array:
    """AGCM (dynamic color_condition) on an s2d frame; classifier runs on the
    natural ¼-res condition image."""
    fea = classifier_apply(p, "AGCM.classifier.", "color_condition", cond_nat, policy=policy)

    def lin(name):
        w = policy.cast(p[f"{name}.weight"])
        return jnp.dot(policy.cast(fea), w, precision=policy.precision,
                       preferred_element_type=policy.compute_dtype) + policy.cast(p[f"{name}.bias"])

    def mod(out, scale, shift):
        return out * _tile4(scale) + _tile4(shift) + out

    out = conv_1x1(p, "AGCM.conv_first", xs, policy=policy)
    out = relu(mod(out, lin("AGCM.cond_scale_first"), lin("AGCM.cond_shift_first")))
    out = conv_1x1(p, "AGCM.HRconv", out, policy=policy)
    out = relu(mod(out, lin("AGCM.cond_scale_HR"), lin("AGCM.cond_shift_HR")))
    out = conv_1x1(p, "AGCM.conv_last", out, policy=policy)
    return mod(out, lin("AGCM.cond_scale_last"), lin("AGCM.cond_shift_last"))


def _le_cond_downs(p: Params, c: jax.Array, *, policy: Policy):
    """CondNet2/3/4 down chains from the shared cond feature ``c``.

    With the consolidated LE.__cond_down conv, the three branch inputs are
    channel WINDOWS of its (…, 3·nch) output: consumers read their window
    through fused-kernel BlockSpecs (cin/ch0) instead of materialized
    slices — the XLA slice fusion cost ~0.6 ms/frame at 1080p (round-5
    profile). The lax/halo fallbacks inside each consumer still slice.
    """
    def mix_chain(x, steps, *, cin=None, ch0=0):
        """Short 1×1 chains via the fused kernel when eligible."""
        from hdrtv_tpu.utils.env import env_bool

        w0 = p[f"{steps[0][0]}.weight"]
        if (
            policy.compute_dtype == jnp.bfloat16
            and env_bool("HDRTV_MIX_CHAIN", True)
            and _use_fused_kernel(x, w0)
        ):
            from hdrtv_tpu.ops.megakernel import fused_mix_chain

            return fused_mix_chain(
                policy.cast(x[0]),
                [(policy.cast(p[f"{n}.weight"][0, 0]), p[f"{n}.bias"], act) for n, act in steps],
                cin=cin, ch0=ch0,
            )[None]
        if cin is not None:
            x = x[..., ch0 : ch0 + cin]
        for n, act in steps:
            x = conv_1x1(p, n, x, policy=policy)
            if act == "lrelu":
                x = leaky_relu(x, 0.1)
        return x

    if "LE.__cond_down.weight" in p:
        cd = conv_s2(p, "LE.__cond_down", c, policy=policy, act="lrelu", a_sub=3)
        nch = cd.shape[-1] // 3
        cond2 = mix_chain(
            cd, [("LE.CondNet2.2", "lrelu"), ("LE.CondNet2.4", None)], cin=nch, ch0=0
        )
        c3 = conv_s2(p, "LE.CondNet3.2", cd, policy=policy, act="lrelu", cin=nch, ch0=nch)
        c4 = conv_s2(p, "LE.CondNet4.2", cd, policy=policy, act="lrelu", cin=nch, ch0=2 * nch)
    else:
        c2 = conv_s2(p, "LE.CondNet2.0", c, policy=policy, act="lrelu")
        cond2 = mix_chain(c2, [("LE.CondNet2.2", "lrelu"), ("LE.CondNet2.4", None)])
        c3 = conv_s2(p, "LE.CondNet3.0", c, policy=policy, act="lrelu")
        c3 = conv_s2(p, "LE.CondNet3.2", c3, policy=policy, act="lrelu")
        c4 = conv_s2(p, "LE.CondNet4.0", c, policy=policy, act="lrelu")
        c4 = conv_s2(p, "LE.CondNet4.2", c4, policy=policy, act="lrelu")

    cond3 = mix_chain(c3, [("LE.CondNet3.4", None)])
    cond4 = conv_s2_nat(p, "LE.CondNet4.4", c4, policy=policy)  # natural /8
    return cond2, cond3, cond4


def _le_mid(p: Params, fea0: jax.Array, cond2, cond3, cond4, *, policy: Policy) -> jax.Array:
    """Down path + bottleneck + up path, fea0 (post HR_conv1) → trunk5 out
    at L1. The L0 head/tail around this are either the plain helpers below
    (le_s2d) or the fused megakernels (ops/megakernel.py)."""
    act = relu
    if _halo.active():
        # MERGED L1→L2 exchange: down_conv1 (stride-2, 1 contaminated
        # half-col from the window-edge left pad) + trunk1 resblock (two
        # convs → ±2 at L2) under one window — crop r/2 ≥ 3 ⇒ need 6
        # (mod 16 keeps fused_down2's (wb/2) % 8 on the extended width);
        # cond2 rides in its half-res domain at r/2.
        fea1 = _halo.run_stage(
            lambda f, c: _resblock(
                p, "LE.recon_trunk1.0",
                conv_s2(p, "LE.down_conv1", f, policy=policy, relu_fused=True),
                c, conv_s1, conv_1x1, policy=policy,
            ),
            [fea0, cond2], [2, 2], need=6, mod=16, out_axis=2, out_stride=2,
            coarse_idx=(1,),
        )
    else:
        fea1 = conv_s2(p, "LE.down_conv1", fea0, policy=policy, relu_fused=True)
        fea1 = _resblock(p, "LE.recon_trunk1.0", fea1, cond2, conv_s1, conv_1x1, policy=policy)

    fea2 = conv_s2(p, "LE.down_conv2", fea1, policy=policy, relu_fused=True)
    fea2 = _resblock(p, "LE.recon_trunk2.0", fea2, cond3, conv_s1, conv_1x1, policy=policy)

    fea3 = act(conv_s2_nat(p, "LE.down_conv3", fea2, policy=policy))  # natural /8

    def conv3_nat(p_, n_, x_, *, policy, relu_fused=False, skip=None):
        y = conv_nat(p_, n_, x_, policy=policy)
        if skip is not None:
            y = y + policy.cast(skip)
        return relu(y) if relu_fused else y

    def conv1_nat(p_, n_, x_, *, policy):
        return conv_nat(p_, n_, x_, pad=0, policy=policy)

    up = _trunk3_up_fused(p, fea3, cond4, policy=policy)
    if up is None:
        out = fea3
        for i in range(4):
            out = _resblock(p, f"LE.recon_trunk3.{i}", out, cond4, conv3_nat, conv1_nat, policy=policy)
        out = out + fea3
        # up_conv1: natural conv + PS fold → s2d L2 tensor directly. The
        # up+fea2 skip add fuses into the trunk4 resblock kernel (x_add).
        up = act(conv_nat(p, "LE.up_conv1.0", out, policy=policy))
    out = _resblock(p, "LE.recon_trunk4.0", fea2, cond3, conv_s1, conv_1x1, policy=policy, x_add=up)

    # up_conv2: s2d conv at L2 + PS fold; the block d2s + skip add fuse into
    # the trunk5 resblock kernel (up_coarse — the d2s transpose and the add
    # pass never touch HBM; ReLU already fused into the conv).
    if _halo.active():
        # MERGED L3→L2 exchange: up_conv2 (3×3 at L3 → 1 contaminated L3
        # col) + trunk5 resblock (±2 at L2); trunk5's d2s-unfold reads
        # up_coarse no closer than 1 L3 col from the window edge at r≥4.
        # coarse_conv=True keeps up_conv2's ext width (w_L3 + r) mod-8
        # fused-eligible — the joint pick may widen r at some widths.
        return _halo.run_stage(
            lambda o, f1, c2: _resblock(
                p, "LE.recon_trunk5.0", f1, c2, conv_s1, conv_1x1, policy=policy,
                up_coarse=conv_s1(p, "LE.up_conv2.0", o, policy=policy, relu_fused=True),
            ),
            [out, fea1, cond2], [2, 2, 2], need=4, mod=8, out_axis=2,
            coarse_idx=(0,), coarse_conv=True,
        )
    upc = conv_s1(p, "LE.up_conv2.0", out, policy=policy, relu_fused=True)
    return _resblock(p, "LE.recon_trunk5.0", fea1, cond2, conv_s1, conv_1x1, policy=policy, up_coarse=upc)


def le_s2d(p: Params, xs: jax.Array, conds: jax.Array, *, policy: Policy) -> jax.Array:
    """LE sft UNet in the block domain. ``xs``/``conds`` are s2d L0 tensors."""
    act = relu
    mask_out = xs  # weighting_network=False long skip

    # conv_first and cond_first.0 read the same tensor in the ensemble
    # (LE input = [agcm_out, agcm_out]); fuse into one pass when possible.
    fea0_pre = None
    if xs is conds and "LE.__in_fused.weight" in p:
        y = conv_s1(p, "LE.__in_fused", xs, policy=policy)
        n_first = p["LE.conv_first.bias"].shape[-1]
        fea0_pre = y[..., :n_first]
        c = leaky_relu(y[..., n_first:], 0.1)
    else:
        c = leaky_relu(conv_s1(p, "LE.cond_first.0", conds, policy=policy), 0.1)
    c = leaky_relu(conv_1x1(p, "LE.cond_first.2", c, policy=policy), 0.1)
    c = leaky_relu(conv_1x1(p, "LE.cond_first.4", c, policy=policy), 0.1)
    c1 = leaky_relu(conv_1x1(p, "LE.CondNet1.0", c, policy=policy), 0.1)
    c1 = leaky_relu(conv_1x1(p, "LE.CondNet1.2", c1, policy=policy), 0.1)
    cond1 = conv_1x1(p, "LE.CondNet1.4", c1, policy=policy)

    cond2, cond3, cond4 = _le_cond_downs(p, c, policy=policy)

    fea0 = act(fea0_pre) if fea0_pre is not None else act(conv_s1(p, "LE.conv_first", xs, policy=policy))
    fea0 = _sft_conv(p, "LE.SFT_layer1", "LE.HR_conv1", fea0, cond1, policy=policy, relu_fused=True)

    out = _le_mid(p, fea0, cond2, cond3, cond4, policy=policy)

    up = d2s_blocks(conv_s1(p, "LE.up_conv3.0", out, policy=policy, relu_fused=True))
    out = up + fea0
    out = _sft_conv(p, "LE.SFT_layer2", "LE.HR_conv2", out, cond1, policy=policy, relu_fused=True)
    out = conv_s1(p, "LE.conv_last", out, policy=policy, skip=mask_out)
    return out


def ensemble_s2d(
    p: Params, img: jax.Array, cond: jax.Array, cfg: ModelConfig = ModelConfig(), *, policy: Policy = F32,
    mega: bool = True,
) -> jax.Array:
    """Full ensemble in s2d mode: natural NHWC in → natural NHWC out.

    ``img``: (N,H,W,3) [0,1] RGB (H,W even); ``cond``: natural ¼-res image.
    ``mega=False`` forces the plain-lax s2d path — required under GSPMD
    spatial sharding (XLA cannot partition Pallas custom calls; the lax
    program partitions cleanly with automatic halo exchange).
    """
    img = policy.cast(img)
    xs = s2d(img)
    if mega and _mega_ok(p, xs.shape, policy):
        out = _ensemble_mega(p, xs[0], cond, policy=policy, pack=False)[None]
    else:
        agcm_out = agcm_s2d(p, xs, cond, policy=policy)
        out = le_s2d(p, agcm_out, agcm_out, policy=policy)
    if cfg.use_hg and "hg.conv1.0.weight" in p:
        from hdrtv_tpu.models.hg_s2d import hg_composite_s2d

        out = hg_composite_s2d(p, out, cfg, policy=policy)
    return d2s(out)


def ensemble_s2d_rgb48(
    p: Params,
    frame_u8: jax.Array,
    cond: jax.Array,
    cfg: ModelConfig = ModelConfig(),
    *,
    policy: Policy = F32,
    mega: bool = True,
) -> jax.Array:
    """uint8 RGB frame (H,W,3) → uint16 RGB48 PQ code values, fully fused.

    The RGB48 pack (clamp·65535+0.5 → u16, the reference delivery contract —
    gui_pipeline_worker_feeders.py:193-235) happens *inside* the tail
    megakernel.
    ``cond`` is the natural ¼-res condition image (f32 [0,1]).
    """
    from hdrtv_tpu.ops.pack import pack_rgb48

    h, w, _ = frame_u8.shape
    if mega and h % 2 == 0 and w % 2 == 0 and _mega_ok(p, (1, h // 2, w // 2, 12), policy):
        return ensemble_s2d_rgb48_flat(
            p, frame_u8.reshape(h, w * 3), cond, cfg, policy=policy
        ).reshape(h, w, 3)
    x = frame_u8[None].astype(jnp.float32) * (1.0 / 255.0)
    out = ensemble_s2d(p, x, cond, cfg, policy=policy, mega=mega)
    return pack_rgb48(out[0])


def ensemble_s2d_rgb48_flat(
    p: Params,
    frame2d_u8: jax.Array,
    cond: jax.Array | None = None,
    cfg: ModelConfig = ModelConfig(),
    *,
    policy: Policy = F32,
    bgr: bool = False,
) -> jax.Array:
    """Flat byte-row contract: (H, 3W) uint8 rows in → (H, 3W) uint16 out.

    This is the preferred device program boundary: a decoded frame buffer IS
    an (H, 3W) byte matrix, and the result IS the RGB48LE byte stream the
    display feeder writes (gui_pipeline_worker_feeders.py:193-235). Keeping
    3-channel-minor tensors off the jit boundary avoids XLA's lane-padding
    relayouts (measured ~4 ms/frame at 1080p). ``cond`` defaults to the
    ¼-res antialiased condition image computed from the same frame; ``bgr``
    folds the BGR→RGB flip into the head kernel's weights (free).

    s2d of an HWC frame needs no W transpose — adjacent column pairs are
    already lane-adjacent — so the s2d tensor is a row-deinterleave:
    reshape + slice + lane concat, all contiguous copies.
    """
    from hdrtv_tpu.ops.pack import pack_rgb48

    h, w3 = frame2d_u8.shape
    w = w3 // 3
    hb, wb = h // 2, w // 2
    if cond is None:
        cond = _cond_quarter_flat(frame2d_u8, bgr=bgr)
    use_hg = cfg.use_hg and "hg.conv1.0.weight" in p
    if h % 2 == 0 and w % 2 == 0 and _mega_ok(p, (1, hb, wb, 12), policy):
        # (Hb,2,Wb,6) row-pair planes — a pure bitcast of the frame rows;
        # the head kernel lane-concats the parities (s2d needs no transpose).
        xr = frame2d_u8.reshape(hb, 2, wb, 6)
        if use_hg:
            from hdrtv_tpu.models.hg_s2d import hg_composite_s2d

            base = _ensemble_mega(
                p, xr, cond, policy=policy, pack=False, scale=1.0 / 255.0, bgr=bgr
            )
            return hg_composite_s2d(p, base[None], cfg, policy=policy, pack=True)
        packed = _ensemble_mega(
            p, xr, cond, policy=policy, pack=True, scale=1.0 / 255.0, bgr=bgr
        )
        return packed.reshape(h, w3)  # (Hb,2,Wb,6) u16 ≡ flat RGB48 rows
    frame = frame2d_u8.reshape(h, w, 3)
    if bgr:
        frame = frame[..., ::-1]
    x = frame[None].astype(jnp.float32) * (1.0 / 255.0)
    out = ensemble_s2d(p, x, cond, cfg, policy=policy)
    return pack_rgb48(out[0]).reshape(h, w3)


def ensemble_s2d_rgb48_pairs(
    p: Params,
    xr_u8: jax.Array,
    cond: jax.Array | None = None,
    cfg: ModelConfig = ModelConfig(),
    *,
    policy: Policy = F32,
    bgr: bool = False,
) -> jax.Array:
    """Row-pair-plane contract: (Hb, 2, Wb, 6) u8 in → (Hb, 2, Wb, 6) u16 out.

    The SAME bytes as the (H, 3W) flat contract — host-side conversion
    between the two layouts is a free numpy view — but keeping the pair
    planes on the jit boundary removes BOTH boundary retiles the round-5
    device profile attributed (~0.8 ms u8 in + ~0.6 ms u16 out per 1080p
    frame): the head megakernel already consumes pair planes, the packed
    tail already emits them, and the cond image contracts over them
    directly (ops/resize.py downsample_quarter_aa_pairs — identical
    matrices and contraction order to the flat path).

    Mega path only by design; anything the megakernels can't take (odd
    sizes, non-bf16 policy, HG in this jit, manual sharding) falls back to
    :func:`ensemble_s2d_rgb48_flat` through in-jit reshapes — correct, just
    without the boundary win. Callers gate with their own cheap
    eligibility check (runtime/processor.py _pairs_ok) so the fallback is
    cold-path only.
    """
    hb, _, wb, _ = xr_u8.shape
    h, w3 = 2 * hb, 6 * wb
    use_hg = cfg.use_hg and "hg.conv1.0.weight" in p
    if (
        not use_hg
        and not _halo.active()
        and hb % 2 == 0
        and wb % 2 == 0
        and _mega_ok(p, (1, hb, wb, 12), policy)
    ):
        if cond is None:
            from hdrtv_tpu.ops.resize import downsample_quarter_aa_pairs

            cond = downsample_quarter_aa_pairs(xr_u8, bgr=bgr)
        return _ensemble_mega(
            p, xr_u8, cond, policy=policy, pack=True, scale=1.0 / 255.0, bgr=bgr
        )
    flat = ensemble_s2d_rgb48_flat(
        p, xr_u8.reshape(h, w3), cond, cfg, policy=policy, bgr=bgr
    )
    return flat.reshape(hb, 2, wb, 6)


def _cond_quarter_flat(frame2d_u8: jax.Array, *, bgr: bool) -> jax.Array:
    """¼-res AA cond from flat byte rows when divisible; reshape fallback
    otherwise (odd widths — the resample matrices need w % 4 handling only
    the natural path has)."""
    from hdrtv_tpu.ops.resize import downsample_quarter_aa, downsample_quarter_aa_flat

    h, w3 = frame2d_u8.shape
    w = w3 // 3
    if h % 4 == 0 and w % 4 == 0:
        return downsample_quarter_aa_flat(frame2d_u8, bgr=bgr)
    assert not _halo.active(), "manual sharding requires /4-divisible shards"
    cframe = frame2d_u8.reshape(h, w, 3)
    if bgr:
        cframe = cframe[..., ::-1]
    return downsample_quarter_aa(cframe[None].astype(jnp.float32) * (1.0 / 255.0))


def ensemble_s2d_base_flat(
    p: Params,
    frame2d_u8: jax.Array,
    cond: jax.Array | None = None,
    *,
    policy: Policy = F32,
    bgr: bool = False,
) -> jax.Array:
    """Stage 1 of the split HG program: (H, 3W) uint8 rows → base s2d output
    (1, Hb, Wb, 12) in the compute dtype.

    Identical math to the base portion of ``ensemble_s2d_rgb48_flat`` (mega
    path when eligible, plain s2d otherwise); the HG composite + pack run in
    a *separate* jit (runtime/processor.py) so each program stays within the
    Mosaic compile budget — the round-2 blocker for the fused HG tail.
    """
    h, w3 = frame2d_u8.shape
    w = w3 // 3
    hb, wb = h // 2, w // 2
    if cond is None:
        cond = _cond_quarter_flat(frame2d_u8, bgr=bgr)
    if h % 2 == 0 and w % 2 == 0 and _mega_ok(p, (1, hb, wb, 12), policy):
        xr = frame2d_u8.reshape(hb, 2, wb, 6)
        return _ensemble_mega(
            p, xr, cond, policy=policy, pack=False, scale=1.0 / 255.0, bgr=bgr
        )[None]
    frame = frame2d_u8.reshape(h, w, 3)
    if bgr:
        frame = frame[..., ::-1]
    x = policy.cast(frame[None].astype(jnp.float32) * (1.0 / 255.0))
    xs = s2d(x)
    agcm_out = agcm_s2d(p, xs, cond, policy=policy)
    return le_s2d(p, agcm_out, agcm_out, policy=policy)


def _pack_rgb48_s2d_flat(out: jax.Array) -> jax.Array:
    """s2d model output (Hb,Wb,12) [0,1] → flat RGB48 byte rows (H, 3W) u16
    (the delivery contract, gui_pipeline_worker_feeders.py:193-235).

    (A contiguous-lane-slice form of the row-pair regroup measured ~4 ms
    slower than this transpose on v5e — u16 minor-dim-6 slices lower badly.)
    """
    hb, wb, _ = out.shape
    v = jnp.clip(out.astype(jnp.float32), 0.0, 1.0) * 65535.0 + 0.5
    u = v.astype(jnp.int32).astype(jnp.uint16)
    u = u.reshape(hb, wb, 2, 2, 3).transpose(0, 2, 1, 3, 4)  # (Hb,a,Wb,b,c)
    return u.reshape(2 * hb, wb * 6)


# ---------------------------------------------------------------------------
# Megakernel execution path (ops/megakernel.py) — the L0 section as three
# fused HBM passes instead of ~15 separate lax convs / elementwise passes.
# ---------------------------------------------------------------------------


def _mega_ok(p: Params, xs_shape, policy: Policy) -> bool:
    from hdrtv_tpu.ops.megakernel import pick_rows
    from hdrtv_tpu.utils.env import env_bool

    if not env_bool("HDRTV_MEGAKERNEL", True) or env_bool("HDRTV_DISABLE_PALLAS", False):
        return False
    if not env_bool("HDRTV_MEGAKERNEL_INTERPRET", False) and jax.default_backend() != "tpu":
        return False
    if policy.compute_dtype != jnp.bfloat16 and not env_bool("HDRTV_MEGAKERNEL_INTERPRET", False):
        return False
    if len(xs_shape) != 4 or xs_shape[0] != 1 or xs_shape[3] != 12:
        return False
    n, hb, wb, _ = xs_shape
    from hdrtv_tpu.ops.megakernel import pick_rows_even

    if wb % 8 != 0 or hb < 8 or pick_rows(hb) > 32 or not pick_rows_even(hb):
        return False
    needed = ("LE.__in_fused.weight", "AGCM.conv_first.weight", "LE.conv_last.weight")
    return all(k in p for k in needed)


def _agcm_mods(p: Params, cond_nat: jax.Array, *, policy: Policy) -> jax.Array:
    """AGCM global modulation vectors, tiled for block-major s2d lanes:
    (6, 4·nf) fp32 rows = (scale,shift) × (first, HR, last); the conv_last
    rows occupy the first 12 lanes."""
    fea = classifier_apply(p, "AGCM.classifier.", "color_condition", cond_nat, policy=policy)

    def lin(name):
        w = policy.cast(p[f"{name}.weight"])
        v = jnp.dot(
            policy.cast(fea), w, precision=policy.precision,
            preferred_element_type=policy.compute_dtype,
        ) + policy.cast(p[f"{name}.bias"])
        return v[0]

    rows = [
        jnp.tile(lin(f"AGCM.cond_{kind}_{tag}"), 4).astype(jnp.float32)
        for tag in ("first", "HR", "last")
        for kind in ("scale", "shift")
    ]
    width = max(v.shape[0] for v in rows)
    return jnp.stack([jnp.pad(v, (0, width - v.shape[0])) for v in rows])


def _ensemble_mega(
    p: Params,
    xs: jax.Array,
    cond_nat: jax.Array,
    *,
    policy: Policy,
    pack: bool,
    scale: float = 1.0,
    bgr: bool = False,
) -> jax.Array:
    """xs: unbatched s2d L0 frame (Hb,Wb,12), u8 (with ``scale``) or float →
    (Hb,2,Wb,6) u16 (pack — a metadata reshape of the RGB48 frame) or
    (Hb,Wb,12) compute-dtype. ``bgr`` permutes the input-consuming weights
    so a BGR-byte-order frame needs no lane flip (free at trace time)."""
    from hdrtv_tpu.ops.megakernel import fused_agcm_head, fused_cond_chain, fused_tail

    def w11(name):
        return p[f"{name}.weight"][0, 0], p[f"{name}.bias"]

    if xs.dtype != jnp.uint8:
        xs = policy.cast(xs)
    mods = _agcm_mods(p, cond_nat, policy=policy)
    n_first = p["LE.conv_first.bias"].shape[-1]
    aw1 = p["AGCM.conv_first.weight"][0, 0]
    if bgr:
        # Only AGCM.conv_first consumes the source frame; the LE input conv
        # consumes the (model-space RGB) AGCM output and stays untouched.
        perm = np.array([(k // 3) * 3 + 2 - (k % 3) for k in range(aw1.shape[0])])
        aw1 = aw1[perm]
    def head(xs_in):
        return fused_agcm_head(
            xs_in, mods,
            aw1, p["AGCM.conv_first.bias"],
            *w11("AGCM.HRconv"), *w11("AGCM.conv_last"),
            p["LE.__in_fused.weight"], p["LE.__in_fused.bias"],
            n_first=n_first, scale=scale, out_dtype=policy.compute_dtype,
        )

    # The chain stays float even in native-int8 mode: per-layer VMEM
    # quantization doubled the kernel (1.59 → 3.19 ms, round-3 trace) — for
    # 1×1 dots the VPU quantize cost matches the MXU dot it accelerates, and
    # the block-diagonal weight wastes 3/4 of the int8 contraction. (The
    # qargs path in fused_cond_chain remains unit-tested for exactness.)
    chain_steps = [
        w11("LE.cond_first.2"), w11("LE.cond_first.4"),
        w11("LE.CondNet1.0"), w11("LE.CondNet1.2"), w11("LE.CondNet1.4"),
    ]

    if _halo.active():
        # MERGED L1 exchange #1: head (one 3×3) → cond chain (1×1s,
        # pointwise) → SFT1+HR_conv1 (one 3×3) under a single shifted
        # window, radius 2 — halves the L1 ext materializations and
        # ppermutes vs per-stage hooks (PERF_NOTES round-4 ext-copy cost
        # model). Contamination travels 1 col/conv inward; the final crop
        # removes exactly 2. mods is a replicated global vector.
        # xs: (Hb,Wb,12) → W axis 1; (Hb,2,Wb,6) → axis 2.
        def head_sft(xs_in):
            fea_pre_i, c0_i, agcm_i = head(xs_in)
            c_feat_i, cond1_i = fused_cond_chain(c0_i, chain_steps)
            fea0_i = _sft_conv(
                p, "LE.SFT_layer1", "LE.HR_conv1", fea_pre_i[None], cond1_i[None],
                policy=policy, relu_fused=True,
            )
            return fea0_i[0], c_feat_i, cond1_i, agcm_i

        fea0_l, c_feat, cond1, agcm = _halo.run_stage(
            head_sft, [xs], [xs.ndim - 2], need=2, mod=8, out_axis=1
        )
        fea0 = fea0_l[None]
    else:
        fea_pre, c0, agcm = head(xs)
        c_feat, cond1 = fused_cond_chain(c0, chain_steps)
        fea0 = _sft_conv(
            p, "LE.SFT_layer1", "LE.HR_conv1", fea_pre[None], cond1[None],
            policy=policy, relu_fused=True,
        )
    cond2, cond3, cond4 = _le_cond_downs(p, c_feat[None], policy=policy)
    out = _le_mid(p, fea0, cond2, cond3, cond4, policy=policy)
    # up_conv3 output stays coarse: fused_tail unfolds the d2s and adds the
    # fea0 skip in VMEM (up_coarse) — the round-3 trace's add.530 + d2s
    # copies disappear.
    sft2 = [
        w11("LE.SFT_layer2.SFT_scale_conv0"), w11("LE.SFT_layer2.SFT_scale_conv1"),
        w11("LE.SFT_layer2.SFT_shift_conv0"), w11("LE.SFT_layer2.SFT_shift_conv1"),
    ]
    def tail(s_in, cond1_in, agcm_in, up_in):
        return fused_tail(
            s_in, cond1_in, agcm_in, sft2,
            p["LE.HR_conv2.weight"], p["LE.HR_conv2.bias"],
            p["LE.conv_last.weight"], p["LE.conv_last.bias"],
            pack=pack,
            qargs_hr=_qargs_for(p, "LE.HR_conv2"),
            up_coarse=up_in,
        )

    def up3_coarse(out_in, fea0_in):
        """up_conv3 + the coarse-skip decision on (unbatched) inputs."""
        upc_i = conv_s1(p, "LE.up_conv3.0", out_in[None], policy=policy, relu_fused=True)
        hb0, wb0, c0f = fea0_in.shape
        if (
            hb0 % 2 == 0 and wb0 % 2 == 0
            and upc_i.shape[1:] == (hb0 // 2, wb0 // 2, 4 * c0f)
        ):
            return fea0_in, upc_i[0]
        return d2s_blocks(upc_i)[0] + fea0_in, None

    if _halo.active():
        # MERGED L1 exchange #2: up_conv3 (3×3 at L2 = radius 2 at L1) +
        # the tail (HR_conv2 + conv_last → radius 2) under one shifted
        # window, radius ≥4 picked jointly so BOTH the fine ext width and
        # ``out``'s half-res ext width (w/2 + r) stay mod-8 fused-eligible
        # (coarse_conv=True); ``out`` rides at r/2 in its half-res domain.
        # The tail consumes up_coarse no closer than 1 L2 col from the
        # window edge, so up_conv3's single contaminated edge column is
        # never read (PERF_NOTES round-4 merge design). Packed output is
        # (Hb,2,Wb,6) → crop axis 2; unpacked (Hb,Wb,C) → axis 1.
        def up_tail(out_in, fea0_in, cond1_in, agcm_in):
            s_i, up_i = up3_coarse(out_in, fea0_in)
            return tail(s_i, cond1_in, agcm_in, up_i)

        return _halo.run_stage(
            up_tail, [out[0], fea0[0], cond1, agcm], [1, 1, 1, 1],
            need=4, mod=8, out_axis=2 if pack else 1, coarse_idx=(0,),
            coarse_conv=True,
        )
    s, up_coarse = up3_coarse(out[0], fea0[0])
    return tail(s, cond1, agcm, up_coarse)


# ---------------------------------------------------------------------------
# Native int8 (W8A8) execution — s2d-transformed int8 weights for the
# megakernels' MXU int8 path (W8A8Conv2d semantics, hdrtvnet_torch.py:296-365)
# ---------------------------------------------------------------------------


def attach_native_int8(sp: dict, raw: dict) -> dict:
    """Attach s2d-transformed int8 weights + scales for quantized layers.

    ``sp`` is the float (pre-dequantized) s2d param tree; ``raw`` the
    original converted checkpoint carrying ``.weight_int8``/``.w_scale``/
    ``.x_scale``(/``.x_zero``). The s2d weight transforms are zero-insertion/
    permutation only, so applying them to the int8 codes is exact; per-out-
    channel scales tile like biases. Only 3×3 layers whose s2d channels are
    128-multiples attach (the megakernels' int8 eligibility); everything
    else keeps the pre-dequantized float path.
    """
    if any(k.startswith("base.") for k in raw):
        # composite (HG) checkpoints carry base.-prefixed ensemble keys; the
        # transformed tree is unprefixed (s2d_transform_params)
        raw = {k[len("base."):] if k.startswith("base.") else k: v for k, v in raw.items()}
    out = dict(sp)
    native = []
    for layer, role in _le_layer_roles().items():
        qk = f"{layer}.weight_int8"
        if qk not in raw or f"{layer}.x_scale" not in raw:
            continue
        if role not in (_S1, _S2, _PSL, _P11):
            continue
        wq = np.asarray(raw[qk])
        wsc = np.asarray(raw.get(f"{layer}.w_scale", raw.get(f"{layer}.scale")), np.float32)
        if role == _S1:
            tq = w_s2d_s1(wq)
            tsc = b_s2d(wsc)
        elif role == _PSL:
            # PS fold is zero-insertion + output-channel permutation — exact
            # on int8 codes; per-channel scales follow the same permutation.
            tq = w_s2d_s1_ps(wq)
            tsc = np.tile(w_ps_permute(wsc.reshape(1, 1, 1, -1))[0, 0, 0], 4)
        elif role == _P11:
            # block-diagonal zero-insert — exact on codes (zeros quantize to 0)
            tq = w_s2d_1x1(wq)
            tsc = b_s2d(wsc)
        else:
            tq = w_s2d_s2(wq)
            tsc = b_s2d(wsc)
        if tq.shape[2] % 128 or tq.shape[3] % 128:
            continue
        out[f"{layer}.qweight"] = tq
        out[f"{layer}.qw_scale"] = tsc
        out[f"{layer}.qx_scale"] = np.float32(raw[f"{layer}.x_scale"])
        if f"{layer}.x_zero" in raw:
            out[f"{layer}.qx_zero"] = np.float32(raw[f"{layer}.x_zero"])
        native.append(layer)
    # The fused CondNet down conv mixes three different activation
    # calibrations. Round 2 dropped the consolidation here (three separate
    # HBM passes — measured +2.5 ms at 1080p, the int8-slower-than-bf16
    # inversion). Round 3 keeps it: the kernel quantizes the shared input
    # once per branch in VMEM ("x_scales"/"x_zeros" multi-branch qargs,
    # ops/megakernel.py fused_down2).
    branches = [f"LE.CondNet{i}.0" for i in (2, 3, 4)]
    if all(f"{b}.qweight" in out for b in branches) and "LE.__cond_down.weight" in out:
        zeros = [f"{b}.qx_zero" in out for b in branches]
        if all(zeros) or not any(zeros):  # calibration style must be uniform
            out["LE.__cond_down.qweight"] = np.concatenate(
                [out[f"{b}.qweight"] for b in branches], axis=-1
            )
            out["LE.__cond_down.qw_scale"] = np.concatenate(
                [out[f"{b}.qw_scale"] for b in branches]
            )
            out["LE.__cond_down.qx_scales"] = np.asarray(
                [out[f"{b}.qx_scale"] for b in branches], np.float32
            )
            if all(zeros):
                out["LE.__cond_down.qx_zeros"] = np.asarray(
                    [out[f"{b}.qx_zero"] for b in branches], np.float32
                )
        else:
            out.pop("LE.__cond_down.weight", None)
            out.pop("LE.__cond_down.bias", None)
    return out


def _qargs_for(p: Params, layer: str) -> dict | None:
    if f"{layer}.qweight" not in p:
        return None
    qa = {
        "w_int8": p[f"{layer}.qweight"],
        "w_scale": p[f"{layer}.qw_scale"],
    }
    if f"{layer}.qx_scales" in p:  # multi-branch consolidation
        qa["x_scales"] = p[f"{layer}.qx_scales"]
        if f"{layer}.qx_zeros" in p:
            qa["x_zeros"] = p[f"{layer}.qx_zeros"]
        return qa
    qa["x_scale"] = p[f"{layer}.qx_scale"]
    if f"{layer}.qx_zero" in p:
        qa["x_zero"] = p[f"{layer}.qx_zero"]
    return qa
