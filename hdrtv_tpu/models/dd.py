"""Double space-to-depth (dd) execution mode — L1 stage one s2d level down.

Groundwork for the next roofline lever (PERF_NOTES "Design record: L1
double-s2d"): the L1-stage kernels (head 3.18 + SFT1 1.38 + tail 3.05 ms at
1080p) carry sub-position lane folds because their frame-boundary channel
counts (12) under-fill the 128 lanes. Running the L1 stage at H/4 × W/4 with
4× channels makes 48/192/512 channels lane-native and halves the L1 grid's
M extents.

This module delivers the EXACT math for that mode, executed and tested:

- ``w_dd_s1`` / ``w_dd_1x1``: the s2d stride-1 / 1×1 transforms compose —
  applying them to the already-transformed weights (block size ×4) yields
  exact double-s2d weights (channel order matches ``s2d(s2d(x))``).
- ``w_dd_s2``: NEW composition for the L1→L2 transitions (down_conv1, the
  CondNet down heads): a natural stride-2 3×3 'same' conv becomes a 2×2
  stride-1 (1,0)-padded conv over the dd tensor whose output lands directly
  in the next level's *single*-s2d layout — the dd grid (H/4 × W/4) IS the
  L2-s2d grid, so the transition needs no data movement at all.
- up_conv3's PS-folded s2d weight (``w_s2d_s1_ps``) needs NO further
  transform: its output channel order (sub-position major, then PS offset,
  then channel) is exactly the dd order, so the runtime d2s_blocks step
  VANISHES in dd mode (verified by the ensemble parity test).
- ``ensemble_dd``: full-ensemble forward in dd mode (lax path), exact vs
  the normal forward to float tolerance (tests/test_dd.py).

What this retires from the design record's open risks: (a) the cond chain
moves to dd wholesale (its 1×1s are block-diagonal compositions; the downs
use ``w_dd_s2``) — no d2s anywhere on the cond path; (b) the up path needs
no new unfold geometry — the d2s disappears instead of changing radius.
What remains future work: the Pallas megakernels in dd geometry (live-tap
contraction for the 4×-denser block structure) — without them the lax dd
path has no perf claim, so the shipped turbo path is untouched.

Reference parity: the math equals Ensemble_AGCM_LE
(/root/reference/src/hdrtvnet_torch.py forward contract); this module is a
TPU-native layout transform with no reference counterpart.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hdrtv_tpu.models.agcm import classifier_apply
from hdrtv_tpu.models.hdrtvnet import ModelConfig
from hdrtv_tpu.models.layers import F32, Params, Policy, leaky_relu, relu
from hdrtv_tpu.models.s2d import (
    _blk,
    _conv,
    _resblock,
    _sft,
    b_s2d,
    conv_1x1,
    conv_nat,
    conv_s1,
    conv_s2,
    conv_s2_nat,
    d2s,
    s2d,
    s2d_transform_params,
    w_s2d_1x1,
    w_s2d_s1,
)
from hdrtv_tpu.parallel import halo as _halo

# ---------------------------------------------------------------------------
# Data movement
# ---------------------------------------------------------------------------


def s2d2(x: jax.Array) -> jax.Array:
    """(N,H,W,C) → (N,H/4,W/4,16C); ch = (a2·2+b2)·4C + (a1·2+b1)·C + c."""
    return s2d(s2d(x))


def d2s2(x: jax.Array) -> jax.Array:
    """Inverse of :func:`s2d2`."""
    return d2s(d2s(x))


def _tile16(v: jax.Array) -> jax.Array:
    """(N,C) modulation vector → (N,1,1,16C) for dd block-major tensors."""
    n, c = v.shape
    return jnp.tile(v, (1, 16)).reshape(n, 1, 1, 16 * c)


def dd_quads_view(frame2d_u8):
    """(H, 3W) byte rows → (H/4, 4, W/4, 12) quad-row planes — a FREE view
    (pure reshape) of a decoded frame buffer, the dd analog of the shipped
    row-pair boundary (``ensemble_s2d_rgb48_pairs``). Plane t = 2a2+a1 holds
    row sub-position (a2, a1); byte 3·(2b2+b1)+c holds column sub-position
    (b2, b1) channel c."""
    h, w3 = frame2d_u8.shape
    return frame2d_u8.reshape(h // 4, 4, w3 // 12, 12)


# dd channel k = (a2·2+b2)·12 + (a1·2+b1)·3 + c ← quad-plane flat index
# t·12 + u·3 + c with t = 2a2+a1, u = 2b2+b1 (host-computed permutation).
_QUAD_PERM = np.empty(48, np.int64)
for _a2 in range(2):
    for _a1 in range(2):
        for _b2 in range(2):
            for _b1 in range(2):
                for _c in range(3):
                    _QUAD_PERM[(_a2 * 2 + _b2) * 12 + (_a1 * 2 + _b1) * 3 + _c] = (
                        (2 * _a2 + _a1) * 12 + (2 * _b2 + _b1) * 3 + _c
                    )
del _a2, _a1, _b2, _b1, _c


def dd_from_quads(xq: jax.Array) -> jax.Array:
    """(Hd, 4, Wd, 12) quad-row planes → (1, Hd, Wd, 48) dd tensor.

    One transpose + a fixed lane permutation — the contract a future dd
    head kernel consumes in-register (the shipped pairs head kernel does
    the 2-plane version of the same regroup)."""
    hd, _, wd, _ = xq.shape
    v = xq.reshape(hd, 4, wd, 4, 3).transpose(0, 2, 1, 3, 4).reshape(hd, wd, 48)
    return v[..., _QUAD_PERM][None]


def quads_from_dd(x: jax.Array) -> jax.Array:
    """(1, Hd, Wd, 48) dd tensor → (Hd, 4, Wd, 12) quad-row planes — the
    inverse of :func:`dd_from_quads`; on u16 output it IS the flat (H, 3W)
    RGB48 byte-row contract (a free host view), the geometry a future dd
    tail kernel packs in-register."""
    _, hd, wd, _ = x.shape
    inv = np.argsort(_QUAD_PERM)
    v = x[0][..., inv].reshape(hd, wd, 4, 4, 3).transpose(0, 2, 1, 3, 4)
    return v.reshape(hd, 4, wd, 12)


# ---------------------------------------------------------------------------
# Weight transforms (host numpy, applied once at load)
# ---------------------------------------------------------------------------


def w_dd_s1(w: np.ndarray) -> np.ndarray:
    """(3,3,Ci,Co) stride-1 'same' → (3,3,16Ci,16Co) 'same' over dd.

    The s2d stride-1 transform composes: the first application yields an
    exact 'same' 3×3 over the s2d grid, which the second application
    transforms exactly again; the nested block order matches ``s2d(s2d(x))``.
    """
    return w_s2d_s1(w_s2d_s1(w))


def w_dd_1x1(w: np.ndarray) -> np.ndarray:
    """(1,1,Ci,Co) → (1,1,16Ci,16Co) block-diagonal (composition)."""
    return w_s2d_1x1(w_s2d_1x1(w))


def b_dd(b: np.ndarray) -> np.ndarray:
    """Bias tiled over the 16 dd sub-positions."""
    return np.tile(b, 16)


def w_dd_s2(w: np.ndarray) -> np.ndarray:
    """(3,3,Ci,Co) natural stride-2 'same' → (2,2,16Ci,4Co) stride-1 with
    (1,0) pad over the dd tensor; output in the NEXT level's single-s2d
    layout (the dd grid and the L2-s2d grid coincide).

    Derivation: output L2-s2d sub-position (ao,bo) at dd-grid row B' reads
    natural rows n = 4B' + 2·ao + di, di ∈ {−1,0,1}; writing n = 4(B'+Δ)+s
    gives Δ ∈ {−1,0} (a 2-tap kernel) and dd row sub-position s = 2a2+a1,
    whose channel block is (a2·2+b2)·4Ci + (a1·2+b1)·Ci.
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((2, 2, 16 * ci, 4 * co), w.dtype)
    for dI in (-1, 0, 1):
        for dJ in (-1, 0, 1):
            for ao in range(2):
                for bo in range(2):
                    dlt_i, s_i = divmod(2 * ao + dI, 4)
                    dlt_j, s_j = divmod(2 * bo + dJ, 4)
                    a2, a1 = divmod(s_i, 2)
                    b2, b1 = divmod(s_j, 2)
                    cin = (a2 * 2 + b2) * 4 * ci + (a1 * 2 + b1) * ci
                    out[dlt_i + 1, dlt_j + 1, cin : cin + ci, _blk(co, ao * 2 + bo)] = (
                        w[dI + 1, dJ + 1]
                    )
    return out


# L1-stage layers by dd role; everything else keeps its single-s2d form.
_DD_S1 = ("LE.conv_first", "LE.cond_first.0", "LE.HR_conv1", "LE.HR_conv2", "LE.conv_last")
_DD_11 = (
    "LE.cond_first.2", "LE.cond_first.4",
    "LE.CondNet1.0", "LE.CondNet1.2", "LE.CondNet1.4",
    "AGCM.conv_first", "AGCM.HRconv", "AGCM.conv_last",
) + tuple(
    f"LE.{sft}.{cv}"
    for sft in ("SFT_layer1", "SFT_layer2")
    for cv in ("SFT_scale_conv0", "SFT_scale_conv1", "SFT_shift_conv0", "SFT_shift_conv1")
)
_DD_S2 = ("LE.down_conv1", "LE.CondNet2.0", "LE.CondNet3.0", "LE.CondNet4.0")


def dd_transform_params(params: dict, cfg: ModelConfig | None = None) -> dict:
    """Full dd parameter tree from an ORIGINAL (natural) checkpoint.

    Starts from :func:`s2d_transform_params` (L2+ layers keep that form),
    then rewrites the L1-stage layers one more s2d level down. up_conv3's
    PS-folded weight passes through — its output IS the dd tensor.
    Composite (HG) checkpoints are not supported in dd mode (groundwork).
    """
    assert not any(k.startswith("base.") for k in params), "dd mode: no-HG only"
    sp = s2d_transform_params(params, cfg)
    out = dict(sp)
    for layer in _DD_S1:
        wk, bk = f"{layer}.weight", f"{layer}.bias"
        if wk in sp:
            out[wk] = w_s2d_s1(sp[wk])  # composition: second s2d level
            if bk in sp:
                out[bk] = b_s2d(sp[bk])
    for layer in _DD_11:
        wk, bk = f"{layer}.weight", f"{layer}.bias"
        if wk in sp:
            out[wk] = w_s2d_1x1(sp[wk])
            if bk in sp:
                out[bk] = b_s2d(sp[bk])
    for layer in _DD_S2:
        wk, bk = f"{layer}.weight", f"{layer}.bias"
        if wk in params:  # built from the natural weight (stride semantics)
            out[wk] = w_dd_s2(np.asarray(params[wk], np.float32))
            if bk in params:
                out[bk] = b_s2d(np.asarray(params[bk], np.float32))
    # dd-domain input fusion (conv_first ∥ cond_first.0 share the LE input)
    out["LE.__in_fused.weight"] = np.concatenate(
        (out["LE.conv_first.weight"], out["LE.cond_first.0.weight"]), axis=-1
    )
    out["LE.__in_fused.bias"] = np.concatenate(
        (out["LE.conv_first.bias"], out["LE.cond_first.0.bias"])
    )
    # the single-s2d cond-down consolidation does not apply in dd (the three
    # branch heads are 2×2 dd convs now); drop it so no caller fuses stale
    # single-s2d weights with dd inputs.
    out.pop("LE.__cond_down.weight", None)
    out.pop("LE.__cond_down.bias", None)
    return out


# ---------------------------------------------------------------------------
# Forward (lax path; release arch, no HG)
# ---------------------------------------------------------------------------


def _conv_dd_s2(p: Params, name: str, x: jax.Array, *, policy: Policy) -> jax.Array:
    """The 2×2 stride-1 (1,0)-padded dd→L2-s2d transition conv."""
    return _conv(p, name, x, padding=[(1, 0), (1, 0)], policy=policy)


def agcm_dd(p: Params, xdd: jax.Array, cond_nat: jax.Array, *, policy: Policy) -> jax.Array:
    """AGCM (dynamic color_condition) on a dd frame; the classifier runs on
    the natural ¼-res condition image (unchanged domain)."""
    fea = classifier_apply(p, "AGCM.classifier.", "color_condition", cond_nat, policy=policy)

    def lin(name):
        w = policy.cast(p[f"{name}.weight"])
        return jnp.dot(policy.cast(fea), w, precision=policy.precision,
                       preferred_element_type=policy.compute_dtype) + policy.cast(p[f"{name}.bias"])

    def mod(out, scale, shift):
        return out * _tile16(scale) + _tile16(shift) + out

    out = conv_1x1(p, "AGCM.conv_first", xdd, policy=policy)
    out = relu(mod(out, lin("AGCM.cond_scale_first"), lin("AGCM.cond_shift_first")))
    out = conv_1x1(p, "AGCM.HRconv", out, policy=policy)
    out = relu(mod(out, lin("AGCM.cond_scale_HR"), lin("AGCM.cond_shift_HR")))
    out = conv_1x1(p, "AGCM.conv_last", out, policy=policy)
    return mod(out, lin("AGCM.cond_scale_last"), lin("AGCM.cond_shift_last"))


def le_dd(p: Params, xs: jax.Array, conds: jax.Array, *, policy: Policy) -> jax.Array:
    """LE sft UNet with the L1 stage in the dd domain.

    L1 tensors (H/4, W/4, 16C); the dd grid coincides with the L2-s2d grid,
    so every L1↔L2 transition is a conv with zero data movement. L2 and
    deeper run the existing single-s2d forms (weights unchanged from
    ``s2d_transform_params``); this function mirrors ``le_s2d``/``_le_mid``
    (models/s2d.py) below fea1 — kept separate so the shipped turbo path
    stays byte-identical.
    """
    assert not _halo.active(), "dd mode: single-device groundwork only"
    act = relu
    mask_out = xs  # weighting_network=False long skip

    if xs is conds and "LE.__in_fused.weight" in p:
        y = conv_s1(p, "LE.__in_fused", xs, policy=policy)
        n_first = p["LE.conv_first.bias"].shape[-1]
        fea0_pre = y[..., :n_first]
        c = leaky_relu(y[..., n_first:], 0.1)
    else:
        fea0_pre = _conv(p, "LE.conv_first", xs, padding=[(1, 1), (1, 1)], policy=policy)
        c = leaky_relu(_conv(p, "LE.cond_first.0", conds, padding=[(1, 1), (1, 1)], policy=policy), 0.1)
    c = leaky_relu(conv_1x1(p, "LE.cond_first.2", c, policy=policy), 0.1)
    c = leaky_relu(conv_1x1(p, "LE.cond_first.4", c, policy=policy), 0.1)
    c1 = leaky_relu(conv_1x1(p, "LE.CondNet1.0", c, policy=policy), 0.1)
    c1 = leaky_relu(conv_1x1(p, "LE.CondNet1.2", c1, policy=policy), 0.1)
    cond1 = conv_1x1(p, "LE.CondNet1.4", c1, policy=policy)

    # cond downs: one 2×2 dd conv per branch lands each on its L2-s2d grid;
    # the tails below are the unchanged single-s2d layers.
    c2 = leaky_relu(_conv_dd_s2(p, "LE.CondNet2.0", c, policy=policy), 0.1)
    c2 = leaky_relu(conv_1x1(p, "LE.CondNet2.2", c2, policy=policy), 0.1)
    cond2 = conv_1x1(p, "LE.CondNet2.4", c2, policy=policy)
    c3 = leaky_relu(_conv_dd_s2(p, "LE.CondNet3.0", c, policy=policy), 0.1)
    c3 = conv_s2(p, "LE.CondNet3.2", c3, policy=policy, act="lrelu")
    cond3 = conv_1x1(p, "LE.CondNet3.4", c3, policy=policy)
    c4 = leaky_relu(_conv_dd_s2(p, "LE.CondNet4.0", c, policy=policy), 0.1)
    c4 = conv_s2(p, "LE.CondNet4.2", c4, policy=policy, act="lrelu")
    cond4 = conv_s2_nat(p, "LE.CondNet4.4", c4, policy=policy)  # natural /8

    fea0 = act(fea0_pre)
    fea0 = _sft(p, "LE.SFT_layer1", fea0, cond1, conv_1x1, policy=policy)
    fea0 = act(_conv(p, "LE.HR_conv1", fea0, padding=[(1, 1), (1, 1)], policy=policy))

    # ---- mid (mirrors _le_mid from fea1; L2+ domains identical) ----
    fea1 = act(_conv_dd_s2(p, "LE.down_conv1", fea0, policy=policy))
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

    out = fea3
    for i in range(4):
        out = _resblock(p, f"LE.recon_trunk3.{i}", out, cond4, conv3_nat, conv1_nat, policy=policy)
    out = out + fea3
    up = act(conv_nat(p, "LE.up_conv1.0", out, policy=policy))
    out = _resblock(p, "LE.recon_trunk4.0", fea2, cond3, conv_s1, conv_1x1, policy=policy, x_add=up)
    upc = conv_s1(p, "LE.up_conv2.0", out, policy=policy, relu_fused=True)
    out = _resblock(p, "LE.recon_trunk5.0", fea1, cond2, conv_s1, conv_1x1, policy=policy, up_coarse=upc)

    # ---- up to L1: the PS-folded conv's output IS the dd tensor ----
    up_dd = conv_s1(p, "LE.up_conv3.0", out, policy=policy, relu_fused=True)
    out = up_dd + fea0
    out = _sft(p, "LE.SFT_layer2", out, cond1, conv_1x1, policy=policy)
    out = act(_conv(p, "LE.HR_conv2", out, padding=[(1, 1), (1, 1)], policy=policy))
    out = _conv(p, "LE.conv_last", out, padding=[(1, 1), (1, 1)], policy=policy) + mask_out
    return out


def ensemble_dd(
    p: Params, img: jax.Array, cond: jax.Array, cfg: ModelConfig = ModelConfig(), *,
    policy: Policy = F32,
) -> jax.Array:
    """Full ensemble in dd mode: natural NHWC in → natural NHWC out.

    ``img``: (N,H,W,3) [0,1] RGB with H,W divisible by 4; ``cond``: natural
    ¼-res condition image. HG composites are out of scope (groundwork).
    """
    assert not cfg.use_hg, "dd mode: no-HG only (groundwork)"
    img = policy.cast(img)
    xdd = s2d2(img)
    agcm_out = agcm_dd(p, xdd, cond, policy=policy)
    out = le_dd(p, agcm_out, agcm_out, policy=policy)
    return d2s2(out)
