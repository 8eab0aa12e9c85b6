"""Functional NHWC layer toolkit over flat parameter pytrees.

Every model in this package is a pure function over a *flat* dict of arrays
keyed by the reference checkpoint's own state-dict names (e.g.
``"LE.conv_first.weight"``). That makes weight import a mechanical transform
(NCHW→HWIO transpose) and parity with the reference auditable key-by-key.

TPU-first conventions:
- activations are NHWC (the decoded HWC video frame is already the network
  layout — no transpose on the hot path);
- conv weights are HWIO so ``lax.conv_general_dilated`` hits the MXU without
  relayout;
- compute dtype is a policy (fp32 on CPU tests, bf16 on TPU); parameters stay
  fp32 and are cast at use so XLA folds the cast into the conv;
- int8 layers are routed *by checkpoint content*: if ``{name}.weight_int8``
  exists the conv dequantizes per-output-channel int8 weights, and if
  ``{name}.x_scale`` exists it fake-quantizes the activation first. This
  reproduces the reference's eager W8 / W8A8 semantics
  (/root/reference/src/models/hdrtvnet_torch.py:233-445) with the activation
  scale held in fp32 exactly as the reference does (:339-349).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict  # flat: str -> jnp.ndarray

# ---------------------------------------------------------------------------
# Activation capture (calibration hook point)
# ---------------------------------------------------------------------------
# The reference calibrates W8A8 activation scales with forward hooks on the
# quantized modules (calibrate_w8a8, hdrtvnet_torch.py:1001-1100). The
# functional analog: under a capture context, conv2d/linear record their
# *input* stats as traced values which the calibration wrapper returns as
# outputs of the jitted program.

_ACTIVE_CAPTURE: list = []


class ActivationCapture:
    """Collects per-layer input statistics during a traced forward pass."""

    def __init__(self, names=None):
        self.names = None if names is None else set(names)
        self.stats: dict[str, dict] = {}

    def _record(self, name: str, x) -> None:
        if self.names is not None and name not in self.names:
            return
        xf = x.astype(jnp.float32)
        self.stats[name] = {
            "abs_max": jnp.max(jnp.abs(xf)),
            "min": jnp.min(xf),
            "max": jnp.max(xf),
        }

    def __enter__(self):
        _ACTIVE_CAPTURE.append(self)
        return self

    def __exit__(self, *exc):
        _ACTIVE_CAPTURE.remove(self)


def _maybe_capture(name: str, x) -> None:
    for cap in _ACTIVE_CAPTURE:
        cap._record(name, x)


@dataclasses.dataclass(frozen=True)
class Policy:
    """Precision policy: params stay fp32; compute happens in compute_dtype.

    ``precision`` feeds lax matmul/conv precision: the FP32 preset pins
    HIGHEST so TPU convs do not silently drop to bf16 passes (the analog of
    the reference's true-fp32 eager path); bf16 uses the MXU default.
    """

    compute_dtype: jnp.dtype = jnp.float32
    precision: lax.Precision | None = None

    def cast(self, x: jax.Array) -> jax.Array:
        if x.dtype != self.compute_dtype:
            return x.astype(self.compute_dtype)
        return x


F32 = Policy(jnp.float32, lax.Precision.HIGHEST)
BF16 = Policy(jnp.bfloat16)


def policy_for(precision: str) -> Policy:
    """Map reference precision tokens (gui_config.py PRECISIONS) to policies.

    fp16 → bf16 (the TPU half-precision), int8 presets compute in bf16 with
    quantization handled by checkpoint content.
    """
    token = str(precision or "fp16").strip().lower()
    if token in {"fp32", "float32"}:
        return F32
    return BF16

_CONV_DN = ("NHWC", "HWIO", "NHWC")


def _dequant_weight(p: Params, name: str, policy: Policy) -> jax.Array:
    """Per-output-channel int8 weight dequantization (HWIO layout).

    Mirrors W8Conv2d/W8A8Conv2d weight handling: scale = amax/127 per out
    channel, dequantized to compute dtype at use.
    """
    w_q = p[f"{name}.weight_int8"]  # HWIO int8
    scale = p.get(f"{name}.w_scale", p.get(f"{name}.scale"))
    return w_q.astype(policy.compute_dtype) * scale.astype(policy.compute_dtype)


def _maybe_fake_quant_act(p: Params, name: str, x: jax.Array, policy: Policy) -> jax.Array:
    """Static activation fake-quant for W8A8 layers.

    Symmetric:  q = round(x/s) clamped to [-128,127];  x' = q*s
    Asymmetric: q = round((x-z)/s) clamped to [0,255]; x' = q*s + z
    Quant math in fp32 (scales can be below fp16/bf16 normal range — the
    reference pins them fp32 for the same reason), result cast to compute.
    """
    x_scale = p.get(f"{name}.x_scale")
    if x_scale is None:
        return x
    x_f = x.astype(jnp.float32)
    s = x_scale.astype(jnp.float32)
    x_zero = p.get(f"{name}.x_zero")
    if x_zero is not None:
        z = x_zero.astype(jnp.float32)
        q = jnp.clip(jnp.round((x_f - z) / s), 0.0, 255.0)
        return (q * s + z).astype(policy.compute_dtype)
    q = jnp.clip(jnp.round(x_f / s), -128.0, 127.0)
    return (q * s).astype(policy.compute_dtype)


def _maybe_gated_quant(p: Params, name: str, x: jax.Array, policy: Policy) -> jax.Array:
    """Value-switchable activation fake-quant for sensitivity probing.

    When ``{name}.x_on`` is present (a 0/1 scalar), the layer's activation
    fake-quant toggles *by value* instead of by pytree structure — so one
    jitted program probes every layer in turn without 100+ retraces
    (quant/mixed.py per-layer stability probe)."""
    if f"{name}.x_on" not in p:
        return x
    xq = _maybe_fake_quant_act(p, name, x, policy)
    return jnp.where(p[f"{name}.x_on"] > 0, xq, x)


def conv2d(
    p: Params,
    name: str,
    x: jax.Array,
    *,
    stride: int = 1,
    padding: int | str = 0,
    policy: Policy = F32,
) -> jax.Array:
    """2D convolution reading ``{name}.weight`` / ``{name}.bias`` (or the int8
    quantized triplet) from the flat param dict. NHWC x, HWIO weights."""
    if _ACTIVE_CAPTURE:
        _maybe_capture(name, x)
    if f"{name}.weight_int8" in p:
        w = _dequant_weight(p, name, policy)
        x = _maybe_fake_quant_act(p, name, x, policy)
    else:
        w = policy.cast(p[f"{name}.weight"])
        x = policy.cast(x)
        x = _maybe_gated_quant(p, name, x, policy)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_CONV_DN,
        precision=policy.precision,
        preferred_element_type=policy.compute_dtype,
    )
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + policy.cast(b)
    return y


def linear(p: Params, name: str, x: jax.Array, *, policy: Policy = F32) -> jax.Array:
    """Dense layer; weights stored (in, out) — transposed from torch at import."""
    if _ACTIVE_CAPTURE:
        _maybe_capture(name, x)
    if f"{name}.weight_int8" in p:
        w = _dequant_weight(p, name, policy)  # (in, out)
        x = _maybe_fake_quant_act(p, name, x, policy)
    else:
        w = policy.cast(p[f"{name}.weight"])
        x = policy.cast(x)
        x = _maybe_gated_quant(p, name, x, policy)
    y = jnp.dot(x, w, precision=policy.precision, preferred_element_type=policy.compute_dtype)
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + policy.cast(b)
    return y


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def leaky_relu(x: jax.Array, slope: float) -> jax.Array:
    return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))


def avg_pool_3s2p1(x: jax.Array) -> jax.Array:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=True) in NHWC.

    count_include_pad means the divisor is always 9 (zeros padded in), matching
    the AGCM classifier's ``color_block`` pooling
    (/root/reference/src/models/hdrtvnet_modules/Condition_arch.py:10).
    """
    # init must be a concrete numpy scalar: a traced/jnp constant breaks the
    # add-monoid pattern match and with it reverse-mode autodiff under jit.
    summed = lax.reduce_window(
        x,
        np.zeros((), x.dtype)[()],
        lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / np.asarray(9, x.dtype)[()]


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    """AvgPool2d(k, stride=k) — used by spatial AGCM variants and post-correction."""
    summed = lax.reduce_window(
        x,
        np.zeros((), x.dtype)[()],
        lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, k, k, 1),
        padding="VALID",
    )
    return summed / np.asarray(k * k, x.dtype)[()]


def max_pool2(x: jax.Array) -> jax.Array:
    """MaxPool2d(2) — HG encoder downsampling."""
    init = np.asarray(-np.inf, x.dtype)[()] if jnp.issubdtype(x.dtype, jnp.floating) else np.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def instance_norm(p: Params, name: str, x: jax.Array, *, eps: float = 1e-5, policy: Policy = F32) -> jax.Array:
    """InstanceNorm2d(affine=True): per-sample, per-channel over H,W (biased var).

    Statistics in fp32 for stability regardless of compute dtype.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    gamma = p[f"{name}.weight"].astype(jnp.float32)
    beta = p[f"{name}.bias"].astype(jnp.float32)
    return (y * gamma + beta).astype(policy.compute_dtype)


def global_avg_pool(x: jax.Array, *, keepdims: bool = True) -> jax.Array:
    """AdaptiveAvgPool2d(1)."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """torch.nn.PixelShuffle(r) in NHWC.

    Input channel index semantics follow torch: c_in = c_out * r * r + i * r + j,
    where (i, j) is the intra-block offset. Weight import preserves torch
    output-channel order so this is bit-compatible.
    """
    n, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # N, H, i, W, j, C
    return x.reshape(n, h * r, w * r, c_out)


def upsample_nearest(x: jax.Array, r: int) -> jax.Array:
    """nn.Upsample(scale_factor=r, mode='nearest') in NHWC."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, r, w, r, c))
    return x.reshape(n, h * r, w * r, c)


def pad_reflect(x: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    """F.pad(..., mode='reflect') on the bottom/right edges (HG /32 padding)."""
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")


def align_to(x: jax.Array, ref_h: int, ref_w: int) -> jax.Array:
    """Center-crop/replicate-pad spatial dims to (ref_h, ref_w).

    Mirrors HDRUNet3T1._align_to (HDRUNet3T1_arch.py:78-104); shapes are static
    under jit so the Python branches trace away.
    """
    _, xh, xw, _ = x.shape
    if xh > ref_h:
        top = (xh - ref_h) // 2
        x = x[:, top : top + ref_h, :, :]
    if xw > ref_w:
        left = (xw - ref_w) // 2
        x = x[:, :, left : left + ref_w, :]
    _, xh, xw, _ = x.shape
    ph, pw = ref_h - xh, ref_w - xw
    if ph > 0 or pw > 0:
        pt, pl = ph // 2, pw // 2
        x = jnp.pad(x, ((0, 0), (pt, ph - pt), (pl, pw - pl), (0, 0)), mode="edge")
    return x


def bilinear_resize(x: jax.Array, h: int, w: int) -> jax.Array:
    """F.interpolate(mode='bilinear', align_corners=False) — half-pixel centers."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, h, w, c), method="bilinear").astype(x.dtype)


def num_params(p: Params) -> int:
    return int(sum(np.prod(v.shape) for v in p.values()))
