"""HG (Highlight Generation) — hallucination generator family.

Semantics of /root/reference/src/models/hdrtvnet_modules/Hallucination_arch.py:
a 6-level BN-conv UNet encoder/decoder with pixel-shuffle (or resize-conv)
upsampling; output composited as ``mask * out + img``.

BatchNorm runs in eval mode (inference framework); the math
``(x - running_mean) * rsqrt(running_var + eps) * gamma + beta`` is applied
directly from the checkpoint's running stats. The ``fusedbn`` variant of the
reference folds these into conv weights at load — here that fold lives in the
weight importer (import_torch.fold_hg_batchnorm) and the model simply skips
BN when the keys are absent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hdrtv_tpu.models.layers import (
    F32,
    Params,
    Policy,
    align_to,
    avg_pool,
    conv2d,
    max_pool2,
    pixel_shuffle,
    relu,
    upsample_nearest,
)


def _batch_norm(p: Params, name: str, x: jax.Array, *, eps: float = 1e-5, policy: Policy = F32) -> jax.Array:
    mean = p[f"{name}.running_mean"].astype(jnp.float32)
    var = p[f"{name}.running_var"].astype(jnp.float32)
    gamma = p[f"{name}.weight"].astype(jnp.float32)
    beta = p[f"{name}.bias"].astype(jnp.float32)
    scale = gamma * jax.lax.rsqrt(var + eps)
    shift = beta - mean * scale
    return (x.astype(jnp.float32) * scale + shift).astype(policy.compute_dtype)


def _conv_block(p: Params, name: str, x: jax.Array, *, policy: Policy) -> jax.Array:
    """conv_block: 3×3 conv → [BatchNorm] → ReLU (Hallucination_arch.py:24-29).

    BN keys absent (fused at import) ⇒ plain conv+ReLU, matching fusedbn.
    """
    x = conv2d(p, f"{name}.0", x, padding=1, policy=policy)
    if f"{name}.1.running_mean" in p:
        x = _batch_norm(p, f"{name}.1", x, policy=policy)
    return relu(x)


def _up_block(p: Params, name: str, x: jax.Array, *, policy: Policy) -> jax.Array:
    """up_block: conv → PixelShuffle(2) → ReLU, or resize-conv when the
    checkpoint carries ``{name}.1.weight`` (resizeconv remap layout)."""
    if f"{name}.1.weight" in p:  # resizeconv: Upsample → conv → ReLU
        x = upsample_nearest(x, 2)
        return relu(conv2d(p, f"{name}.1", x, padding=1, policy=policy))
    x = conv2d(p, f"{name}.0", x, padding=1, policy=policy)
    return relu(pixel_shuffle(x, 2))


def hg_apply(
    p: Params,
    img: jax.Array,
    mask: jax.Array,
    *,
    prefix: str = "hg.",
    hg_arch: str = "pixelshuffle",
    policy: Policy = F32,
) -> jax.Array:
    """Hallucination_Generator.forward (Hallucination_arch.py:97-137).

    ``img``/``mask`` must already be padded to a multiple of 32 (the composite
    wrapper handles the reflect padding).
    """
    if hg_arch.startswith("direct"):
        return hg_direct_apply(p, img, mask, prefix=prefix, policy=policy)
    img = policy.cast(img)
    mask = policy.cast(mask)

    c1 = _conv_block(p, f"{prefix}conv1", img, policy=policy)
    c2 = _conv_block(p, f"{prefix}conv2", max_pool2(c1), policy=policy)
    c3 = _conv_block(p, f"{prefix}conv3_2", max_pool2(_conv_block(p, f"{prefix}conv3_1", c2, policy=policy)), policy=policy)
    c4 = _conv_block(p, f"{prefix}conv4_2", max_pool2(_conv_block(p, f"{prefix}conv4_1", c3, policy=policy)), policy=policy)
    c5 = _conv_block(p, f"{prefix}conv5_2", max_pool2(_conv_block(p, f"{prefix}conv5_1", c4, policy=policy)), policy=policy)
    code = _conv_block(p, f"{prefix}conv_code2", max_pool2(_conv_block(p, f"{prefix}conv_code1", c5, policy=policy)), policy=policy)

    u = jnp.concatenate((_up_block(p, f"{prefix}Up_conv1", code, policy=policy), c5), axis=-1)
    u = conv2d(p, f"{prefix}conv6", u, policy=policy)
    u = jnp.concatenate((_up_block(p, f"{prefix}Up_conv2", u, policy=policy), c4), axis=-1)
    u = conv2d(p, f"{prefix}conv7", u, policy=policy)
    u = jnp.concatenate((_up_block(p, f"{prefix}Up_conv3", u, policy=policy), c3), axis=-1)
    u = conv2d(p, f"{prefix}conv8", u, policy=policy)
    u = jnp.concatenate((_up_block(p, f"{prefix}Up_conv4", u, policy=policy), c2), axis=-1)
    u = conv2d(p, f"{prefix}conv9", u, policy=policy)
    u = jnp.concatenate((_up_block(p, f"{prefix}Up_conv5", u, policy=policy), c1), axis=-1)
    u = conv2d(p, f"{prefix}conv10", u, policy=policy)

    out = conv2d(p, f"{prefix}conv_last", jnp.concatenate((u, img), axis=-1), policy=policy)
    return mask * out + img


def hg_direct_apply(
    p: Params,
    img: jax.Array,
    mask: jax.Array,
    *,
    prefix: str = "hg.",
    bottleneck_scale: int = 8,
    trunk_depth: int = 8,
    policy: Policy = F32,
) -> jax.Array:
    """Hallucination_Generator_Direct — one low-res masked residual island
    (Hallucination_arch.py:281-361)."""
    img = policy.cast(img)
    mask = policy.cast(mask)
    cond = jnp.concatenate((img, mask), axis=-1)
    low = avg_pool(cond, bottleneck_scale)
    out = relu(conv2d(p, f"{prefix}low_in", low, policy=policy))
    for i in range(trunk_depth):
        out = relu(conv2d(p, f"{prefix}trunk.{2 * i}", out, padding=1, policy=policy))
    out = conv2d(p, f"{prefix}low_out", out, policy=policy)
    out = pixel_shuffle(out, bottleneck_scale)
    out = align_to(out, img.shape[1], img.shape[2])
    return mask * out + img
