"""LE (Local Enhancement) — SFT-conditioned UNet (HDRUNet3T1 family).

Semantics of /root/reference/src/models/hdrtvnet_modules/HDRUNet3T1_arch.py
and arch_util.py (SFTLayer, ResBlock_with_SFT, ResBlock_noSFT): a 3-level
stride-2 UNet over nf=32 features, SFT-modulated residual trunks at each
scale, pixel-shuffle upsampling, and a long skip ``out = mask_out + out``.

The "aligned fast graph vs safe crop/pad" split of the reference
(HDRUNet3T1_arch.py:78-104, flipped per preset at hdrtvnet_torch.py:219-231)
collapses here: shapes are static under jit, so the ``align_to`` branches
trace to nothing when shapes already line up — one code path serves both.
"""

from __future__ import annotations

import jax

from hdrtv_tpu.models.layers import (
    F32,
    Params,
    Policy,
    align_to,
    conv2d,
    leaky_relu,
    pixel_shuffle,
    relu,
)


def sft(p: Params, name: str, fea: jax.Array, cond: jax.Array, *, policy: Policy = F32) -> jax.Array:
    """SFTLayer: x * (scale + 1) + shift, scale/shift from two 1×1 conv stacks
    with LeakyReLU(0.1) (arch_util.py:60-73)."""
    scale = conv2d(
        p, f"{name}.SFT_scale_conv1", leaky_relu(conv2d(p, f"{name}.SFT_scale_conv0", cond, policy=policy), 0.1),
        policy=policy,
    )
    shift = conv2d(
        p, f"{name}.SFT_shift_conv1", leaky_relu(conv2d(p, f"{name}.SFT_shift_conv0", cond, policy=policy), 0.1),
        policy=policy,
    )
    return fea * (scale + 1.0) + shift


def resblock_sft(p: Params, name: str, fea: jax.Array, cond: jax.Array, *, policy: Policy = F32) -> jax.Array:
    """ResBlock_with_SFT (arch_util.py:75-95)."""
    out = sft(p, f"{name}.sft1", fea, cond, policy=policy)
    out = relu(conv2d(p, f"{name}.conv1", out, padding=1, policy=policy))
    out = sft(p, f"{name}.sft2", out, cond, policy=policy)
    out = conv2d(p, f"{name}.conv2", out, padding=1, policy=policy)
    return fea + out


def resblock_plain(p: Params, name: str, fea: jax.Array, cond: jax.Array, *, policy: Policy = F32) -> jax.Array:
    """ResBlock_noSFT — quantization-friendly trunk block (arch_util.py:98-110)."""
    out = relu(conv2d(p, f"{name}.conv1", fea, padding=1, policy=policy))
    out = conv2d(p, f"{name}.conv2", out, padding=1, policy=policy)
    return fea + out


def _trunk(p, name, fea, cond, n_blocks, block_fn, *, policy):
    for i in range(n_blocks):
        fea = block_fn(p, f"{name}.{i}", fea, cond, policy=policy)
    return fea


# Trunk depths per le_arch. "sft" is the release default; "cleantrunk*" are the
# TensorRT-era quantization-friendly variants (SFT removed from trunks).
_TRUNK_BLOCKS = {"trunk1": 1, "trunk2": 1, "trunk3": 4, "trunk4": 1, "trunk5": 1}


def _act(act_type: str):
    if act_type == "leakyrelu":
        return lambda x: leaky_relu(x, 0.1)
    return relu


def le_apply(
    p: Params,
    img: jax.Array,
    cond_img: jax.Array,
    *,
    prefix: str = "LE.",
    le_arch: str = "sft",
    act_type: str = "relu",
    weighting_network: bool = False,
    trunk3_depth: int = 4,
    policy: Policy = F32,
) -> jax.Array:
    """HDRUNet3T1.forward.

    ``img`` and ``cond_img`` are both the AGCM output in the ensemble
    (Ensemble_AGCM_LE_arch.py:889-897 passes [cond_out, cond_out]).
    """
    act = _act(act_type)
    img = policy.cast(img)
    cond_img = policy.cast(cond_img)
    le_arch = (le_arch or "sft").replace("-", "_")
    if le_arch.startswith(("cleantrunk", "flat")):
        block_fn = resblock_plain
    else:
        block_fn = resblock_sft
    t3 = trunk3_depth
    if le_arch.startswith("cleantrunk_deep"):
        t3 = int(le_arch.replace("cleantrunk_deep", "") or 8)

    if weighting_network:
        m = relu(conv2d(p, f"{prefix}mask_est.0", img, padding=1, policy=policy))
        m = relu(conv2d(p, f"{prefix}mask_est.2", m, padding=1, policy=policy))
        m = relu(conv2d(p, f"{prefix}mask_est.4", m, policy=policy))
        mask = conv2d(p, f"{prefix}mask_est.6", m, policy=policy)
        mask_out = mask * img
    else:
        mask_out = img  # long skip connection

    # Condition branch: cond_first then CondNet1..4 at 4 scales.
    c = leaky_relu(conv2d(p, f"{prefix}cond_first.0", cond_img, padding=1, policy=policy), 0.1)
    c = leaky_relu(conv2d(p, f"{prefix}cond_first.2", c, policy=policy), 0.1)
    c = leaky_relu(conv2d(p, f"{prefix}cond_first.4", c, policy=policy), 0.1)

    c1 = leaky_relu(conv2d(p, f"{prefix}CondNet1.0", c, policy=policy), 0.1)
    c1 = leaky_relu(conv2d(p, f"{prefix}CondNet1.2", c1, policy=policy), 0.1)
    cond1 = conv2d(p, f"{prefix}CondNet1.4", c1, policy=policy)

    c2 = leaky_relu(conv2d(p, f"{prefix}CondNet2.0", c, stride=2, padding=1, policy=policy), 0.1)
    c2 = leaky_relu(conv2d(p, f"{prefix}CondNet2.2", c2, policy=policy), 0.1)
    cond2 = conv2d(p, f"{prefix}CondNet2.4", c2, policy=policy)

    c3 = leaky_relu(conv2d(p, f"{prefix}CondNet3.0", c, stride=2, padding=1, policy=policy), 0.1)
    c3 = leaky_relu(conv2d(p, f"{prefix}CondNet3.2", c3, stride=2, padding=1, policy=policy), 0.1)
    cond3 = conv2d(p, f"{prefix}CondNet3.4", c3, policy=policy)

    c4 = leaky_relu(conv2d(p, f"{prefix}CondNet4.0", c, stride=2, padding=1, policy=policy), 0.1)
    c4 = leaky_relu(conv2d(p, f"{prefix}CondNet4.2", c4, stride=2, padding=1, policy=policy), 0.1)
    cond4 = conv2d(p, f"{prefix}CondNet4.4", c4, stride=2, padding=1, policy=policy)

    # Encoder.
    fea0 = act(conv2d(p, f"{prefix}conv_first", img, padding=1, policy=policy))
    fea0 = sft(p, f"{prefix}SFT_layer1", fea0, cond1, policy=policy)
    fea0 = act(conv2d(p, f"{prefix}HR_conv1", fea0, padding=1, policy=policy))

    fea1 = act(conv2d(p, f"{prefix}down_conv1", fea0, stride=2, padding=1, policy=policy))
    fea1 = _trunk(p, f"{prefix}recon_trunk1", fea1, cond2, 1, block_fn, policy=policy)

    fea2 = act(conv2d(p, f"{prefix}down_conv2", fea1, stride=2, padding=1, policy=policy))
    fea2 = _trunk(p, f"{prefix}recon_trunk2", fea2, cond3, 1, block_fn, policy=policy)

    fea3 = act(conv2d(p, f"{prefix}down_conv3", fea2, stride=2, padding=1, policy=policy))
    out = _trunk(p, f"{prefix}recon_trunk3", fea3, cond4, t3, block_fn, policy=policy)
    out = out + fea3

    # Decoder with skip adds; align_to is a no-op for preset-aligned shapes.
    up = act(pixel_shuffle(conv2d(p, f"{prefix}up_conv1.0", out, padding=1, policy=policy), 2))
    up = align_to(up, fea2.shape[1], fea2.shape[2])
    out = _trunk(p, f"{prefix}recon_trunk4", up + fea2, cond3, 1, block_fn, policy=policy)

    up = act(pixel_shuffle(conv2d(p, f"{prefix}up_conv2.0", out, padding=1, policy=policy), 2))
    up = align_to(up, fea1.shape[1], fea1.shape[2])
    out = _trunk(p, f"{prefix}recon_trunk5", up + fea1, cond2, 1, block_fn, policy=policy)

    up = act(pixel_shuffle(conv2d(p, f"{prefix}up_conv3.0", out, padding=1, policy=policy), 2))
    up = align_to(up, fea0.shape[1], fea0.shape[2])
    out = up + fea0
    out = sft(p, f"{prefix}SFT_layer2", out, cond1, policy=policy)

    out = act(conv2d(p, f"{prefix}HR_conv2", out, padding=1, policy=policy))
    out = conv2d(p, f"{prefix}conv_last", out, padding=1, policy=policy)
    out = align_to(out, mask_out.shape[1], mask_out.shape[2])
    return mask_out + out
