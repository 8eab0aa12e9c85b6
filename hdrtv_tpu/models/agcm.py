"""AGCM (Adaptive Global Color Mapping) — ConditionNet family.

Re-implements the semantics of
/root/reference/src/models/hdrtvnet_modules/Condition_arch.py (ConditionNet,
Color_Condition classifier variants, plain/affine/lite/lowrank/spatial modes)
as pure NHWC functions over a flat param dict keyed by the reference
state-dict names.

Default release arch: ``color_condition`` classifier — a small CNN on the
¼-resolution condition image producing a 6-dim global color vector, which
modulates three 1×1 convs on the full-resolution image via learned per-layer
scale/shift (Condition_arch.py:552-585).
"""

from __future__ import annotations

import re
import jax

from hdrtv_tpu.models.layers import (
    F32,
    Params,
    Policy,
    avg_pool,
    avg_pool_3s2p1,
    bilinear_resize,
    conv2d,
    global_avg_pool,
    instance_norm,
    leaky_relu,
    linear,
    relu,
)

# ---------------------------------------------------------------------------
# Classifier name normalization (Condition_arch.py:79-181 semantics)
# ---------------------------------------------------------------------------


def normalize_classifier_name(classifier: str | None) -> str:
    name = str(classifier or "color_condition").strip().lower().replace("-", "_")
    m = re.fullmatch(
        r"(?:agcm_)?spatial(?:_?mix_?global_?cnn|_?mixgcnn|_?global_?mix_?cnn)_?h?([0-9]+)?(?:_?wide_?([0-9]+))?(?:_?x_?([0-9]+))?",
        name,
    )
    if m:
        return f"agcm_spatialmixglobalcnnh{m.group(1) or 16}wide{m.group(2) or 32}x{m.group(3) or 4}"
    m = re.fullmatch(
        r"(?:agcm_)?spatial(?:_?mix_?global|_?mixg|_?global_?mix)_?h?([0-9]+)?(?:_?wide_?([0-9]+))?(?:_?x_?([0-9]+))?",
        name,
    )
    if m:
        return f"agcm_spatialmixglobalh{m.group(1) or 16}wide{m.group(2) or 32}x{m.group(3) or 4}"
    m = re.fullmatch(
        r"(?:agcm_)?spatial(?:_?mix|_?matrix|_?mat)_?h?([0-9]+)?(?:_?wide_?([0-9]+))?(?:_?x_?([0-9]+))?",
        name,
    )
    if m:
        return f"agcm_spatialmixh{m.group(1) or 16}wide{m.group(2) or 32}x{m.group(3) or 4}"
    m = re.fullmatch(
        r"(?:agcm_)?spatial(?:_?affine)?_?h?([0-9]+)?(?:_?wide_?([0-9]+))?(?:_?x_?([0-9]+))?",
        name,
    )
    if m:
        return f"agcm_spatialh{m.group(1) or 16}wide{m.group(2) or 32}x{m.group(3) or 4}"
    m = re.fullmatch(r"(?:agcm_)?lite(?:_?agcm)?_?([0-9]+)?", name)
    if m:
        return f"agcm_lite{m.group(1) or 16}"
    m = re.fullmatch(r"(?:agcm_)?lowrank_?([0-9]+)?", name)
    if m:
        return f"agcm_lowrank{m.group(1) or 16}"
    aliases = {
        "color": "color_condition",
        "default": "color_condition",
        "color_condition_noin": "color_condition_woin",
        "color_condition_wo_in": "color_condition_woin",
        "color_condition_no_in": "color_condition_woin",
        "base": "agcm_plain",
        "base3": "agcm_plain",
        "plain": "agcm_plain",
        "plain3": "agcm_plain",
        "plain_agcm": "agcm_plain",
        "plain_agcm3": "agcm_plain",
        "agcm_base": "agcm_plain",
        "agcm_base3": "agcm_plain",
        "affine": "agcm_affine",
        "adaptive_affine": "agcm_affine",
    }
    return aliases.get(name, name)


def agcm_lite_width(classifier: str) -> int | None:
    m = re.fullmatch(r"agcm_lite([0-9]+)", normalize_classifier_name(classifier))
    return None if not m else max(4, min(64, int(m.group(1))))


def agcm_lowrank_rank(classifier: str) -> int | None:
    m = re.fullmatch(r"agcm_lowrank([0-9]+)", normalize_classifier_name(classifier))
    return None if not m else max(1, min(64, int(m.group(1))))


def agcm_spatial_config(classifier: str) -> tuple[int, int, int] | None:
    m = re.fullmatch(
        r"agcm_spatial(?:mixglobalcnn|mixgcnn|mixglobal|mixg|mix)?h([0-9]+)wide([0-9]+)x([0-9]+)",
        normalize_classifier_name(classifier),
    )
    if not m:
        return None
    return (
        max(2, min(32, int(m.group(1)))),
        max(4, min(128, int(m.group(2)))),
        max(1, min(16, int(m.group(3)))),
    )


def agcm_mode(classifier: str) -> str:
    name = normalize_classifier_name(classifier)
    if name == "agcm_plain":
        return "plain"
    if name == "agcm_affine":
        return "affine"
    if agcm_spatial_config(name) is not None:
        return "spatial_mix" if name.startswith("agcm_spatialmix") else "spatial_affine"
    if agcm_lite_width(name) is not None:
        return "lite"
    if agcm_lowrank_rank(name) is not None:
        return "lowrank"
    return "dynamic"


def is_plain_agcm_classifier(classifier: str) -> bool:
    return agcm_mode(classifier) in {"plain", "affine", "spatial_mix", "spatial_affine"}


# ---------------------------------------------------------------------------
# Classifier CNNs (Color_Condition variants)
# ---------------------------------------------------------------------------

# Sequential-index layouts: list of (conv_idx, instancenorm_idx|None) blocks,
# plus the trailing 1x1 conv index. Derived from nn.Sequential numbering of
# color_block (4 entries with norm: conv,pool,act,IN; 3 without).
_CLASSIFIER_LAYOUTS = {
    "color_condition": ([(0, 3), (4, 7), (8, 11), (12, 15), (16, None)], 20),
    "color_condition_wodropout": ([(0, 3), (4, 7), (8, 11), (12, 15), (16, None)], 19),
    "color_condition_woin": ([(0, None), (3, None), (6, None), (9, None), (12, None)], 16),
    "color_condition_3layer": ([(0, 3), (4, 7), (8, None)], 12),
    "color_condition_4layer": ([(0, 3), (4, 7), (8, 11), (12, None)], 16),
    "color_condition_6layer": ([(0, 3), (4, 7), (8, 11), (12, 15), (16, 19), (20, None)], 24),
}


def classifier_apply(
    p: Params, prefix: str, classifier: str, cond: jax.Array, *, policy: Policy = F32
) -> jax.Array:
    """Color_Condition classifier: returns the (N, cond_c) global color vector.

    Each block: 1×1 conv → AvgPool(3,2,1,count_include_pad) → LeakyReLU(0.2)
    [→ InstanceNorm]; then Dropout (eval no-op) → 1×1 conv → global avg pool.

    Under manual (shard_map) spatial sharding the ¼-res condition shard is
    all-gathered once and the classifier runs replicated: its InstanceNorm +
    global pool need global statistics, and the input is a few MB while the
    trunk is 1×1 convs — gathering beats sharding the reductions.
    """
    from hdrtv_tpu.parallel import halo as _halo

    if _halo.active():
        cond = _halo.gather_w(cond, axis=2)
        with _halo.suspended():
            return classifier_apply(p, prefix, classifier, cond, policy=policy)
    layout, final_conv = _CLASSIFIER_LAYOUTS[normalize_classifier_name(classifier)]
    x = policy.cast(cond)
    for conv_idx, in_idx in layout:
        x = conv2d(p, f"{prefix}model.{conv_idx}", x, policy=policy)
        x = avg_pool_3s2p1(x)
        x = leaky_relu(x, 0.2)
        if in_idx is not None:
            x = instance_norm(p, f"{prefix}model.{in_idx}", x, policy=policy)
    x = conv2d(p, f"{prefix}model.{final_conv}", x, policy=policy)
    return global_avg_pool(x, keepdims=False)  # (N, cond_c)


# ---------------------------------------------------------------------------
# ConditionNet forward
# ---------------------------------------------------------------------------


def _modulate(out: jax.Array, scale: jax.Array, shift: jax.Array) -> jax.Array:
    """out * scale + shift + out   (== out * (scale + 1) + shift)."""
    n, c = scale.shape
    scale = scale.reshape(n, 1, 1, c)
    shift = shift.reshape(n, 1, 1, c)
    return out * scale + shift + out


def _spatial_params(
    p: Params, prefix: str, classifier: str, content: jax.Array, *, policy: Policy
) -> jax.Array:
    """Shared low-res trunk of the spatial AGCM variants; returns full-res params."""
    scale_k, _, depth = agcm_spatial_config(classifier)
    name = normalize_classifier_name(classifier)
    low = avg_pool(policy.cast(content), scale_k)
    params = relu(conv2d(p, f"{prefix}spatial_in", low, policy=policy))
    for i in range(depth):
        params = relu(conv2d(p, f"{prefix}spatial_trunk.{2 * i}", params, padding=1, policy=policy))
    params = conv2d(p, f"{prefix}spatial_out", params, policy=policy)
    if name.startswith(("agcm_spatialmixglobal", "agcm_spatialmixg")):
        if name.startswith(("agcm_spatialmixglobalcnn", "agcm_spatialmixgcnn")):
            g = relu(conv2d(p, f"{prefix}global_net.0", low, policy=policy))
            g = relu(conv2d(p, f"{prefix}global_net.2", g, stride=2, padding=1, policy=policy))
            g = relu(conv2d(p, f"{prefix}global_net.4", g, stride=2, padding=1, policy=policy))
            g = global_avg_pool(g)
            g = conv2d(p, f"{prefix}global_net.7", g, policy=policy)
        else:
            g = global_avg_pool(policy.cast(content))
            g = relu(conv2d(p, f"{prefix}global_in", g, policy=policy))
            g = conv2d(p, f"{prefix}global_out", g, policy=policy)
        params = params + g
    h, w = content.shape[1], content.shape[2]
    if (params.shape[1], params.shape[2]) != (h, w):
        params = bilinear_resize(params, h, w)
    return params


def agcm_apply(
    p: Params,
    content: jax.Array,
    cond: jax.Array,
    *,
    prefix: str = "AGCM.",
    classifier: str = "color_condition",
    policy: Policy = F32,
) -> jax.Array:
    """ConditionNet.forward — returns the color-mapped image (NHWC).

    ``content`` is the full-res [0,1] RGB frame; ``cond`` the ¼-res condition
    image (ignored by the plain/affine/spatial modes, which work off content).
    """
    mode = agcm_mode(classifier)
    content = policy.cast(content)

    if mode == "plain":
        out = relu(conv2d(p, f"{prefix}conv_first", content, policy=policy))
        out = relu(conv2d(p, f"{prefix}HRconv", out, policy=policy))
        return conv2d(p, f"{prefix}conv_last", out, policy=policy)

    if mode == "affine":
        pooled = global_avg_pool(content)
        h = relu(conv2d(p, f"{prefix}affine.0", pooled, policy=policy))
        params = conv2d(p, f"{prefix}affine.2", h, policy=policy)  # (N,1,1,6)
        scale, shift = params[..., :3], params[..., 3:]
        return content * (scale + 1.0) + shift

    if mode == "spatial_affine":
        params = _spatial_params(p, prefix, classifier, content, policy=policy)
        scale, shift = params[..., :3], params[..., 3:]
        return content * (scale + 1.0) + shift

    if mode == "spatial_mix":
        params = _spatial_params(p, prefix, classifier, content, policy=policy)
        delta, shift = params[..., :9], params[..., 9:]
        r, g, b = content[..., 0:1], content[..., 1:2], content[..., 2:3]
        out_r = r * (delta[..., 0:1] + 1.0) + g * delta[..., 1:2] + b * delta[..., 2:3] + shift[..., 0:1]
        out_g = r * delta[..., 3:4] + g * (delta[..., 4:5] + 1.0) + b * delta[..., 5:6] + shift[..., 1:2]
        out_b = r * delta[..., 6:7] + g * delta[..., 7:8] + b * (delta[..., 8:9] + 1.0) + shift[..., 2:3]
        return jax.numpy.concatenate((out_r, out_g, out_b), axis=-1)

    # dynamic / lite / lowrank: classifier-driven global modulation
    fea = classifier_apply(p, f"{prefix}classifier.", "color_condition", cond, policy=policy)

    scale_first = linear(p, f"{prefix}cond_scale_first", fea, policy=policy)
    shift_first = linear(p, f"{prefix}cond_shift_first", fea, policy=policy)
    scale_hr = linear(p, f"{prefix}cond_scale_HR", fea, policy=policy)
    shift_hr = linear(p, f"{prefix}cond_shift_HR", fea, policy=policy)
    scale_last = linear(p, f"{prefix}cond_scale_last", fea, policy=policy)
    shift_last = linear(p, f"{prefix}cond_shift_last", fea, policy=policy)

    out = conv2d(p, f"{prefix}conv_first", content, policy=policy)
    out = relu(_modulate(out, scale_first, shift_first))
    if mode == "lowrank":
        out = conv2d(
            p, f"{prefix}HRconv_expand", conv2d(p, f"{prefix}HRconv_reduce", out, policy=policy), policy=policy
        )
    else:
        out = conv2d(p, f"{prefix}HRconv", out, policy=policy)
    out = relu(_modulate(out, scale_hr, shift_hr))
    out = conv2d(p, f"{prefix}conv_last", out, policy=policy)
    return _modulate(out, scale_last, shift_last)
