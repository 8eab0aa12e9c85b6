"""HDRTVNet++ top-level models: Ensemble (AGCM→LE) and HG composite.

Semantics of /root/reference/src/models/hdrtvnet_modules/Ensemble_AGCM_LE_arch.py
and HG_Composite_arch.py over the functional AGCM/LE/HG modules. Includes the
post-correction head family (spatial/affine/residual/global color correctors,
Ensemble_AGCM_LE_arch.py:91-324) and the highlight mask + /32 reflect padding
of the composite (HG_Composite_arch.py:77-105).
"""

from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp

from hdrtv_tpu.models.agcm import agcm_apply, normalize_classifier_name
from hdrtv_tpu.models.hg import hg_apply
from hdrtv_tpu.models.layers import (
    F32,
    Params,
    Policy,
    avg_pool,
    bilinear_resize,
    conv2d,
    global_avg_pool,
    pad_reflect,
    pixel_shuffle,
    relu,
)
from hdrtv_tpu.models.le_unet import le_apply


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture selection — mirrors the reference checkpoint's
    ``architecture`` dict (hdrtvnet_torch.py:1805-1827)."""

    classifier: str = "color_condition"
    cond_c: int = 6
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 32
    act_type: str = "relu"
    weighting_network: bool = False
    use_hg: bool = False
    hg_nf: int = 64
    mask_r: float = 0.75
    le_arch: str = "sft"
    hg_arch: str = "pixelshuffle"
    post_correction: str = ""

    # Env-var arch overrides consulted when neither the checkpoint's
    # ``architecture`` dict nor an explicit override names the field
    # (hdrtvnet_torch.py:2093-2110, :1793, :3717-3718).
    _ENV_FIELDS = {
        "classifier": "HDRTVNET_CLASSIFIER",
        "le_arch": "HDRTVNET_LE_ARCH",
        "hg_arch": "HDRTVNET_HG_ARCH",
        "post_correction": "HDRTVNET_POST_CORRECTION",
    }

    @classmethod
    def from_arch_dict(cls, arch: dict | None, **overrides) -> "ModelConfig":
        import os

        arch = dict(arch or {})
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in arch.items() if k in known}
        kwargs.update(overrides)
        for field, var in cls._ENV_FIELDS.items():
            if field not in kwargs:
                v = os.environ.get(var, "").strip()
                if v:
                    kwargs[field] = v
        if "classifier" in kwargs:
            kwargs["classifier"] = normalize_classifier_name(kwargs["classifier"])
        return cls(**kwargs)


# ---------------------------------------------------------------------------
# Post-correction heads
# ---------------------------------------------------------------------------


def parse_post_correction(spec: str | None):
    """_parse_post_correction (Ensemble_AGCM_LE_arch.py:24-88)."""
    spec = str(spec or "").strip().lower()
    if not spec or spec in {"none", "off", "0", "false"}:
        return None
    canonical = spec.replace("-", "").replace("_", "")
    m = re.fullmatch(
        r"(?:post)?global(?:color)?(?:correct|correction|corr)?wide([0-9]+)x([0-9]+)"
        r"(?:post)?(?:color)?(?:correct|correction|corr)h(4|8|16)wide([0-9]+)x([0-9]+)",
        canonical,
    )
    if m:
        return ("global_spatial", int(m.group(1)), int(m.group(2)), int(m.group(3)), int(m.group(4)), int(m.group(5)))
    m = re.fullmatch(
        r"(?:post)?global(?:color)?(?:correct|correction|corr)?wide([0-9]+)x([0-9]+)"
        r"(?:post)?res(?:idual)?h(2|4|8|16)wide([0-9]+)x([0-9]+)",
        canonical,
    )
    if m:
        return ("global_residual", int(m.group(1)), int(m.group(2)), int(m.group(3)), int(m.group(4)), int(m.group(5)))
    m = re.fullmatch(r"(?:post)?res(?:idual)?h(2|4|8|16)wide([0-9]+)x([0-9]+)", canonical)
    if m:
        return ("residual", int(m.group(1)), int(m.group(2)), int(m.group(3)))
    m = re.fullmatch(r"(?:post)?global(?:color)?(?:correct|correction|corr)?wide([0-9]+)x([0-9]+)", canonical)
    if m:
        return ("global", 1, int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"(?:post)?affineh(4|8|16)wide([0-9]+)x([0-9]+)", canonical)
    if m:
        return ("affine", int(m.group(1)), int(m.group(2)), int(m.group(3)))
    m = re.fullmatch(r"(?:post)?(?:color)?(?:correct|correction|corr)h(4|8|16)wide([0-9]+)x([0-9]+)", canonical)
    if not m:
        raise ValueError(f"Unsupported post_correction '{spec}'")
    return ("spatial", int(m.group(1)), int(m.group(2)), int(m.group(3)))


def _color_matrix_apply(hdr: jax.Array, delta: jax.Array, shift: jax.Array) -> jax.Array:
    """out_c = hdr · (row_c + e_c) + shift_c for a 3×3 matrix + RGB shift."""
    r, g, b = hdr[..., 0:1], hdr[..., 1:2], hdr[..., 2:3]
    out_r = r * (delta[..., 0:1] + 1.0) + g * delta[..., 1:2] + b * delta[..., 2:3] + shift[..., 0:1]
    out_g = r * delta[..., 3:4] + g * (delta[..., 4:5] + 1.0) + b * delta[..., 5:6] + shift[..., 1:2]
    out_b = r * delta[..., 6:7] + g * delta[..., 7:8] + b * (delta[..., 8:9] + 1.0) + shift[..., 2:3]
    return jnp.concatenate((out_r, out_g, out_b), axis=-1)


def _pc_trunk(p: Params, prefix: str, low: jax.Array, depth: int, *, policy: Policy) -> jax.Array:
    x = relu(conv2d(p, f"{prefix}trunk.0", low, policy=policy))
    for i in range(depth):
        x = relu(conv2d(p, f"{prefix}trunk.{2 * (i + 1)}", x, padding=1, policy=policy))
    return x


def post_correction_apply(
    p: Params, spec: str, img: jax.Array, hdr: jax.Array, *, prefix: str = "post_correction.", policy: Policy = F32
) -> jax.Array:
    cfg = parse_post_correction(spec)
    if cfg is None:
        return hdr
    mode = cfg[0]
    h, w = hdr.shape[1], hdr.shape[2]

    def _full(v, limit):
        if (v.shape[1], v.shape[2]) != (h, w):
            v = bilinear_resize(v, h, w)
        return jnp.tanh(v) * limit

    def _global(pp, gprefix, limit=0.25):
        params = conv2d(p, f"{gprefix}net.1", global_avg_pool(jnp.concatenate((img, hdr), axis=-1)), policy=policy)
        params = relu(params)
        # net indices: 1=conv, (3,5,..)=hidden convs, last = 12-out conv.
        idx = 3
        while f"{gprefix}net.{idx + 2}.weight" in p or f"{gprefix}net.{idx + 2}.weight_int8" in p:
            params = relu(conv2d(p, f"{gprefix}net.{idx}", params, policy=policy))
            idx += 2
        params = conv2d(p, f"{gprefix}net.{idx}", params, policy=policy)
        params = jnp.tanh(params) * limit
        return _color_matrix_apply(hdr, params[..., :9], params[..., 9:])

    if mode == "global":
        return _global(p, prefix)
    if mode in ("global_spatial", "global_residual"):
        hdr_g = _global(p, prefix)
        sub = "spatial." if mode == "global_spatial" else "residual."
        _, _, _, scale, width, depth = cfg
        inner = ("spatial", scale, width, depth) if mode == "global_spatial" else ("residual", scale, width, depth)
        return _post_spatial_like(p, f"{prefix}{sub}", inner, img, hdr_g, policy=policy)
    return _post_spatial_like(p, prefix, cfg, img, hdr, policy=policy)


def _post_spatial_like(p, prefix, cfg, img, hdr, *, policy):
    mode, scale, width, depth = cfg[0], cfg[1], cfg[2], cfg[3]
    h, w = hdr.shape[1], hdr.shape[2]
    low = avg_pool(jnp.concatenate((img, hdr), axis=-1), scale)
    x = _pc_trunk(p, prefix, low, depth, policy=policy)
    limit = 0.20 if mode == "residual" else 0.25
    if mode == "residual":
        delta = pixel_shuffle(conv2d(p, f"{prefix}out", x, policy=policy), scale)
        delta = jnp.tanh(delta) * limit
        if (delta.shape[1], delta.shape[2]) != (h, w):
            delta = bilinear_resize(delta, h, w)
        return hdr + delta
    params = conv2d(p, f"{prefix}out", x, policy=policy)
    if (params.shape[1], params.shape[2]) != (h, w):
        params = bilinear_resize(params, h, w)
    params = jnp.tanh(params) * limit
    if mode == "affine":
        return hdr * (1.0 + params[..., :3]) + params[..., 3:]
    return _color_matrix_apply(hdr, params[..., :9], params[..., 9:])


# ---------------------------------------------------------------------------
# Ensemble + composite forwards
# ---------------------------------------------------------------------------


def ensemble_agcm_le(
    p: Params,
    img: jax.Array,
    cond: jax.Array,
    cfg: ModelConfig = ModelConfig(),
    *,
    prefix: str = "",
    policy: Policy = F32,
) -> jax.Array:
    """Ensemble_AGCM_LE.forward (Ensemble_AGCM_LE_arch.py:889-897):
    AGCM color-maps the frame, LE refines it with itself as condition."""
    cond_out = agcm_apply(
        p, img, cond, prefix=f"{prefix}AGCM.", classifier=cfg.classifier, policy=policy
    )
    out = le_apply(
        p,
        cond_out,
        cond_out,
        prefix=f"{prefix}LE.",
        le_arch=cfg.le_arch,
        act_type=cfg.act_type,
        weighting_network=cfg.weighting_network,
        policy=policy,
    )
    if cfg.post_correction:
        out = post_correction_apply(
            p, cfg.post_correction, policy.cast(img), out, prefix=f"{prefix}post_correction.", policy=policy
        )
    return out


def make_mask(img: jax.Array, r: float = 0.75, thresh: float = 0.1) -> jax.Array:
    """Highlight mask (HG_Composite_arch.py:77-84): binarized normalized maxRGB."""
    m = jnp.max(img, axis=-1, keepdims=True)
    m = jnp.clip((m - r) / (1.0 - r), 0.0, 1.0)
    return (m > thresh).astype(img.dtype)


def hg_composite(
    p: Params,
    img: jax.Array,
    cond: jax.Array,
    cfg: ModelConfig = ModelConfig(use_hg=True),
    *,
    policy: Policy = F32,
) -> jax.Array:
    """HG_Composite.forward: base ensemble → highlight mask → /32 reflect pad →
    HG → crop back (HG_Composite_arch.py:86-107)."""
    base_out = ensemble_agcm_le(p, img, cond, cfg, prefix="base.", policy=policy)
    mask = make_mask(base_out, r=cfg.mask_r)

    h, w = base_out.shape[1], base_out.shape[2]
    pad_h = (32 - (h % 32)) % 32
    pad_w = (32 - (w % 32)) % 32
    base_pad = pad_reflect(base_out, pad_h, pad_w)
    mask_pad = pad_reflect(mask, pad_h, pad_w)
    hg_out = hg_apply(p, base_pad, mask_pad, prefix="hg.", hg_arch=cfg.hg_arch, policy=policy)
    if pad_h or pad_w:
        hg_out = hg_out[:, :h, :w, :]
    return hg_out


def model_apply(
    p: Params, img: jax.Array, cond: jax.Array, cfg: ModelConfig, *, policy: Policy = F32
) -> jax.Array:
    """Dispatch on use_hg — the single forward used by the runtime processor."""
    if cfg.use_hg:
        return hg_composite(p, img, cond, cfg, policy=policy)
    return ensemble_agcm_le(p, img, cond, cfg, policy=policy)
