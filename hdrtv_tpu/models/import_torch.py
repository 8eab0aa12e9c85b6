"""Reference checkpoint import: torch ``.pt`` state dicts → flat NHWC pytrees.

Reads the reference's shipped weights (fp32 ``HR.pt`` layouts and the portable
INT8 checkpoints described at hdrtvnet_torch.py:1102-1218) and converts them
to this package's layout:

- conv weights  (O, I, kh, kw)  →  (kh, kw, I, O)   [HWIO]
- linear weights (out, in)      →  (in, out)
- int8 weights keep the same transforms; per-out-channel scales stay (O,)
  which broadcasts over the last (O) axis of HWIO / (in,out)
- fp16 buffers are upcast to fp32 (the Policy casts at use)

torch is imported lazily and only used as a deserializer (``weights_only``
where possible — the reference tree is untrusted content). Converted params
can be cached to ``.npz`` so TPU-only environments never touch torch.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

from hdrtv_tpu.models.agcm import (
    agcm_lite_width,
    agcm_lowrank_rank,
    normalize_classifier_name,
)
from hdrtv_tpu.models.hdrtvnet import ModelConfig

_META_KEYS = (
    "compute_dtype",
    "quantization",
    "qat_strategy",
    "channel_threshold",
    "qat_epochs",
    "qat_lr",
    "qat_recipe",
    "architecture",
    "w8a8_layers",
    "selection_mode",
    "auto_selection",
    "fp16_layers",
    "activation_quant",
    "checkpoint_format",
    "state_format",
    "backend_neutral",
    "target_backend",
    "tensorrt_source_checkpoint",
    "tensorrt_source_schema",
    "tensorrt_source_signature",
    "fp8_source_schema",
    "fp8_source_note",
    "calibration_method",
)


def _to_numpy(t: Any) -> np.ndarray:
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    if arr.dtype == np.float16:
        arr = arr.astype(np.float32)
    return arr


def load_torch_file(path: str) -> tuple[dict[str, np.ndarray], dict[str, Any]]:
    """Load a reference checkpoint; returns (raw torch-layout state, metadata)."""
    import torch  # lazy; deserializer only

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)

    meta: dict[str, Any] = {}
    if isinstance(obj, dict) and "state_dict" in obj:
        state = obj["state_dict"]
        for k in _META_KEYS:
            if k in obj:
                meta[k] = obj[k]
        # Quantized-layer *names* only (the qparams tensors stay behind):
        # the FP8 sources carry the matching INT8 composition whose layer
        # set defines where ModelOpt emits FP8 Q/DQ at build time.
        if isinstance(obj.get("weight_qparams"), dict):
            meta["quantized_layers"] = [str(k) for k in obj["weight_qparams"]]
    else:
        state = obj
    out = {}
    for k, v in state.items():
        if hasattr(v, "shape"):
            out[str(k)] = _to_numpy(v)
    return out, meta


def _is_linear_key(key: str) -> bool:
    """Keys whose 2-D weights are nn.Linear (cond scale/shift heads)."""
    stem = key.rsplit(".", 1)[0]
    leaf = stem.rsplit(".", 1)[-1]
    return leaf.startswith(("cond_scale", "cond_shift"))


def convert_state(raw: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Torch layout → NHWC/HWIO flat params; strips ``module.`` prefixes."""
    out: dict[str, np.ndarray] = {}
    for key, arr in raw.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith(("weight", "weight_int8")):
            if arr.ndim == 4:
                arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
            elif arr.ndim == 2:
                arr = np.transpose(arr, (1, 0))  # (out,in) -> (in,out)
        out[key] = np.ascontiguousarray(arr)
    return out


# ---------------------------------------------------------------------------
# Classifier-variant remaps (Condition_arch.remap_condition_state_dict)
# ---------------------------------------------------------------------------


def remap_condition_state(
    state: dict[str, np.ndarray], prefix: str = "", classifier: str = "color_condition"
) -> dict[str, np.ndarray]:
    """Key remaps for woIN / lite / lowrank classifier variants, on *torch-layout*
    state (before convert_state). Mirrors Condition_arch.py:184-295."""
    classifier = normalize_classifier_name(classifier)

    rank = agcm_lowrank_rank(classifier)
    if rank is not None:
        mapped = dict(state)
        w_key, b_key = f"{prefix}HRconv.weight", f"{prefix}HRconv.bias"
        if w_key in mapped and f"{prefix}HRconv_reduce.weight" not in mapped:
            weight = mapped.pop(w_key).astype(np.float64)
            bias = mapped.pop(b_key, None)
            matrix = weight.reshape(weight.shape[0], weight.shape[1])
            u, s, vh = np.linalg.svd(matrix, full_matrices=False)
            r = min(int(rank), int(s.size))
            sqrt_s = np.sqrt(np.clip(s[:r], 0.0, None))
            mapped[f"{prefix}HRconv_reduce.weight"] = (
                (sqrt_s[:, None] * vh[:r, :]).reshape(r, weight.shape[1], 1, 1).astype(np.float32)
            )
            mapped[f"{prefix}HRconv_reduce.bias"] = np.zeros(r, np.float32)
            mapped[f"{prefix}HRconv_expand.weight"] = (
                (u[:, :r] * sqrt_s[None, :]).reshape(weight.shape[0], r, 1, 1).astype(np.float32)
            )
            mapped[f"{prefix}HRconv_expand.bias"] = (
                np.zeros(weight.shape[0], np.float32) if bias is None else bias.astype(np.float32)
            )
        return mapped

    lite = agcm_lite_width(classifier)
    if lite is not None:
        mapped = dict(state)

        def _slice(key, *slices):
            full = f"{prefix}{key}"
            if full in mapped and hasattr(mapped[full], "ndim"):
                mapped[full] = np.ascontiguousarray(mapped[full][tuple(slices)])

        for name in ("cond_scale_first.weight", "cond_scale_HR.weight", "cond_shift_first.weight", "cond_shift_HR.weight"):
            _slice(name, slice(0, lite), slice(None))
        for name in (
            "cond_scale_first.bias", "cond_scale_HR.bias", "cond_shift_first.bias", "cond_shift_HR.bias",
            "conv_first.weight", "conv_first.bias", "HRconv.bias",
        ):
            _slice(name, slice(0, lite))
        _slice("HRconv.weight", slice(0, lite), slice(0, lite), slice(None), slice(None))
        _slice("conv_last.weight", slice(None), slice(0, lite), slice(None), slice(None))
        return mapped

    if classifier != "color_condition_woin":
        return dict(state)

    mapped = dict(state)
    root = f"{prefix}classifier.model."
    if not any(k.startswith(f"{root}20.") for k in mapped):
        return mapped
    drop = tuple(f"{root}{i}." for i in (3, 7, 11, 15))
    index_map = {"4": "3", "8": "6", "12": "9", "16": "12", "20": "16"}
    for key in list(mapped):
        if key.startswith(drop):
            mapped.pop(key, None)
            continue
        for old, new in index_map.items():
            op = f"{root}{old}."
            if key.startswith(op):
                mapped[f"{root}{new}.{key[len(op):]}"] = mapped.pop(key)
                break
    return mapped


def fold_hg_batchnorm(state: dict[str, np.ndarray], prefix: str = "hg.", eps: float = 1e-5) -> dict[str, np.ndarray]:
    """Fold eval-mode BatchNorm into the preceding conv (fusedbn semantics,
    Hallucination_arch.py:239-273). Operates on torch-layout (OIHW) state."""
    mapped = dict(state)
    blocks = ("conv1", "conv2", "conv3_1", "conv3_2", "conv4_1", "conv4_2", "conv5_1", "conv5_2", "conv_code1", "conv_code2")
    for block in blocks:
        base = f"{prefix}{block}"
        keys = {s: f"{base}.1.{s}" for s in ("weight", "bias", "running_mean", "running_var")}
        if not all(k in mapped for k in keys.values()):
            continue
        conv_w = mapped[f"{base}.0.weight"].astype(np.float32)
        conv_b = mapped.get(f"{base}.0.bias")
        conv_b = np.zeros(conv_w.shape[0], np.float32) if conv_b is None else conv_b.astype(np.float32)
        inv_std = 1.0 / np.sqrt(mapped[keys["running_var"]].astype(np.float32) + eps)
        scale = mapped[keys["weight"]].astype(np.float32) * inv_std
        mapped[f"{base}.0.weight"] = conv_w * scale.reshape(-1, 1, 1, 1)
        mapped[f"{base}.0.bias"] = (conv_b - mapped[keys["running_mean"]].astype(np.float32)) * scale + mapped[
            keys["bias"]
        ].astype(np.float32)
        for s in ("weight", "bias", "running_mean", "running_var", "num_batches_tracked"):
            mapped.pop(f"{base}.1.{s}", None)
    return mapped


# ---------------------------------------------------------------------------
# High-level loaders
# ---------------------------------------------------------------------------


def fp8_e4m3_roundtrip(w: np.ndarray) -> np.ndarray:
    """ModelOpt-style FP8 weight quantization emulated in numerics:
    per-tensor amax/448 scaling into float8_e4m3 and back. The reference's
    FP8 path stores FP32 sources and lets ModelOpt emit FP8 Q/DQ during the
    TensorRT build (fp8_source_note in the shipped checkpoints); on TPU we
    reproduce those numerics at load and compute in bf16."""
    import ml_dtypes

    amax = float(np.abs(w).max())
    if amax <= 0.0:
        return np.asarray(w, np.float32)
    scale = amax / 448.0  # e4m3 max normal
    q = (np.asarray(w, np.float32) / scale).astype(ml_dtypes.float8_e4m3fn)
    return q.astype(np.float32) * scale


def emulate_fp8_weights(state: dict[str, np.ndarray], layers) -> int:
    """Roundtrip the quantized layers' conv/linear weights through e4m3.
    Returns the number of layers emulated (mutates ``state``)."""
    n = 0
    for layer in layers:
        for cand in (f"{layer}.weight", f"base.{layer}.weight", f"hg.{layer}.weight"):
            if cand in state:
                state[cand] = fp8_e4m3_roundtrip(state[cand])
                n += 1
                break
    return n


def load_checkpoint(
    path: str,
    *,
    hg_path: str | None = None,
    use_hg: bool | None = None,
    fold_bn: bool = True,
    fp8_emulate: bool | None = None,
    **cfg_overrides,
) -> tuple[dict[str, np.ndarray], ModelConfig]:
    """Load an HR (and optional HG) reference checkpoint into (params, config).

    Composite layout: HR keys are prefixed ``base.`` and HG keys ``hg.``
    when ``use_hg`` — matching HG_Composite's module tree so the same flat
    names appear in both frameworks.

    FP8 source checkpoints (``fp8_source_schema`` containers, 12 shipped in
    src/models/weights/original/tensorrt_fp8/) are recognized automatically:
    the quantized layers' weights roundtrip through float8_e4m3 numerics
    (``fp8_emulate=False`` loads the plain FP32 tensors instead).
    """
    raw, meta = load_torch_file(path)
    arch = dict(meta.get("architecture") or {})
    if use_hg is None:
        use_hg = bool(arch.get("use_hg", hg_path is not None))
    cfg = ModelConfig.from_arch_dict(arch, use_hg=use_hg, **cfg_overrides)

    raw = remap_condition_state(raw, prefix="AGCM." if any(k.startswith("AGCM.") for k in raw) else "base.AGCM.",
                                classifier=cfg.classifier)

    if use_hg:
        state: dict[str, np.ndarray] = {}
        for k, v in raw.items():
            if k.startswith(("base.", "hg.")):
                state[k] = v
            else:
                state[f"base.{k}"] = v
        if hg_path:
            hg_raw, _ = load_torch_file(hg_path)
            for k, v in hg_raw.items():
                state[k if k.startswith("hg.") else f"hg.{k}"] = v
        if fold_bn:
            state = fold_hg_batchnorm(state, prefix="hg.")
    else:
        state = {k[len("base."):] if k.startswith("base.") else k: v for k, v in raw.items() if not k.startswith("hg.")}

    if fp8_emulate is None:
        fp8_emulate = "fp8_source_schema" in meta
    if fp8_emulate and meta.get("quantized_layers"):
        emulate_fp8_weights(state, meta["quantized_layers"])

    return convert_state(state), cfg


def save_npz(path: str, params: Mapping[str, np.ndarray], meta: dict | None = None) -> None:
    """Write an npz checkpoint; ``meta`` (architecture dict + quant layer
    lists) goes into a ``<stem>.json`` sidecar so converted checkpoints keep
    their self-description (the portable-checkpoint schema role,
    hdrtvnet_torch.py:1102-1218)."""
    import json

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in params.items()})
    if meta:
        with open(_sidecar_path(path), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True, default=str)


def _sidecar_path(npz_path: str) -> str:
    base = npz_path[:-4] if npz_path.endswith(".npz") else npz_path
    return base + ".json"


def load_npz(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def load_npz_meta(path: str) -> dict:
    """Sidecar metadata for an npz checkpoint ({} when absent/unreadable).
    A flat dict of ModelConfig fields is accepted as a bare arch dict."""
    import json

    try:
        with open(_sidecar_path(path)) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def npz_arch_dict(meta: dict) -> dict:
    """Arch dict from sidecar meta: nested under ``architecture`` (portable
    schema) or the whole flat dict (golden-fixture convention)."""
    arch = meta.get("architecture")
    if isinstance(arch, dict):
        return arch
    return {k: v for k, v in meta.items() if not isinstance(v, (list, dict))}


def split_source_checkpoint(
    path: str, out_hr: str, out_hg: str
) -> tuple[list[str], list[str]]:
    """Split a composite HR+HG checkpoint into HR and HG source checkpoints
    (scripts/quantize/split_tensorrt_sources.py role).

    Composite keys are ``base.*`` (Ensemble_AGCM_LE) and ``hg.*``
    (Hallucination generator); quant-metadata layer lists filter with the
    same prefix rules (:26-40): HR keeps non-``hg.`` entries with ``base.``
    stripped, HG keeps ``hg.``-prefixed entries stripped. Accepts ``.pt``
    composites and this build's ``.npz`` composites (QAT output). Outputs
    are npz checkpoints with sidecar metadata. Returns (hr_keys, hg_keys).
    """
    if path.endswith(".npz"):
        raw, meta = load_npz(path), load_npz_meta(path)
    else:
        raw, meta = load_torch_file(path)
    hr_state, hg_state = {}, {}
    for k, v in raw.items():
        if k.startswith("hg."):
            hg_state[k[3:]] = v
        else:
            hr_state[k[5:] if k.startswith("base.") else k] = v
    if not hg_state:
        raise ValueError(f"{path} carries no hg.* keys — not a composite checkpoint")

    def _filter_list(values, *, hg: bool) -> list[str]:
        out = []
        for layer in values or []:
            text = str(layer)
            if hg:
                if text.startswith("hg."):
                    out.append(text[3:])
            elif not text.startswith("hg."):
                out.append(text[5:] if text.startswith("base.") else text)
        return out

    arch = dict(meta.get("architecture") or {})
    common = {k: v for k, v in meta.items() if k not in ("architecture", "w8a8_layers", "fp16_layers")}
    hr_meta = dict(common)
    hr_meta["architecture"] = {**arch, "use_hg": False}
    hg_meta = dict(common)
    hg_meta["architecture"] = {k: v for k, v in arch.items() if k.startswith("hg") or k == "act_type"}
    for key in ("w8a8_layers", "fp16_layers"):
        if key in meta:
            hr_meta[key] = _filter_list(meta.get(key), hg=False)
            hg_meta[key] = _filter_list(meta.get(key), hg=True)
    save_npz(out_hr, hr_state, hr_meta)
    save_npz(out_hg, hg_state, hg_meta)
    return sorted(hr_state), sorted(hg_state)
