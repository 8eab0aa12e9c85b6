"""PTQ activation calibration for W8A8 layers.

Functional port of ``calibrate_w8a8`` (hdrtvnet_torch.py:1001-1100): run
calibration frames through the weight-quantized model while capturing each
quantized layer's *input* range, then set per-tensor activation scales:

  symmetric:  x_scale = max|x| / 127          (method="max")
  asymmetric: x_zero = min(x), x_scale = (max - min) / 255
  percentile: p99.9 clipping variants of both
  kl:         TensorRT-style entropy calibration — 2048-bin |x| histograms,
              threshold chosen to minimize KL(P‖Q) between the reference
              distribution and its 128-level quantization (the legacy
              native-implicit calibrator role, hdrtvnet_torch.py:7597-8162)

Capture rides the ActivationCapture context (models/layers.py) — stats are
traced values returned from a jitted wrapper, so calibration runs at full
device speed with one extra output pytree instead of forward hooks.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from hdrtv_tpu.models.hdrtvnet import ModelConfig, model_apply
from hdrtv_tpu.models.layers import ActivationCapture, F32, Policy
from hdrtv_tpu.ops.resize import downsample_quarter_aa


class _PercentileCapture(ActivationCapture):
    def __init__(self, names, percentile: float, percentile_low: float):
        super().__init__(names)
        self.p_hi = percentile
        self.p_lo = percentile_low

    def _record(self, name, x):
        if self.names is not None and name not in self.names:
            return
        xf = x.astype(jnp.float32).reshape(-1)
        self.stats[name] = {
            "abs_max": jnp.max(jnp.abs(xf)),
            "min": jnp.min(xf),
            "max": jnp.max(xf),
            "p_abs": jnp.percentile(jnp.abs(xf), self.p_hi),
            "p_min": jnp.percentile(xf, self.p_lo),
            "p_max": jnp.percentile(xf, self.p_hi),
        }


class _HistCapture(ActivationCapture):
    """Fixed-range |x| histograms (ranges from a prior abs-max pass)."""

    def __init__(self, names, ranges: dict, bins: int = 2048):
        super().__init__(names)
        self.ranges = ranges
        self.bins = bins

    def _record(self, name, x):
        if self.names is not None and name not in self.names:
            return
        rng = self.ranges.get(name, 1.0)
        xf = jnp.abs(x.astype(jnp.float32).reshape(-1))
        self.stats[name] = {
            "hist": jnp.histogram(xf, bins=self.bins, range=(0.0, rng))[0],
        }


def _kl_at(hist: np.ndarray, i: int, levels: int) -> float:
    ref = hist[:i].copy()
    ref[i - 1] += hist[i:].sum()  # clip outliers into the last bin
    p = ref / ref.sum()

    # quantize the first i bins into `levels` groups, expand uniformly over
    # the nonzero entries of each group (the TensorRT reference algorithm)
    edges = np.linspace(0, i, levels + 1)
    lo = np.floor(edges[:-1]).astype(int)
    hi = np.minimum(np.ceil(edges[1:]).astype(int), i)
    q = np.zeros(i)
    for g in range(levels):
        chunk = hist[lo[g] : hi[g]]
        nz = chunk > 0
        if nz.any():
            q[lo[g] : hi[g]][nz] = chunk[nz].sum() / nz.sum()
    qs = q.sum()
    if qs <= 0:
        return np.inf
    q /= qs
    mask = p > 0
    return float(np.sum(p[mask] * np.log(p[mask] / np.maximum(q[mask], 1e-12))))


def kl_threshold(hist: np.ndarray, *, levels: int = 128, stride: int = 16) -> int:
    """TensorRT entropy-calibration threshold search: the bin count ``i``
    whose clipped distribution quantizes to ``levels`` with minimal
    KL(P‖Q). Coarse-to-fine: every ``stride`` bins, then ±stride refine.
    Returns the chosen bin index (scale = (i+0.5)·bin_width/127).
    """
    hist = np.asarray(hist, np.float64)
    bins = hist.size
    if hist.sum() <= 0:
        return bins
    coarse = list(range(levels, bins + 1, stride))
    if coarse[-1] != bins:
        coarse.append(bins)
    kls = {i: _kl_at(hist, i, levels) for i in coarse}
    best = min(kls, key=kls.get)
    for i in range(max(levels, best - stride + 1), min(bins, best + stride)):
        if i not in kls:
            kls[i] = _kl_at(hist, i, levels)
    return min(kls, key=kls.get)


def w8a8_layer_names(params: dict) -> list[str]:
    return sorted(k[: -len(".x_scale")] for k in params if k.endswith(".x_scale"))


def calibrate(
    params: dict,
    frames: Iterable[np.ndarray],
    cfg: ModelConfig,
    *,
    policy: Policy = F32,
    method: str = "max",
    percentile: float = 99.9,
    percentile_low: float = 0.1,
) -> dict:
    """Return params with calibrated ``x_scale``/``x_zero``.

    ``frames``: [0,1] RGB HWC float arrays (dataset / video / synthetic
    calibration source roles, hdrtvnet_torch.py:7823-8073).
    """
    layers = w8a8_layer_names(params)
    if not layers:
        return dict(params)
    watch = set(layers)
    use_pct = method == "percentile"
    use_kl = method in ("kl", "kl_div", "entropy")

    def make_capture():
        if use_pct:
            return _PercentileCapture(watch, percentile, percentile_low)
        return ActivationCapture(watch)

    def run(p, img, cond):
        with make_capture() as cap:
            model_apply(p, img, cond, cfg, policy=policy)
            return dict(cap.stats)

    run_j = jax.jit(run)
    dev_params = {k: jnp.asarray(v) for k, v in params.items()}
    frames = list(frames)

    agg: dict[str, dict] = {}
    for frame in frames:
        img = jnp.asarray(frame, dtype=jnp.float32)[None]
        cond = downsample_quarter_aa(img)
        stats = jax.device_get(run_j(dev_params, img, cond))
        for name, s in stats.items():
            a = agg.setdefault(
                name,
                {"abs_max": 0.0, "min": np.inf, "max": -np.inf, "p_abs": 0.0, "p_min": np.inf, "p_max": -np.inf},
            )
            a["abs_max"] = max(a["abs_max"], float(s["abs_max"]))
            a["min"] = min(a["min"], float(s["min"]))
            a["max"] = max(a["max"], float(s["max"]))
            if use_pct:
                a["p_abs"] = max(a["p_abs"], float(s["p_abs"]))
                a["p_min"] = min(a["p_min"], float(s["p_min"]))
                a["p_max"] = max(a["p_max"], float(s["p_max"]))

    kl_scale: dict[str, float] = {}
    if use_kl:
        # Second pass with fixed ranges from the abs-max pass: accumulate
        # 2048-bin histograms, then the entropy threshold search per layer.
        bins = 2048
        ranges = {n: max(agg[n]["abs_max"], 1e-8) for n in agg}

        def run_hist(p, img, cond):
            with _HistCapture(watch, ranges, bins) as cap:
                model_apply(p, img, cond, cfg, policy=policy)
                return dict(cap.stats)

        run_hist_j = jax.jit(run_hist)
        hists: dict[str, np.ndarray] = {}
        for frame in frames:
            img = jnp.asarray(frame, dtype=jnp.float32)[None]
            cond = downsample_quarter_aa(img)
            stats = jax.device_get(run_hist_j(dev_params, img, cond))
            for name, s in stats.items():
                h = np.asarray(s["hist"], np.float64)
                hists[name] = hists.get(name, 0) + h
        for name, h in hists.items():
            i = kl_threshold(h)
            bin_w = ranges[name] / 2048
            kl_scale[name] = max((i + 0.5) * bin_w, 1e-8) / 127.0

    out = dict(params)
    for name in layers:
        s = agg.get(name)
        if s is None:
            continue
        if f"{name}.x_zero" in out:  # asymmetric (KL calibrates symmetric only)
            if use_pct and np.isfinite(s["p_min"]):
                x_min, x_max = s["p_min"], s["p_max"]
            else:
                x_min, x_max = s["min"], s["max"]
            out[f"{name}.x_scale"] = np.float32(max(x_max - x_min, 1e-8) / 255.0)
            out[f"{name}.x_zero"] = np.float32(x_min)
        elif use_kl and name in kl_scale:
            out[f"{name}.x_scale"] = np.float32(kl_scale[name])
        else:
            val = s["p_abs"] if (use_pct and s["p_abs"] > 0.0) else s["abs_max"]
            out[f"{name}.x_scale"] = np.float32(max(val, 1e-8) / 127.0)
    return out
