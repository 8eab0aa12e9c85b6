"""Mixed-quantization layout *generation* — per-layer sensitivity probe.

The reference ships hand-tuned layer recipes (configs/qat_layouts/*.txt) and
the 1,250-line stability probe that produced them
(scripts/quantize/quantize_int8_mixed.py): quantize one layer at a time,
score the output degradation on probe frames, and keep the least-sensitive
layers in W8A8.

TPU-native twist: a layer's quantization toggles *by value* (the ``x_on``
gate in models/layers.py plus a dequantized-weight value swap), so the
whole probe runs inside ONE jitted program — no per-layer retrace. Scores
per layer: full-frame MAE, highlight-region MAE (maxRGB > 0.75, the HG mask
region where int8 flicker shows first — probe_trt_temporal_stability.py
role), and ΔEITP.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hdrtv_tpu.models.hdrtvnet import ModelConfig, model_apply
from hdrtv_tpu.models.layers import F32, Policy
from hdrtv_tpu.ops.resize import downsample_quarter_aa
from hdrtv_tpu.quant.calibrate import calibrate
from hdrtv_tpu.quant.int8 import DEFAULT_EXCLUDE_SUFFIXES, quantizable_layers, quantize_params


@dataclasses.dataclass
class LayerSensitivity:
    layer: str
    mae: float
    highlight_mae: float
    delta_e_itp: float
    gflops: float = 0.0  # per-probe-frame conv cost (the quantization *benefit*)

    @property
    def score(self) -> float:
        # Highlight stability dominates the reference recipe decisions
        # (README.md:68 "failed visual/temporal checks" on highlights).
        return self.mae + 3.0 * self.highlight_mae + 0.002 * self.delta_e_itp

    @property
    def cost_per_gflop(self) -> float:
        """Quality cost per unit of compute converted to int8 — the mixed
        recipe wants *compute-heavy robust* layers, not no-op layers whose
        quantization is merely invisible."""
        return self.score / max(self.gflops, 1e-6)


class _ShapeCapture:
    """Records each layer's input spatial shape at trace time (static)."""

    def __init__(self):
        self.shapes: dict[str, tuple] = {}

    def _record(self, name, x):
        self.shapes[name] = tuple(x.shape)

    names = None

    def __enter__(self):
        from hdrtv_tpu.models.layers import _ACTIVE_CAPTURE

        _ACTIVE_CAPTURE.append(self)
        return self

    def __exit__(self, *exc):
        from hdrtv_tpu.models.layers import _ACTIVE_CAPTURE

        _ACTIVE_CAPTURE.remove(self)


def probe_layer_sensitivity(
    params: dict,
    frames,
    cfg: ModelConfig = ModelConfig(),
    *,
    policy: Policy = F32,
    layers: list[str] | None = None,
    exclude: tuple[str, ...] = DEFAULT_EXCLUDE_SUFFIXES,
    highlight_thresh: float = 0.75,
    peak_nits: float = 1000.0,
) -> list[LayerSensitivity]:
    """Quantize one layer at a time (W8 weights + calibrated A8 activation)
    and score degradation vs the float forward on the probe frames."""
    import jax
    import jax.numpy as jnp

    from hdrtv_tpu.ops.color import delta_e_itp as de_itp

    if layers is None:
        layers = [l for l in quantizable_layers(params) if not l.endswith(exclude)]

    # One calibration pass over the fully-quantized model provides every
    # layer's activation scale; the probe then flips layers on one by one.
    fullq = quantize_params(params, layers, mode="w8a8")
    fullq = calibrate(fullq, frames, cfg, policy=policy, method="max")

    probe = dict(params)
    deq_weights: dict[str, np.ndarray] = {}
    for l in layers:
        probe[f"{l}.x_scale"] = np.asarray(fullq[f"{l}.x_scale"], np.float32)
        probe[f"{l}.x_on"] = np.float32(0.0)
        q = np.asarray(fullq[f"{l}.weight_int8"], np.float32)
        deq_weights[l] = q * np.asarray(fullq[f"{l}.w_scale"], np.float32)

    def forward(p, img, cond):
        return model_apply(p, img, cond, cfg, policy=policy)

    fwd = jax.jit(forward)

    probe_inputs = []
    baselines = []
    for frame in frames:
        img = jnp.asarray(frame, jnp.float32)[None]
        cond = downsample_quarter_aa(img)
        probe_inputs.append((img, cond))
        baselines.append(np.asarray(fwd(probe, img, cond), np.float32))

    # Per-layer conv FLOPs from input shapes captured at trace time —
    # the compute *benefit* of quantizing each layer. A fresh lambda forces
    # a retrace (eval_shape of the already-jitted `forward` would hit the
    # pjit cache and skip tracing, bypassing the capture).
    img0, cond0 = probe_inputs[0]
    with _ShapeCapture() as shp:
        jax.eval_shape(
            lambda p, i, c: model_apply(p, i, c, cfg, policy=policy), probe, img0, cond0
        )
    gflops: dict[str, float] = {}
    for l in layers:
        in_shape = shp.shapes.get(l)
        w = params.get(f"{l}.weight")
        if in_shape is None or w is None:
            gflops[l] = 0.0
            continue
        if w.ndim == 4:
            kh, kw, ci, co = w.shape
            hw = in_shape[1] * in_shape[2]
            gflops[l] = 2.0 * hw * kh * kw * ci * co / 1e9
        else:
            gflops[l] = 2.0 * float(np.prod(in_shape[:-1])) * w.shape[0] * w.shape[1] / 1e9

    results: list[LayerSensitivity] = []
    for l in layers:
        trial = dict(probe)
        trial[f"{l}.x_on"] = np.float32(1.0)
        trial[f"{l}.weight"] = deq_weights[l]
        maes, hmaes, des = [], [], []
        for (img, cond), base in zip(probe_inputs, baselines):
            out = np.asarray(fwd(trial, img, cond), np.float32)
            diff = np.abs(out - base)
            maes.append(float(diff.mean()))
            hl = np.asarray(img, np.float32).max(axis=-1) > highlight_thresh
            hmaes.append(float(diff[hl].mean()) if hl.any() else 0.0)
            des.append(
                float(
                    de_itp(
                        jnp.asarray(np.clip(out[0], 0, 1) * peak_nits),
                        jnp.asarray(np.clip(base[0], 0, 1) * peak_nits),
                    )
                )
            )
        results.append(
            LayerSensitivity(
                layer=l,
                mae=float(np.mean(maes)),
                highlight_mae=float(np.mean(hmaes)),
                delta_e_itp=float(np.mean(des)),
                gflops=gflops.get(l, 0.0),
            )
        )
    return results


def generate_mixed_layout(
    params: dict,
    frames,
    cfg: ModelConfig = ModelConfig(),
    *,
    count: int = 29,
    out_path: str | None = None,
    policy: Policy = F32,
    exclude: tuple[str, ...] = DEFAULT_EXCLUDE_SUFFIXES,
    tag: str = "generated",
) -> list[str]:
    """Emit a mixed W8A8 layout, readable by quant.int8.load_mixed_layout
    (one layer per line, '#' comments — the configs/qat_layouts/*.txt
    contract).

    Selection ranks by quality cost per GFLOP converted: quantizing a layer
    must *buy* compute, so compute-heavy robust layers (the reference
    recipe's trunk3/CondNet4 picks) outrank no-op layers whose quantization
    is merely invisible."""
    sens = probe_layer_sensitivity(params, frames, cfg, policy=policy, exclude=exclude)
    ranked = sorted(sens, key=lambda s: s.cost_per_gflop)
    chosen = [s.layer for s in ranked[:count]]
    if out_path:
        with open(out_path, "w") as f:
            f.write(f"# Mixed W8A8 layout generated by per-layer sensitivity probe ({tag}).\n")
            f.write(f"# Composition: {len(chosen)} W8A8 of {len(sens)} probed layers.\n")
            f.write("# rank = (mae + 3*highlight_mae + 0.002*dEITP) / gflops, ascending\n")
            for s in ranked[:count]:
                f.write(f"{s.layer}\n")
            f.write("# --- rejected (worst cost/benefit first) ---\n")
            for s in ranked[: count - 1 : -1]:
                f.write(f"# {s.layer}  score={s.score:.6f} gflops={s.gflops:.3f}\n")
    return chosen
