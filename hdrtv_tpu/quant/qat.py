"""QAT: straight-through-estimator fake quantization for fine-tuning.

The reference QAT scripts train with ``_FakeQuantizeSTE`` on Conv/Linear
weights plus the teacher-distillation loss recipe
(scripts/quantize/quantize_int8_mixed_qat.py:188; README.md:1174-1187).
Here fake-quant is a *pytree transform* applied inside the loss function
(hooked via make_train_step(fake_quant=...)): latent weights stay fp32,
the forward sees round(w/s)·s, and the custom VJP passes gradients straight
through the rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def fake_quant_ste(w: jax.Array) -> jax.Array:
    """Per-output-channel symmetric int8 fake-quant (round/clamp like
    W8Conv2d) with identity gradient."""
    axes = tuple(range(w.ndim - 1))
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=axes, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -128.0, 127.0)
    return q * scale


def _fq_fwd(w):
    return fake_quant_ste(w), None


def _fq_bwd(_, g):
    return (g,)


fake_quant_ste.defvjp(_fq_fwd, _fq_bwd)


def make_weight_fake_quant(layers: list[str]):
    """Pytree transform fake-quantizing ``{layer}.weight`` for the given
    layers — plug into train.make_train_step(fake_quant=...)."""
    targets = {f"{l}.weight" for l in layers}

    def transform(params: dict) -> dict:
        return {
            k: fake_quant_ste(v) if k in targets else v for k, v in params.items()
        }

    return transform


def run_qat(
    params: dict,
    cfg,
    layers: list[str],
    frames,
    *,
    steps: int = 50,
    lr: float = 2e-6,
    mode: str = "w8a8",
    asymmetric: bool = True,
    distill: bool = True,
    calibrate_after: bool = True,
    policy=None,
    log=print,
) -> tuple[dict, list[float]]:
    """Teacher-distilled QAT fine-tune → calibrated portable int8 params.

    The reference recipe (scripts/quantize/quantize_int8_mixed_qat.py;
    README.md:1174-1187): STE fake-quant on the selected layers, FP32-teacher
    distillation with highlight/dark tone-protection losses, then freeze into
    a portable checkpoint. ``frames``: [0,1] RGB HWC arrays (paired GT would
    replace the teacher where available).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from hdrtv_tpu.models.hdrtvnet import model_apply
    from hdrtv_tpu.models.layers import F32
    from hdrtv_tpu.ops.resize import downsample_quarter_aa
    from hdrtv_tpu.train import init_state, make_train_step

    policy = policy or F32
    teacher = {k: jnp.asarray(v) for k, v in params.items()}
    fq = make_weight_fake_quant(layers)
    opt = optax.adam(lr)
    train = make_train_step(cfg, opt, policy=policy, fake_quant=fq)
    state = init_state({k: jnp.asarray(v) for k, v in params.items()}, opt)

    losses: list[float] = []
    n = max(1, len(frames))
    for i in range(steps):
        frame = frames[i % n]
        img = jnp.asarray(frame[None], jnp.float32)
        cond = downsample_quarter_aa(img)
        t_out = model_apply(teacher, img, cond, cfg, policy=policy) if distill else None
        gt = t_out if distill else img
        state, loss = train(state, img, cond, gt, t_out)
        losses.append(float(loss))
        if log and (i % 10 == 0 or i == steps - 1):
            log(f"qat step {i}: loss {float(loss):.5f}")

    host = {k: np.asarray(v) for k, v in state.params.items()}
    q = finalize_qat(host, layers, mode=mode, asymmetric=asymmetric)
    if calibrate_after and mode == "w8a8":
        from hdrtv_tpu.quant.calibrate import calibrate

        q = calibrate(q, frames, cfg, policy=policy)
    return q, losses


def finalize_qat(params: dict, layers: list[str], *, mode: str = "w8a8", asymmetric: bool = False) -> dict:
    """Freeze trained latent weights into a real int8 checkpoint
    (the QAT → portable-checkpoint step, make_portable_int8_checkpoint.py)."""
    import numpy as np

    from hdrtv_tpu.quant.int8 import quantize_params

    host = {k: np.asarray(v) for k, v in params.items()}
    return quantize_params(host, layers, mode=mode, asymmetric=asymmetric)
