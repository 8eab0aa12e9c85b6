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


def finalize_qat(params: dict, layers: list[str], *, mode: str = "w8a8", asymmetric: bool = False) -> dict:
    """Freeze trained latent weights into a real int8 checkpoint
    (the QAT → portable-checkpoint step, make_portable_int8_checkpoint.py)."""
    import numpy as np

    from hdrtv_tpu.quant.int8 import quantize_params

    host = {k: np.asarray(v) for k, v in params.items()}
    return quantize_params(host, layers, mode=mode, asymmetric=asymmetric)
