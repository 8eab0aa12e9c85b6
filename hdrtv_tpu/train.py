"""Training / fine-tuning step (QAT recipe losses) over the functional model.

The reference trains offline via QAT scripts with FP32-teacher distillation:
weighted combination of teacher L1, highlight-region L1 and dark-region L1
(scripts/quantize/quantize_int8_mixed_qat.py — teacher 0.68/0.65, highlight
0.38/0.35, dark 0.36/0.34; README.md:1174-1187). This module provides the
same loss shape as a jittable train step usable under a device mesh: params
replicated, frame batch sharded over ``data`` and W over ``spatial``; GSPMD
inserts the gradient all-reduce and conv halo exchanges.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from hdrtv_tpu.models.hdrtvnet import ModelConfig, model_apply
from hdrtv_tpu.models.layers import F32, Policy


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Mixed-QAT recipe defaults (quantize_int8_mixed_qat.py)."""

    gt: float = 1.0
    teacher: float = 0.68
    highlight: float = 0.38
    dark: float = 0.36
    highlight_thresh: float = 0.75
    dark_thresh: float = 0.15


def qat_loss(
    out: jax.Array,
    gt: jax.Array,
    teacher_out: jax.Array | None,
    w: LossWeights = LossWeights(),
) -> jax.Array:
    """L1 to GT + teacher distillation + tone-protected highlight/dark terms."""
    out = out.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    loss = w.gt * jnp.mean(jnp.abs(out - gt))
    ref = gt if teacher_out is None else teacher_out.astype(jnp.float32)
    if teacher_out is not None:
        loss = loss + w.teacher * jnp.mean(jnp.abs(out - teacher_out.astype(jnp.float32)))
    # Tone-protection masks: luminance regions where quantization artifacts
    # (highlight rolloff / dark banding) are most visible.
    lum = jnp.max(ref, axis=-1, keepdims=True)
    hl = (lum > w.highlight_thresh).astype(jnp.float32)
    dk = (lum < w.dark_thresh).astype(jnp.float32)
    loss = loss + w.highlight * jnp.sum(hl * jnp.abs(out - ref)) / jnp.maximum(jnp.sum(hl) * 3, 1.0)
    loss = loss + w.dark * jnp.sum(dk * jnp.abs(out - ref)) / jnp.maximum(jnp.sum(dk) * 3, 1.0)
    return loss


@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: Any
    step: int = 0


def make_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    *,
    policy: Policy = F32,
    weights: LossWeights = LossWeights(),
    fake_quant: Callable[[dict], dict] | None = None,
) -> Callable:
    """Build ``train_step(state, img, cond, gt[, teacher_out]) -> (state, loss)``.

    ``fake_quant`` hooks the QAT straight-through-estimator weight transform
    (quant/qat.py) into the forward pass; gradients flow to the latent fp32
    params via the STE custom-vjp.
    """

    def loss_fn(params, img, cond, gt, teacher_out):
        p = fake_quant(params) if fake_quant is not None else params
        out = model_apply(p, img, cond, cfg, policy=policy)
        return qat_loss(out, gt, teacher_out, weights)

    def train_step(state: TrainState, img, cond, gt, teacher_out=None):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, img, cond, gt, teacher_out)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def init_state(params: dict, optimizer: optax.GradientTransformation) -> TrainState:
    # Only float parameters are trainable; int8 payloads are frozen buffers.
    return TrainState(params=params, opt_state=optimizer.init(params))


# ---------------------------------------------------------------------------
# Checkpoint / resume (QAT early-stop + best-by-monitor pattern, SURVEY.md §5)
# ---------------------------------------------------------------------------


def save_train_state(path: str, state: TrainState) -> None:
    """Persist params + optimizer state to a single npz.

    Leaves are stored flat with the pytree structure alongside, so the exact
    optax state (namedtuple chain) round-trips. Self-contained single file;
    orbax's sharded checkpointing becomes worthwhile only at multi-host scale.
    """
    import os
    import pickle

    import jax
    import numpy as np

    flat, treedef = jax.tree_util.tree_flatten(
        {"params": state.params, "opt_state": state.opt_state}
    )
    out = path if path.endswith(".npz") else path + ".npz"
    parent = os.path.dirname(os.path.abspath(out))
    os.makedirs(parent, exist_ok=True)
    np.savez_compressed(
        out,
        step=np.int64(state.step),
        treedef=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(flat)},
    )


def load_train_state(path: str, optimizer: optax.GradientTransformation | None = None) -> TrainState:
    import pickle

    import jax
    import numpy as np

    npz_path = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz_path, allow_pickle=False) as z:
        step = int(z["step"])
        treedef = pickle.loads(z["treedef"].tobytes())
        n_leaves = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [z[f"leaf_{i}"] for i in range(n_leaves)]
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return TrainState(params=tree["params"], opt_state=tree["opt_state"], step=step)
