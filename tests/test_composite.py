"""HG composite end-to-end: ensemble + highlight generator + mask/crop."""

import numpy as np
import jax.numpy as jnp

from tests.conftest import load_fixture


def _composite_params():
    import os

    from hdrtv_tpu.models.import_torch import convert_state, load_npz

    weights = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
    params = {f"base.{k}": jnp.asarray(v) for k, v in load_npz(weights).items()}
    fx = load_fixture("hg_tiny.npz")
    hg_raw = {k: v for k, v in fx.items() if k.startswith("hg.")}
    params.update({k: jnp.asarray(v) for k, v in convert_state(hg_raw).items()})
    return params


class TestComposite:
    def test_composite_forward_with_padding(self):
        """Odd size (not /32) exercises the reflect pad + crop path
        (HG_Composite_arch.py:90-105)."""
        from hdrtv_tpu.models.hdrtvnet import ModelConfig, model_apply

        params = _composite_params()
        cfg = ModelConfig(use_hg=True)
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(1, 40, 56, 3).astype(np.float32))
        cond = jnp.asarray(rng.rand(1, 10, 14, 3).astype(np.float32))
        out = np.asarray(model_apply(params, img, cond, cfg))
        assert out.shape == (1, 40, 56, 3)
        assert np.isfinite(out).all()

    def test_composite_mask_gates_hg(self):
        """Where the mask is 0 the composite must return the base output
        exactly (out = mask*hg + base)."""
        from hdrtv_tpu.models.hdrtvnet import ModelConfig, ensemble_agcm_le, hg_composite

        params = _composite_params()
        cfg = ModelConfig(use_hg=True)
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 0.3)  # dark: mask ≈ 0
        cond = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32) * 0.3)
        base_cfg = ModelConfig(use_hg=False)
        base_params = {k[len("base."):]: v for k, v in params.items() if k.startswith("base.")}
        base = np.asarray(ensemble_agcm_le(base_params, img, cond, base_cfg))
        comp = np.asarray(hg_composite(params, img, cond, cfg))
        mask_zero = base.max(axis=-1) <= 0.75 + 0.1 * 0.25  # below threshold
        np.testing.assert_allclose(comp[mask_zero[..., None].repeat(3, -1)],
                                   base[mask_zero[..., None].repeat(3, -1)], atol=1e-6)

    def test_processor_hg_smoke(self, tmp_path):
        """HDRTVNetTPU with a composite checkpoint (use_hg) runs end-to-end."""
        from hdrtv_tpu.models.import_torch import save_npz
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        params = {k: np.asarray(v) for k, v in _composite_params().items()}
        path = str(tmp_path / "composite.npz")
        save_npz(path, params)
        proc = HDRTVNetTPU(path, precision="fp32", use_hg=True, persistent_cache=False)
        # Round 2: the pixelshuffle composite runs in the s2d turbo domain
        # (models/hg_s2d.py); non-release HG archs still fall back.
        assert proc.turbo
        frame = (np.random.RandomState(2).rand(64, 96, 3) * 255).astype(np.uint8)
        out = proc.process_rgb48(frame)
        assert out.shape == (64, 96, 3) and out.dtype == np.uint16
