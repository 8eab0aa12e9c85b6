"""Golden parity: JAX models vs reference torch outputs (committed fixtures).

Fixtures are produced by tools/make_goldens.py running the *reference*
implementation (HDRTVNet++ torch) on fixed inputs; these tests must match
them to float32 tolerance — the validate_tensorrt_sources parity methodology
(SURVEY.md §4) applied at unit level.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import load_fixture


@pytest.fixture(scope="module")
def hr_params():
    from hdrtv_tpu.models.import_torch import load_checkpoint

    try:
        params, cfg = load_checkpoint(
            "/root/reference/src/models/weights/original/HR.pt", use_hg=False
        )
    except FileNotFoundError:
        pytest.skip("reference checkpoint not available")
    return {k: jnp.asarray(v) for k, v in params.items()}, cfg


class TestEnsembleGolden:
    def test_agcm_matches_reference(self, hr_params):
        from hdrtv_tpu.models.agcm import agcm_apply

        params, _ = hr_params
        fx = load_fixture("ensemble_fp32.npz")
        out = agcm_apply(params, jnp.asarray(fx["img"]), jnp.asarray(fx["cond"]))
        np.testing.assert_allclose(np.asarray(out), fx["agcm_out"], atol=2e-5, rtol=0)

    def test_ensemble_matches_reference(self, hr_params):
        from hdrtv_tpu.models.hdrtvnet import ensemble_agcm_le

        params, cfg = hr_params
        fx = load_fixture("ensemble_fp32.npz")
        out = ensemble_agcm_le(params, jnp.asarray(fx["img"]), jnp.asarray(fx["cond"]), cfg)
        np.testing.assert_allclose(np.asarray(out), fx["out"], atol=5e-5, rtol=0)

    def test_ensemble_jits_and_matches(self, hr_params):
        from hdrtv_tpu.models.hdrtvnet import ensemble_agcm_le

        params, cfg = hr_params
        fx = load_fixture("ensemble_fp32.npz")
        fn = jax.jit(lambda p, i, c: ensemble_agcm_le(p, i, c, cfg))
        out = fn(params, jnp.asarray(fx["img"]), jnp.asarray(fx["cond"]))
        np.testing.assert_allclose(np.asarray(out), fx["out"], atol=5e-5, rtol=0)


class TestHGGolden:
    def _state(self, fx, fold):
        from hdrtv_tpu.models.import_torch import convert_state, fold_hg_batchnorm

        raw = {k: v for k, v in fx.items() if k.startswith("hg.")}
        if fold:
            raw = fold_hg_batchnorm(raw, prefix="hg.")
        return {k: jnp.asarray(v) for k, v in convert_state(raw).items()}

    @pytest.mark.parametrize("fold", [False, True], ids=["bn-eval", "bn-folded"])
    def test_hg_matches_reference(self, fold):
        from hdrtv_tpu.models.hg import hg_apply

        fx = load_fixture("hg_tiny.npz")
        params = self._state(fx, fold)
        out = hg_apply(params, jnp.asarray(fx["img"]), jnp.asarray(fx["mask"]), prefix="hg.")
        np.testing.assert_allclose(np.asarray(out), fx["out"], atol=2e-4, rtol=0)

    def test_composite_mask_semantics(self):
        from hdrtv_tpu.models.hdrtvnet import make_mask

        img = jnp.asarray(
            np.stack(
                [np.full((4, 4, 3), 0.5, np.float32), np.full((4, 4, 3), 0.99, np.float32)]
            )
        )
        mask = make_mask(img, r=0.75)
        # below the 0.75 knee → 0; bright highlight → 1 (HG_Composite_arch.py:77-84)
        assert float(mask[0].max()) == 0.0
        assert float(mask[1].min()) == 1.0


class TestCondResizeGolden:
    def test_quarter_bicubic_aa_matches_torch(self):
        from hdrtv_tpu.ops.resize import downsample_quarter_aa

        fx = load_fixture("cond_resize.npz")
        out = downsample_quarter_aa(jnp.asarray(fx["frame"]))
        np.testing.assert_allclose(np.asarray(out), fx["quarter_bicubic_aa"], atol=2e-6, rtol=0)

    def test_quarter_bilinear_matches_torch(self):
        from hdrtv_tpu.ops.resize import downsample_quarter_bilinear

        fx = load_fixture("cond_resize.npz")
        out = downsample_quarter_bilinear(jnp.asarray(fx["frame"]))
        np.testing.assert_allclose(np.asarray(out), fx["quarter_bilinear"], atol=2e-6, rtol=0)
