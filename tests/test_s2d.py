"""s2d (space-to-depth) execution mode: exactness vs the normal forward."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")


@pytest.fixture(scope="module")
def both_params():
    from hdrtv_tpu.models.import_torch import load_npz
    from hdrtv_tpu.models.s2d import s2d_transform_params

    params = load_npz(WEIGHTS)
    sp = s2d_transform_params(params)
    return (
        {k: jnp.asarray(v) for k, v in params.items()},
        {k: jnp.asarray(v) for k, v in sp.items()},
    )


class TestS2DDataMovement:
    def test_s2d_d2s_roundtrip(self):
        from hdrtv_tpu.models.s2d import d2s, s2d

        x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 12, 5).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(d2s(s2d(x))), np.asarray(x))

    def test_s2d_channel_order_block_major(self):
        from hdrtv_tpu.models.s2d import s2d

        x = np.zeros((1, 4, 4, 1), np.float32)
        x[0, 1, 0, 0] = 7.0  # position a=1,b=0 of block (0,0)
        out = np.asarray(s2d(jnp.asarray(x)))
        assert out[0, 0, 0, 2] == 7.0  # channel (a*2+b)*C = 2

    def test_s2d_conv_weight_sparsity(self):
        """The 3×3 block-domain kernel populates exactly 9 of 36 routing
        slots per (in-sub, out-sub) pair — the exact-transform invariant."""
        from hdrtv_tpu.models.s2d import w_s2d_s1

        w = np.random.RandomState(1).rand(3, 3, 2, 2).astype(np.float32)
        t = w_s2d_s1(w)
        assert t.shape == (3, 3, 8, 8)
        # count nonzero (tap, in-sub, out-sub) combos per channel pair
        nz = (np.abs(t.reshape(9, 4, 2, 4, 2)) > 0).any(axis=(2, 4)).sum()
        assert nz == 36  # 9 taps·4 slots... each (out-sub) has 9 valid slots


class TestS2DEquivalence:
    def test_ensemble_s2d_matches_normal(self, both_params):
        from hdrtv_tpu.models.hdrtvnet import ModelConfig, ensemble_agcm_le
        from hdrtv_tpu.models.s2d import ensemble_s2d

        pj, spj = both_params
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        cond = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32))
        ref = np.asarray(ensemble_agcm_le(pj, img, cond, ModelConfig()))
        out = np.asarray(ensemble_s2d(spj, img, cond, ModelConfig()))
        np.testing.assert_allclose(out, ref, atol=5e-6, rtol=0)

    def test_ensemble_s2d_matches_golden(self, both_params):
        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.s2d import ensemble_s2d
        from tests.conftest import load_fixture

        _, spj = both_params
        fx = load_fixture("ensemble_fp32.npz")
        out = np.asarray(ensemble_s2d(spj, jnp.asarray(fx["img"]), jnp.asarray(fx["cond"]), ModelConfig()))
        np.testing.assert_allclose(out, fx["out"], atol=5e-5, rtol=0)

    def test_processor_turbo_matches_safe(self):
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        frame = (np.random.RandomState(2).rand(64, 96, 3) * 255).astype(np.uint8)
        turbo = HDRTVNetTPU(WEIGHTS, precision="fp32", turbo=True, persistent_cache=False)
        safe = HDRTVNetTPU(WEIGHTS, precision="fp32", turbo=False, persistent_cache=False)
        assert turbo.turbo and not safe.turbo
        a = turbo.process_rgb48(frame)
        b = safe.process_rgb48(frame)
        # identical math → at most 1 code value of rounding skew
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    def test_processor_turbo_odd_dims_fallback(self):
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        frame = (np.random.RandomState(3).rand(33, 49, 3) * 255).astype(np.uint8)
        turbo = HDRTVNetTPU(WEIGHTS, precision="fp32", turbo=True, persistent_cache=False)
        out = turbo.process_rgb48(frame)
        assert out.shape == (33, 49, 3)
