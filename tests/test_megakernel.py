"""Parity tests for the L0-section megakernels (ops/megakernel.py).

Kernels run in Pallas interpret mode on CPU against their jnp oracles, and
the full mega ensemble path is checked end-to-end against the plain s2d
composition (which itself has goldens vs the torch reference).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tests.conftest import FIXTURES  # noqa: F401  (ensures CPU platform forced)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(7)


class TestKernels:
    def test_agcm_head_parity(self, rng):
        from hdrtv_tpu.ops.megakernel import fused_agcm_head, fused_agcm_head_ref

        f32 = np.float32
        hb, wb = 24, 32
        xs = jnp.asarray(rng.rand(hb, wb, 12).astype(f32))
        mods = jnp.asarray(rng.randn(6, 256).astype(f32) * 0.1)
        args = (
            jnp.asarray(rng.randn(12, 256).astype(f32) * 0.2),
            jnp.asarray(rng.randn(256).astype(f32) * 0.1),
            jnp.asarray(rng.randn(256, 256).astype(f32) * 0.05),
            jnp.asarray(rng.randn(256).astype(f32) * 0.1),
            jnp.asarray(rng.randn(256, 12).astype(f32) * 0.1),
            jnp.asarray(rng.randn(12).astype(f32) * 0.1),
            jnp.asarray(rng.randn(3, 3, 12, 384).astype(f32) * 0.1),
            jnp.asarray(rng.randn(384).astype(f32) * 0.1),
        )
        with pltpu.force_tpu_interpret_mode():
            fea, c0, agcm = fused_agcm_head(xs, mods, *args, n_first=128, out_dtype=jnp.float32)
        fea_r, c0_r, agcm_r = fused_agcm_head_ref(xs, mods, *args, n_first=128)
        np.testing.assert_allclose(np.asarray(fea, f32), np.asarray(fea_r, f32), atol=2e-5)
        np.testing.assert_allclose(np.asarray(c0, f32), np.asarray(c0_r, f32), atol=2e-5)
        np.testing.assert_allclose(np.asarray(agcm, f32), np.asarray(agcm_r, f32), atol=2e-5)

    def test_agcm_head_u8_scale(self, rng):
        """uint8 input with in-kernel /255 matches a pre-scaled f32 input."""
        from hdrtv_tpu.ops.megakernel import fused_agcm_head

        f32 = np.float32
        hb, wb = 12, 16
        xu8 = jnp.asarray((rng.rand(hb, wb, 12) * 255).astype(np.uint8))
        mods = jnp.asarray(rng.randn(6, 256).astype(f32) * 0.1)
        args = (
            jnp.asarray(rng.randn(12, 256).astype(f32) * 0.2),
            jnp.asarray(rng.randn(256).astype(f32) * 0.1),
            jnp.asarray(rng.randn(256, 256).astype(f32) * 0.05),
            jnp.asarray(rng.randn(256).astype(f32) * 0.1),
            jnp.asarray(rng.randn(256, 12).astype(f32) * 0.1),
            jnp.asarray(rng.randn(12).astype(f32) * 0.1),
            jnp.asarray(rng.randn(3, 3, 12, 384).astype(f32) * 0.1),
            jnp.asarray(rng.randn(384).astype(f32) * 0.1),
        )
        with pltpu.force_tpu_interpret_mode():
            a = fused_agcm_head(xu8, mods, *args, n_first=128, scale=1 / 255.0, out_dtype=jnp.float32)
            b = fused_agcm_head(
                xu8.astype(jnp.float32) / 255.0, mods, *args, n_first=128, out_dtype=jnp.float32
            )
        for av, bv in zip(a, b):
            np.testing.assert_allclose(np.asarray(av, f32), np.asarray(bv, f32), atol=2e-5)

    def test_cond_chain_parity(self, rng):
        from hdrtv_tpu.ops.megakernel import fused_cond_chain, fused_cond_chain_ref

        f32 = np.float32
        c0 = jnp.asarray(rng.rand(24, 32, 256).astype(f32))
        weights = [
            (jnp.asarray(rng.randn(256, 256).astype(f32) * 0.05), jnp.asarray(rng.randn(256).astype(f32) * 0.1))
            for _ in range(4)
        ] + [(jnp.asarray(rng.randn(256, 64).astype(f32) * 0.05), jnp.asarray(rng.randn(64).astype(f32) * 0.1))]
        with pltpu.force_tpu_interpret_mode():
            c, cond1 = fused_cond_chain(c0, weights)
        c_r, cond1_r = fused_cond_chain_ref(c0, weights)
        np.testing.assert_allclose(np.asarray(c, f32), np.asarray(c_r, f32), atol=2e-5)
        np.testing.assert_allclose(np.asarray(cond1, f32), np.asarray(cond1_r, f32), atol=2e-5)

    def test_tail_parity(self, rng):
        from hdrtv_tpu.ops.megakernel import fused_tail, fused_tail_ref

        f32 = np.float32
        hb, wb = 24, 32
        s = jnp.asarray(rng.rand(hb, wb, 128).astype(f32))
        cond1 = jnp.asarray(rng.rand(hb, wb, 64).astype(f32))
        skip = jnp.asarray(rng.rand(hb, wb, 12).astype(f32))
        sft = [
            (jnp.asarray(rng.randn(64, 64).astype(f32) * 0.05), jnp.asarray(rng.randn(64).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(64, 128).astype(f32) * 0.05), jnp.asarray(rng.randn(128).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(64, 64).astype(f32) * 0.05), jnp.asarray(rng.randn(64).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(64, 128).astype(f32) * 0.05), jnp.asarray(rng.randn(128).astype(f32) * 0.1)),
        ]
        w_hr = jnp.asarray(rng.randn(3, 3, 128, 128).astype(f32) * 0.05)
        b_hr = jnp.asarray(rng.randn(128).astype(f32) * 0.1)
        w_l = jnp.asarray(rng.randn(3, 3, 128, 12).astype(f32) * 0.05)
        b_l = jnp.asarray(rng.randn(12).astype(f32) * 0.1)
        with pltpu.force_tpu_interpret_mode():
            y16 = fused_tail(s, cond1, skip, sft, w_hr, b_hr, w_l, b_l, pack=True)
            ybf = fused_tail(s, cond1, skip, sft, w_hr, b_hr, w_l, b_l, pack=False)
        y16_r = fused_tail_ref(s, cond1, skip, sft, w_hr, b_hr, w_l, b_l, pack=True)
        ybf_r = fused_tail_ref(s, cond1, skip, sft, w_hr, b_hr, w_l, b_l, pack=False)
        assert y16.shape == (hb, 2, wb, 6)
        assert np.abs(np.asarray(y16, np.int32) - np.asarray(y16_r, np.int32)).max() <= 1
        np.testing.assert_allclose(np.asarray(ybf, f32), np.asarray(ybf_r, f32), atol=2e-5)

    def test_down2_parity(self, rng):
        from hdrtv_tpu.ops.megakernel import fused_down2, fused_down2_ref

        f32 = np.float32
        for hb, wb, c, co in ((24, 32, 128, 128), (20, 16, 256, 384)):
            x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
            w = jnp.asarray(rng.randn(3, 3, c, co).astype(f32) * 0.05)
            b = jnp.asarray(rng.randn(co).astype(f32) * 0.1)
            for act in (None, "relu", "lrelu"):
                with pltpu.force_tpu_interpret_mode():
                    y = fused_down2(x, w, b, act=act)
                y_r = fused_down2_ref(x, w, b, act=act)
                assert y.shape == (hb // 2, wb // 2, co)
                np.testing.assert_allclose(np.asarray(y, f32), np.asarray(y_r, f32), atol=3e-5)


class TestEnsembleMega:
    def test_rgb48_matches_plain_s2d(self, rng):
        """Full mega path ≡ plain s2d composition on the real HR weights."""
        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48, s2d_transform_params
        from hdrtv_tpu.ops.resize import downsample_quarter_aa

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        params = load_npz(os.path.join(here, "weights", "hr_fp32.npz"))
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(params).items()}
        cfg = ModelConfig()

        frame = jnp.asarray((rng.rand(48, 64, 3) * 255).astype(np.uint8))
        cond = downsample_quarter_aa(frame[None].astype(jnp.float32) / 255.0)

        os.environ["HDRTV_MEGAKERNEL_INTERPRET"] = "1"
        try:
            with pltpu.force_tpu_interpret_mode():
                mega = ensemble_s2d_rgb48(sp, frame, cond, cfg, policy=F32)
        finally:
            del os.environ["HDRTV_MEGAKERNEL_INTERPRET"]
        os.environ["HDRTV_MEGAKERNEL"] = "0"
        try:
            base = ensemble_s2d_rgb48(sp, frame, cond, cfg, policy=F32)
        finally:
            del os.environ["HDRTV_MEGAKERNEL"]
        d = np.abs(np.asarray(mega, np.int32) - np.asarray(base, np.int32))
        assert d.max() <= 1, f"u16 maxdiff {d.max()}"
        assert mega.shape == (48, 64, 3) and mega.dtype == jnp.uint16

    def test_flat_bgr_weight_permutation(self, rng):
        """bgr=True (weights permuted) ≡ explicit lane flip + bgr=False."""
        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48_flat, s2d_transform_params

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        params = load_npz(os.path.join(here, "weights", "hr_fp32.npz"))
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(params).items()}
        cfg = ModelConfig()

        bgr_frame = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        rgb_frame = bgr_frame[..., ::-1]
        os.environ["HDRTV_MEGAKERNEL_INTERPRET"] = "1"
        try:
            with pltpu.force_tpu_interpret_mode():
                a = ensemble_s2d_rgb48_flat(
                    sp, jnp.asarray(bgr_frame.reshape(48, 192)), None, cfg, policy=F32, bgr=True
                )
                b = ensemble_s2d_rgb48_flat(
                    sp, jnp.asarray(np.ascontiguousarray(rgb_frame).reshape(48, 192)), None, cfg, policy=F32
                )
        finally:
            del os.environ["HDRTV_MEGAKERNEL_INTERPRET"]
        assert np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)).max() <= 1


class TestSftKernels:
    def _sft4(self, rng, cc, c):
        f32 = np.float32
        return [
            (jnp.asarray(rng.randn(cc, cc).astype(f32) * 0.05), jnp.asarray(rng.randn(cc).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(cc, c).astype(f32) * 0.05), jnp.asarray(rng.randn(c).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(cc, cc).astype(f32) * 0.05), jnp.asarray(rng.randn(cc).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(cc, c).astype(f32) * 0.05), jnp.asarray(rng.randn(c).astype(f32) * 0.1)),
        ]

    def test_sft_conv_v2_parity(self, rng):
        from hdrtv_tpu.ops.megakernel import fused_sft_conv3_v2, fused_sft_conv3_v2_ref

        f32 = np.float32
        hb, wb, c, cc = 24, 32, 128, 64
        x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        cond = jnp.asarray(rng.rand(hb, wb, cc).astype(f32))
        skip = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        sft = self._sft4(rng, cc, c)
        w = jnp.asarray(rng.randn(3, 3, c, c).astype(f32) * 0.05)
        b = jnp.asarray(rng.randn(c).astype(f32) * 0.1)
        for relu, sk in ((True, None), (False, skip)):
            with pltpu.force_tpu_interpret_mode():
                y = fused_sft_conv3_v2(x, cond, sft, w, b, relu=relu, skip=sk)
            y_r = fused_sft_conv3_v2_ref(x, cond, sft, w, b, relu=relu, skip=sk)
            np.testing.assert_allclose(np.asarray(y, f32), np.asarray(y_r, f32), atol=3e-5)

    def test_resblock_parity(self, rng):
        from hdrtv_tpu.ops.megakernel import fused_resblock, fused_resblock_ref

        f32 = np.float32
        hb, wb, c, cc = 24, 32, 128, 64
        x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        cond = jnp.asarray(rng.rand(hb, wb, cc).astype(f32))
        sft1 = self._sft4(rng, cc, c)
        sft2 = self._sft4(rng, cc, c)
        w1 = jnp.asarray(rng.randn(3, 3, c, c).astype(f32) * 0.05)
        b1 = jnp.asarray(rng.randn(c).astype(f32) * 0.1)
        w2 = jnp.asarray(rng.randn(3, 3, c, c).astype(f32) * 0.05)
        b2 = jnp.asarray(rng.randn(c).astype(f32) * 0.1)
        with pltpu.force_tpu_interpret_mode():
            y = fused_resblock(x, cond, sft1, w1, b1, sft2, w2, b2)
        y_r = fused_resblock_ref(x, cond, sft1, w1, b1, sft2, w2, b2)
        np.testing.assert_allclose(np.asarray(y, f32), np.asarray(y_r, f32), atol=5e-5)
