"""Double-s2d (dd) execution mode: weight-transform and ensemble exactness.

Retires the open transform risks of the L1 double-s2d design record
(PERF_NOTES round 5): the composed transforms, the dd→L2 stride-2
transition, and the vanishing up-path d2s are all verified exact here.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")


def _conv_ref(x, w, *, stride=1):
    import jax

    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class TestDDTransforms:
    def test_s2d2_roundtrip_and_order(self):
        from hdrtv_tpu.models.dd import d2s2, s2d2

        x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 12, 3).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(d2s2(s2d2(x))), np.asarray(x))
        # natural (r, c) = (1, 2): a2=0,a1=1,b2=1,b1=0 → ch (0·2+1)·4C+(1·2+0)·C
        probe = np.zeros((1, 4, 4, 1), np.float32)
        probe[0, 1, 2, 0] = 7.0
        out = np.asarray(s2d2(jnp.asarray(probe)))
        assert out[0, 0, 0, 1 * 4 + 2] == 7.0

    def test_w_dd_s1_exact(self):
        from hdrtv_tpu.models.dd import s2d2, w_dd_s1

        rng = np.random.RandomState(1)
        w = rng.rand(3, 3, 2, 3).astype(np.float32)
        x = jnp.asarray(rng.rand(1, 8, 12, 2).astype(np.float32))
        ref = s2d2(_conv_ref(x, w))
        out = _conv_ref(s2d2(x), w_dd_s1(w))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=0)

    def test_w_dd_s2_exact(self):
        """Natural stride-2 'same' ≡ 2×2 stride-1 (1,0)-pad over dd, output
        in the next level's single-s2d layout (zero-data-movement L1→L2)."""
        import jax

        from hdrtv_tpu.models.dd import s2d2, w_dd_s2
        from hdrtv_tpu.models.s2d import s2d

        rng = np.random.RandomState(2)
        w = rng.rand(3, 3, 2, 3).astype(np.float32)
        x = jnp.asarray(rng.rand(1, 16, 24, 2).astype(np.float32))
        ref = s2d(_conv_ref(x, w, stride=2))
        out = jax.lax.conv_general_dilated(
            s2d2(x), jnp.asarray(w_dd_s2(w)), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=0)

    def test_w_dd_1x1_block_structure(self):
        from hdrtv_tpu.models.dd import w_dd_1x1

        w = np.random.RandomState(3).rand(1, 1, 2, 4).astype(np.float32)
        t = w_dd_1x1(w)
        assert t.shape == (1, 1, 32, 64)
        for s in range(16):
            np.testing.assert_array_equal(t[0, 0, s * 2 : s * 2 + 2, s * 4 : s * 4 + 4], w[0, 0])
        assert np.count_nonzero(t) == np.count_nonzero(w) * 16


class TestDDEnsemble:
    def test_ensemble_dd_matches_normal(self):
        from hdrtv_tpu.models.dd import dd_transform_params, ensemble_dd
        from hdrtv_tpu.models.hdrtvnet import ModelConfig, ensemble_agcm_le
        from hdrtv_tpu.models.import_torch import load_npz

        params = load_npz(WEIGHTS)
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        dp = {k: jnp.asarray(v) for k, v in dd_transform_params(params).items()}
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        cond = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32))
        ref = np.asarray(ensemble_agcm_le(pj, img, cond, ModelConfig()))
        out = np.asarray(ensemble_dd(dp, img, cond, ModelConfig()))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=0)


class TestDDBoundary:
    def test_quads_view_matches_s2d2(self):
        """The (H/4,4,W/4,12) quad-row view + lane permutation IS the dd
        tensor of the frame — the free-host-view boundary claim, executed."""
        from hdrtv_tpu.models.dd import dd_from_quads, dd_quads_view, s2d2

        rng = np.random.RandomState(4)
        h, w = 16, 24
        frame2d = (rng.rand(h, w * 3) * 255).astype(np.uint8)
        ref = s2d2(
            jnp.asarray(frame2d.reshape(h, w, 3)[None].astype(np.float32))
        )
        out = dd_from_quads(jnp.asarray(dd_quads_view(frame2d))).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_quads_view_is_free(self):
        """The quad view must be a pure reshape of the byte rows (no copy)."""
        from hdrtv_tpu.models.dd import dd_quads_view

        frame2d = np.zeros((16, 72), np.uint8)
        v = dd_quads_view(frame2d)
        assert v.base is frame2d or v.base is frame2d.base

    def test_quads_roundtrip_and_rgb48_rows(self):
        """quads_from_dd inverts dd_from_quads, and on u16 model output the
        quad planes ARE the flat (H,3W) RGB48 rows (free host view)."""
        from hdrtv_tpu.models.dd import dd_from_quads, dd_quads_view, quads_from_dd

        rng = np.random.RandomState(5)
        h, w = 16, 24
        frame2d = (rng.rand(h, w * 3) * 65535).astype(np.uint16)
        v = frame2d.reshape(h // 4, 4, (w * 3) // 12, 12)
        x = dd_from_quads(jnp.asarray(v))
        back = np.asarray(quads_from_dd(x))
        np.testing.assert_array_equal(back, v)
        np.testing.assert_array_equal(back.reshape(h, w * 3), frame2d)
        del dd_quads_view


class TestDDPolicy:
    def test_ensemble_dd_bf16_close_to_s2d_bf16(self):
        """dd mode is policy-clean: under BF16 it tracks the single-s2d bf16
        path within bf16 noise (different-but-equivalent contraction order)."""
        from hdrtv_tpu.models.dd import dd_transform_params, ensemble_dd
        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.models.layers import BF16
        from hdrtv_tpu.models.s2d import ensemble_s2d, s2d_transform_params

        params = load_npz(WEIGHTS)
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(params).items()}
        dp = {k: jnp.asarray(v) for k, v in dd_transform_params(params).items()}
        rng = np.random.RandomState(6)
        img = jnp.asarray(rng.rand(1, 32, 48, 3).astype(np.float32))
        cond = jnp.asarray(rng.rand(1, 8, 12, 3).astype(np.float32))
        ref = np.asarray(ensemble_s2d(sp, img, cond, ModelConfig(), policy=BF16)).astype(np.float32)
        out = np.asarray(ensemble_dd(dp, img, cond, ModelConfig(), policy=BF16)).astype(np.float32)
        np.testing.assert_allclose(out, ref, atol=3e-2, rtol=0)
