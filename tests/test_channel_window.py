"""Channel-window (cin/ch0) consumption of consolidated tensors (round 5).

The consolidated LE.__cond_down conv emits a (…, 3·nch) tensor whose three
branch inputs were materialized as XLA channel slices (~0.6 ms/frame at
1080p, round-5 device profile). fused_mix_chain and fused_down2 now read
their window through input BlockSpecs instead. Parity targets: window
reads ≡ slice-then-kernel, and the lax fallbacks slice identically.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


@pytest.fixture
def rng():
    return np.random.RandomState(3)


class TestMixChainWindow:
    @pytest.mark.parametrize("kb", [0, 1, 2])
    def test_window_matches_slice(self, rng, kb):
        from hdrtv_tpu.ops.megakernel import fused_mix_chain, fused_mix_chain_ref

        hb, wb, nch = 16, 32, 128
        x = jnp.asarray(rng.rand(hb, wb, 3 * nch).astype(np.float32))
        steps = [
            (jnp.asarray(rng.randn(nch, nch).astype(np.float32) * 0.05),
             jnp.asarray(rng.randn(nch).astype(np.float32) * 0.1), "lrelu"),
            (jnp.asarray(rng.randn(nch, 64).astype(np.float32) * 0.05),
             jnp.asarray(rng.randn(64).astype(np.float32) * 0.1), None),
        ]
        with pltpu.force_tpu_interpret_mode():
            got = fused_mix_chain(x, steps, cin=nch, ch0=kb * nch)
        ref = fused_mix_chain_ref(x[:, :, kb * nch : (kb + 1) * nch], steps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_misaligned_offset_rejected(self, rng):
        from hdrtv_tpu.ops.megakernel import fused_mix_chain

        x = jnp.zeros((16, 32, 384), jnp.float32)
        steps = [(jnp.zeros((128, 64), jnp.float32), jnp.zeros((64,), jnp.float32), None)]
        with pytest.raises(ValueError):
            fused_mix_chain(x, steps, cin=128, ch0=64)


class TestDown2Window:
    @pytest.mark.parametrize("kb", [0, 2])
    def test_window_matches_slice(self, rng, kb):
        from hdrtv_tpu.models.s2d import w_s2d_s2
        from hdrtv_tpu.ops.megakernel import fused_down2, fused_down2_ref

        hb, wb, cn = 16, 32, 32  # natural 3×3 stride-2 conv, 32→32
        wn = rng.randn(3, 3, cn, cn).astype(np.float32) * 0.05
        w = jnp.asarray(w_s2d_s2(wn))  # (3,3,128,128) block-structured
        b = jnp.asarray(rng.randn(w.shape[-1]).astype(np.float32) * 0.1)
        x = jnp.asarray(rng.rand(hb, wb, 3 * w.shape[2]).astype(np.float32))
        win = x[:, :, kb * w.shape[2] : (kb + 1) * w.shape[2]]
        with pltpu.force_tpu_interpret_mode():
            got = fused_down2(x, w, b, act="lrelu", cin=w.shape[2], ch0=kb * w.shape[2])
            ref = fused_down2(win, w, b, act="lrelu")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
        ref2 = fused_down2_ref(win, w, b, act="lrelu")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref2), rtol=1e-4, atol=1e-4)


class TestCondDownsEndToEnd:
    def test_consolidated_windows_match_separate(self, rng):
        """_le_cond_downs on the consolidated conv (channel-window
        consumption, off-TPU: the cin/ch0 lax-fallback slices inside
        conv_s2/mix_chain) ≡ the separate-conv path on the original
        weights — the consolidation is an exact concat
        (models/s2d.py s2d_transform_params)."""
        import os

        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import _le_cond_downs, s2d_transform_params

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        params = load_npz(os.path.join(here, "weights", "hr_fp32.npz"))
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(params).items()}
        assert "LE.__cond_down.weight" in sp
        c = jnp.asarray(rng.rand(1, 16, 32, sp["LE.__cond_down.weight"].shape[2]).astype(np.float32))

        a2, a3, a4 = _le_cond_downs(sp, c, policy=F32)
        sp_sep = dict(sp)
        del sp_sep["LE.__cond_down.weight"], sp_sep["LE.__cond_down.bias"]
        b2, b3, b4 = _le_cond_downs(sp_sep, c, policy=F32)
        for a, b in ((a2, b2), (a3, b3), (a4, b4)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
