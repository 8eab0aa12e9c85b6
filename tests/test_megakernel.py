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

    def test_tail_up_coarse_parity(self):
        """fused_tail(up_coarse=...) unfolds d2s(up)+fea in VMEM — must match
        the materialized d2s_blocks + add path (round-3 up-path fusion)."""
        from hdrtv_tpu.models.s2d import d2s
        from hdrtv_tpu.ops.megakernel import fused_tail, fused_tail_ref

        rng = np.random.RandomState(15)  # own stream (module fixture is sequential)
        f32 = np.float32
        hb, wb, c = 24, 32, 128
        fea = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        upc = jnp.asarray(rng.rand(hb // 2, wb // 2, 4 * c).astype(f32))
        cond1 = jnp.asarray(rng.rand(hb, wb, 64).astype(f32))
        skip = jnp.asarray(rng.rand(hb, wb, 12).astype(f32))
        sft = [
            (jnp.asarray(rng.randn(64, 64).astype(f32) * 0.05), jnp.asarray(rng.randn(64).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(64, 128).astype(f32) * 0.05), jnp.asarray(rng.randn(128).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(64, 64).astype(f32) * 0.05), jnp.asarray(rng.randn(64).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(64, 128).astype(f32) * 0.05), jnp.asarray(rng.randn(128).astype(f32) * 0.1)),
        ]
        w_hr = jnp.asarray(rng.randn(3, 3, c, c).astype(f32) * 0.05)
        b_hr = jnp.asarray(rng.randn(c).astype(f32) * 0.1)
        w_l = jnp.asarray(rng.randn(3, 3, c, 12).astype(f32) * 0.05)
        b_l = jnp.asarray(rng.randn(12).astype(f32) * 0.1)
        s_mat = d2s(upc[None])[0] + fea
        with pltpu.force_tpu_interpret_mode():
            y = fused_tail(fea, cond1, skip, sft, w_hr, b_hr, w_l, b_l, pack=True, up_coarse=upc)
        y_r = fused_tail_ref(s_mat, cond1, skip, sft, w_hr, b_hr, w_l, b_l, pack=True)
        assert np.abs(np.asarray(y, np.int32) - np.asarray(y_r, np.int32)).max() <= 1

    def test_resblock_up_inputs_parity(self):
        """fused_resblock(up_coarse=...) and (x_add=...) forms ≡ materialized
        d2s/add + plain resblock."""
        from hdrtv_tpu.models.s2d import d2s
        from hdrtv_tpu.ops.megakernel import fused_resblock, fused_resblock_ref

        rng = np.random.RandomState(16)
        f32 = np.float32
        hb, wb, c, cc = 16, 16, 128, 64
        fea = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        upc = jnp.asarray(rng.rand(hb // 2, wb // 2, 4 * c).astype(f32))
        upf = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        cond = jnp.asarray(rng.rand(hb, wb, cc).astype(f32))

        def sft4():
            return [
                (jnp.asarray(rng.randn(cc, cc).astype(f32) * 0.05), jnp.asarray(rng.randn(cc).astype(f32) * 0.1)),
                (jnp.asarray(rng.randn(cc, c).astype(f32) * 0.05), jnp.asarray(rng.randn(c).astype(f32) * 0.1)),
                (jnp.asarray(rng.randn(cc, cc).astype(f32) * 0.05), jnp.asarray(rng.randn(cc).astype(f32) * 0.1)),
                (jnp.asarray(rng.randn(cc, c).astype(f32) * 0.05), jnp.asarray(rng.randn(c).astype(f32) * 0.1)),
            ]

        sft1, sft2 = sft4(), sft4()
        w1 = jnp.asarray(rng.randn(3, 3, c, c).astype(f32) * 0.05)
        b1 = jnp.asarray(rng.randn(c).astype(f32) * 0.1)
        w2 = jnp.asarray(rng.randn(3, 3, c, c).astype(f32) * 0.05)
        b2 = jnp.asarray(rng.randn(c).astype(f32) * 0.1)

        with pltpu.force_tpu_interpret_mode():
            y_c = fused_resblock(fea, cond, sft1, w1, b1, sft2, w2, b2, up_coarse=upc)
            y_a = fused_resblock(fea, cond, sft1, w1, b1, sft2, w2, b2, x_add=upf)
        ref_c = fused_resblock_ref(d2s(upc[None])[0] + fea, cond, sft1, w1, b1, sft2, w2, b2)
        ref_a = fused_resblock_ref(upf + fea, cond, sft1, w1, b1, sft2, w2, b2)
        np.testing.assert_allclose(np.asarray(y_c, f32), np.asarray(ref_c, f32), atol=3e-5)
        np.testing.assert_allclose(np.asarray(y_a, f32), np.asarray(ref_a, f32), atol=3e-5)

    def test_trunk3_stage_parity(self):
        """fused_trunk3 (whole natural L3 stage + up_conv1, round 3) ≡ the
        lax resblock chain + skip + conv."""
        import jax

        from hdrtv_tpu.ops.megakernel import fused_trunk3

        rng = np.random.RandomState(18)
        f32 = np.float32
        hb, wb, cin, cc4, co = 27, 16, 32, 16, 128
        fea3 = jnp.asarray(rng.rand(hb, wb, cin).astype(f32) - 0.2)
        cond4 = jnp.asarray(rng.rand(hb, wb, cc4).astype(f32) - 0.3)

        def pair(ci, co_):
            return (
                jnp.asarray(rng.randn(ci, co_).astype(f32) * 0.2),
                jnp.asarray(rng.randn(co_).astype(f32) * 0.1),
            )

        blocks = []
        for _ in range(4):
            sft1 = [pair(cc4, cc4), pair(cc4, cin), pair(cc4, cc4), pair(cc4, cin)]
            sft2 = [pair(cc4, cc4), pair(cc4, cin), pair(cc4, cc4), pair(cc4, cin)]
            w1 = jnp.asarray(rng.randn(3, 3, cin, cin).astype(f32) * 0.1)
            b1 = jnp.asarray(rng.randn(cin).astype(f32) * 0.1)
            w2 = jnp.asarray(rng.randn(3, 3, cin, cin).astype(f32) * 0.1)
            b2 = jnp.asarray(rng.randn(cin).astype(f32) * 0.1)
            blocks.append((sft1, w1, b1, sft2, w2, b2))
        w_up = jnp.asarray(rng.randn(3, 3, cin, co).astype(f32) * 0.1)
        b_up = jnp.asarray(rng.randn(co).astype(f32) * 0.1)

        with pltpu.force_tpu_interpret_mode():
            got = fused_trunk3(fea3, cond4, blocks, w_up, b_up)

        def conv(x, w, b):
            return jax.lax.conv_general_dilated(
                x[None], w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0] + b

        def mix(c, p0, p1):
            h = c @ p0[0] + p0[1]
            h = jnp.where(h >= 0, h, h * 0.1)
            return h @ p1[0] + p1[1]

        x = fea3
        for sft1, w1, b1, sft2, w2, b2 in blocks:
            t = x * (mix(cond4, sft1[0], sft1[1]) + 1.0) + mix(cond4, sft1[2], sft1[3])
            h1 = jnp.maximum(conv(t, w1, b1), 0.0)
            t2 = h1 * (mix(cond4, sft2[0], sft2[1]) + 1.0) + mix(cond4, sft2[2], sft2[3])
            x = x + conv(t2, w2, b2)
        out = x + fea3
        want = jnp.maximum(conv(out, w_up, b_up), 0.0)
        np.testing.assert_allclose(
            np.asarray(got, f32), np.asarray(want, f32), atol=5e-4
        )

    def test_down2_parity(self, rng):
        """fused_down2's contract is an s2d-transformed stride-2 weight
        (w_s2d_s2) — the kernel skips its structural zero row-blocks, so the
        test weights must carry them (random natural weights, transformed)."""
        from hdrtv_tpu.models.s2d import w_s2d_s2
        from hdrtv_tpu.ops.megakernel import fused_down2, fused_down2_ref

        f32 = np.float32
        for hb, wb, c, co in ((24, 32, 128, 128), (20, 16, 256, 384)):
            x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
            w_nat = rng.randn(3, 3, c // 4, co // 4).astype(f32) * 0.05
            w = jnp.asarray(w_s2d_s2(w_nat))
            b = jnp.asarray(rng.randn(co).astype(f32) * 0.1)
            for act in (None, "relu", "lrelu"):
                with pltpu.force_tpu_interpret_mode():
                    y = fused_down2(x, w, b, act=act)
                y_r = fused_down2_ref(x, w, b, act=act)
                assert y.shape == (hb // 2, wb // 2, co)
                np.testing.assert_allclose(np.asarray(y, f32), np.asarray(y_r, f32), atol=3e-5)

    def test_block_conv3_a_sub_split(self, rng):
        """fused_block_conv3 with a_sub=1 on a w_s2d_s1-transformed weight
        (co=512: the PS up-conv shape) must match the dense lax reference;
        co=128 auto-disables the split (half-block below one lane register)."""
        from hdrtv_tpu.models.s2d import w_s2d_s1
        from hdrtv_tpu.ops.conv_kernels import fused_block_conv3, fused_block_conv3_ref

        f32 = np.float32
        for c, co in ((128, 512), (128, 128)):
            x = jnp.asarray(rng.rand(16, 16, c).astype(f32))
            w = jnp.asarray(w_s2d_s1(rng.randn(3, 3, c // 4, co // 4).astype(f32) * 0.05))
            b = jnp.asarray(rng.randn(co).astype(f32) * 0.1)
            with pltpu.force_tpu_interpret_mode():
                y = fused_block_conv3(x, w, b, relu=True, a_sub=1)
            y_r = fused_block_conv3_ref(x, w, b, relu=True)
            np.testing.assert_allclose(np.asarray(y, f32), np.asarray(y_r, f32), atol=3e-5)

    def test_block_conv3_double_buffered_multi_tile(self, rng, monkeypatch):
        """The double-buffered DMA path (HDRTV_DB_DMA, ≥2 row tiles: slot
        ping-pong + prefetch of tile i+1 during tile i's compute) must match
        both the lax reference and the synchronous single-buffer path on a
        grid that exercises top/interior/bottom tiles."""
        from hdrtv_tpu.ops.conv_kernels import _pick_th, fused_block_conv3, fused_block_conv3_ref

        f32 = np.float32
        hb, wb, c = 48, 16, 128
        assert hb // _pick_th(hb, wb, c, db=True) >= 3, "test must span ≥3 tiles"
        x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        w = jnp.asarray(rng.randn(3, 3, c, c).astype(f32) * 0.05)
        b = jnp.asarray(rng.randn(c).astype(f32) * 0.1)
        skip = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        y_r = fused_block_conv3_ref(x, w, b, relu=True, skip=skip)
        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("HDRTV_DB_DMA", flag)
            with pltpu.force_tpu_interpret_mode():
                outs[flag] = np.asarray(fused_block_conv3(x, w, b, relu=True, skip=skip), f32)
            np.testing.assert_allclose(outs[flag], np.asarray(y_r, f32), atol=3e-5)
        np.testing.assert_array_equal(outs["1"], outs["0"])

    def test_block_conv3_double_buffered_quant(self, rng, monkeypatch):
        """db path under native int8 qargs: matches the db=off kernel bit-exactly."""
        from hdrtv_tpu.ops.conv_kernels import fused_block_conv3

        f32 = np.float32
        hb, wb, c = 32, 16, 128
        x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        wf = rng.randn(3, 3, c, c).astype(f32) * 0.05
        w_scale = np.abs(wf).max(axis=(0, 1, 2)) / 127.0
        w_int8 = np.clip(np.round(wf / w_scale), -127, 127).astype(np.int8)
        b = jnp.asarray(rng.randn(c).astype(f32) * 0.1)
        qargs = {
            "w_int8": jnp.asarray(w_int8),
            "w_scale": jnp.asarray(w_scale),
            "x_scale": jnp.asarray(1.0 / 127.0, f32),
        }
        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("HDRTV_DB_DMA", flag)
            with pltpu.force_tpu_interpret_mode():
                outs[flag] = np.asarray(
                    fused_block_conv3(x, jnp.asarray(wf), b, relu=True, qargs=qargs), f32
                )
        np.testing.assert_array_equal(outs["1"], outs["0"])

    def test_block_conv3_pool_out(self, rng):
        """pool_out fuses the 2×2 max pool into the conv epilogue — must
        equal maxpool(conv(x)) (the HG encoder's conv_block→pool pairs)."""
        from hdrtv_tpu.ops.conv_kernels import fused_block_conv3, fused_block_conv3_ref

        f32 = np.float32
        x = jnp.asarray(rng.rand(16, 16, 128).astype(f32))
        w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(f32) * 0.05)
        b = jnp.asarray(rng.randn(128).astype(f32) * 0.1)
        with pltpu.force_tpu_interpret_mode():
            y = fused_block_conv3(x, w, b, relu=True, pool_out=True)
        full = np.asarray(fused_block_conv3_ref(x, w, b, relu=True), f32)
        ref = full.reshape(8, 2, 8, 2, 128).max(axis=(1, 3))
        assert y.shape == (8, 8, 128)
        np.testing.assert_allclose(np.asarray(y, f32), ref, atol=3e-5)

    def test_hg_tail_parity(self, rng):
        """fused_hg_tail (concat-free conv10/conv_last + composite + pack)
        vs the jnp reference."""
        from hdrtv_tpu.ops.megakernel import fused_hg_tail, fused_hg_tail_ref

        f32 = np.float32
        hb, wb = 16, 16
        up5 = jnp.asarray(rng.rand(hb, wb, 256).astype(f32))
        c1 = jnp.asarray(rng.rand(hb, wb, 256).astype(f32))
        img = jnp.asarray(rng.rand(hb, wb, 12).astype(f32))
        mask = jnp.asarray((rng.rand(hb, wb, 4) > 0.5).astype(f32))
        w10 = jnp.asarray(rng.randn(512, 12).astype(f32) * 0.05)
        b10 = jnp.asarray(rng.randn(12).astype(f32) * 0.1)
        wl = jnp.asarray(rng.randn(24, 12).astype(f32) * 0.3)
        bl = jnp.asarray(rng.randn(12).astype(f32) * 0.1)
        with pltpu.force_tpu_interpret_mode():
            y = fused_hg_tail(up5, c1, img, mask, w10, b10, wl, bl)
        y_r = fused_hg_tail_ref(up5, c1, img, mask, w10, b10, wl, bl)
        assert y.shape == (hb, 2, wb, 6) and y.dtype == jnp.uint16
        diff = np.abs(np.asarray(y).astype(np.int64) - np.asarray(y_r).astype(np.int64))
        assert diff.max() <= 1  # fp reassociation at the u16 boundary

    def test_down2_dense_fallback(self):
        """a_sub=0 computes the dense (no structural-zero) path — correct for
        arbitrary weights a future caller might pass (ADVICE r2)."""
        from hdrtv_tpu.ops.megakernel import fused_down2, fused_down2_ref

        rng = np.random.RandomState(12)  # own stream (module fixture is sequential)
        f32 = np.float32
        hb, wb, c, co = 24, 32, 128, 128
        x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        w = jnp.asarray(rng.randn(3, 3, c, co).astype(f32) * 0.05)  # dense!
        b = jnp.asarray(rng.randn(co).astype(f32) * 0.1)
        with pltpu.force_tpu_interpret_mode():
            y = fused_down2(x, w, b, act="relu", a_sub=0)
        y_r = fused_down2_ref(x, w, b, act="relu")
        np.testing.assert_allclose(np.asarray(y, f32), np.asarray(y_r, f32), atol=3e-5)

    def test_down2_consolidated_blocks(self, rng):
        """a_sub=3: three w_s2d_s2 sub-blocks concatenated along co (the
        LE.__cond_down consolidation) must equal the dense reference."""
        from hdrtv_tpu.models.s2d import w_s2d_s2
        from hdrtv_tpu.ops.megakernel import fused_down2, fused_down2_ref

        f32 = np.float32
        hb, wb, c = 24, 32, 256
        x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        subs = [w_s2d_s2(rng.randn(3, 3, c // 4, 64).astype(f32) * 0.05) for _ in range(3)]
        w = jnp.asarray(np.concatenate(subs, axis=-1))  # co = 3*256
        b = jnp.asarray(rng.randn(768).astype(f32) * 0.1)
        with pltpu.force_tpu_interpret_mode():
            y = fused_down2(x, w, b, act="lrelu", a_sub=3)
        y_r = fused_down2_ref(x, w, b, act="lrelu")
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


class TestNativeInt8:
    def _mk(self, rng, c, co):
        w_int8 = rng.randint(-127, 128, (3, 3, c, co)).astype(np.int8)
        w_scale = (rng.rand(co).astype(np.float32) * 0.01 + 0.002)
        b = rng.randn(co).astype(np.float32) * 0.1
        return w_int8, w_scale, b

    @staticmethod
    def _eager_ref(x, w_int8, w_scale, b, s, z, act):
        """Eager W8A8 semantics: fake-quant input, conv dequant weights."""
        import jax
        xf = np.asarray(x, np.float32)
        if z is None:
            q = np.clip(np.round(xf / s), -128, 127)
            xq = q * s
        else:
            q = np.clip(np.round((xf - z) / s), 0, 255)
            xq = q * s + z
        wf = w_int8.astype(np.float32) * w_scale
        y = jax.lax.conv_general_dilated(
            jnp.asarray(xq)[None], jnp.asarray(wf), (2, 2), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0] + b
        y = np.asarray(y)
        if act == "relu":
            y = np.maximum(y, 0)
        elif act == "lrelu":
            y = np.where(y >= 0, y, y * 0.1)
        return y

    def test_down2_int8_multibranch_parity(self):
        """Consolidated CondNet down conv with per-branch activation
        calibration (round-3 int8 fix): one kernel, three quantizations in
        VMEM ≡ three separate eager W8A8 convs."""
        from hdrtv_tpu.models.s2d import w_s2d_s2
        from hdrtv_tpu.ops.megakernel import fused_down2

        rng = np.random.RandomState(11)  # own stream: the module fixture is
        # sequential — drawing from it here would shift every later test's data

        c, co_b = 256, 256  # per-branch: 256 → 256 (CondNet shapes)
        x = jnp.asarray(rng.rand(24, 32, c).astype(np.float32) * 1.5 - 0.25)
        w_nats = [
            rng.randint(-127, 128, (3, 3, c // 4, co_b // 4)).astype(np.int8)
            for _ in range(3)
        ]
        w_int8s = [w_s2d_s2(wn).astype(np.int8) for wn in w_nats]
        w_scales = [rng.rand(co_b).astype(np.float32) * 0.01 + 0.002 for _ in range(3)]
        bs = [rng.randn(co_b).astype(np.float32) * 0.1 for _ in range(3)]
        scales = [0.012, 0.009, 0.015]
        zeros = [-0.1, -0.05, -0.21]

        qargs = dict(
            w_int8=jnp.asarray(np.concatenate(w_int8s, axis=-1)),
            w_scale=jnp.asarray(np.concatenate(w_scales)),
            x_scales=jnp.asarray(scales, jnp.float32),
            x_zeros=jnp.asarray(zeros, jnp.float32),
        )
        with pltpu.force_tpu_interpret_mode():
            y = fused_down2(
                x, jnp.zeros((3, 3, c, 3 * co_b), jnp.float32),
                jnp.asarray(np.concatenate(bs)), act="lrelu", qargs=qargs, a_sub=3,
            )
        y = np.asarray(y, np.float32)
        assert y.shape == (12, 16, 3 * co_b)
        for bi in range(3):
            ref = self._eager_ref(
                x, w_int8s[bi], w_scales[bi], bs[bi], scales[bi], zeros[bi], "lrelu"
            )
            got = y[..., bi * co_b : (bi + 1) * co_b]
            err = np.abs(got - ref)
            # interior exact; borders differ by the quantized-zero pad code
            assert err[1:-1, 1:].max() < 2e-3
            s = scales[bi]
            tol = s * 0.75 * 3 * 128 * np.abs(w_int8s[bi]).mean() * w_scales[bi].mean()
            assert err.max() < max(float(tol), 1e-3)

    def test_block_conv3_int8_parity(self):
        """Stride-1 native int8 (the round-3 PS up-conv path): fused
        fused_block_conv3 W8A8 ≡ eager fake-quant + dequant-weight conv."""
        import jax

        from hdrtv_tpu.models.s2d import w_s2d_s1
        from hdrtv_tpu.ops.conv_kernels import fused_block_conv3

        rng = np.random.RandomState(13)  # own stream (module fixture is sequential)
        c, co = 256, 256
        x = jnp.asarray(rng.rand(16, 32, c).astype(np.float32) * 1.2 - 0.1)
        w_nat = rng.randint(-127, 128, (3, 3, c // 4, co // 4)).astype(np.int8)
        w_int8 = w_s2d_s1(w_nat).astype(np.int8)
        w_scale = rng.rand(co).astype(np.float32) * 0.01 + 0.002
        b = rng.randn(co).astype(np.float32) * 0.1
        s, z = 0.011, -0.13

        qargs = dict(
            w_int8=jnp.asarray(w_int8), w_scale=jnp.asarray(w_scale),
            x_scale=jnp.float32(s), x_zero=jnp.float32(z),
        )
        with pltpu.force_tpu_interpret_mode():
            y = fused_block_conv3(
                x, jnp.zeros((3, 3, c, co), jnp.float32), jnp.asarray(b),
                relu=True, a_sub=1, qargs=qargs,
            )
        y = np.asarray(y, np.float32)

        xf = np.asarray(x, np.float32)
        q = np.clip(np.round((xf - z) / s), 0, 255)
        xq = q * s + z
        wf = w_int8.astype(np.float32) * w_scale
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(xq)[None], jnp.asarray(wf), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0] + b
        ref = np.maximum(np.asarray(ref), 0.0)
        err = np.abs(y - ref)
        # interior exact; borders carry the quantized-zero pad code instead
        # of the eager path's literal f32 zeros
        assert err[1:-1, 1:-1].max() < 2e-3
        tol = s * 0.75 * 3 * 128 * np.abs(w_int8).mean() * w_scale.mean()
        assert err.max() < max(float(tol), 1e-3)

    def test_attach_psl_int8_scales_exact(self):
        """_PSL attach (round 3): PS-permuted per-channel scales dequantize
        the transformed codes to exactly the transform of the dequantized
        weights — permutation and scale stay aligned."""
        from hdrtv_tpu.models.s2d import w_ps_permute, w_s2d_s1_ps

        rng = np.random.RandomState(14)
        ci, co = 8, 16
        codes = rng.randint(-127, 128, (3, 3, ci, co)).astype(np.int8)
        wsc = rng.rand(co).astype(np.float32) * 0.01 + 0.002

        tq = w_s2d_s1_ps(codes)
        tsc = np.tile(w_ps_permute(wsc.reshape(1, 1, 1, -1))[0, 0, 0], 4)
        got = tq.astype(np.float32) * tsc
        want = w_s2d_s1_ps(codes.astype(np.float32) * wsc)
        np.testing.assert_array_equal(got, want)

    def test_cond_chain_int8_parity(self):
        """Per-layer native int8 in the 1×1 cond chain (round 3): VMEM
        re-quantization between layers ≡ eager per-layer W8A8."""
        from hdrtv_tpu.models.s2d import w_s2d_1x1
        from hdrtv_tpu.ops.megakernel import fused_cond_chain

        rng = np.random.RandomState(17)
        f32 = np.float32
        hb, wb, c = 8, 16, 256
        c0 = jnp.asarray(rng.rand(hb, wb, c).astype(f32) * 0.8 - 0.1)
        weights, qargs, eager = [], [], []
        for li in range(5):
            co = c if li != 4 else 64
            b = rng.randn(co).astype(f32) * 0.05
            if li in (0, 2, 3):  # quantized layers (last: co<128 stays float)
                codes = rng.randint(-127, 128, (1, 1, c // 4, co // 4)).astype(np.int8)
                wsc = rng.rand(co // 4).astype(f32) * 0.01 + 0.002
                tq = w_s2d_1x1(codes)[0, 0]
                tsc = np.tile(wsc, 4)
                # layer 3: symmetric calibration (no x_zero) — the round-3
                # regression case (z=0.0 must not select the asymmetric path)
                s = 0.008 + 0.002 * li
                z = None if li == 3 else -0.07 * (li + 1)
                wf = tq.astype(f32) * tsc
                weights.append((jnp.asarray(wf.astype(f32)), jnp.asarray(b)))
                qa = dict(
                    w_int8=jnp.asarray(tq), w_scale=jnp.asarray(tsc),
                    x_scale=jnp.float32(s),
                )
                if z is not None:
                    qa["x_zero"] = jnp.float32(z)
                qargs.append(qa)
                eager.append(("q", wf, b, s, z))
            else:
                w = rng.randn(c, co).astype(f32) * 0.05
                weights.append((jnp.asarray(w), jnp.asarray(b)))
                qargs.append(None)
                eager.append(("f", w, b, None, None))

        with pltpu.force_tpu_interpret_mode():
            c_out, cond1 = fused_cond_chain(c0, weights, qargs=qargs)

        v = np.asarray(c0, f32).reshape(-1, c)
        outs = []
        for idx, (kind, w, b, s, z) in enumerate(eager):
            if kind == "q" and z is None:
                q = np.clip(np.round(v / s), -128, 127)
                v = (q * s) @ w + b
            elif kind == "q":
                q = np.clip(np.round((v - z) / s), 0, 255)
                v = (q * s + z) @ w + b
            else:
                v = v @ w + b
            if idx != 4:
                v = np.where(v >= 0, v, v * 0.1)
            if idx == 1:
                outs.append(v.copy())
        np.testing.assert_allclose(
            np.asarray(c_out, f32).reshape(-1, c), outs[0], atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(cond1, f32).reshape(-1, 64), v, atol=2e-3
        )

    def test_down2_int8_parity(self, rng):
        from hdrtv_tpu.models.s2d import w_s2d_s2
        from hdrtv_tpu.ops.megakernel import fused_down2

        c, co = 128, 128
        x = jnp.asarray(rng.rand(24, 32, c).astype(np.float32) * 2 - 0.5)
        # int8 codes must carry the w_s2d_s2 zero structure (real checkpoints
        # quantize the transformed weight; structural zeros quantize to 0).
        w_nat = rng.randint(-127, 128, (3, 3, c // 4, co // 4)).astype(np.int8)
        w_int8 = w_s2d_s2(w_nat).astype(np.int8)
        w_scale = rng.rand(co).astype(np.float32) * 0.01 + 0.002
        b = rng.randn(co).astype(np.float32) * 0.1
        for z in (None, -0.11):
            s = 0.011
            qargs = dict(
                w_int8=jnp.asarray(w_int8), w_scale=jnp.asarray(w_scale),
                x_scale=s, x_zero=z,
            )
            if z is None:
                qargs.pop("x_zero")
            with pltpu.force_tpu_interpret_mode():
                y = fused_down2(x, jnp.zeros((3, 3, c, co), jnp.float32),
                                jnp.asarray(b), act="lrelu", qargs=qargs)
            ref = self._eager_ref(x, w_int8, w_scale, b, s, z, "lrelu")
            # asym zero-point padding differs by <= s/2 per contributing tap
            tol = 1e-4 if z is None else s * 0.75 * 3 * 128 * np.abs(w_int8).mean() * w_scale.mean()
            err = np.abs(np.asarray(y, np.float32) - ref)
            interior = err[1:-1, 1:]
            np.testing.assert_allclose(interior, 0, atol=max(float(tol) * 0.02, 2e-4))
            assert err.max() < max(float(tol), 1e-3)

    @staticmethod
    def _fq(x, s, z):
        xf = np.asarray(x, np.float32)
        if z is None:
            return np.clip(np.round(xf / s), -128, 127) * s
        return np.clip(np.round((xf - z) / s), 0, 255) * s + z

    def test_sft_conv_v2_int8_parity(self, rng):
        from hdrtv_tpu.ops.megakernel import fused_sft_conv3_v2, fused_sft_conv3_v2_ref

        f32 = np.float32
        hb, wb, c, cc = 24, 32, 128, 64
        x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        cond = jnp.asarray(rng.rand(hb, wb, cc).astype(f32))
        sft = [
            (jnp.asarray(rng.randn(cc, cc).astype(f32) * 0.05), jnp.asarray(rng.randn(cc).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(cc, c).astype(f32) * 0.05), jnp.asarray(rng.randn(c).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(cc, cc).astype(f32) * 0.05), jnp.asarray(rng.randn(cc).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(cc, c).astype(f32) * 0.05), jnp.asarray(rng.randn(c).astype(f32) * 0.1)),
        ]
        w_int8, w_scale, b = self._mk(rng, c, c)
        s, z = 0.02, -0.9
        qargs = dict(w_int8=jnp.asarray(w_int8), w_scale=jnp.asarray(w_scale), x_scale=s, x_zero=z)
        with pltpu.force_tpu_interpret_mode():
            y = fused_sft_conv3_v2(
                x, cond, sft, jnp.zeros((3, 3, c, c), f32), jnp.asarray(b),
                relu=True, qargs=qargs, out_dtype=jnp.float32,
            )
        # oracle: compute SFT output, fake-quant it, conv dequant weights
        (w0, b0), (w1, b1), (w2, b2), (w3, b3) = [(np.asarray(a), np.asarray(bb)) for a, bb in sft]
        cf = np.asarray(cond, f32)
        h = cf @ w0 + b0; h = np.where(h >= 0, h, h * 0.1)
        g = cf @ w2 + b2; g = np.where(g >= 0, g, g * 0.1)
        t = np.asarray(x, f32) * (h @ w1 + b1 + 1.0) + (g @ w3 + b3)
        tq = self._fq(t, s, z)
        import jax
        wf = w_int8.astype(f32) * w_scale
        ref = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(tq)[None], jnp.asarray(wf), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]) + b
        ref = np.maximum(ref, 0)
        err = np.abs(np.asarray(y, f32) - ref)
        assert err[1:-1, 1:-1].max() < 2e-3   # interior: exact up to f32 rounding
        assert err.max() < 0.25               # borders: sub-quantum pad skew only

    def test_resblock_int8_runs_and_is_close(self, rng):
        from hdrtv_tpu.ops.megakernel import fused_resblock, fused_resblock_ref

        f32 = np.float32
        hb, wb, c, cc = 24, 32, 128, 64
        x = jnp.asarray(rng.rand(hb, wb, c).astype(f32))
        cond = jnp.asarray(rng.rand(hb, wb, cc).astype(f32))
        sft1 = [
            (jnp.asarray(rng.randn(cc, cc).astype(f32) * 0.05), jnp.asarray(rng.randn(cc).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(cc, c).astype(f32) * 0.05), jnp.asarray(rng.randn(c).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(cc, cc).astype(f32) * 0.05), jnp.asarray(rng.randn(cc).astype(f32) * 0.1)),
            (jnp.asarray(rng.randn(cc, c).astype(f32) * 0.05), jnp.asarray(rng.randn(c).astype(f32) * 0.1)),
        ]
        sft2 = sft1
        w1_int8, ws1, b1 = self._mk(rng, c, c)
        w2_int8, ws2, b2 = self._mk(rng, c, c)
        q1 = dict(w_int8=jnp.asarray(w1_int8), w_scale=jnp.asarray(ws1), x_scale=0.02, x_zero=-0.5)
        q2 = dict(w_int8=jnp.asarray(w2_int8), w_scale=jnp.asarray(ws2), x_scale=0.02, x_zero=-0.5)
        wf1 = jnp.asarray(w1_int8.astype(f32) * ws1).reshape(3, 3, c, c)
        wf2 = jnp.asarray(w2_int8.astype(f32) * ws2).reshape(3, 3, c, c)
        with pltpu.force_tpu_interpret_mode():
            yq = fused_resblock(x, cond, sft1, wf1, jnp.asarray(b1), sft2, wf2, jnp.asarray(b2),
                                qargs1=q1, qargs2=q2, out_dtype=jnp.float32)

        # eager W8A8 oracle: fake-quant each conv input (incl. clipping),
        # conv with dequantized weights (W8A8Conv2d semantics)
        import jax

        def conv(t, wf, b):
            return np.asarray(jax.lax.conv_general_dilated(
                jnp.asarray(t.astype(f32))[None], wf, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]) + b

        (w0, b0), (w1s, b1s), (w2s, b2s), (w3s, b3s) = [(np.asarray(a), np.asarray(bb)) for a, bb in sft1]
        cf = np.asarray(cond, f32)
        h = cf @ w0 + b0; h = np.where(h >= 0, h, h * 0.1)
        g = cf @ w2s + b2s; g = np.where(g >= 0, g, g * 0.1)
        scale = h @ w1s + b1s
        shift = g @ w3s + b3s
        t1 = np.asarray(x, f32) * (scale + 1.0) + shift
        h1 = np.maximum(conv(self._fq(t1, 0.02, -0.5), wf1, b1), 0.0)
        t2 = h1 * (scale + 1.0) + shift  # sft2 == sft1 in this test
        y_ref = conv(self._fq(t2, 0.02, -0.5), wf2, b2) + np.asarray(x, f32)

        err = np.abs(np.asarray(yq, f32) - y_ref)
        # interior matches eager W8A8 up to rounding-boundary code flips
        # (the float64 numpy oracle rounds (t-z)/s slightly differently than
        # the kernel's f32 math near .5 boundaries — ±1 code ≈ w·s each)
        assert err[2:-2, 2:-2].max() < 0.1
        assert err.max() < 1.5  # borders: sub-quantum pad skew chains
