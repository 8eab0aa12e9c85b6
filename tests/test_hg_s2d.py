"""HG composite in the s2d domain — exactness vs the natural path + golden."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _full_hg_params():
    from hdrtv_tpu.models.import_torch import convert_state

    fx = np.load(os.path.join(FIXTURES, "hg_mid.npz"))
    raw = {k: fx[k] for k in fx.files if k.startswith("hg.")}
    return {k: jnp.asarray(v) for k, v in convert_state(raw).items()}, fx


class TestPadReflectS2d:
    def test_matches_natural_reflect(self):
        from hdrtv_tpu.models.layers import pad_reflect
        from hdrtv_tpu.models.s2d import d2s, s2d
        from hdrtv_tpu.models.hg_s2d import pad_reflect_s2d

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 20, 28, 3).astype(np.float32))
        xs = s2d(x)
        for pgh, pgw in ((3, 0), (0, 4), (5, 2)):
            ref = s2d(pad_reflect(x, 2 * pgh, 2 * pgw))
            got = pad_reflect_s2d(xs, pgh, pgw)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_noop(self):
        from hdrtv_tpu.models.hg_s2d import pad_reflect_s2d

        x = jnp.ones((1, 4, 4, 12))
        assert pad_reflect_s2d(x, 0, 0) is x


class TestSubposOps:
    def test_subpos_max_is_maxpool2(self):
        from hdrtv_tpu.models.layers import max_pool2
        from hdrtv_tpu.models.s2d import s2d
        from hdrtv_tpu.models.hg_s2d import subpos_max

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 16, 24, 5).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(subpos_max(s2d(x))), np.asarray(max_pool2(x))
        )

    def test_mask_s2d_matches_make_mask(self):
        from hdrtv_tpu.models.hdrtvnet import make_mask
        from hdrtv_tpu.models.s2d import s2d
        from hdrtv_tpu.models.hg_s2d import mask_s2d

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(1, 8, 12, 3).astype(np.float32))
        ref = s2d(make_mask(x))  # (1,4,6,4)
        got = mask_s2d(s2d(x))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestHGS2d:
    def test_hg_s2d_matches_natural(self):
        """hg_s2d_apply on s2d tensors ≡ hg_apply on natural tensors
        (reference-arch nf=16 weights; nf=64 exercised on-chip)."""
        from hdrtv_tpu.models.hg import hg_apply
        from hdrtv_tpu.models.s2d import d2s, s2d
        from hdrtv_tpu.models.hg_s2d import hg_s2d_transform, hg_s2d_apply

        params, fx = _full_hg_params()
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        mask = jnp.asarray((rng.rand(1, 64, 96, 1) > 0.7).astype(np.float32))

        ref = np.asarray(hg_apply(params, img, mask, prefix="hg."))

        sp = {k: jnp.asarray(v) for k, v in hg_s2d_transform(
            {k: np.asarray(v) for k, v in params.items()}
        ).items()}
        mask4 = s2d(jnp.broadcast_to(mask, mask.shape))[..., :4]
        got = np.asarray(d2s(hg_s2d_apply(sp, s2d(img), mask4)))
        np.testing.assert_allclose(got, ref, atol=5e-5)

    def test_hg_s2d_matches_torch_golden(self):
        """s2d path vs the torch reference output stored in the fixture."""
        from hdrtv_tpu.models.s2d import d2s, s2d
        from hdrtv_tpu.models.hg_s2d import hg_s2d_transform, hg_s2d_apply

        params, fx = _full_hg_params()
        img = jnp.asarray(fx["img"])
        mask = jnp.asarray(fx["mask"])
        sp = {k: jnp.asarray(v) for k, v in hg_s2d_transform(
            {k: np.asarray(v) for k, v in params.items()}
        ).items()}
        mask4 = s2d(mask)
        got = np.asarray(d2s(hg_s2d_apply(sp, s2d(img), mask4)))
        np.testing.assert_allclose(got, fx["out"], atol=2e-4)

    def test_ensemble_s2d_composite_matches_natural(self):
        """Full composite through ensemble_s2d (real base weights + full HG)
        vs the natural hg_composite."""
        from hdrtv_tpu.models.hdrtvnet import ModelConfig, hg_composite
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.models.s2d import ensemble_s2d, s2d_transform_params
        from hdrtv_tpu.ops.resize import downsample_quarter_aa

        hg_params, _ = _full_hg_params()
        base = load_npz(os.path.join(FIXTURES, "..", "..", "weights", "hr_fp32.npz"))
        nat = {f"base.{k}": jnp.asarray(v) for k, v in base.items()}
        nat.update(hg_params)
        cfg = ModelConfig(use_hg=True)

        rng = np.random.RandomState(5)
        img = jnp.asarray(rng.rand(1, 56, 80, 3).astype(np.float32))
        cond = downsample_quarter_aa(img)

        ref = np.asarray(hg_composite(nat, img, cond, cfg))

        host = {k: np.asarray(v) for k, v in nat.items()}
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host, cfg).items()}
        got = np.asarray(ensemble_s2d(sp, img, cond, cfg))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_flat_rgb48_composite_mega_interpret(self):
        """The flat byte-row program with HG through the megakernel branch
        (interpret mode) ≡ the plain s2d composite path."""
        import os as _os

        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import (
            ensemble_s2d,
            ensemble_s2d_rgb48_flat,
            s2d_transform_params,
        )
        from hdrtv_tpu.ops.pack import pack_rgb48
        from hdrtv_tpu.ops.resize import downsample_quarter_aa
        from jax.experimental.pallas import tpu as pltpu

        hg_params, _ = _full_hg_params()
        base = load_npz(os.path.join(FIXTURES, "..", "..", "weights", "hr_fp32.npz"))
        host = {f"base.{k}": np.asarray(v) for k, v in base.items()}
        host.update({k: np.asarray(v) for k, v in hg_params.items()})
        cfg = ModelConfig(use_hg=True)
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host, cfg).items()}

        rng = np.random.RandomState(6)
        frame = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        flat = jnp.asarray(frame.reshape(64, 96 * 3))
        cond = downsample_quarter_aa(jnp.asarray(frame[None]).astype(jnp.float32) / 255.0)

        x = jnp.asarray(frame[None]).astype(jnp.float32) / 255.0
        ref = np.asarray(pack_rgb48(ensemble_s2d(sp, x, cond, cfg, policy=F32)[0]))

        _os.environ["HDRTV_MEGAKERNEL_INTERPRET"] = "1"
        _os.environ["HDRTV_HG_TAIL"] = "1"  # cover the fused-tail integration
        try:
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(
                    ensemble_s2d_rgb48_flat(sp, flat, cond, cfg, policy=F32)
                ).reshape(64, 96, 3)
        finally:
            del _os.environ["HDRTV_MEGAKERNEL_INTERPRET"]
            del _os.environ["HDRTV_HG_TAIL"]
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1  # fp reassociation at the u16 rounding boundary

    def test_composite_s2d_with_padding(self):
        """Odd-in-/32 size exercises the s2d reflect pad + crop; the whole
        composite must match the natural hg_composite wrapper."""
        from hdrtv_tpu.models.hdrtvnet import ModelConfig, make_mask
        from hdrtv_tpu.models.layers import pad_reflect
        from hdrtv_tpu.models.hg import hg_apply
        from hdrtv_tpu.models.s2d import d2s, s2d
        from hdrtv_tpu.models.hg_s2d import hg_composite_s2d, hg_s2d_transform

        params, fx = _full_hg_params()
        cfg = ModelConfig(use_hg=True)
        rng = np.random.RandomState(4)
        base = jnp.asarray(rng.rand(1, 56, 80, 3).astype(np.float32))  # pads to 64×96

        # natural reference: mask → pad → hg → crop (hg_composite inner steps)
        mask = make_mask(base, r=cfg.mask_r)
        ref = np.asarray(
            hg_apply(params, pad_reflect(base, 8, 16), pad_reflect(mask, 8, 16), prefix="hg.")
        )[:, :56, :80]

        sp = {k: jnp.asarray(v) for k, v in hg_s2d_transform(
            {k: np.asarray(v) for k, v in params.items()}
        ).items()}
        got = np.asarray(d2s(hg_composite_s2d(sp, s2d(base), cfg)))
        np.testing.assert_allclose(got, ref, atol=5e-5)
