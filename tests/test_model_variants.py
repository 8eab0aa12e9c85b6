"""Golden parity for the architecture variant families.

AGCM plain/affine/lite/spatial/spatial-mix/lowrank, LE cleantrunk, and the
HG direct generator, against reference outputs with seeded random weights
(fixtures from tools/make_goldens.py).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from tests.conftest import load_fixture


def _params_from(fx: dict, prefix: str) -> dict:
    from hdrtv_tpu.models.import_torch import convert_state

    raw = {k[len(prefix):]: v for k, v in fx.items() if k.startswith(prefix)}
    return {k: jnp.asarray(v) for k, v in convert_state(raw).items()}


class TestAGCMVariants:
    @pytest.mark.parametrize(
        "tag,classifier",
        [
            ("plain", "agcm_plain"),
            ("affine", "agcm_affine"),
            ("lite8", "agcm_lite_8"),
            ("spatial", "spatial_h4_wide8_x2"),
            ("spatialmix", "spatial_mix_h4_wide8_x2"),
        ],
    )
    def test_variant_matches_reference(self, tag, classifier):
        from hdrtv_tpu.models.agcm import agcm_apply

        fx = load_fixture("agcm_variants.npz")
        params = _params_from(fx, f"{tag}__sd__")
        out = agcm_apply(
            params,
            jnp.asarray(fx["img"]),
            jnp.asarray(fx["cond"]),
            prefix="",
            classifier=classifier,
        )
        np.testing.assert_allclose(np.asarray(out), fx[f"{tag}__out"], atol=2e-5, rtol=0)

    def test_mode_detection(self):
        from hdrtv_tpu.models.agcm import agcm_mode

        assert agcm_mode("plain") == "plain"
        assert agcm_mode("adaptive_affine") == "affine"
        assert agcm_mode("lite_16") == "lite"
        assert agcm_mode("lowrank8") == "lowrank"
        assert agcm_mode("spatial_mix_h16") == "spatial_mix"
        assert agcm_mode("spatialh8wide16x2") == "spatial_affine"
        assert agcm_mode("color_condition") == "dynamic"


class TestEnsembleVariants:
    @pytest.mark.parametrize(
        "tag,le_arch",
        [
            ("cleantrunk", "cleantrunk"),
            ("cleantrunk_deep8", "cleantrunk_deep8"),
            ("wide64x4", "cleantrunk_wide64x4"),
            ("selectsft23", "selectsft23"),
            ("bottleneck_heavy", "bottleneck_heavy"),
            ("flatall8", "cleantrunk_flatall8"),
            ("plainflatlinear8", "plainflatlinear8"),
            ("plainbottleneck", "plainbottleneckh8wide24x2"),
            ("conddirect", "conddirecth4wide24x2"),
            ("condgatedirect", "condgatedirecth4wide24x2"),
        ],
    )
    def test_le_arch_matches_reference(self, tag, le_arch):
        from hdrtv_tpu.models.hdrtvnet import ModelConfig, ensemble_agcm_le

        fx = load_fixture("ensemble_variants.npz")
        params = _params_from(fx, f"{tag}__sd__")
        cfg = ModelConfig(le_arch=le_arch, nf=16)
        out = ensemble_agcm_le(params, jnp.asarray(fx["img"]), jnp.asarray(fx["cond"]), cfg)
        np.testing.assert_allclose(np.asarray(out), fx[f"{tag}__out"], atol=1e-4, rtol=0)

    def test_lowrank_svd_remap_matches_reference(self):
        """Checkpoint remap: full-rank HRconv factored via SVD into
        reduce/expand (Condition_arch.remap_condition_state_dict)."""
        from hdrtv_tpu.models.hdrtvnet import ModelConfig, ensemble_agcm_le
        from hdrtv_tpu.models.import_torch import convert_state, remap_condition_state

        fx = load_fixture("ensemble_variants.npz")
        raw = {k[len("lowrank4__sd__"):]: v for k, v in fx.items() if k.startswith("lowrank4__sd__")}
        raw = remap_condition_state(raw, prefix="AGCM.", classifier="lowrank_4")
        params = {k: jnp.asarray(v) for k, v in convert_state(raw).items()}
        cfg = ModelConfig(classifier="agcm_lowrank4", nf=16)
        out = ensemble_agcm_le(params, jnp.asarray(fx["img"]), jnp.asarray(fx["cond"]), cfg)
        np.testing.assert_allclose(np.asarray(out), fx["lowrank4__out"], atol=2e-4, rtol=0)


class TestHGDirect:
    def test_hg_direct_matches_reference(self):
        from hdrtv_tpu.models.hg import hg_direct_apply

        fx = load_fixture("hg_direct.npz")
        params = _params_from(fx, "sd__")
        out = hg_direct_apply(
            params,
            jnp.asarray(fx["img"]),
            jnp.asarray(fx["mask"]),
            prefix="",
            bottleneck_scale=4,
            trunk_depth=2,
        )
        np.testing.assert_allclose(np.asarray(out), fx["out"], atol=2e-5, rtol=0)


class TestFP8Import:
    """FP8 source checkpoints (VERDICT r1 item 9): all 12 load; quantized
    layers roundtrip through float8_e4m3 numerics."""

    ROOT = "/root/reference/src/models/weights/original/tensorrt_fp8"

    def test_e4m3_roundtrip_numerics(self):
        import ml_dtypes
        from hdrtv_tpu.models.import_torch import fp8_e4m3_roundtrip

        rng = np.random.RandomState(0)
        w = rng.randn(64, 32).astype(np.float32) * 0.2
        q = fp8_e4m3_roundtrip(w)
        # idempotent (already on the e4m3 grid) and value-changing
        np.testing.assert_array_equal(fp8_e4m3_roundtrip(q), q)
        assert not np.array_equal(q, w)
        # relative error bounded by e4m3's ~2^-3 mantissa step
        big = np.abs(w) > 0.05
        assert np.max(np.abs(q[big] - w[big]) / np.abs(w[big])) < 0.0725

    @pytest.mark.skipif(not os.path.isdir(ROOT), reason="reference weights absent")
    def test_all_twelve_fp8_checkpoints_load(self):
        import glob
        from hdrtv_tpu.models.import_torch import load_checkpoint

        paths = sorted(glob.glob(os.path.join(self.ROOT, "*", "*.pt")))
        assert len(paths) == 12
        for p in paths:
            use_hg = "hr_hg" in p
            params, cfg = load_checkpoint(p, use_hg=use_hg)
            assert cfg.use_hg == use_hg
            assert len(params) > 200
            # fp8 emulation applied: conv weights are on the e4m3 grid
            from hdrtv_tpu.models.import_torch import fp8_e4m3_roundtrip

            key = "base.LE.conv_first.weight" if use_hg else "LE.conv_first.weight"
            w = params[key]
            np.testing.assert_array_equal(fp8_e4m3_roundtrip(w), w)

    @pytest.mark.skipif(not os.path.isdir(ROOT), reason="reference weights absent")
    def test_fp8_forward_close_to_fp32(self):
        from hdrtv_tpu.models.hdrtvnet import ensemble_agcm_le
        from hdrtv_tpu.models.import_torch import load_checkpoint
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.ops.resize import downsample_quarter_aa

        path = os.path.join(self.ROOT, "hr", "HR_original_fp8_full_qat.pt")
        p8, cfg = load_checkpoint(path, use_hg=False)
        p32, _ = load_checkpoint(path, use_hg=False, fp8_emulate=False)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 32, 48, 3).astype(np.float32))
        cond = downsample_quarter_aa(x)
        y8 = np.asarray(ensemble_agcm_le({k: jnp.asarray(v) for k, v in p8.items()}, x, cond, cfg, policy=F32))
        y32 = np.asarray(ensemble_agcm_le({k: jnp.asarray(v) for k, v in p32.items()}, x, cond, cfg, policy=F32))
        err = np.abs(y8 - y32)
        assert err.max() < 0.1 and err.mean() < 0.01  # fp8 weight noise only
        assert err.max() > 0  # emulation actually changed numerics


class TestArchEnvOverrides:
    def test_env_fills_silent_fields(self, monkeypatch):
        # env arch overrides apply only when the checkpoint's architecture
        # dict is silent (hdrtvnet_torch.py:2093-2110)
        from hdrtv_tpu.models.hdrtvnet import ModelConfig

        monkeypatch.setenv("HDRTVNET_CLASSIFIER", "color_condition_lite")
        monkeypatch.setenv("HDRTVNET_LE_ARCH", "sft_lite")
        monkeypatch.setenv("HDRTVNET_POST_CORRECTION", "spatial")
        cfg = ModelConfig.from_arch_dict({})
        assert cfg.classifier == "color_condition_lite"
        assert cfg.le_arch == "sft_lite"
        assert cfg.post_correction == "spatial"

    def test_checkpoint_arch_wins_over_env(self, monkeypatch):
        from hdrtv_tpu.models.hdrtvnet import ModelConfig

        monkeypatch.setenv("HDRTVNET_LE_ARCH", "sft_lite")
        cfg = ModelConfig.from_arch_dict({"le_arch": "sft"})
        assert cfg.le_arch == "sft"

    def test_defaults_without_env(self, monkeypatch):
        from hdrtv_tpu.models.hdrtvnet import ModelConfig

        for var in ("HDRTVNET_CLASSIFIER", "HDRTVNET_LE_ARCH",
                    "HDRTVNET_HG_ARCH", "HDRTVNET_POST_CORRECTION"):
            monkeypatch.delenv(var, raising=False)
        cfg = ModelConfig.from_arch_dict({})
        assert cfg.classifier == "color_condition" and cfg.le_arch == "sft"
        assert cfg.hg_arch == "pixelshuffle" and cfg.post_correction == ""
