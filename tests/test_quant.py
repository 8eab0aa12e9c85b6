"""Quantization subsystem tests: W8/W8A8 numerics, calibration, portable
checkpoint import, QAT fake-quant."""

import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _tiny_conv_params():
    rng = np.random.RandomState(0)
    return {
        "net.conv.weight": rng.randn(3, 3, 4, 8).astype(np.float32) * 0.2,
        "net.conv.bias": rng.randn(8).astype(np.float32) * 0.1,
    }


class TestW8Numerics:
    def test_weight_quant_matches_torch_math(self):
        """Per-out-channel amax/127 scale + round/clamp — W8Conv2d parity."""
        from hdrtv_tpu.quant.int8 import quantize_weight

        rng = np.random.RandomState(1)
        w = rng.randn(3, 3, 4, 8).astype(np.float32)
        q, scale = quantize_weight(w)
        assert q.dtype == np.int8 and scale.shape == (8,)
        np.testing.assert_allclose(scale, np.abs(w).max(axis=(0, 1, 2)) / 127.0, rtol=1e-6)
        deq = q.astype(np.float32) * scale
        assert np.abs(deq - w).max() <= scale.max() * 0.5 + 1e-7

    def test_w8_conv_forward_uses_dequant(self):
        from hdrtv_tpu.models.layers import conv2d
        from hdrtv_tpu.quant.int8 import quantize_params

        params = _tiny_conv_params()
        qp = quantize_params(params, ["net.conv"], mode="w8")
        x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 4).astype(np.float32))
        out_fp = conv2d({k: jnp.asarray(v) for k, v in params.items()}, "net.conv", x, padding=1)
        out_q = conv2d({k: jnp.asarray(v) for k, v in qp.items()}, "net.conv", x, padding=1)
        # int8 weights ⇒ close but not identical
        err = float(jnp.max(jnp.abs(out_fp - out_q)))
        assert 0 < err < 0.05

    def test_w8a8_activation_quant_symmetric(self):
        from hdrtv_tpu.models.layers import conv2d
        from hdrtv_tpu.quant.int8 import quantize_params

        params = quantize_params(_tiny_conv_params(), ["net.conv"], mode="w8a8")
        params["net.conv.x_scale"] = np.float32(0.5 / 127.0)
        p = {k: jnp.asarray(v) for k, v in params.items()}
        x = jnp.full((1, 4, 4, 4), 0.2537, jnp.float32)
        out = conv2d(p, "net.conv", x, padding=1)
        # activation snapped to round(0.2537/s)*s
        s = 0.5 / 127.0
        exp_x = round(0.2537 / s) * s
        w = np.asarray(params["net.conv.weight_int8"], np.float32) * params["net.conv.w_scale"]
        ref = jax.lax.conv_general_dilated(
            jnp.full((1, 4, 4, 4), exp_x, jnp.float32), jnp.asarray(w),
            (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(params["net.conv.bias"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_predequantize_roundtrip(self):
        from hdrtv_tpu.quant.int8 import predequantize_params, quantize_params

        params = _tiny_conv_params()
        qp = quantize_params(params, ["net.conv"], mode="w8a8", asymmetric=True)
        deq = predequantize_params(qp)
        assert "net.conv.weight" in deq
        assert "net.conv.weight_int8" not in deq and "net.conv.x_scale" not in deq
        err = np.abs(deq["net.conv.weight"] - params["net.conv.weight"]).max()
        assert err < 0.01


class TestMixedLayout:
    def test_load_reference_layout(self):
        import os

        from hdrtv_tpu.quant.int8 import load_mixed_layout

        path = "/root/reference/configs/qat_layouts/original_nohg_mixed_w8a8.txt"
        if not os.path.isfile(path):
            pytest.skip("reference layouts unavailable")
        layers = load_mixed_layout(path)
        assert len(layers) == 29  # mixed no-HG contract (README.md:1130-1143)
        assert all(l.startswith(("LE.", "AGCM.")) for l in layers)

    def test_quantize_respects_exclusions(self):
        from hdrtv_tpu.quant.int8 import quantize_params, quantized_layer_summary

        params = {
            "LE.conv_last.weight": np.random.rand(3, 3, 8, 3).astype(np.float32),
            "LE.conv_a.weight": np.random.rand(3, 3, 8, 8).astype(np.float32),
        }
        qp = quantize_params(params)
        summary = quantized_layer_summary(qp)
        assert summary["LE.conv_last"] == "fp"
        assert summary["LE.conv_a"] == "w8a8"


class TestCalibration:
    def test_calibrate_sets_scales(self):
        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.quant.calibrate import calibrate
        from hdrtv_tpu.quant.int8 import quantize_params
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
        params = load_npz(path)
        qp = quantize_params(params, ["LE.conv_first", "LE.HR_conv1"], mode="w8a8")
        frames = [np.random.RandomState(i).rand(32, 64, 3).astype(np.float32) for i in range(2)]
        cal = calibrate(qp, frames, ModelConfig())
        assert float(cal["LE.conv_first.x_scale"]) != 1.0
        assert float(cal["LE.conv_first.x_scale"]) > 0
        # conv_first input is the AGCM output (≈[0,1.x]) → scale ≈ amax/127
        assert 1e-4 < float(cal["LE.conv_first.x_scale"]) < 0.1

    def test_int8_model_quality_vs_fp32(self):
        """End-to-end: full-int8 model stays close to fp32 (PSNR gate)."""
        from hdrtv_tpu.models.hdrtvnet import ModelConfig, ensemble_agcm_le
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.ops.metrics import psnr
        from hdrtv_tpu.quant.calibrate import calibrate
        from hdrtv_tpu.quant.int8 import quantize_params
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
        params = load_npz(path)
        cfg = ModelConfig()
        qp = quantize_params(params, mode="w8a8", asymmetric=True)
        frames = [np.random.RandomState(7).rand(32, 64, 3).astype(np.float32)]
        qp = calibrate(qp, frames, cfg)

        img = jnp.asarray(frames[0][None])
        from hdrtv_tpu.ops.resize import downsample_quarter_aa

        cond = downsample_quarter_aa(img)
        out_fp = ensemble_agcm_le({k: jnp.asarray(v) for k, v in params.items()}, img, cond, cfg)
        out_q = ensemble_agcm_le({k: jnp.asarray(v) for k, v in qp.items()}, img, cond, cfg)
        q_psnr = float(psnr(jnp.clip(out_q, 0, 1), jnp.clip(out_fp, 0, 1)))
        assert q_psnr > 30.0, f"int8 PSNR vs fp32 too low: {q_psnr}"


class TestQAT:
    def test_ste_gradient_is_identity(self):
        from hdrtv_tpu.quant.qat import fake_quant_ste

        w = jnp.asarray(np.random.RandomState(3).randn(3, 3, 4, 8).astype(np.float32))
        g = jax.grad(lambda w: jnp.sum(fake_quant_ste(w) * 2.0))(w)
        np.testing.assert_allclose(np.asarray(g), 2.0, atol=1e-6)

    def test_fake_quant_matches_real_quant(self):
        from hdrtv_tpu.quant.int8 import quantize_weight
        from hdrtv_tpu.quant.qat import fake_quant_ste

        w = np.random.RandomState(4).randn(3, 3, 4, 8).astype(np.float32)
        fq = np.asarray(fake_quant_ste(jnp.asarray(w)))
        q, s = quantize_weight(w)
        np.testing.assert_allclose(fq, q.astype(np.float32) * s, atol=1e-6)

    def test_train_step_with_fake_quant_decreases_loss(self):
        import optax

        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.quant.qat import make_weight_fake_quant
        from hdrtv_tpu.train import init_state, make_train_step
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
        params = {k: jnp.asarray(v) for k, v in load_npz(path).items()}
        cfg = ModelConfig()
        opt = optax.adam(1e-4)
        fq = make_weight_fake_quant(["LE.conv_first", "LE.HR_conv1"])
        train = make_train_step(cfg, opt, fake_quant=fq)
        state = init_state(params, opt)
        rng = np.random.RandomState(5)
        img = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
        cond = jnp.asarray(rng.rand(1, 8, 16, 3).astype(np.float32))
        gt = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
        losses = []
        for _ in range(3):
            state, loss = train(state, img, cond, gt)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestKLCalibration:
    def test_kl_threshold_clips_outliers(self):
        """A distribution with a long sparse tail should clip well below the
        max bin; a uniform distribution should keep (nearly) all bins."""
        from hdrtv_tpu.quant.calibrate import kl_threshold

        rng = np.random.RandomState(0)
        body = np.histogram(np.abs(rng.randn(200_000) * 0.1), bins=2048, range=(0, 2.0))[0]
        body[-8:] += 3  # a few extreme outliers at the far end
        i = kl_threshold(body)
        assert 128 <= i < 1600  # clipped far below the outlier bins

        uniform = np.ones(2048)
        assert kl_threshold(uniform) >= 2000  # nothing to clip

    def test_calibrate_kl_method_sets_scales(self):
        import jax.numpy as jnp
        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.quant.calibrate import calibrate, w8a8_layer_names
        from hdrtv_tpu.quant.int8 import quantize_params

        weights = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights", "hr_fp32.npz"
        )
        params = quantize_params(load_npz(weights), mode="w8a8")
        layers = w8a8_layer_names(params)
        assert layers
        rng = np.random.RandomState(0)
        frames = [rng.rand(32, 48, 3).astype(np.float32) for _ in range(2)]
        out = calibrate(params, frames, ModelConfig(), method="kl")
        out_max = calibrate(params, frames, ModelConfig(), method="max")
        diffs = 0
        for n in layers:
            kl_s = float(out[f"{n}.x_scale"])
            mx_s = float(out_max[f"{n}.x_scale"])
            assert 0 < kl_s <= mx_s * 1.01  # KL clips, never exceeds abs-max
            if kl_s < mx_s * 0.999:
                diffs += 1
        assert diffs > 0  # at least some layers actually clipped


class TestMixedLayoutGeneration:
    def test_probe_and_layout_generation(self, tmp_path):
        """Per-layer sensitivity probe emits a load_mixed_layout-compatible
        file; conv_last (the reference's always-excluded layer) is excluded,
        and sensitive layers rank behind robust ones (VERDICT r1 item 8)."""
        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.quant.int8 import load_mixed_layout
        from hdrtv_tpu.quant.mixed import generate_mixed_layout, probe_layer_sensitivity

        weights = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights", "hr_fp32.npz"
        )
        params = load_npz(weights)
        rng = np.random.RandomState(0)
        frames = [rng.rand(32, 48, 3).astype(np.float32) for _ in range(2)]

        # Probe a small subset to keep CI time bounded.
        subset = [
            "LE.recon_trunk3.0.conv1", "LE.recon_trunk3.1.conv1",
            "LE.conv_first", "AGCM.conv_first", "LE.CondNet4.2",
            "LE.HR_conv2",
        ]
        sens = probe_layer_sensitivity(params, frames, ModelConfig(), layers=subset)
        assert {s.layer for s in sens} == set(subset)
        assert all(s.mae >= 0 and np.isfinite(s.score) for s in sens)
        assert any(s.mae > 0 for s in sens)  # quantization visibly perturbs

        out = str(tmp_path / "layout.txt")
        chosen = generate_mixed_layout(
            params, frames, ModelConfig(), count=3, out_path=out,
        )
        assert len(chosen) == 3
        assert all(not c.endswith("conv_last") for c in chosen)
        assert load_mixed_layout(out) == chosen
