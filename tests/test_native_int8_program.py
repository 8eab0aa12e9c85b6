"""Full-program native-int8 parity: the megakernel W8A8 path (MXU int8
dots with in-kernel activation quantization) vs the pre-dequantized float
program, on a freshly PTQ-quantized real checkpoint (interpret mode)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")


@pytest.fixture(scope="module")
def quantized_trees():
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_npz
    from hdrtv_tpu.models.s2d import attach_native_int8, s2d_transform_params
    from hdrtv_tpu.quant.calibrate import calibrate
    from hdrtv_tpu.quant.int8 import predequantize_params, quantize_params

    cfg = ModelConfig()
    fp32 = load_npz(WEIGHTS)
    q = quantize_params(fp32, mode="w8a8")
    rng = np.random.RandomState(0)
    # image-like calibration frames (smooth gradients + highlights) — random
    # noise gives uselessly wide activation ranges
    yy, xx = np.mgrid[0:32, 0:48].astype(np.float32)
    frames = [
        np.stack([xx / 48 * s, yy / 32 * s, np.full_like(xx, 0.2 + 0.2 * s)], -1)
        for s in (0.6, 0.9, 1.0)
    ]
    q = calibrate(q, frames, cfg)

    predeq = predequantize_params(q)
    sp_float = s2d_transform_params(predeq, cfg)
    sp_int8 = attach_native_int8(dict(sp_float), q)
    return cfg, q, sp_float, sp_int8


class TestNativeInt8Program:
    def test_qweights_attached(self, quantized_trees):
        _, _, sp_float, sp_int8 = quantized_trees
        qkeys = [k for k in sp_int8 if k.endswith(".qweight")]
        assert qkeys, "no native-int8 layers attached"
        # int8 codes of the transform's structural zero blocks must be 0
        for k in qkeys:
            if "down_conv1" in k:
                w = np.asarray(sp_int8[k])
                assert w.dtype == np.int8
                # w_s2d_s2: dI=2 rows of the a0 output half are all zero
                co = w.shape[-1]
                assert (w[2, :, :, : co // 2] == 0).all()

    def test_program_parity_vs_eager_w8a8(self, quantized_trees):
        """Interpret-mode mega program with native int8 ≈ the eager W8A8
        path (same activation fake-quant; residual = the SFT/1×1 inputs the
        kernels keep in float)."""
        from hdrtv_tpu.models.hdrtvnet import ensemble_agcm_le
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48_flat
        from hdrtv_tpu.ops.pack import pack_rgb48
        from hdrtv_tpu.ops.resize import downsample_quarter_aa

        cfg, q_eager, _, sp_int8 = quantized_trees
        q = {k: jnp.asarray(v) for k, v in sp_int8.items()}
        qe = {k: jnp.asarray(v) for k, v in q_eager.items()}
        yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
        frame = np.stack([xx / 96, yy / 64, 0.5 * (xx / 96 + yy / 64)], -1)
        frame = (frame * 255).astype(np.uint8)
        flat = jnp.asarray(frame.reshape(64, 96 * 3))

        # eager W8A8 oracle: natural path quantizes activations per layer
        x = jnp.asarray(frame[None, ..., ::-1]).astype(jnp.float32) / 255.0
        cond = downsample_quarter_aa(x)
        eager = np.asarray(pack_rgb48(ensemble_agcm_le(qe, x, cond, cfg)[0]))

        os.environ["HDRTV_MEGAKERNEL_INTERPRET"] = "1"
        try:
            with pltpu.force_tpu_interpret_mode():
                out_q = np.asarray(
                    ensemble_s2d_rgb48_flat(q, flat, None, cfg, policy=F32, bgr=True)
                ).reshape(64, 96, 3)
        finally:
            del os.environ["HDRTV_MEGAKERNEL_INTERPRET"]

        a = eager.astype(np.float32) / 65535.0
        b = out_q.astype(np.float32) / 65535.0
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 38.0, f"native int8 diverges from eager W8A8: {psnr:.1f} dB"
