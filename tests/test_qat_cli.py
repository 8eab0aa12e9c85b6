"""QAT fine-tune pipeline test (tiny run, CPU)."""

import os

import numpy as np


def test_run_qat_produces_calibrated_int8(tmp_path):
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_npz
    from hdrtv_tpu.quant.int8 import quantized_layer_summary
    from hdrtv_tpu.quant.qat import run_qat

    weights = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
    params = load_npz(weights)
    layers = ["LE.conv_first", "LE.HR_conv1", "LE.HR_conv2"]
    frames = [np.random.RandomState(i).rand(32, 64, 3).astype(np.float32) for i in range(2)]
    qp, losses = run_qat(params, ModelConfig(), layers, frames, steps=3, lr=1e-5, log=None)

    summary = quantized_layer_summary(qp)
    assert all(summary[l] == "w8a8-asym" for l in layers)
    # calibration ran: scales moved off the 1.0 placeholder
    assert float(qp["LE.conv_first.x_scale"]) != 1.0
    assert len(losses) == 3
    assert losses[-1] <= losses[0] * 1.5  # training is sane (not exploding)
