"""Precision sweep (config 3) test on the shipped weights."""

import os

import pytest


def test_precision_sweep_ladder():
    from hdrtv_tpu.bench.sweep import precision_sweep
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_npz

    weights = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
    params = load_npz(weights)
    entries = precision_sweep(params, ModelConfig(), frame_count=1, size=(64, 96))
    names = [e.preset for e in entries]
    assert "bf16" in names
    assert any("int8-full" in n for n in names)
    by_name = {e.preset: e for e in entries}
    # bf16 vs fp32 should be near-transparent; int8 lower but sane.
    assert by_name["bf16"].psnr > 40.0
    for e in entries:
        if "int8" in e.preset:
            assert 25.0 < e.psnr < by_name["bf16"].psnr + 1
            assert e.delta_e_itp > by_name["bf16"].delta_e_itp


@pytest.mark.skipif(
    not os.path.isfile(
        "/root/reference/src/models/weights/original/pytorch_int8/hr/HR_original_int8_full_qat.pt"
    ),
    reason="reference checkpoints unavailable",
)
def test_sweep_accepts_shipped_qat_checkpoints():
    from hdrtv_tpu.bench.sweep import precision_sweep
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_checkpoint, load_npz

    weights = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
    params = load_npz(weights)
    qat, _ = load_checkpoint(
        "/root/reference/src/models/weights/original/pytorch_int8/hr/HR_original_int8_full_qat.pt",
        use_hg=False,
    )
    entries = precision_sweep(
        params,
        ModelConfig(),
        presets={"full-qat": {"params": qat}},
        frame_count=1,
        size=(64, 96),
    )
    e = entries[0]
    # Full-INT8 contract: every quantizable layer W8A8, zero fallback
    # (README.md:69).
    assert e.layer_mix == {"w8a8-asym": 128}
    assert e.psnr > 28.0


class TestNaturalFrames:
    def test_deterministic_full_range_with_speculars(self):
        """QUALITY.md content contract: deterministic across calls, full
        [0,1] range, a near-clip specular population (HG-mask zone / int8
        highlight-rolloff probe), deep shadows, and nonzero grain."""
        import numpy as np

        from hdrtv_tpu.bench.sweep import natural_frames

        a = natural_frames(3, (96, 160))
        b = natural_frames(3, (96, 160))
        for fa, fb in zip(a, b):
            assert fa.dtype == np.float32 and fa.shape == (96, 160, 3)
            assert np.array_equal(fa, fb)  # deterministic
        f = a[0]
        assert f.min() <= 0.02 and f.max() >= 0.98  # full range
        frac_clip = float((f.max(-1) > 0.85).mean())
        assert 0.003 < frac_clip < 0.2  # speculars present, not dominant
        # grain: local high-frequency energy well above zero
        hf = np.abs(np.diff(f, axis=1)).mean()
        assert hf > 1e-3
