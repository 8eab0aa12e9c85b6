"""Row-pair-plane jit boundary (round 5).

The (Hb, 2, Wb, 6) contract carries the SAME bytes as the (H, 3W) flat
byte-row contract — host-side conversion is a free numpy view — but keeps
the layout the megakernels consume/emit on the jit boundary, removing the
two boundary retiles the round-5 device profile measured (~0.8 ms u8 in +
~0.6 ms u16 out per 1080p frame). Parity targets:

- ops/resize.py downsample_quarter_aa_pairs ≡ downsample_quarter_aa_flat
  (same matrices, same contraction order, multi-dim dot_general)
- models/s2d.py ensemble_s2d_rgb48_pairs ≡ ensemble_s2d_rgb48_flat on the
  mega path (interpret mode) and on the non-mega fallback
- runtime/processor.py wants_pairs eligibility gates + process_rgb48
  shape contract through the pairs program

Reference context: the flat contract mirrors the reference feeder byte
layout (gui_pipeline_worker_feeders.py:193-235); the pairs contract is a
TPU-side refinement invisible at the numpy API.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl  # noqa: F401  (interpret mode dep)
from jax.experimental.pallas import tpu as pltpu

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _model():
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_npz
    from hdrtv_tpu.models.s2d import s2d_transform_params

    params = load_npz(os.path.join(HERE, "weights", "hr_fp32.npz"))
    sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(params).items()}
    return sp, ModelConfig()


class TestCondPairs:
    @pytest.mark.parametrize("bgr", [False, True])
    def test_matches_flat(self, rng, bgr):
        from hdrtv_tpu.ops.resize import (
            downsample_quarter_aa_flat,
            downsample_quarter_aa_pairs,
        )

        h, w = 64, 96
        flat = (rng.rand(h, w * 3) * 255).astype(np.uint8)
        xr = flat.reshape(h // 2, 2, w // 2, 6)
        a = np.asarray(downsample_quarter_aa_flat(jnp.asarray(flat), bgr=bgr))
        b = np.asarray(downsample_quarter_aa_pairs(jnp.asarray(xr), bgr=bgr))
        assert a.shape == b.shape == (1, h // 4, w // 4, 3)
        assert np.abs(a - b).max() < 1e-5

    def test_matches_reference_hwc_path(self, rng):
        """pairs ≡ the (H, W, 3) reference-semantics bicubic-AA downsample."""
        from hdrtv_tpu.ops.resize import (
            downsample_quarter_aa,
            downsample_quarter_aa_pairs,
        )

        h, w = 32, 48
        frame = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ref = np.asarray(
            downsample_quarter_aa(
                jnp.asarray(frame[None].astype(np.float32) / 255.0)
            )
        )
        xr = np.ascontiguousarray(frame).reshape(h // 2, 2, w // 2, 6)
        got = np.asarray(downsample_quarter_aa_pairs(jnp.asarray(xr)))
        assert np.abs(ref - got).max() < 1e-5


class TestPairsEnsemble:
    def test_mega_parity_interpret(self, rng):
        """pairs ≡ flat through the megakernel path (interpret mode)."""
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import (
            ensemble_s2d_rgb48_flat,
            ensemble_s2d_rgb48_pairs,
        )

        sp, cfg = _model()
        h, w = 48, 64
        flat = (rng.rand(h, w * 3) * 255).astype(np.uint8)
        xr = flat.reshape(h // 2, 2, w // 2, 6)
        os.environ["HDRTV_MEGAKERNEL_INTERPRET"] = "1"
        try:
            with pltpu.force_tpu_interpret_mode():
                a = ensemble_s2d_rgb48_flat(
                    sp, jnp.asarray(flat), None, cfg, policy=F32, bgr=True
                )
                b = ensemble_s2d_rgb48_pairs(
                    sp, jnp.asarray(xr), None, cfg, policy=F32, bgr=True
                )
        finally:
            del os.environ["HDRTV_MEGAKERNEL_INTERPRET"]
        assert a.shape == (h, w * 3) and a.dtype == jnp.uint16
        assert b.shape == (h // 2, 2, w // 2, 6) and b.dtype == jnp.uint16
        d = np.abs(
            np.asarray(a, np.int32) - np.asarray(b, np.int32).reshape(h, w * 3)
        )
        assert d.max() <= 1, f"u16 maxdiff {d.max()}"

    def test_non_mega_fallback_bit_equal(self, rng):
        """Off the mega path (plain CPU) the pairs entry routes through the
        flat program via in-jit reshapes — bit-identical output bytes."""
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import (
            ensemble_s2d_rgb48_flat,
            ensemble_s2d_rgb48_pairs,
        )

        sp, cfg = _model()
        h, w = 32, 48
        flat = (rng.rand(h, w * 3) * 255).astype(np.uint8)
        xr = flat.reshape(h // 2, 2, w // 2, 6)
        a = np.asarray(
            ensemble_s2d_rgb48_flat(sp, jnp.asarray(flat), None, cfg, policy=F32, bgr=True)
        )
        b = np.asarray(
            ensemble_s2d_rgb48_pairs(sp, jnp.asarray(xr), None, cfg, policy=F32, bgr=True)
        )
        assert np.array_equal(a, b.reshape(h, w * 3))


class TestProcessorPairs:
    def _proc(self, **kw):
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        return HDRTVNetTPU(
            os.path.join(HERE, "weights", "hr_fp32.npz"),
            precision="fp16",
            persistent_cache=False,
            **kw,
        )

    def test_wants_pairs_gates(self):
        proc = self._proc()
        if not proc.turbo:
            pytest.skip("turbo off in this env")
        assert proc.wants_pairs(1080, 1920)
        assert proc.wants_pairs(720, 1280)
        assert not proc.wants_pairs(1081, 1920)  # /8 grid
        assert not proc.wants_pairs(540, 962)
        os.environ["HDRTV_PAIRS_BOUNDARY"] = "0"
        try:
            assert not proc.wants_pairs(1080, 1920)
        finally:
            del os.environ["HDRTV_PAIRS_BOUNDARY"]

    def test_wants_pairs_letterbox_gate(self):
        proc = self._proc(proc_resolution=(1280, 720))
        if not proc.turbo:
            pytest.skip("turbo off in this env")
        # Mismatched source → device letterbox runs on the flat layout.
        assert not proc.wants_pairs(1080, 1920)
        # At the processing resolution no letterbox runs → pairs eligible.
        assert proc.wants_pairs(720, 1280)

    def test_wants_pairs_cond_shortcut_gate(self):
        proc = self._proc(fast_condition_resize=True)
        assert not proc.wants_pairs(1080, 1920)

    def test_process_rgb48_shape_contract(self, rng):
        """The numpy API is unchanged by the boundary switch (CPU: the pairs
        jit runs its non-mega fallback — still exercises both boundary
        views and the dispatch gate)."""
        proc = self._proc()
        h, w = 48, 64
        if not proc.wants_pairs(h, w):
            pytest.skip("pairs boundary inactive in this env")
        frame = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        out = proc.process_rgb48(frame)
        assert out.shape == (h, w, 3) and out.dtype == np.uint16
        assert int(out.max()) > 0
        # and it matches the flat program bit-for-bit off the mega path
        os.environ["HDRTV_PAIRS_BOUNDARY"] = "0"
        try:
            ref = proc.process_rgb48(frame)
        finally:
            del os.environ["HDRTV_PAIRS_BOUNDARY"]
        assert np.array_equal(out, ref)

    def test_device_entry_accepts_pairs(self, rng):
        proc = self._proc()
        h, w = 48, 64
        if not proc.wants_pairs(h, w):
            pytest.skip("pairs boundary inactive in this env")
        flat = (rng.rand(h, w * 3) * 255).astype(np.uint8)
        xr = jnp.asarray(flat.reshape(h // 2, 2, w // 2, 6))
        out = np.asarray(proc.process_rgb48_device(xr))
        assert out.shape == (h // 2, 2, w // 2, 6) and out.dtype == np.uint16
        ref = np.asarray(proc.process_rgb48_device(jnp.asarray(flat)))
        assert np.array_equal(out.reshape(h, w * 3), ref)
