"""Runtime units: engine registry, profiling timers, processor API parity."""

import os
import time

import numpy as np
import pytest


class TestEngineRegistry:
    def test_record_lookup_validate(self, tmp_path, monkeypatch):
        monkeypatch.setenv("HDRTVNET_ENGINE_CACHE_DIR", str(tmp_path))
        from hdrtv_tpu.runtime.engine import EngineRecord, EngineRegistry

        reg = EngineRegistry()
        key = EngineRecord.make_key("abc123", 1920, 1080, "fp16")
        assert key == "abc123_1920x1080_fp16"
        rec = EngineRecord(
            key=key, model_hash="abc123", width=1920, height=1080,
            precision="fp16", use_hg=False, jax_version="0.9.0",
            device_kind="test", compile_seconds=1.5, created=time.time(),
        )
        reg.record(rec)
        assert reg.lookup(key).model_hash == "abc123"
        assert reg.validate(key, "abc123")
        assert not reg.validate(key, "OTHER")  # stale model → rebuild
        assert len(reg.list()) == 1
        n = reg.clear()
        assert n >= 1 and reg.lookup(key) is None

    def test_model_fingerprint_detects_weight_swap(self):
        from hdrtv_tpu.runtime.engine import model_fingerprint

        a = {"w": np.ones((8, 8), np.float32)}
        b = {"w": np.ones((8, 8), np.float32) * 2}
        assert model_fingerprint(a) != model_fingerprint(b)
        assert model_fingerprint(a) == model_fingerprint({"w": np.ones((8, 8), np.float32)})


class TestProfiling:
    def test_stage_timers_report(self):
        from hdrtv_tpu.utils.profiling import StageTimers

        t = StageTimers()
        for _ in range(20):
            with t.stage("decode"):
                pass
            t.add("infer", 5.0)
        st = t.stats("infer")
        assert st.mean_ms == 5.0 and st.count == 20
        report = t.report()
        assert "decode" in report and "infer" in report
        assert "infer" in t.as_dict()


class TestProcessorAPI:
    """Reference HDRTVNetTorch API parity (hdrtvnet_torch.py:2239-2480)."""

    @pytest.fixture(scope="class")
    def proc(self):
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        weights = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
        return HDRTVNetTPU(weights, precision="fp32", persistent_cache=False)

    def test_preprocess_infer_postprocess_roundtrip(self, proc):
        frame = (np.random.RandomState(0).rand(32, 64, 3) * 255).astype(np.uint8)
        x, cond = proc.preprocess(frame)
        assert x.shape == (1, 32, 64, 3) and cond.shape == (1, 8, 16, 3)
        out = proc.infer((x, cond))
        result = proc.postprocess(out)
        assert result.shape == (32, 64, 3) and result.dtype == np.uint8
        # staged path == fused path
        np.testing.assert_array_equal(result, proc.process(frame))

    def test_process_timed_reports_stages(self, proc):
        frame = (np.random.RandomState(1).rand(32, 64, 3) * 255).astype(np.uint8)
        out, pre_ms, infer_ms, post_ms = proc.process_timed(frame)
        assert out.shape == (32, 64, 3)
        assert pre_ms >= 0 and infer_ms > 0 and post_ms >= 0

    def test_warmup_records_engine(self, tmp_path, monkeypatch):
        monkeypatch.setenv("HDRTVNET_ENGINE_CACHE_DIR", str(tmp_path))
        from hdrtv_tpu.runtime.engine import EngineRegistry
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        weights = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
        p = HDRTVNetTPU(weights, precision="fp32")
        dt = p.warmup_compile(64, 32)
        assert dt > 0
        recs = EngineRegistry().list()
        assert any(r.width == 64 and r.height == 32 for r in recs)
        assert p.registry.validate(recs[0].key, p.model_hash)
