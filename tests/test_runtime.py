"""Runtime units: engine registry, profiling timers, processor API parity."""

import os
import time

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights", "hr_fp32.npz")


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

    def test_persistent_cache_strips_mosaic_debuginfo(self, tmp_path, monkeypatch):
        """enable_persistent_cache installs the strip-debuginfo wrapper so
        kernel payloads (and cache keys) survive source edits (round-3 root
        cause in PERF_NOTES)."""
        monkeypatch.setenv("HDRTVNET_ENGINE_CACHE_DIR", str(tmp_path))
        import jax._src.tpu_custom_call as tcc

        from hdrtv_tpu.runtime import engine

        engine.enable_persistent_cache()
        assert engine._DEBUGINFO_STRIPPED
        assert tcc._lower_mosaic_module_to_asm.__name__ == "stripped"

    def test_seed_cache_copies_committed_entries(self, tmp_path, monkeypatch):
        """The committed .engine_cache_seed survives the between-rounds
        machine rebuild; enable_persistent_cache copies its entries into the
        runtime root (idempotently) so the driver bench never cold-compiles
        after a reboot."""
        seed = tmp_path / "seed"
        root = tmp_path / "root"
        seed.mkdir()
        root.mkdir()
        (seed / "jit_x-aaaa-cache").write_bytes(b"exe-bytes")
        (seed / "not_a_cache.txt").write_bytes(b"ignored")
        monkeypatch.setenv("HDRTV_ENGINE_SEED_DIR", str(seed))
        from hdrtv_tpu.runtime.engine import seed_cache

        assert seed_cache(str(root)) == 1
        assert (root / "jit_x-aaaa-cache").read_bytes() == b"exe-bytes"
        assert not (root / "not_a_cache.txt").exists()
        # idempotent: existing entries are never re-copied/overwritten
        (root / "jit_x-aaaa-cache").write_bytes(b"newer")
        assert seed_cache(str(root)) == 0
        assert (root / "jit_x-aaaa-cache").read_bytes() == b"newer"

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

    def test_warmup_warms_the_dispatched_program(self, proc, monkeypatch):
        """warmup_compile must warm the program the runner and host API
        actually dispatch — the pair-plane program when eligible (round 5),
        else the flat byte-row program (round-4 fix). Warming the NHWC
        variant would leave the first real frame paying the cold compile."""
        flat_calls, pairs_calls = [], []
        orig_flat = proc._dispatch_rgb48_flat
        orig_pairs = proc._process_rgb48_pairs_jit

        def spy_flat(flat):
            flat_calls.append(tuple(flat.shape))
            return orig_flat(flat)

        def spy_pairs(xr):
            pairs_calls.append(tuple(xr.shape))
            return orig_pairs(xr)

        monkeypatch.setattr(proc, "_dispatch_rgb48_flat", spy_flat)
        monkeypatch.setattr(proc, "_process_rgb48_pairs_jit", spy_pairs)
        proc.warmup_compile(64, 32)
        if proc.wants_pairs(32, 64):
            assert pairs_calls == [(16, 2, 32, 6)] and flat_calls == []
        else:
            assert flat_calls == [(32, 192)] and pairs_calls == []


class TestLetterbox:
    def test_letterbox_plan_and_values(self):
        import jax.numpy as jnp
        from hdrtv_tpu.ops.resize import letterbox_plan, letterbox_u8

        # 4K 16:9 → 1080p: pure downscale, no bars.
        assert letterbox_plan(2160, 3840, 1080, 1920)[:4] == (1080, 1920, 0, 0)
        # 4:3 source into 16:9 target: pillarbox bars left/right.
        nh, nw, top, left, _ = letterbox_plan(480, 640, 1080, 1920)
        assert (nh, nw) == (1080, 1440) and top == 0 and left == 240

        frame = jnp.full((480, 640, 3), 200, jnp.uint8)
        out = letterbox_u8(frame, 1080, 1920)
        out = np.asarray(out)
        assert out.shape == (1080, 1920, 3)
        assert out[:, :240].max() == 0 and out[:, -240:].max() == 0  # bars
        assert abs(int(out[540, 960, 0]) - 200) <= 2  # content preserved

    def test_processor_letterboxes_to_processing_resolution(self):
        """convert --resolution governs processing: a larger source is
        letterboxed on device (VERDICT r1 item 4; gui_scaling.py:228)."""
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        proc = HDRTVNetTPU(
            WEIGHTS, precision="fp32", persistent_cache=False,
            proc_resolution=(96, 64),
        )
        src = (np.random.RandomState(0).rand(128, 96, 3) * 255).astype(np.uint8)
        out = proc.process_rgb48(src)
        assert out.shape == (64, 96, 3)
        # Must equal processing an explicitly pre-letterboxed frame.
        import jax.numpy as jnp
        from hdrtv_tpu.ops.resize import letterbox_u8

        pre = np.asarray(letterbox_u8(jnp.asarray(src), 64, 96))
        proc2 = HDRTVNetTPU(WEIGHTS, precision="fp32", persistent_cache=False)
        ref = proc2.process_rgb48(pre)
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    def test_batch_letterboxes_to_processing_resolution(self):
        """process_rgb48_batch with proc_resolution set returns frames at the
        processing resolution (round-4 fix: the batch reshape must derive its
        shape from the letterboxed outputs, not the input frames)."""
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        proc = HDRTVNetTPU(
            WEIGHTS, precision="fp32", persistent_cache=False,
            proc_resolution=(96, 64),
        )
        frames = (np.random.RandomState(2).rand(2, 128, 96, 3) * 255).astype(np.uint8)
        out = proc.process_rgb48_batch(frames)
        assert out.shape == (2, 64, 96, 3)
        np.testing.assert_array_equal(out[0], proc.process_rgb48(frames[0]))

    def test_batch_mesh_letterboxes_to_processing_resolution(self, cpu_devices):
        """The mesh-DP batch path letterboxes per frame too (same round-4
        reshape fix in _batch_mesh_fn)."""
        import jax
        from jax.sharding import Mesh

        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        proc = HDRTVNetTPU(
            WEIGHTS, precision="fp32", persistent_cache=False,
            proc_resolution=(96, 64),
        )
        mesh = Mesh(np.asarray(cpu_devices[:2]).reshape(2, 1), ("data", "spatial"))
        frames = (np.random.RandomState(3).rand(2, 128, 96, 3) * 255).astype(np.uint8)
        out = proc.process_rgb48_batch(frames, mesh=mesh)
        assert out.shape == (2, 64, 96, 3)
        ref = proc.process_rgb48(frames[1])
        assert np.abs(out[1].astype(int) - ref.astype(int)).max() <= 1


class TestHGSplitExecution:
    """Two-program HG execution (base jit + HG jit) ≡ the single fused
    program — the round-3 path that lands the fused HG tail kernel within
    the Mosaic compile budget (VERDICT r2 item 1)."""

    @pytest.fixture(scope="class")
    def hg_ckpt(self, tmp_path_factory):
        from hdrtv_tpu.models.import_torch import convert_state, load_npz

        fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures", "hg_mid.npz"))
        hg = convert_state({k: fx[k] for k in fx.files if k.startswith("hg.")})
        base = load_npz(WEIGHTS)
        combined = {f"base.{k}": v for k, v in base.items()}
        combined.update({k: np.asarray(v) for k, v in hg.items()})
        path = tmp_path_factory.mktemp("hgckpt") / "hg_fp32.npz"
        np.savez(str(path), **combined)
        return str(path)

    def test_split_matches_single_program(self, hg_ckpt, monkeypatch):
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        proc = HDRTVNetTPU(hg_ckpt, precision="fp32", use_hg=True, persistent_cache=False)
        assert proc.turbo and proc.cfg.use_hg
        frame = (np.random.RandomState(7).rand(64, 96, 3) * 255).astype(np.uint8)
        assert proc._hg_split_active(64, 96 * 3)
        split = proc.process_rgb48(frame)
        monkeypatch.setenv("HDRTV_HG_SPLIT", "0")
        assert not proc._hg_split_active(64, 96 * 3)
        single = proc.process_rgb48(frame)
        np.testing.assert_array_equal(split, single)

    def test_split_mega_tail_interpret(self, hg_ckpt, monkeypatch):
        """Split path through the megakernel base + fused HG tail (interpret
        mode) ≡ the plain single program with kernels disabled."""
        from jax.experimental.pallas import tpu as pltpu

        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        frame = (np.random.RandomState(8).rand(64, 96, 3) * 255).astype(np.uint8)
        proc = HDRTVNetTPU(hg_ckpt, precision="fp32", use_hg=True, persistent_cache=False)
        monkeypatch.setenv("HDRTV_MEGAKERNEL_INTERPRET", "1")
        with pltpu.force_tpu_interpret_mode():
            got = proc.process_rgb48(frame)
        monkeypatch.delenv("HDRTV_MEGAKERNEL_INTERPRET")
        monkeypatch.setenv("HDRTV_HG_SPLIT", "0")
        proc2 = HDRTVNetTPU(hg_ckpt, precision="fp32", use_hg=True, persistent_cache=False)
        ref = proc2.process_rgb48(frame)
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1  # fp reassociation at the u16 rounding boundary


class TestEngineClearSafety:
    def test_clear_leaves_foreign_files(self, tmp_path, monkeypatch):
        """engines clear must not delete non-cache files in a shared dir."""
        monkeypatch.setenv("HDRTVNET_ENGINE_CACHE_DIR", str(tmp_path))
        from hdrtv_tpu.runtime.engine import EngineRegistry

        reg = EngineRegistry()
        (tmp_path / "engines.json").write_text("{}")
        (tmp_path / "jit_step_deadbeef").write_text("x")
        (tmp_path / ("a" * 40)).write_text("x")
        (tmp_path / "my_thesis.docx").write_text("precious")
        (tmp_path / "notes.txt").write_text("precious")
        removed = reg.clear()
        assert removed == 3
        assert (tmp_path / "my_thesis.docx").exists()
        assert (tmp_path / "notes.txt").exists()
