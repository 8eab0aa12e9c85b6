"""Benchmark suite tests: playback sessions, quality metrics flow, GT sync."""

import json
import os

import numpy as np
import jax.numpy as jnp


class FakeProcessor:
    model_path = ""

    def warmup_compile(self, w, h, **kw):
        return 0.0

    def process_rgb48_device(self, frame):
        return (frame.astype(jnp.uint16) * 257)

    def process_rgb48(self, frame):
        return np.asarray(frame, dtype=np.uint16) * 257


class TestPlaybackBench:
    def test_session_layout(self, tmp_path):
        from hdrtv_tpu.bench.playback import PlaybackRunConfig, run_playback_benchmark

        cfg = PlaybackRunConfig(resolution_key="540p", realtime=False, duration_s=0.3, warmup_frames=2)
        res = run_playback_benchmark(cfg, FakeProcessor(), str(tmp_path))
        assert res.frames > 0
        for name in ("session.json", "summary.txt", "runtime_metrics.csv"):
            assert os.path.isfile(tmp_path / name)
        with open(tmp_path / "session.json") as f:
            data = json.load(f)
        assert data["frames"] == res.frames

    def test_batch_csv(self, tmp_path):
        from hdrtv_tpu.bench.playback import PlaybackRunConfig, run_batch

        cfgs = [
            PlaybackRunConfig(resolution_key="540p", realtime=False, duration_s=0.2, warmup_frames=1),
            PlaybackRunConfig(resolution_key="720p", realtime=False, duration_s=0.2, warmup_frames=1),
        ]
        results = run_batch(cfgs, lambda cfg: FakeProcessor(), str(tmp_path))
        assert len(results) == 2
        assert os.path.isfile(tmp_path / "batch.csv")
        with open(tmp_path / "batch.csv") as f:
            header = f.readline().strip().split(",")
        assert "ring_ms" in header  # VERDICT r3 item 8: ring_ms in batch CSVs

    def test_device_resident_report(self):
        from hdrtv_tpu.bench.playback import run_device_resident

        rep = run_device_resident(FakeProcessor(), "540p", frames=3)
        assert rep["device_fps"] > 0 and rep["frames"] == 3
        assert "device-resident" in rep["methodology"]


class TestQualityBench:
    def test_full_quality_run(self, tmp_path):
        from hdrtv_tpu.bench.quality import QualityRunConfig, run_quality_benchmark
        from hdrtv_tpu.pipeline.source import SyntheticSource

        src = SyntheticSource(96, 64, fps=30, frames=120)

        def gt_reader(idx):
            # "GT" = the identity-scaled frame the fake processor produces
            s = SyntheticSource(96, 64, fps=30, frames=120)
            s.seek(idx)
            meta = s.read_with_meta()
            if meta is None:
                return None
            return meta[0].astype(np.float32) / 255.0

        cfg = QualityRunConfig(frame_count=3)
        summary = run_quality_benchmark(
            cfg, FakeProcessor(), src, gt_reader, str(tmp_path), source_name="synthetic"
        )
        assert summary["mean_psnr"] is not None
        # fake processor output == GT → near-perfect metrics
        assert summary["mean_psnr"] > 45.0
        assert summary["mean_ssim"] > 0.99
        assert os.path.isfile(os.path.join(summary["session_dir"], "results.csv"))

    def test_distinct_frame_selection(self):
        from hdrtv_tpu.bench.quality import select_distinct_frames
        from hdrtv_tpu.pipeline.source import SyntheticSource

        src = SyntheticSource(96, 64, fps=30, frames=200)
        frames = select_distinct_frames(src, 5)
        assert len(frames) == 5
        assert frames == sorted(frames)
        assert len(set(frames)) == 5

    def test_evaluate_pair_reconciles_mismatched_resolutions(self):
        """The normal GT pairing has a full-res GT vs a processing-res
        prediction — evaluate_pair must resize to the prediction grid
        instead of crashing in the device metrics (round-4 fix)."""
        from hdrtv_tpu.bench.quality import evaluate_pair

        rng = np.random.RandomState(0)
        pred = rng.rand(48, 64, 3).astype(np.float32)
        # GT is the same content at 2× resolution
        gt = np.repeat(np.repeat(pred, 2, axis=0), 2, axis=1)
        m = evaluate_pair(pred, gt, peak_nits=1000.0)
        assert m["psnr"] > 25.0  # same content → high score, no crash

    def test_selection_scan_is_bounded_for_all_rejected_sources(self):
        """A source whose frames all fail QC must not be decoded end-to-end:
        the sequential scan is bounded in TOTAL reads, not accepted probes
        (round-4 fix)."""
        from hdrtv_tpu.bench.quality import select_distinct_frames

        class AllDark:
            frame_count = 10_000  # long source; the scan must not read it all
            fps = 24.0
            path = None

            def __init__(self):
                self.reads = 0
                self._i = -1

            def seek(self, n):
                self._i = n - 1

            def read_with_meta(self, timeout=5.0):
                self.reads += 1
                self._i += 1
                # all-black frames fail the too-dark QC gate
                return np.zeros((64, 96, 3), np.uint8), self._i, self._i / 24.0

        src = AllDark()
        frames = select_distinct_frames(src, 3, probe_stride=24, max_probes=50)
        assert frames  # rejected pool still yields a selection
        assert src.reads <= 50 * 24 * 2 + 1  # bounded scan

    def test_selection_head_skip_does_not_consume_scan_budget(self):
        """A seek-less source with a long credit-skip head must still reach
        the credit-free region: only in-region reads count against the scan
        budget (review fix on the round-4 bound)."""
        from hdrtv_tpu.bench.quality import select_distinct_frames

        rng = np.random.RandomState(1)
        tex = (rng.rand(16, 64, 96, 3) * 255).astype(np.uint8)

        class NoSeek:  # frame_count=10k/fps=24 → movie_frame_bounds lo=800
            frame_count = 10_000
            fps = 24.0
            path = None
            _i = -1

            def read_with_meta(self, timeout=5.0):
                self._i += 1
                return tex[self._i % 16], self._i, self._i / 24.0

        # budget = 10*24*2 = 480 reads < lo=800: pre-fix this returned []
        frames = select_distinct_frames(NoSeek(), 2, probe_stride=24, max_probes=10)
        assert frames and all(f >= 800 for f in frames)


class TestGTSync:
    def test_frame_map_rate_aware(self):
        from hdrtv_tpu.bench.gt_sync import make_frame_map

        fmap = make_frame_map(sdr_fps=24.0, gt_fps=48.0)
        assert fmap(10) == 20

    def test_fast_reader_reseeks_after_failed_read(self):
        """A failed seek+read moves the capture but produces no frame — the
        sequential-read cursor must be invalidated or the next sequential
        request decodes whatever frame the capture sits on (round-4 fix)."""
        from hdrtv_tpu.bench.gt_sync import HDRGroundTruthReader

        r = HDRGroundTruthReader.__new__(HDRGroundTruthReader)
        r._y4m = None
        import cv2

        r._cv2 = cv2

        class FakeCap:
            pos = 0

            def set(self, prop, v):
                self.pos = int(v)

            def read(self):
                if self.pos >= 100:
                    return False, None
                f = np.full((4, 4, 3), self.pos, np.uint8)
                self.pos += 1
                return True, f

        r.cap = FakeCap()
        r._pos = 0
        a = r.read_unit_rgb_fast(5)
        assert int(round(float(a[0, 0, 0]) * 255)) == 5
        assert r.read_unit_rgb_fast(200) is None  # failed read moved the cap
        b = r.read_unit_rgb_fast(6)  # sequential w.r.t. the stale cursor
        assert b is not None
        assert int(round(float(b[0, 0, 0]) * 255)) == 6

    def test_sync_offset_cache_roundtrip(self, tmp_path):
        """find_sync_offset's disk cache: second identical call decodes
        nothing; a different window is a different key (round-4 wiring)."""
        from hdrtv_tpu.bench.gt_sync import find_sync_offset

        calls = []
        rng = np.random.RandomState(0)
        gt_frames = {i: rng.rand(16, 16, 3).astype(np.float32) for i in range(6)}

        class Reader:
            fps = 24.0

            def read_unit_rgb(self, i):
                calls.append(i)
                return gt_frames.get(int(i))

        sdr = {2: gt_frames[2]}
        cp = str(tmp_path / "cache.json")
        off, score = find_sync_offset(
            sdr, Reader(), lambda i: i, window_frames=1,
            cache_path=cp, cache_key="k",
        )
        n1 = len(calls)
        assert n1 > 0 and off == 0
        off2, score2 = find_sync_offset(
            sdr, Reader(), lambda i: i, window_frames=1,
            cache_path=cp, cache_key="k",
        )
        assert (off2, score2) == (off, score)
        assert len(calls) == n1  # cache hit — no new decodes
        find_sync_offset(
            sdr, Reader(), lambda i: i, window_frames=2,
            cache_path=cp, cache_key="k",
        )
        assert len(calls) > n1  # wider window = different key → recomputed

    def test_sync_offset_cache_robustness(self, tmp_path):
        """Review fixes on the disk cache: an unwritable path never fails the
        search, the -1.0 no-frames sentinel is not persisted, and the cache
        file is FIFO-capped (stale mtime-keyed entries can't grow forever)."""
        import json as _json

        from hdrtv_tpu.bench import gt_sync
        from hdrtv_tpu.bench.gt_sync import find_sync_offset

        frame = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)

        class Reader:
            fps = 24.0

            def read_unit_rgb(self, i):
                return frame if 0 <= int(i) < 4 else None

        class DeadReader(Reader):
            def read_unit_rgb(self, i):
                return None

        # unwritable: cache_path nested under a regular FILE → OSError inside
        blocker = tmp_path / "blocker"
        blocker.write_text("x")
        off, score = find_sync_offset(
            {2: frame}, Reader(), lambda i: i, window_frames=1,
            cache_path=str(blocker / "cache.json"), cache_key="k",
        )
        assert off == 0 and score > 0  # search result intact, no raise

        # sentinel: a reader that decodes nothing must not poison the cache
        cp = tmp_path / "cache.json"
        off, score = find_sync_offset(
            {2: frame}, DeadReader(), lambda i: i, window_frames=1,
            cache_path=str(cp), cache_key="dead",
        )
        assert score == -1.0 and not cp.exists()

        # FIFO cap: > _SYNC_CACHE_MAX distinct keys keep only the newest
        for k in range(gt_sync._SYNC_CACHE_MAX + 6):
            find_sync_offset(
                {2: frame}, Reader(), lambda i: i, window_frames=1,
                cache_path=str(cp), cache_key=f"k{k}",
            )
        cache = _json.loads(cp.read_text())
        assert len(cache) == gt_sync._SYNC_CACHE_MAX
        last = f"k{gt_sync._SYNC_CACHE_MAX + 5}|w1|g0.06"
        assert last in cache and not any(k.startswith("k0|") for k in cache)

    def test_frame_map_sync_offset(self):
        from hdrtv_tpu.bench.gt_sync import make_frame_map

        fmap_off = make_frame_map(24.0, 24.0, offset_frames=3)
        assert fmap_off(10) == 13

    def test_sync_offset_search_finds_shift(self):
        from hdrtv_tpu.bench.gt_sync import find_sync_offset, make_frame_map

        rng = np.random.RandomState(0)
        clip = [rng.rand(32, 48, 3).astype(np.float32) for _ in range(60)]
        true_offset = 4

        class Reader:
            def read_unit_rgb(self, idx):
                j = idx - true_offset
                return clip[j] if 0 <= j < len(clip) else None

        sdr_frames = {i: clip[i] for i in (10, 20, 30)}
        off, score = find_sync_offset(sdr_frames, Reader(), make_frame_map(30, 30), window_frames=8)
        assert off == true_offset
        assert score > 0.9

    def test_sync_offset_min_gain_rejects_noise(self):
        from hdrtv_tpu.bench.gt_sync import find_sync_offset, make_frame_map

        rng = np.random.RandomState(1)
        clip = [rng.rand(32, 48, 3).astype(np.float32) for _ in range(40)]

        class Reader:
            def read_unit_rgb(self, idx):
                return clip[idx] if 0 <= idx < len(clip) else None

        sdr_frames = {i: clip[i] for i in (5, 15, 25)}  # already aligned
        off, _ = find_sync_offset(sdr_frames, Reader(), make_frame_map(30, 30), window_frames=6)
        assert off == 0

    def test_sync_offset_cache(self, tmp_path):
        from hdrtv_tpu.bench.gt_sync import find_sync_offset, make_frame_map

        clip = [np.random.RandomState(i).rand(16, 16, 3).astype(np.float32) for i in range(20)]

        class Reader:
            calls = 0

            def read_unit_rgb(self, idx):
                Reader.calls += 1
                return clip[idx] if 0 <= idx < len(clip) else None

        cache = str(tmp_path / "sync.json")
        args = ({5: clip[5]}, Reader(), make_frame_map(30, 30))
        find_sync_offset(*args, window_frames=3, cache_path=cache, cache_key="k")
        calls_first = Reader.calls
        find_sync_offset(*args, window_frames=3, cache_path=cache, cache_key="k")
        assert Reader.calls == calls_first  # cache hit, no re-read


class TestHdrIO:
    def test_exact_decode_cmd_and_showinfo_parse(self):
        from hdrtv_tpu.bench.hdr_io import (
            build_exact_decode_cmd, match_pts_frame, parse_showinfo,
        )

        cmd = build_exact_decode_cmd("gt.mkv", [7, 3, 7])
        assert "rgb48le" in cmd and "-vsync" in cmd
        sel = cmd[cmd.index("-vf") + 1]
        assert sel == "select='eq(n\\,3)+eq(n\\,7)'"  # sorted, deduped

        stderr = (
            "[Parsed_showinfo_0 @ 0x1] n:   0 pts:  12000 pts_time:0.4 duration:...\n"
            "[Parsed_showinfo_0 @ 0x1] n:   1 pts:  12500 pts_time:0.433333 x\n"
            "[Parsed_showinfo_0 @ 0x1] n:   2 pts:  13000 pts_time:0.466667 x\n"
            "unrelated line\n"
        )
        infos = parse_showinfo(stderr)
        assert infos == [(0, 0.4), (1, 0.433333), (2, 0.466667)]
        # frame 13 at 30fps → t=0.4333…: PTS guard picks output index 1
        assert match_pts_frame(infos, 13 / 30.0, 30.0) == 1
        # a time far from any decoded pts is rejected (keyframe mis-seek)
        assert match_pts_frame(infos, 5.0, 30.0) is None

    def test_pts_tolerance_env(self, monkeypatch):
        from hdrtv_tpu.bench.hdr_io import match_pts_frame

        infos = [(0, 0.400), (1, 0.500)]
        # target 0.44 is 0.04s (=1.2 frame periods at 30fps) past 0.400:
        # outside the default 0.60-frame tolerance...
        assert match_pts_frame(infos, 0.44, 30.0) is None
        # ...inside a widened HDRTVNET_HDR_FAST_SEEK_PTS_TOL_FRAMES
        monkeypatch.setenv("HDRTVNET_HDR_FAST_SEEK_PTS_TOL_FRAMES", "1.5")
        assert match_pts_frame(infos, 0.44, 30.0) == 0

    def test_exact_decode_batching_env(self, monkeypatch, tmp_path):
        # HDRTVNET_HDR_EXACT_BATCH_MAX_FRAMES bounds frames per FFmpeg pass
        # (gui_hdr_io.py:36-41): 5 indices at batch max 2 → 3 subprocess runs
        import hdrtv_tpu.bench.hdr_io as hdr_io

        calls = []

        def fake_run(cmd, capture_output=True, timeout=0):
            calls.append(cmd)
            sel = cmd[cmd.index("-vf") + 1]
            n = sel.count("eq(")
            class R:
                stdout = b"\x00" * (4 * 4 * 6 * n)
                stderr = b""
            return R()

        monkeypatch.setattr(hdr_io, "probe_video",
                            lambda p: {"width": 4, "height": 4, "fps": 30.0, "frames": 99})
        monkeypatch.setattr(hdr_io.subprocess, "run", fake_run)
        monkeypatch.setenv("HDRTVNET_HDR_EXACT_BATCH_MAX_FRAMES", "2")
        out = hdr_io.read_frames_exact("x.mkv", [1, 2, 3, 4, 5])
        assert len(calls) == 3 and sorted(out) == [1, 2, 3, 4, 5]

    def test_fast_seek_disable_env(self, monkeypatch):
        from hdrtv_tpu.bench.hdr_io import read_frame_fast

        monkeypatch.setenv("HDRTVNET_HDR_FAST_SEEK", "0")
        assert read_frame_fast("does_not_exist.mkv", 3) is None

    def test_probe_video_na_fields_fall_back_to_cv2(self, monkeypatch, tmp_path):
        """ffprobe emitting empty/N/A fields (audio-only or broken streams)
        must fall through to the cv2 probe, not crash on int() (ADVICE r2)."""
        import subprocess
        import types

        import cv2

        import hdrtv_tpu.bench.hdr_io as hio

        # tiny real video so the cv2 fallback has something to read
        path = str(tmp_path / "v.avi")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 16))
        for _ in range(3):
            wr.write(np.zeros((16, 32, 3), np.uint8))
        wr.release()

        monkeypatch.setattr(hio.shutil, "which", lambda name: "/usr/bin/" + name)
        monkeypatch.setattr(
            hio.subprocess,
            "run",
            lambda *a, **k: types.SimpleNamespace(stdout="N/A,N/A,0/0,N/A\n", returncode=0),
        )
        info = hio.probe_video(path)
        assert info["width"] == 32 and info["height"] == 16

    def test_artifact_writers_roundtrip(self, tmp_path):
        import cv2
        from hdrtv_tpu.bench.hdr_io import float01_to_u16, write_tiff16

        rgb = (np.random.RandomState(0).rand(16, 16, 3)).astype(np.float32)
        u16 = float01_to_u16(rgb)
        path = str(tmp_path / "x.tiff")
        write_tiff16(path, u16)
        back = cv2.imread(path, cv2.IMREAD_UNCHANGED)[..., ::-1]
        assert back.dtype == np.uint16
        np.testing.assert_array_equal(back, u16)


class TestQualityPostVerify:
    def test_post_verify_recovers_offset_and_writes_artifacts(self, tmp_path):
        """A GT stream shifted by +1 frame is re-aligned by the ±N search,
        and per-frame artifacts land in the session dir (gui_benchmark.py
        :2128-2439 roles)."""
        from hdrtv_tpu.bench.quality import QualityRunConfig, run_quality_benchmark

        def frame_for(i):  # distinct deterministic content per index
            return (np.random.RandomState(1000 + i).rand(48, 64, 3) * 255).astype(np.uint8)

        class _Src:
            fps = 30.0

            def __init__(self):
                self._idx = 0

            def read_with_meta(self):
                if self._idx >= 120:
                    return None
                i = self._idx
                self._idx += 1
                return frame_for(i), i, i / 30.0

            def seek(self, i):
                self._idx = int(i)

        src = _Src()

        def gt_read(idx):
            # GT stream lags by one frame: mapped idx i is actually at i+1.
            if not (0 <= idx + 1 < 130):
                return None
            return frame_for(idx + 1)[..., ::-1].astype(np.float32) / 255.0

        class _Identity:
            def process_rgb48(self, frame_bgr):
                return (frame_bgr[..., ::-1].astype(np.uint16)) * 257

        cfg = QualityRunConfig(frame_count=3)
        summary = run_quality_benchmark(
            cfg, _Identity(), src, gt_read, str(tmp_path),
            source_name="synthetic", post_verify=True, verify_window=2,
        )
        assert summary["frames"], "no rows produced"
        for row in summary["frames"]:
            assert row["gt_alignment_offset_frames"] == -1  # recovered shift
            assert row["psnr"] > 45  # aligned pair ⇒ near-identical
        assert summary["post_verify"]["enabled"]
        assert "frame_selection" in summary and "gt_decode" in summary
        fdirs = os.listdir(os.path.join(summary["session_dir"], "frames"))
        assert len(fdirs) == len(summary["frames"])
        one = os.path.join(summary["session_dir"], "frames", fdirs[0])
        assert sorted(os.listdir(one)) == ["hdr_convert.tiff", "hdr_gt.tiff", "sdr.png"]


class TestEnvKnobs:
    """Reference env-var families (README.md:271-317): GT-sync search,
    frame cache, post-verify, timing tolerance, HDR-VDP cache."""

    def test_sync_window_and_min_gain_from_env(self, monkeypatch):
        from hdrtv_tpu.bench.gt_sync import find_sync_offset, make_frame_map

        rng = np.random.RandomState(1)
        clip = [rng.rand(32, 48, 3).astype(np.float32) for _ in range(60)]
        true_offset = 4

        class Reader:
            fps = 1.0  # 1 fps ⇒ SEARCH_S maps 1:1 to frames

            def read_unit_rgb(self, idx):
                j = idx - true_offset
                return clip[j] if 0 <= j < len(clip) else None

        sdr_frames = {i: clip[i] for i in (10, 20, 30)}
        args = (sdr_frames, Reader(), make_frame_map(30, 30))
        # window smaller than the true offset ⇒ not found
        monkeypatch.setenv("HDRTVNET_GT_SYNC_OFFSET_SEARCH_S", "2")
        off, _ = find_sync_offset(*args)
        assert off == 0
        # wide enough ⇒ found
        monkeypatch.setenv("HDRTVNET_GT_SYNC_OFFSET_SEARCH_S", "8")
        off, _ = find_sync_offset(*args)
        assert off == true_offset
        # absurd min-gain ⇒ offset rejected back to 0
        monkeypatch.setenv("HDRTVNET_GT_SYNC_OFFSET_MIN_GAIN", "10.0")
        off, _ = find_sync_offset(*args)
        assert off == 0

    def test_gt_reader_cache_cap(self, monkeypatch, tmp_path):
        import cv2

        from hdrtv_tpu.bench.gt_sync import HDRGroundTruthReader

        path = str(tmp_path / "gt.avi")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(8):
            wr.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
        wr.release()

        monkeypatch.setenv("HDRTVNET_SDR_FRAME_CACHE_MAX", "2")
        r = HDRGroundTruthReader(path, exact=True)  # exact cache path
        r._hdr_io = type(
            "H", (), {"read_frames_exact": staticmethod(
                lambda p, idxs: {i: np.full((48, 64, 3), i, np.uint16) for i in idxs}
            ), "read_frame_fast": staticmethod(lambda p, i: None)},
        )
        for i in range(5):
            assert r.read_unit_rgb(i) is not None
        assert len(r._exact_cache) <= 2
        r.close()

    def test_post_verify_env_gate_and_cap(self, monkeypatch):
        from hdrtv_tpu.bench.quality import QualityRunConfig, run_quality_benchmark

        calls = {"n": 0}

        class _Src:
            fps = 30.0
            frame_count = 30

            def __init__(self):
                self._idx = 0

            def read_with_meta(self):
                f = np.full((48, 64, 3), self._idx * 7 % 255, np.uint8)
                self._idx += 1
                return f, self._idx - 1, (self._idx - 1) / 30.0

            def seek(self, i):
                self._idx = int(i)

        def gt_read(idx):
            calls["n"] += 1
            return np.full((48, 64, 3), (idx * 7 % 255) / 255.0, np.float32)

        class _Identity:
            def process_rgb48(self, frame_bgr):
                return frame_bgr[..., ::-1].astype(np.uint16) * 257

        monkeypatch.setenv("HDRTVNET_BENCHMARK_AUTO_POST_VERIFY", "0")
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            s = run_quality_benchmark(
                QualityRunConfig(frame_count=3), _Identity(), _Src(), gt_read, td,
                save_artifacts=False,
            )
        assert not s["post_verify"]["enabled"]
        # with verify off, exactly one gt read per row
        assert calls["n"] == len(s["frames"])

        monkeypatch.setenv("HDRTVNET_BENCHMARK_AUTO_POST_VERIFY", "1")
        monkeypatch.setenv("HDRTVNET_BENCHMARK_GT_LOCAL_SEARCH_FRAMES", "1")
        monkeypatch.setenv("HDRTVNET_BENCHMARK_AUTO_POST_VERIFY_MAX_ITEMS", "1")
        calls["n"] = 0
        with tempfile.TemporaryDirectory() as td:
            s = run_quality_benchmark(
                QualityRunConfig(frame_count=3), _Identity(), _Src(), gt_read, td,
                save_artifacts=False,
            )
        n = len(s["frames"])
        # row 1: ±1 search (3 reads) + final read; rows 2..n: 1 read each
        assert calls["n"] == 4 + (n - 1)

    def test_timing_tolerance_env(self, monkeypatch):
        from hdrtv_tpu.runtime.probe import MediaInfo, validate_timing_compatibility

        src = MediaInfo(64, 48, 30.0, 300, False)
        gt = MediaInfo(64, 48, 30.0, 420, False)  # 4 s longer
        ok, _err, _notes = validate_timing_compatibility(src, gt)
        assert not ok  # beyond the default 2 s tolerance
        monkeypatch.setenv("HDRTVNET_GT_SYNC_TOLERANCE_S", "5.0")
        ok, _err, notes = validate_timing_compatibility(src, gt)
        assert ok and any("overlap sync" in n for n in notes)

    def test_hdrvdp3_cache_dir(self, monkeypatch, tmp_path):
        from hdrtv_tpu.bench import hdrvdp3

        monkeypatch.setenv("HDRTVNET_HDRVDP3_CMD", "echo {test} {reference} 7.25")
        monkeypatch.setenv("HDRTVNET_HDRVDP_CACHE_DIR", str(tmp_path / "vdp"))
        a = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
        b = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32)
        score, status = hdrvdp3.hdrvdp3_score(a, b)
        assert status == "ok" and score is not None
        score2, status2 = hdrvdp3.hdrvdp3_score(a, b)
        assert status2 == "ok (cached)" and score2 == score


class TestFigures:
    """Figure renderer — the scripts/render_mpv_preview_figures.py role:
    session discovery, PQ display transform, contact sheets, manifest."""

    @staticmethod
    def _make_session(root):
        import cv2

        from hdrtv_tpu.bench import hdr_io

        rng = np.random.RandomState(3)
        dirs = []
        for name in ("frames/f000012", "frames/f000044"):
            d = os.path.join(root, name)
            os.makedirs(d)
            cv2.imwrite(os.path.join(d, "sdr.png"),
                        rng.randint(0, 255, (36, 64, 3), np.uint8))
            for k in ("hdr_gt.tiff", "hdr_convert.tiff"):
                hdr_io.write_tiff16(
                    os.path.join(d, k),
                    rng.randint(0, 65535, (36, 64, 3)).astype(np.uint16),
                )
            dirs.append(d)
        return dirs

    def test_discovery_modes(self, tmp_path):
        from hdrtv_tpu.bench.figures import discover_frame_dirs

        dirs = self._make_session(str(tmp_path))
        found, _root = discover_frame_dirs(str(tmp_path))
        assert found == sorted(dirs)
        # a frame dir itself
        found, _ = discover_frame_dirs(dirs[0])
        assert found == [dirs[0]]
        # a file selects its parent
        found, _ = discover_frame_dirs(os.path.join(dirs[1], "sdr.png"))
        assert found == [dirs[1]]
        # kind subset still matches
        found, _ = discover_frame_dirs(str(tmp_path), kinds=("sdr",))
        assert len(found) == 2

    def test_tone_map_properties(self):
        from hdrtv_tpu.bench.figures import tone_map_pq
        from hdrtv_tpu.ops.color import pq_oetf

        # black maps to black, monotone ramp stays monotone, in-range
        ramp = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8, 1)
        code = np.repeat(ramp, 3, axis=-1)
        out = tone_map_pq(code)
        assert out.shape == code.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        gray = out[..., 0].ravel()
        assert np.all(np.diff(gray) >= -1e-4)
        assert gray[0] < 1e-3
        # reference-white PQ code (203 nits) should land near display white
        ref_white = float(np.asarray(pq_oetf(np.float32(203.0))))
        w = tone_map_pq(np.full((4, 4, 3), ref_white, np.float32))
        assert w.mean() > 0.8

    def test_render_session_manifest_and_outputs(self, tmp_path):
        import cv2

        from hdrtv_tpu.bench.figures import render_session

        self._make_session(str(tmp_path / "sess"))
        out = str(tmp_path / "figs")
        m = render_session(str(tmp_path / "sess"), out,
                           render_size=(128, 72), scale="fsr")
        assert len(m["frames"]) == 2
        one = m["frames"][0]["outputs"]
        img = cv2.imread(one["hdr_convert"], cv2.IMREAD_UNCHANGED)
        assert img.shape == (72, 128, 3) and img.dtype == np.uint8
        sheet = cv2.imread(one["contact_sheet"], cv2.IMREAD_UNCHANGED)
        assert sheet.shape[1] == 3 * 128 + 2 * 4  # 3 columns + separators
        assert os.path.isfile(os.path.join(out, "manifest.json"))

    def test_png_depth_16(self, tmp_path):
        import cv2

        from hdrtv_tpu.bench.figures import render_session

        self._make_session(str(tmp_path / "sess"))
        m = render_session(str(tmp_path / "sess"), str(tmp_path / "figs"),
                           kinds=("hdr_convert",), png_depth=16, sheet=False)
        img = cv2.imread(m["frames"][0]["outputs"]["hdr_convert"],
                         cv2.IMREAD_UNCHANGED)
        assert img.dtype == np.uint16

    def test_cas_sharpen_edges(self):
        from hdrtv_tpu.bench.figures import cas_sharpen

        x = np.zeros((8, 8, 3), np.float32)
        x[:, 4:] = 1.0
        y = cas_sharpen(x, 0.2)
        assert y.shape == x.shape and y.min() >= 0.0 and y.max() <= 1.0
        # flat regions unchanged, zero strength is identity
        assert np.allclose(y[:, :2], 0.0) and np.allclose(y[:, 6:], 1.0)
        np.testing.assert_array_equal(cas_sharpen(x, 0.0), x)


class TestQualityQueue:
    """Benchmark queue (reference one-click precision sweep): the GT
    post-verify alignment is computed once and reused across presets."""

    class _Src:
        fps = 30.0
        frame_count = 30

        def __init__(self):
            self._idx = 0

        def read_with_meta(self):
            f = np.full((48, 64, 3), self._idx * 7 % 255, np.uint8)
            self._idx += 1
            return f, self._idx - 1, (self._idx - 1) / 30.0

        def seek(self, i):
            self._idx = int(i)

    class _Identity:
        def process_rgb48(self, frame_bgr):
            return frame_bgr[..., ::-1].astype(np.uint16) * 257

    def test_queue_shares_alignment(self, tmp_path):
        from hdrtv_tpu.bench.quality import QualityRunConfig, run_quality_queue

        calls = {"n": 0}

        def gt_read(idx):
            calls["n"] += 1
            return np.full((48, 64, 3), (idx * 7 % 255) / 255.0, np.float32)

        ran = []
        summaries = run_quality_queue(
            QualityRunConfig(frame_count=3),
            ["FP16", "FP32"],
            lambda key: self._Identity(),
            self._Src(),
            gt_read,
            str(tmp_path),
            save_artifacts=False,
            progress=ran.append,
        )
        assert ran == ["FP16", "FP32"]
        assert [s["precision"] for s in summaries] == ["FP16", "FP32"]
        n = len(summaries[0]["frames"])
        assert n == len(summaries[1]["frames"])
        # run 1: ±2 search (5 reads) + final read per row; run 2 reuses the
        # cached offsets — exactly one read per row
        assert calls["n"] == 6 * n + n
        # both runs produced their own session dirs
        assert summaries[0]["session_dir"] != summaries[1]["session_dir"]

    def test_cache_bound(self, tmp_path, monkeypatch):
        from hdrtv_tpu.bench import quality as q

        monkeypatch.setenv("HDRTVNET_BENCHMARK_QUEUE_TASK_CACHE_MAX", "2")
        cache = {}
        gt_read = lambda idx: np.full((48, 64, 3), 0.5, np.float32)
        q.run_quality_benchmark(
            q.QualityRunConfig(frame_count=4), self._Identity(), self._Src(),
            gt_read, str(tmp_path), save_artifacts=False, verify_cache=cache,
        )
        assert len(cache) <= 2


class TestFrameQC:
    def _frame(self, fill, noise=0.0, seed=0):
        rng = np.random.RandomState(seed)
        f = np.full((72, 96, 3), fill, np.float32)
        if noise:
            f += rng.randn(72, 96, 3) * noise
        return np.clip(f, 0, 255).astype(np.uint8)

    def test_qc_gates(self):
        from hdrtv_tpu.bench.frame_select import frame_qc

        ok, why = frame_qc(self._frame(2))
        assert not ok and why == "too_dark"
        ok, why = frame_qc(self._frame(252))
        assert not ok and why == "too_bright"
        ok, why = frame_qc(self._frame(120, noise=0.5))
        assert not ok and why == "flat"
        ok, why = frame_qc(self._frame(120, noise=40.0))
        assert ok and why == "ok"
        ok, why = frame_qc(None)
        assert not ok and why == "unreadable"

    def test_qc_env_thresholds(self, monkeypatch):
        from hdrtv_tpu.bench.frame_select import frame_qc

        monkeypatch.setenv("HDRTVNET_BENCHMARK_FRAME_QC_MIN_STD", "0.0")
        ok, why = frame_qc(self._frame(120, noise=0.5))
        assert ok  # flat gate disabled

    def test_logo_detector_on_credits_card(self):
        import cv2
        from hdrtv_tpu.bench.frame_select import looks_like_logo_or_credits

        # near-black card with many small bright text-like blobs
        card = np.zeros((240, 360, 3), np.uint8)
        rng = np.random.RandomState(1)
        for _ in range(40):
            x, y = rng.randint(10, 340), rng.randint(10, 220)
            cv2.rectangle(card, (x, y), (x + rng.randint(6, 24), y + 6), (230, 230, 230), -1)
        assert looks_like_logo_or_credits(card)
        # a textured natural frame is not a card
        nat = np.clip(rng.randn(240, 360, 3) * 40 + 120, 0, 255).astype(np.uint8)
        assert not looks_like_logo_or_credits(nat)

    def test_movie_bounds_policy(self, monkeypatch):
        from hdrtv_tpu.bench.frame_select import movie_frame_bounds

        # short sources: policy disengaged (below SKIP_MIN_FRAMES)
        assert movie_frame_bounds(200, 24.0) == (0, 199)
        # feature length: head = max(2.5%, 120 s) capped at 8%,
        # tail = max(8%, 600 s) capped at 18%
        total = 24 * 60 * 120  # 2 h at 24 fps = 172800
        lo, hi = movie_frame_bounds(total, 24.0)
        assert lo == round(total * 0.025)  # ratio > 120 s here
        assert hi == total - round(total * 0.08 * 0) - round(600 * 24) - 1 or hi <= total - 1
        assert lo > 0 and hi < total - 1
        # caps engage via env
        monkeypatch.setenv("HDRTVNET_BENCHMARK_FRAME_QC_SKIP_HEAD_SECONDS", "100000")
        lo2, _ = movie_frame_bounds(total, 24.0)
        assert lo2 == round(total * 0.08)  # MAX_HEAD_SKIP_RATIO cap

    def test_selection_skips_credit_region(self, monkeypatch):
        from hdrtv_tpu.bench.quality import select_distinct_frames
        from hdrtv_tpu.pipeline.source import SyntheticSource

        monkeypatch.setenv("HDRTVNET_BENCHMARK_FRAME_QC_SKIP_MIN_FRAMES", "100")
        monkeypatch.setenv("HDRTVNET_BENCHMARK_FRAME_QC_SKIP_HEAD_RATIO", "0.2")
        monkeypatch.setenv("HDRTVNET_BENCHMARK_FRAME_QC_SKIP_HEAD_SECONDS", "0")
        monkeypatch.setenv("HDRTVNET_BENCHMARK_FRAME_QC_SKIP_TAIL_SECONDS", "0")
        monkeypatch.setenv("HDRTVNET_BENCHMARK_FRAME_QC_MAX_HEAD_SKIP_RATIO", "0.5")
        src = SyntheticSource(96, 64, fps=30, frames=400)
        frames = select_distinct_frames(src, 4)
        assert len(frames) == 4
        assert min(frames) >= 80  # head region skipped

    def test_post_verify_min_gain_keeps_mapping(self):
        # near-tie neighbor scores: the timing-derived mapping wins unless
        # the neighbor beats it by MIN_GAIN (gui_benchmark.py:718-731)
        from hdrtv_tpu.bench.quality import post_verify_alignment

        rng = np.random.RandomState(0)
        sdr = rng.rand(24, 32, 3).astype(np.float32)
        base = sdr.copy()
        neighbor = np.clip(sdr + rng.randn(24, 32, 3).astype(np.float32) * 0.001, 0, 1)

        def gt_read(idx):
            return {10: base, 11: neighbor}.get(idx)

        off, _ = post_verify_alignment(sdr, gt_read, 10, window=1)
        assert off == 0
        # a decisively better neighbor is still taken
        def gt_read2(idx):
            return {10: rng.rand(24, 32, 3).astype(np.float32), 11: sdr}.get(idx)

        off2, score2 = post_verify_alignment(sdr, gt_read2, 10, window=1)
        assert off2 == 1 and score2 > 0.9


class TestGtReaderModes:
    def _video(self, tmp_path):
        import cv2

        path = str(tmp_path / "gt.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 24, (64, 32))
        for i in range(6):
            w.write(np.full((32, 64, 3), 40 + i * 10, np.uint8))
        w.release()
        return path

    def test_hdr_gt_mode_env(self, tmp_path, monkeypatch):
        from hdrtv_tpu.bench.gt_sync import HDRGroundTruthReader

        path = self._video(tmp_path)
        monkeypatch.setenv("HDRTVNET_BENCHMARK_HDR_GT_MODE", "fast")
        r = HDRGroundTruthReader(path)
        assert not r.exact and r.decode_method == "cv2-8bit"
        monkeypatch.setenv("HDRTVNET_BENCHMARK_HDR_GT_MODE", "exact")
        r2 = HDRGroundTruthReader(path)
        assert r2.exact and r2.decode_method == "ffmpeg-rgb48le-exact"

    def test_cache_mb_cap(self, tmp_path, monkeypatch):
        from hdrtv_tpu.bench.gt_sync import HDRGroundTruthReader

        monkeypatch.setenv("HDRTVNET_BENCHMARK_HDR_GT_MODE", "fast")
        monkeypatch.setenv("HDRTVNET_BENCHMARK_POST_VERIFY_CACHE_MAX_MB", "1")
        r = HDRGroundTruthReader(self._video(tmp_path))
        # each fake entry is 1 MB; the MB cap keeps at most one (plus the
        # newest insert before eviction rechecks)
        mb = np.zeros((512, 1024), np.uint16)  # 1 MiB
        for i in range(5):
            r._cache_put({i: mb})
        total = sum(v.nbytes for v in r._exact_cache.values())
        assert total <= 2 * (1 << 20)


class TestPostVerifyGates:
    def test_structure_similarity(self):
        from hdrtv_tpu.bench.quality import _structure_similarity

        rng = np.random.RandomState(0)
        a = rng.rand(32, 48, 3).astype(np.float32)
        assert _structure_similarity(a, a) > 0.9999
        # 8-bit-quantized copy of the same frame stays structurally identical
        q = (a * 255).astype(np.uint8).astype(np.float32) / 255.0
        assert _structure_similarity(a, q) > 0.999
        # a different frame scores well below the 0.985 gate
        b = rng.rand(32, 48, 3).astype(np.float32)
        assert _structure_similarity(a, b) < 0.5

    def test_verify_reasons_recorded(self, tmp_path):
        from hdrtv_tpu.bench.quality import QualityRunConfig, run_quality_benchmark
        from hdrtv_tpu.pipeline.source import SyntheticSource

        class Reader:
            decode_method = "ffmpeg-rgb48le-exact"

            def __init__(self):
                self.rng = np.random.RandomState(3)

            def read_unit_rgb(self, idx):
                s = SyntheticSource(96, 64, fps=30, frames=200)
                s.seek(idx)
                m = s.read_with_meta()
                return None if m is None else m[0].astype(np.float32) / 255.0

            def read_unit_rgb_fast(self, idx):
                # fast decode returns a DIFFERENT frame → gates must fire
                return self.rng.rand(64, 96, 3).astype(np.float32)

        src = SyntheticSource(96, 64, fps=30, frames=200)
        summary = run_quality_benchmark(
            QualityRunConfig(frame_count=2), FakeProcessor(), src, Reader(),
            str(tmp_path), source_name="synthetic", save_artifacts=False,
        )
        rows = summary["frames"]
        assert rows
        joined = "; ".join("; ".join(r["verify_reasons"]) for r in rows)
        assert "GT frame changed" in joined or "GT pixel delta" in joined


class TestPlaybackModes:
    def test_loop_source_sustains_duration(self, tmp_path):
        from hdrtv_tpu.bench.playback import LoopingSource
        from hdrtv_tpu.pipeline.source import SyntheticSource

        src = LoopingSource(SyntheticSource(32, 16, fps=30, frames=5))
        seen = [src.read_with_meta() for _ in range(12)]
        assert all(m is not None for m in seen)
        assert src.loops >= 2
        assert src.fps == 30  # attribute passthrough

    def test_wall_clock_and_samples(self, tmp_path):
        from hdrtv_tpu.bench.playback import PlaybackRunConfig, run_playback_benchmark

        cfg = PlaybackRunConfig(
            resolution_key="540p", realtime=False, duration_s=1.0,
            warmup_frames=1, wall_clock=True, sample_interval=5,
        )
        res = run_playback_benchmark(cfg, FakeProcessor(), str(tmp_path))
        assert 0.9 <= res.wall_s <= 8.0  # stopped by the wall timer, not EOF
        assert res.frames > 0
        assert res.samples and res.samples[0]["proc_res"] == "960x540"
        # sample CSV got one row per sample
        import csv as _csv

        with open(tmp_path / "runtime_metrics.csv") as f:
            rows = list(_csv.DictReader(f))
        assert len(rows) == len(res.samples)
        assert "elapsed_s" in rows[0]


class TestFfmpegCandidateScan:
    def test_preview_cmd_and_dims(self):
        from hdrtv_tpu.bench.hdr_io import build_preview_decode_cmd, preview_dims

        pw, ph = preview_dims(1920, 1080, 160)
        assert pw == 160 and ph == 90
        assert preview_dims(1080, 1920, 160) == (90, 160)  # portrait
        assert preview_dims(100, 50, 160) == (100, 50)  # never upscale
        cmd = build_preview_decode_cmd("m.mkv", [5, 2, 5], 160, 90)
        assert "rgb24" in cmd
        sel = cmd[cmd.index("-vf") + 1]
        assert sel == "select='eq(n\\,2)+eq(n\\,5)',scale=160:90"

    def test_scan_used_when_available(self, monkeypatch):
        from hdrtv_tpu.bench import quality as q
        from hdrtv_tpu.bench import hdr_io

        rng = np.random.RandomState(0)
        frames = {i: np.clip(rng.randn(36, 64, 3) * 40 + 120, 0, 255).astype(np.uint8)
                  for i in range(0, 300)}
        monkeypatch.setattr(hdr_io, "ffmpeg_available", lambda: True)
        monkeypatch.setattr(
            hdr_io, "read_preview_frames",
            lambda path, idxs, **kw: {i: frames[i] for i in idxs},
        )

        class Src:
            path = "movie.mkv"
            frame_count = 300
            fps = 30.0

            def read_with_meta(self, *a, **k):
                raise AssertionError("sequential scan must not run")

            def seek(self, i):
                pass

        got = q.select_distinct_frames(Src(), 4)
        assert len(got) == 4 and got == sorted(got)

    def test_scan_disabled_falls_back(self, monkeypatch):
        from hdrtv_tpu.bench import quality as q
        from hdrtv_tpu.pipeline.source import SyntheticSource

        monkeypatch.setenv("HDRTVNET_FRAME_DETECT_FFMPEG", "0")
        src = SyntheticSource(96, 64, fps=30, frames=150)
        src.path = "x.mkv"
        got = q.select_distinct_frames(src, 3)
        assert len(got) == 3
