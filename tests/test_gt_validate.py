"""Media-probe timing/audio extensions + GT pair validation worker."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_video(path, frames, fps=25.0, size=(64, 32)):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), fps, size)
    for f in frames:
        w.write(f)
    w.release()
    return str(path)


def _pattern_frames(n, size=(64, 32), shift=0, border=0):
    """Deterministic textured frames; ``shift`` offsets content in time,
    ``border`` adds horizontal black bars (letterbox)."""
    w, h = size
    rng = np.random.RandomState(7)
    base = (rng.rand(h * 4, w, 3) * 255).astype(np.uint8)
    out = []
    for i in range(n):
        row = ((i + shift) * 3) % (h * 3)
        f = base[row : row + h].copy()
        if border:
            f[:border] = 0
            f[-border:] = 0
        out.append(f)
    return out


class TestTimingCompat:
    def _info(self, **kw):
        from hdrtv_tpu.runtime.probe import MediaInfo

        d = dict(width=64, height=32, fps=25.0, frame_count=100, is_hdr=False)
        d.update(kw)
        return MediaInfo(**d)

    def test_matching_pair_ok(self):
        from hdrtv_tpu.runtime.probe import validate_timing_compatibility

        ok, err, notes = validate_timing_compatibility(self._info(), self._info())
        assert ok and err is None and notes == []

    def test_fps_mismatch_fails(self):
        from hdrtv_tpu.runtime.probe import validate_timing_compatibility

        ok, err, _ = validate_timing_compatibility(self._info(), self._info(fps=30.0))
        assert not ok and "FPS mismatch" in err

    def test_small_frame_count_delta_tolerated(self):
        from hdrtv_tpu.runtime.probe import validate_timing_compatibility

        ok, _, notes = validate_timing_compatibility(self._info(), self._info(frame_count=102))
        assert ok and notes == []

    def test_overlap_sync_note_within_tolerance(self):
        from hdrtv_tpu.runtime.probe import validate_timing_compatibility

        # 40 frames at 25fps = 1.6s delta ≤ 2s sync tolerance → overlap note
        ok, _, notes = validate_timing_compatibility(self._info(), self._info(frame_count=140))
        assert ok and any("overlap sync" in n for n in notes)

    def test_large_delta_fails_when_enforced(self):
        from hdrtv_tpu.runtime.probe import validate_timing_compatibility

        ok, err, _ = validate_timing_compatibility(self._info(), self._info(frame_count=400))
        assert not ok and "mismatch" in err

    def test_large_delta_passes_with_content_sync(self):
        from hdrtv_tpu.runtime.probe import validate_timing_compatibility

        ok, _, notes = validate_timing_compatibility(
            self._info(), self._info(frame_count=400), enforce_sync_tolerance=False
        )
        assert ok and any("content sync" in n for n in notes)

    def test_none_meta_fails(self):
        from hdrtv_tpu.runtime.probe import validate_timing_compatibility

        ok, err, _ = validate_timing_compatibility(None, self._info())
        assert not ok and "metadata" in err


class TestAudioProbe:
    def test_no_audio_in_mjpg(self, tmp_path):
        from hdrtv_tpu.runtime.probe import probe_audio_streams

        path = _write_video(tmp_path / "v.avi", _pattern_frames(5))
        assert probe_audio_streams(path) == []

    def test_missing_file_is_empty(self):
        from hdrtv_tpu.runtime.probe import probe_audio_streams

        assert probe_audio_streams("/nonexistent.mp4") == []


class TestGTValidation:
    def test_same_content_validates(self, tmp_path):
        from hdrtv_tpu.bench.gt_validate import validate_gt_pair

        frames = _pattern_frames(30)
        src = _write_video(tmp_path / "src.avi", frames)
        gt = _write_video(tmp_path / "gt.avi", frames)
        res = validate_gt_pair(gt, src, require_hdr=False)
        assert res.ok, res.message
        assert res.content_score > 0.9
        assert res.offset_frames == 0

    def test_different_content_fails(self, tmp_path):
        from hdrtv_tpu.bench.gt_validate import validate_gt_pair

        src = _write_video(tmp_path / "src.avi", _pattern_frames(30))
        rng = np.random.RandomState(99)
        other = [(rng.rand(32, 64, 3) * 255).astype(np.uint8) for _ in range(30)]
        gt = _write_video(tmp_path / "gt.avi", other)
        res = validate_gt_pair(gt, src, require_hdr=False)
        assert not res.ok and "Content mismatch" in res.message

    def test_sdr_gt_requires_hdr_metadata(self, tmp_path):
        from hdrtv_tpu.bench.gt_validate import validate_gt_pair

        frames = _pattern_frames(10)
        src = _write_video(tmp_path / "src.avi", frames)
        gt = _write_video(tmp_path / "gt.avi", frames)
        res = validate_gt_pair(gt, src, require_hdr=True)
        assert not res.ok and "HDR" in res.message

    def test_missing_files(self, tmp_path):
        from hdrtv_tpu.bench.gt_validate import validate_gt_pair

        res = validate_gt_pair(str(tmp_path / "nope.mp4"), None)
        assert not res.ok and "not found" in res.message
        src = _write_video(tmp_path / "src.avi", _pattern_frames(5))
        res = validate_gt_pair(src, None, require_hdr=False)
        assert not res.ok and "SDR input" in res.message

    def test_fps_mismatch_fails(self, tmp_path):
        from hdrtv_tpu.bench.gt_validate import validate_gt_pair

        frames = _pattern_frames(20)
        src = _write_video(tmp_path / "src.avi", frames, fps=25.0)
        gt = _write_video(tmp_path / "gt.avi", frames, fps=30.0)
        res = validate_gt_pair(gt, src, require_hdr=False)
        assert not res.ok and "FPS mismatch" in res.message

    def test_worker_runs_and_reports(self, tmp_path):
        from hdrtv_tpu.bench.gt_validate import GTValidationWorker

        frames = _pattern_frames(20)
        src = _write_video(tmp_path / "src.avi", frames)
        gt = _write_video(tmp_path / "gt.avi", frames)
        done = []
        w = GTValidationWorker(gt, src, require_hdr=False, on_done=done.append).start()
        res = w.join(timeout=30)
        assert res is not None and res.ok
        assert done and done[0] is res

    def test_worker_cancel(self, tmp_path):
        from hdrtv_tpu.bench.gt_validate import GTValidationWorker

        frames = _pattern_frames(20)
        src = _write_video(tmp_path / "src.avi", frames)
        gt = _write_video(tmp_path / "gt.avi", frames)
        w = GTValidationWorker(gt, src, require_hdr=False)
        w.cancel()  # cancel before start → first checkpoint aborts
        w.start()
        res = w.join(timeout=30)
        assert w.canceled and not res.ok


class TestHDRWriters:
    def test_write_hdr_image_by_extension(self, tmp_path):
        from hdrtv_tpu.bench.hdr_io import write_hdr_image

        rgb = np.random.RandomState(0).rand(8, 12, 3).astype(np.float32)
        tiff = write_hdr_image(str(tmp_path / "a.tiff"), rgb)
        back = cv2.imread(tiff, cv2.IMREAD_UNCHANGED)
        assert back.dtype == np.uint16 and back.shape == (8, 12, 3)
        np.testing.assert_allclose(
            back[..., ::-1].astype(np.float32) / 65535.0, rgb, atol=1e-4
        )

    def test_exr_writes_or_falls_back(self, tmp_path):
        from hdrtv_tpu.bench.hdr_io import write_hdr_image

        rgb = np.random.RandomState(1).rand(8, 12, 3).astype(np.float32) * 2.0  # >1 HDR
        path = write_hdr_image(str(tmp_path / "b.exr"), rgb)
        import os

        assert os.path.isfile(path)
        if path.endswith(".exr"):
            back = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if back is not None:  # codec readable → float round-trip
                np.testing.assert_allclose(back[..., ::-1], rgb, atol=1e-3)
        else:
            assert path.endswith(".tiff")  # graceful fallback
