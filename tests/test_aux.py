"""Auxiliary subsystem tests: live source, audio policy, compare, probing."""

import time

import numpy as np
import pytest


class TestLiveSource:
    def test_observe_process_split(self):
        from hdrtv_tpu.pipeline.live import LiveSource, synthetic_grabber

        with LiveSource(synthetic_grabber(64, 32), process_fps=30, observe_fps=120) as src:
            frames = []
            t_end = time.monotonic() + 0.25
            while time.monotonic() < t_end:
                meta = src.read_with_meta(timeout=0.5)
                assert meta is not None
                frames.append(meta)
                time.sleep(1 / 30)
            # observe thread polls faster than we consume
            assert src.frames_observed > len(frames)
            assert frames[0][0].shape == (32, 64, 3)

    def test_source_loss_returns_none(self):
        from hdrtv_tpu.pipeline.live import LiveSource

        calls = {"n": 0}

        def dying_grabber():
            calls["n"] += 1
            if calls["n"] > 3:
                return None  # window closed
            return np.zeros((16, 16, 3), np.uint8)

        with LiveSource(dying_grabber, process_fps=30, observe_fps=200) as src:
            src.read_with_meta(timeout=0.5)
            time.sleep(0.1)
            deadline = time.monotonic() + 1.0
            while time.monotonic() < deadline:
                if src.read_with_meta(timeout=0.2) is None:
                    break
            else:
                pytest.fail("live source never reported loss")

    def test_fps_policies(self):
        from hdrtv_tpu.pipeline.live import display_fps_for, observe_fps_for

        assert observe_fps_for(24.0) == 36.0  # 1.5× default
        assert display_fps_for(24.0) == 24.0  # never above process


class TestAudioPolicy:
    def test_mute_on_low_fps_and_fade_in(self):
        from hdrtv_tpu.pipeline.audio import AutoMutePolicy

        p = AutoMutePolicy(target_fps=30.0, fade_in_s=1.0, window=3)
        now = 100.0
        assert p.update(30.0, now) == 1.0
        # sustained low fps → mute
        for i in range(5):
            g = p.update(10.0, now + i)
        assert g == 0.0 and p.muted
        # recovery → fade-in ramp
        for i in range(5):
            g = p.update(30.0, now + 10)
        assert not p.muted
        g_mid = p.update(30.0, now + 10.5)
        assert 0.0 < g_mid < 1.0
        assert p.update(30.0, now + 12.0) == 1.0

    def test_attachment_calls_gain_setter(self):
        from hdrtv_tpu.pipeline.audio import AudioAttachment, AutoMutePolicy

        gains = []
        att = AudioAttachment(AutoMutePolicy(target_fps=30.0, window=2), gains.append)
        att.on_metrics(30.0)
        att.on_metrics(5.0)
        att.on_metrics(5.0)
        assert gains and gains[-1] == 0.0


class TestCompare:
    def test_compare_sheet(self, tmp_path):
        from hdrtv_tpu.pipeline.compare import compare_frame, write_compare_sheet

        class FakeProc:
            def process_rgb48(self, frame):
                return frame.astype(np.uint16) * 257

        rng = np.random.RandomState(0)
        sdr = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
        gt = rng.rand(24, 32, 3).astype(np.float32)
        res = compare_frame(FakeProc(), sdr, frame_idx=7, gt_rgb01=gt)
        assert "psnr" in res.metrics
        path = write_compare_sheet(res, str(tmp_path))
        import os

        assert os.path.isfile(path)
        assert os.path.isfile(tmp_path / "compare_000007.json")


class TestProbe:
    def _make_video(self, tmp_path, n=10):
        import cv2

        path = str(tmp_path / "p.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 24, (64, 32))
        for i in range(n):
            w.write(np.full((32, 64, 3), 100, np.uint8))
        w.release()
        return path

    def test_probe_media_cv2_fallback(self, tmp_path):
        from hdrtv_tpu.runtime.probe import probe_media, should_bypass_processing

        info = probe_media(self._make_video(tmp_path))
        assert (info.width, info.height) == (64, 32)
        assert abs(info.fps - 24.0) < 0.1
        assert not info.is_hdr
        assert not should_bypass_processing(info)

    def test_active_picture_detection(self):
        from hdrtv_tpu.runtime.probe import detect_active_picture

        frames = []
        for i in range(3):
            f = np.zeros((100, 200, 3), np.uint8)
            f[20:80, 10:190] = 120 + i  # letterboxed + pillarboxed content
            frames.append(f)
        top, bottom, left, right = detect_active_picture(frames)
        assert (top, bottom) == (20, 80)
        assert (left, right) == (10, 190)

    def test_hdr_flag_from_metadata(self):
        from hdrtv_tpu.runtime.probe import MediaInfo, should_bypass_processing

        info = MediaInfo(1920, 1080, 24.0, 100, is_hdr=True, color_transfer="smpte2084")
        assert should_bypass_processing(info)
