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
    def test_mute_on_sustained_instability_and_fade_in(self):
        from hdrtv_tpu.pipeline.audio import AutoMutePolicy

        p = AutoMutePolicy(fade_ms=1000.0, stable_need=3, hold_s=0.45,
                           unstable_need=4, grace_s=1.6)
        now = 100.0
        assert p.update(30.0, now) == 1.0
        # wild FPS swings (and sub-min-FPS samples) → unstable → mute after
        # unstable_need=4 accumulated unstable samples
        for i, fps in enumerate([30.0, 4.0, 25.0, 3.0, 20.0]):
            g = p.update(fps, now + i)
        assert g == 0.0 and p.muted
        # steady recovery: stable_need samples + hold_s continuous hold
        for i in range(6):
            g = p.update(30.0, now + 10 + i * 0.2)
        assert not p.muted
        g_mid = p.update(30.0, now + 10 + 5 * 0.2 + 0.5)
        assert 0.0 < g_mid < 1.0
        assert p.update(30.0, now + 10 + 5 * 0.2 + 1.1) == 1.0

    def test_stability_not_target_ratio(self):
        # steadily low-but-stable FPS above min_fps must NOT mute — the
        # reference policy is instability-based (gui_audio_mute.py:320)
        from hdrtv_tpu.pipeline.audio import AutoMutePolicy

        p = AutoMutePolicy(target_fps=60.0)
        for i in range(20):
            g = p.update(12.0, 100.0 + i)
        assert g == 1.0 and not p.muted

    def test_rearm_grace_blocks_immediate_remute(self):
        from hdrtv_tpu.pipeline.audio import AutoMutePolicy

        p = AutoMutePolicy(stable_need=2, hold_s=0.1, unstable_need=2,
                           grace_s=5.0, fade_ms=80.0)
        now = 100.0
        for i, fps in enumerate([30.0, 3.0, 25.0, 2.0, 22.0]):
            p.update(fps, now + i)
        assert p.muted
        for i in range(4):
            p.update(30.0, now + 10 + i)
        assert not p.muted
        # within grace_s: unstable swings cannot re-mute
        for i, fps in enumerate([30.0, 3.0, 25.0, 2.0, 24.0, 1.0]):
            p.update(fps, now + 14.0 + i * 0.1)
        assert not p.muted

    def test_disabled_never_mutes(self):
        from hdrtv_tpu.pipeline.audio import AutoMutePolicy

        p = AutoMutePolicy(enabled=False)
        for i, fps in enumerate([30.0, 1.0, 28.0, 2.0, 25.0, 1.0]):
            g = p.update(fps, 100.0 + i)
        assert g == 1.0 and not p.muted

    def test_attachment_calls_gain_setter(self):
        from hdrtv_tpu.pipeline.audio import AudioAttachment, AutoMutePolicy

        gains = []
        att = AudioAttachment(AutoMutePolicy(unstable_need=2), gains.append)
        for fps in (30.0, 3.0, 25.0, 2.0, 20.0):
            att.on_metrics(fps)
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

    def test_probe_media_y4m_native_with_color_sidecar(self, tmp_path):
        """A y4m master + the export path's PQ/BT.2020 sidecar must probe as
        HDR without any binary (round-4 fix: the native y4m GT path was
        rejected by GT validation because probe_media didn't know y4m)."""
        import json

        from hdrtv_tpu.bench.y4m import Y4MWriter
        from hdrtv_tpu.pipeline.export import _y4m_sidecar
        from hdrtv_tpu.runtime.probe import probe_media

        path = str(tmp_path / "gt.y4m")
        w = Y4MWriter(path, 64, 32, fps=25.0, ctag="422p10")
        for _ in range(4):
            w.write_rgb_unit(np.full((32, 64, 3), 0.5, np.float32), matrix="bt2020nc")
        w.close()
        # without the sidecar: valid geometry, honest not-HDR
        info = probe_media(path)
        assert (info.width, info.height, info.frame_count) == (64, 32, 4)
        assert abs(info.fps - 25.0) < 1e-6
        assert not info.is_hdr
        # with the sidecar: PQ/BT.2020 detected
        with open(path + ".json", "w") as f:
            json.dump(_y4m_sidecar(path), f)
        info = probe_media(path)
        assert info.is_hdr and info.color_transfer == "smpte2084"
        assert info.pix_fmt == "yuv422p10"
        # corrupt (non-UTF8) sidecar: optional metadata must degrade, not
        # knock the whole probe off the native path (review fix)
        with open(path + ".json", "wb") as f:
            f.write(b"\xff\xfe\x00garbage")
        info = probe_media(path)
        assert (info.width, info.height) == (64, 32)  # still native-parsed
        assert not info.is_hdr

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


class TestLiveAudioDelayPolicy:
    def test_default_and_clamps(self, monkeypatch):
        from hdrtv_tpu.pipeline.audio import live_audio_delay_target_ms

        assert live_audio_delay_target_ms() == 95.0  # default target
        # hint + margin, clamped to [min, max]
        assert live_audio_delay_target_ms(200.0) == 210.0
        assert live_audio_delay_target_ms(10.0) == 70.0   # min clamp
        assert live_audio_delay_target_ms(5000.0) == 650.0  # max clamp

    def test_tab_floor(self):
        from hdrtv_tpu.pipeline.audio import live_audio_delay_target_ms

        # tab-sourced audio never targets below the tab floor (80)
        assert live_audio_delay_target_ms(50.0, tab_audio=True) == 80.0
        assert live_audio_delay_target_ms(50.0, tab_audio=False) == 70.0

    def test_env_overrides(self, monkeypatch):
        from hdrtv_tpu.pipeline.audio import live_audio_delay_target_ms

        monkeypatch.setenv("HDRTVNET_LIVE_AUDIO_MAX_DELAY_MS", "300")
        monkeypatch.setenv("HDRTVNET_LIVE_AUDIO_DELAY_MARGIN_MS", "50")
        assert live_audio_delay_target_ms(280.0) == 300.0


class TestShellStatusInterval:
    def test_default_and_floor(self, monkeypatch):
        from hdrtv_tpu.pipeline.shell import status_interval_s

        assert status_interval_s() == 0.9
        monkeypatch.setenv("HDRTVNET_PLAYBACK_STATUS_MS", "100")
        assert status_interval_s() == 0.25  # 250 ms floor


class TestEnvDocsComplete:
    def test_every_env_var_documented(self):
        """Every HDRTVNET_* var the package reads appears in ENV_VARS.md —
        the catalog is the contract (reference README env catalog role)."""
        import glob
        import os
        import re

        root = os.path.join(os.path.dirname(__file__), "..")
        used = set()
        for p in glob.glob(os.path.join(root, "hdrtv_tpu", "**", "*.py"), recursive=True):
            with open(p) as f:
                text = f.read()
            # only vars actually read via env helpers / os.environ — skip
            # docstring prose mentions
            for m in re.finditer(r"env_\w+\(\s*\"(HDRTVNET_[A-Z0-9_]+)\"|os\.environ\.get\(\s*\"(HDRTVNET_[A-Z0-9_]+)\"", text):
                used.add(m.group(1) or m.group(2))
        with open(os.path.join(root, "ENV_VARS.md")) as f:
            doc = f.read()
        # combined rows document suffix families as `BASE_A / _B`; expand
        doc_vars = set(re.findall(r"HDRTVNET_[A-Z0-9_]+", doc))
        for m in re.finditer(r"`(HDRTVNET_[A-Z0-9_]+)`((?:\s*/\s*`_[A-Z0-9_]+`)+)", doc):
            base = m.group(1)
            for suf in re.findall(r"`(_[A-Z0-9_]+)`", m.group(2)):
                doc_vars.add(base + suf)  # append form: SAMPLES / _STRICT
                n = suf.count("_")  # replace form: _MIN_DELAY_MS / _MAX_DELAY_MS
                doc_vars.add("_".join(base.split("_")[:-n]) + suf)
        missing = sorted(used - doc_vars)
        assert not missing, f"undocumented env vars: {missing}"
