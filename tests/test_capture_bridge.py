"""Capture grabber backends + browser audio-sync bridge."""

import json
import os
import urllib.request

import numpy as np
import pytest


class TestMatchScoring:
    def test_wid_dominates(self):
        from hdrtv_tpu.pipeline.capture import WindowTarget, target_match_score

        ref = WindowTarget(title="Netflix", wid=42, pid=100)
        same_wid = WindowTarget(title="other", wid=42)
        same_title = WindowTarget(title="Netflix", wid=7, pid=100)
        assert target_match_score(same_wid, ref) > target_match_score(same_title, ref)

    def test_title_substring_scores_lower_than_exact(self):
        from hdrtv_tpu.pipeline.capture import WindowTarget, target_match_score

        ref = WindowTarget(title="Daredevil - Netflix")
        exact = WindowTarget(title="daredevil - netflix")  # case-normalized
        sub = WindowTarget(title="Netflix")
        assert target_match_score(exact, ref) > target_match_score(sub, ref) > 0

    def test_no_overlap_is_minus_one(self):
        from hdrtv_tpu.pipeline.capture import WindowTarget, target_match_score

        assert target_match_score(WindowTarget(title="a"), WindowTarget(title="b")) == -1
        assert target_match_score(None, WindowTarget()) == -1

    def test_find_best(self):
        from hdrtv_tpu.pipeline.capture import (
            WindowTarget,
            find_best_matching_target,
        )

        ref = WindowTarget(title="Player", pid=5)
        cands = [
            WindowTarget(title="Editor", pid=9),
            WindowTarget(title="Player", pid=5),
            WindowTarget(title="play", pid=2),
        ]
        assert find_best_matching_target(cands, ref) is cands[1]
        assert find_best_matching_target([], ref) is None


class TestPixelConversions:
    def test_bgra_to_bgr(self):
        from hdrtv_tpu.pipeline.capture import bgra_to_bgr

        h, w = 4, 6
        rng = np.random.RandomState(0)
        px = rng.randint(0, 256, size=(h, w, 4), dtype=np.uint8)
        out = bgra_to_bgr(px.tobytes(), w, h)
        np.testing.assert_array_equal(out, px[..., :3])

    def test_yuyv_gray_ramp(self):
        """Y-only YUYV (U=V=128) must decode to a neutral gray ramp."""
        from hdrtv_tpu.pipeline.capture import yuyv_to_bgr

        h, w = 2, 8
        y = np.linspace(16, 235, w, dtype=np.uint8)
        buf = np.empty((h, w, 2), np.uint8)
        buf[..., 0] = y[None, :]
        buf[..., 1] = 128
        out = yuyv_to_bgr(buf.tobytes(), w, h)
        assert out.shape == (h, w, 3)
        # neutral: all three channels equal
        assert np.abs(out.astype(int)[..., 0] - out.astype(int)[..., 1]).max() <= 1
        # studio-range endpoints map to ~0 / ~255
        assert out[0, 0, 0] <= 2 and out[0, -1, 0] >= 253

    def test_yuyv_red(self):
        """Pure-red YUYV sample decodes to red-dominant BGR."""
        from hdrtv_tpu.pipeline.capture import yuyv_to_bgr

        # BT.601: red (255,0,0) → Y≈81, U≈90, V≈240
        buf = np.array([[[81, 90], [81, 240]]], np.uint8)  # one YUYV macropixel
        out = yuyv_to_bgr(buf.tobytes(), 2, 1)
        b, g, r = out[0, 0]
        assert r > 200 and g < 60 and b < 60


class TestGrabberFactory:
    def test_synthetic_spec(self):
        from hdrtv_tpu.pipeline.capture import make_grabber

        g = make_grabber("synthetic")
        f = g()
        assert f.dtype == np.uint8 and f.ndim == 3

    def test_auto_falls_back_to_synthetic(self, monkeypatch):
        from hdrtv_tpu.pipeline.capture import make_grabber

        monkeypatch.delenv("DISPLAY", raising=False)
        g = make_grabber(None)  # no X, (likely) no /dev/video0 → synthetic
        assert g() is not None

    def test_explicit_missing_v4l2_raises(self):
        from hdrtv_tpu.pipeline.capture import make_grabber

        with pytest.raises(RuntimeError):
            make_grabber("v4l2:/dev/video99")

    def test_unknown_spec_raises(self):
        from hdrtv_tpu.pipeline.capture import make_grabber

        with pytest.raises(ValueError):
            make_grabber("directshow")

    @pytest.mark.skipif(not os.environ.get("DISPLAY"), reason="no X display")
    def test_x11_root_grab(self):
        from hdrtv_tpu.pipeline.capture import X11Grabber

        g = X11Grabber()
        f = g()
        g.close()
        assert f is not None and f.ndim == 3

    def test_live_source_with_factory_grabber(self):
        from hdrtv_tpu.pipeline.capture import make_grabber
        from hdrtv_tpu.pipeline.live import LiveSource

        with LiveSource(make_grabber("synthetic"), process_fps=60.0) as src:
            meta = src.read_with_meta()
            assert meta is not None
            frame, idx, pts = meta
            assert frame.dtype == np.uint8 and idx == 0


def _req(url, method="GET", payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


class TestAudioSyncBridge:
    @pytest.fixture()
    def bridge(self):
        from hdrtv_tpu.pipeline.bridge import AudioSyncBridge

        b = AudioSyncBridge(port=0)  # ephemeral port
        with b:
            yield b

    def test_health_and_session_lifecycle(self, bridge):
        base = bridge.address()
        st, body = _req(f"{base}/health")
        assert st == 200 and body["ok"] and body["session_count"] == 0

        st, body = _req(f"{base}/session/start", "POST", {
            "title": "Daredevil - Netflix", "fps": 60, "has_audio": True, "width": 1920, "height": 1080,
        })
        assert st == 200 and body["ok"]
        sid = body["session_id"]

        st, body = _req(f"{base}/sessions")
        assert st == 200 and len(body["sessions"]) == 1
        sess = body["sessions"][0]
        assert sess["title"] == "Daredevil - Netflix" and sess["has_audio"] is True

        st, body = _req(f"{base}/session/{sid}/keepalive", "POST", {"has_audio": False})
        assert st == 200 and body["ok"] and body["has_audio"] is False

        st, body = _req(f"{base}/session/{sid}/stop", "POST", {})
        assert st == 200

        # late keepalive after close → 410 GONE (revocation contract,
        # browser_tab_bridge.py keepalive SessionClosedError path)
        st, body = _req(f"{base}/session/{sid}/keepalive", "POST", {})
        assert st == 410 and not body["ok"]

    def test_unknown_routes_404(self, bridge):
        base = bridge.address()
        assert _req(f"{base}/nope")[0] == 404
        assert _req(f"{base}/session/zz/frobnicate", "POST", {})[0] == 404

    def test_session_expiry(self, bridge):
        bridge.upsert_session({"session_id": "old", "title": "t"})
        with bridge._lock:
            bridge._sessions["old"].last_seen -= bridge.timeout_s + 1
        bridge._expire()
        assert bridge.list_sessions() == []

    def test_upsert_merges(self, bridge):
        a = bridge.upsert_session({"session_id": "s1", "title": "A", "width": 100})
        b = bridge.upsert_session({"session_id": "s1", "height": 50})
        assert b.title == "A" and b.width == 100 and b.height == 50
        assert a.session_id == b.session_id
