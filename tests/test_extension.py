"""Browser extension ↔ bridge protocol contract (static checks)."""

import json
import os

EXT = os.path.join(os.path.dirname(__file__), "..", "extension")


class TestExtension:
    def test_manifest_is_valid_mv3(self):
        with open(os.path.join(EXT, "manifest.json")) as f:
            m = json.load(f)
        assert m["manifest_version"] == 3
        assert "tabCapture" in m["permissions"] and "offscreen" in m["permissions"]
        assert m["background"]["service_worker"] == "background.js"
        assert any("127.0.0.1" in h for h in m["host_permissions"])

    def test_offscreen_speaks_the_bridge_protocol(self):
        """The endpoints the extension calls must be the ones AudioSyncBridge
        serves (pipeline/bridge.py routes)."""
        with open(os.path.join(EXT, "offscreen.js")) as f:
            js = f.read()
        assert "/session/start" in js
        assert "/keepalive" in js
        assert "/stop" in js
        assert "410" in js  # revocation handling (SessionClosedError → GONE)
        # default port matches the bridge default (HDRTVNET_TAB_BRIDGE_PORT)
        from hdrtv_tpu.pipeline.bridge import AudioSyncBridge

        assert str(AudioSyncBridge().port) in js

    def test_keepalive_beats_session_timeout(self):
        """The keepalive cadence must be well under the bridge expiry."""
        with open(os.path.join(EXT, "offscreen.js")) as f:
            js = f.read()
        import re

        ka = int(re.search(r"KEEPALIVE_MS = (\d+)", js).group(1))
        from hdrtv_tpu.pipeline.bridge import AudioSyncBridge

        assert ka / 1000.0 < AudioSyncBridge().timeout_s / 2

    def test_all_files_present(self):
        for name in ("background.js", "offscreen.js", "offscreen.html", "popup.js", "popup.html"):
            assert os.path.isfile(os.path.join(EXT, name)), name
