"""AudioPlayer device binding (fake-mpv IPC harness) + runner metrics cadence."""

import json
import os
import stat
import time

import numpy as np
import pytest

# Fake mpv: parses --input-ipc-server=..., serves the unix socket with a tiny
# python server that appends每 received command line to <sock>.log.
FAKE_MPV = r"""#!/usr/bin/env python3
import socket, sys, time
ipc = None
for a in sys.argv[1:]:
    if a.startswith("--input-ipc-server="):
        ipc = a.split("=", 1)[1]
if ipc is None:
    time.sleep(30); sys.exit(0)
srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
srv.bind(ipc)
srv.listen(1)
conn, _ = srv.accept()
with open(ipc + ".log", "ab", buffering=0) as log:
    while True:
        data = conn.recv(4096)
        if not data:
            break
        log.write(data)
"""


@pytest.fixture()
def fake_mpv(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    mpv = bindir / "mpv"
    mpv.write_text(FAKE_MPV.replace("每", " "))
    mpv.chmod(mpv.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return bindir


class TestAudioPlayer:
    def _read_log(self, player, timeout=5.0):
        log = player.ipc_path + ".log"
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if os.path.exists(log) and os.path.getsize(log):
                time.sleep(0.1)  # let trailing writes land
                with open(log) as f:
                    return [json.loads(line) for line in f if line.strip()]
            time.sleep(0.02)
        return []

    def test_volume_commands_reach_ipc(self, fake_mpv, tmp_path):
        from hdrtv_tpu.pipeline.audio import AudioPlayer

        media = tmp_path / "clip.mp4"
        media.write_bytes(b"x")
        p = AudioPlayer(str(media))
        try:
            assert p.set_gain(0.5)
            assert p.pause(True)
            assert p.seek(3.25)
            cmds = self._read_log(p)
        finally:
            p.close()
        names = [c["command"][0] for c in cmds]
        assert names == ["set_property", "set_property", "seek"]
        assert cmds[0]["command"][1:] == ["volume", 50.0]
        assert cmds[1]["command"][1:] == ["pause", True]
        assert cmds[2]["command"] == ["seek", 3.25, "absolute"]

    def test_attachment_drives_player(self, fake_mpv, tmp_path):
        from hdrtv_tpu.pipeline.audio import AudioAttachment, AudioPlayer, AutoMutePolicy

        media = tmp_path / "clip.mp4"
        media.write_bytes(b"x")
        p = AudioPlayer(str(media))
        try:
            attach = AudioAttachment(AutoMutePolicy(unstable_need=2), p.set_gain)
            for fps in (30.0, 3.0, 25.0, 2.0, 20.0):  # sustained instability → mute
                attach.on_metrics(fps)
            cmds = self._read_log(p)
        finally:
            p.close()
        assert any(c["command"][:2] == ["set_property", "volume"] and c["command"][2] == 0.0 for c in cmds)

    def test_missing_mpv_raises(self, monkeypatch, tmp_path):
        from hdrtv_tpu.pipeline.audio import AudioPlayer

        monkeypatch.setenv("PATH", str(tmp_path))  # no mpv anywhere
        with pytest.raises(RuntimeError, match="mpv not found"):
            AudioPlayer("x.mp4")


class TestRunnerMetricsCallback:
    def test_periodic_emission(self):
        from hdrtv_tpu.pipeline.runner import PipelineRunner
        from hdrtv_tpu.pipeline.source import SyntheticSource

        class _Proc:
            def process_rgb48_device(self, flat_u8):
                import jax.numpy as jnp

                return flat_u8.astype(jnp.uint16)

        class _Sink:
            def show(self, *a):
                pass

        snaps = []
        src = SyntheticSource(64, 32, fps=120, frames=90)
        r = PipelineRunner(src, _Proc(), _Sink(), realtime=True, max_frames=90,
                           on_metrics=snaps.append)
        r.run()
        # ~0.75 s of media at 0.2 s throttle → a few snapshots, each monotone
        assert len(snaps) >= 2
        assert all(s.frames <= 90 for s in snaps)
        assert snaps[-1].frames > snaps[0].frames


class TestRunnerStageTimers:
    def test_stages_populated(self, capsys):
        from hdrtv_tpu.pipeline.runner import PipelineRunner
        from hdrtv_tpu.pipeline.source import SyntheticSource

        class _Proc:
            def process_rgb48_device(self, flat_u8):
                import jax.numpy as jnp

                return flat_u8.astype(jnp.uint16)

        class _Sink:
            def show(self, *a):
                pass

        r = PipelineRunner(SyntheticSource(64, 32, fps=1000, frames=6), _Proc(), _Sink(),
                           realtime=False, max_frames=6)
        r.run()
        d = r.timers.as_dict()
        assert set(d) >= {"decode", "submit", "render"}
        assert d["decode"]["count"] >= 6 and d["render"]["count"] == 6
        report = r.timers.report()
        assert "decode" in report and "p99" in report


class TestAudioDelay:
    """Audio delay (the reference's 0-2000 ms slider, README.md:250):
    playhead-offset mapping in the split-process audio player."""

    def test_delay_offsets_start_and_seek(self, fake_mpv, tmp_path):
        from hdrtv_tpu.pipeline.audio import AudioPlayer

        media = tmp_path / "clip.mp4"
        media.write_bytes(b"x")
        p = AudioPlayer(str(media), start_s=5.0, delay_ms=500)
        try:
            assert "--start=4.500" in p.proc.args
            p.seek(10.0)
            p.seek(0.1)  # clamped at 0
            cmds = TestAudioPlayer._read_log(self, p)
        finally:
            p.close()
        seeks = [c["command"] for c in cmds if c["command"][0] == "seek"]
        assert ["seek", 9.5, "absolute"] in seeks
        assert ["seek", 0.0, "absolute"] in seeks

    def test_set_delay_shifts_relative(self, fake_mpv, tmp_path):
        from hdrtv_tpu.pipeline.audio import AudioPlayer

        media = tmp_path / "clip.mp4"
        media.write_bytes(b"x")
        p = AudioPlayer(str(media), delay_ms=0)
        try:
            assert p.set_delay(400)      # 0 → 0.4 s: playhead back 0.4
            assert p.set_delay(400)      # no-op
            assert p.set_delay(9999)     # clamps to 2.0 s: back 1.6 more
            cmds = TestAudioPlayer._read_log(self, p)
        finally:
            p.close()
        rel = [c["command"] for c in cmds if c["command"][0] == "seek"
               and c["command"][2] == "relative"]
        assert len(rel) == 2
        assert abs(rel[0][1] + 0.4) < 1e-9
        assert abs(rel[1][1] + 1.6) < 1e-9
        # delay is clamped to the slider range
        assert p.delay_s == 2.0
