"""Audio attach + auto-mute policy + the mpv audio player binding.

The reference attaches a Qt audio track to playback and auto-mutes when
pipeline FPS falls below a threshold, restoring with a fade-in
(gui_audio_playback.py / gui_audio_mute.py). The *policy* is platform-free:
an FPS-window monitor deciding mute state and a fade-in gain ramp.
``AudioPlayer`` is the actual device binding — an audio-only mpv process
playing the source's audio track, volume-controlled live over mpv's JSON
IPC socket so the fade ramp is audible.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import socket
import subprocess
import tempfile
import time
from typing import Callable

from hdrtv_tpu.utils.env import env_float


@dataclasses.dataclass
class AutoMutePolicy:
    """Mute when smoothed FPS dips below ``mute_below`` of target; unmute
    with a linear fade once it recovers above ``unmute_above``."""

    target_fps: float
    mute_below: float = env_float("HDRTVNET_AUDIO_MUTE_FPS_RATIO", 0.85, lo=0.1, hi=1.0)
    unmute_above: float = 0.95
    fade_in_s: float = env_float("HDRTVNET_AUDIO_FADE_IN_S", 0.6, lo=0.0, hi=5.0)
    window: int = 12

    def __post_init__(self):
        self._samples: list[float] = []
        self.muted = False
        self._fade_start: float | None = None

    def update(self, fps_sample: float, now: float | None = None) -> float:
        """Feed an FPS sample; returns current gain in [0,1]."""
        now = time.monotonic() if now is None else now
        self._samples.append(fps_sample)
        if len(self._samples) > self.window:
            self._samples.pop(0)
        smoothed = sum(self._samples) / len(self._samples)
        ratio = smoothed / max(1e-6, self.target_fps)

        if not self.muted and ratio < self.mute_below:
            self.muted = True
            self._fade_start = None
        elif self.muted and ratio > self.unmute_above:
            self.muted = False
            self._fade_start = now

        if self.muted:
            return 0.0
        if self._fade_start is not None:
            t = now - self._fade_start
            if t >= self.fade_in_s:
                self._fade_start = None
                return 1.0
            return max(0.0, min(1.0, t / max(1e-6, self.fade_in_s)))
        return 1.0


class AudioAttachment:
    """Binds the policy to a gain callback (e.g. an mpv --volume setter)."""

    def __init__(self, policy: AutoMutePolicy, set_gain: Callable[[float], None] | None = None):
        self.policy = policy
        self.set_gain = set_gain or (lambda g: None)
        self.gain = 1.0

    def on_metrics(self, fps: float) -> float:
        g = self.policy.update(fps)
        if g != self.gain:
            self.gain = g
            self.set_gain(g)
        return g


class AudioPlayer:
    """Audio-only mpv bound to the source file — the audio attach device
    (gui_audio_playback.py role). ``set_gain`` drives mpv's volume property
    over the JSON IPC socket (``--input-ipc-server``), so the auto-mute fade
    is applied live; ``track`` selects an ``--aid`` from
    :func:`hdrtv_tpu.runtime.probe.probe_audio_streams` ordinals."""

    def __init__(self, media_path: str, *, track: int | None = None, start_s: float = 0.0,
                 volume: float = 1.0, delay_ms: float = 0.0):
        if shutil.which("mpv") is None:
            raise RuntimeError("mpv not found on PATH")
        self.media_path = media_path
        # audio-delay: positive values make the audio lag the video by that
        # much (the reference's 0-2000 ms slider, README.md:250). With a
        # separate audio-only mpv there is no shared clock, so the delay is
        # applied as a playhead offset: every absolute position maps to
        # position - delay.
        self.delay_s = max(0.0, min(2.0, float(delay_ms) / 1000.0))
        self._dir = tempfile.mkdtemp(prefix="hdrtv_audio_")
        self.ipc_path = os.path.join(self._dir, "mpv.sock")
        args = [
            "mpv", "--no-config", "--no-video", "--keep-open=no",
            f"--input-ipc-server={self.ipc_path}",
            f"--volume={max(0.0, min(1.0, volume)) * 100:.0f}",
        ]
        if track is not None:
            args.append(f"--aid={int(track) + 1}")  # mpv track ids are 1-based
        eff_start = max(0.0, start_s - self.delay_s)
        if eff_start > 0:
            args.append(f"--start={eff_start:.3f}")
        self.proc = subprocess.Popen(
            [*args, media_path],
            stdin=subprocess.DEVNULL, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        self._sock: socket.socket | None = None

    def _ipc(self, command: list) -> bool:
        try:
            if self._sock is None:
                deadline = time.monotonic() + 5.0
                while not os.path.exists(self.ipc_path):
                    if self.proc.poll() is not None or time.monotonic() > deadline:
                        return False
                    time.sleep(0.02)
                self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                self._sock.connect(self.ipc_path)
            self._sock.sendall((json.dumps({"command": command}) + "\n").encode())
            return True
        except OSError:
            self._sock = None
            return False

    def set_gain(self, gain: float) -> bool:
        """[0,1] gain → mpv volume 0-100 (the AudioAttachment callback)."""
        return self._ipc(["set_property", "volume", max(0.0, min(1.0, gain)) * 100.0])

    def pause(self, paused: bool = True) -> bool:
        return self._ipc(["set_property", "pause", bool(paused)])

    def seek(self, seconds: float) -> bool:
        return self._ipc(["seek", max(0.0, float(seconds) - self.delay_s), "absolute"])

    def set_delay(self, delay_ms: float) -> bool:
        """Live delay change (the slider): shift the playhead by the delta so
        the new offset takes effect without a full reseek from the caller."""
        new = max(0.0, min(2.0, float(delay_ms) / 1000.0))
        delta = self.delay_s - new  # more delay → playhead moves back
        self.delay_s = new
        if abs(delta) < 1e-6:
            return True
        return self._ipc(["seek", delta, "relative"])

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=2.0)
            except subprocess.TimeoutExpired:
                self.proc.kill()
        shutil.rmtree(self._dir, ignore_errors=True)
