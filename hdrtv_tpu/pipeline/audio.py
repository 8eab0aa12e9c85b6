"""Audio attach + auto-mute policy.

The reference attaches a Qt audio track to playback and auto-mutes when
pipeline FPS falls below a threshold, restoring with a fade-in
(gui_audio_playback.py / gui_audio_mute.py). The *policy* is platform-free
and lives here: an FPS-window monitor deciding mute state and a fade-in gain
ramp; the actual audio device binding is a thin callback (none in headless
environments).
"""

from __future__ import annotations

import dataclasses
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
