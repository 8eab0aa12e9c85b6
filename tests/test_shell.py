"""Interactive shell controller — key mapping, control routing, status line."""

import numpy as np


class _FakeRunner:
    def __init__(self):
        self.calls = []

    def pause(self):
        self.calls.append(("pause",))

    def resume(self):
        self.calls.append(("resume",))

    def request_seek(self, f):
        self.calls.append(("seek", f))

    def request_precision_change(self, p):
        self.calls.append(("precision", p))

    def request_resolution_change(self, wh):
        self.calls.append(("resolution", wh))

    def stop(self):
        self.calls.append(("stop",))


class _FakeAudio:
    def __init__(self):
        self.calls = []

    def pause(self, p):
        self.calls.append(("pause", p))

    def seek(self, s):
        self.calls.append(("seek", s))

    def set_gain(self, g):
        self.calls.append(("gain", g))


class _FakeSource:
    fps = 30.0


def _controller(audio=None):
    from hdrtv_tpu.pipeline.shell import ShellController

    return ShellController(
        _FakeRunner(), _FakeSource(), audio=audio,
        precisions=("fp16", "int8"), resolutions=("720p", "1080p"),
        precision="fp16", resolution="1080p",
    )


class TestShellController:
    def test_pause_resume_round_trip(self):
        c = _controller(audio=_FakeAudio())
        assert c.handle_key(" ") == "paused"
        assert c.paused and ("pause",) in c.runner.calls
        assert ("pause", True) in c.audio.calls
        assert c.handle_key(" ") == "resumed"
        assert not c.paused and ("resume",) in c.runner.calls

    def test_seek_keys_move_by_5s_and_1_frame(self):
        c = _controller(audio=_FakeAudio())
        c.position_frame = 300
        c.handle_key("RIGHT")
        assert ("seek", 450) in c.runner.calls  # +5 s at 30 fps
        assert ("seek", 15.0) in c.audio.calls  # audio follows in seconds
        c.handle_key(",")
        assert ("seek", 449) in c.runner.calls  # −1 frame scrub
        c.position_frame = 10
        c.handle_key("LEFT")
        assert ("seek", 0) in c.runner.calls  # clamped at 0

    def test_precision_resolution_cycling(self):
        from hdrtv_tpu.config import processing_dims

        c = _controller()
        assert c.handle_key("p") == "precision → int8"
        assert ("precision", "int8") in c.runner.calls
        c.handle_key("p")
        assert c.precision == "fp16"  # wraps around
        assert c.handle_key("r") == "resolution → 720p"
        assert ("resolution", processing_dims("720p")) in c.runner.calls

    def test_mute_toggle(self):
        c = _controller(audio=_FakeAudio())
        c.handle_key("m")
        assert ("gain", 0.0) in c.audio.calls
        c.handle_key("m")
        assert ("gain", 1.0) in c.audio.calls

    def test_quit_stops_runner(self):
        c = _controller()
        assert c.handle_key("q") == "quit"
        assert c.quit_requested and ("stop",) in c.runner.calls

    def test_unknown_key_is_noop(self):
        c = _controller()
        assert c.handle_key("z") is None
        assert c.runner.calls == []

    def test_status_line_renders_metrics(self):
        from hdrtv_tpu.pipeline.runner import RuntimeMetrics

        c = _controller()
        assert "---" in c.status_line()  # no metrics yet
        c.on_metrics(RuntimeMetrics(fps=42.5, frames=120, dropped=3))
        line = c.status_line()
        assert "42.5" in line and "f120" in line and "drop 3" in line
        assert "fp16/1080p" in line
        c.handle_key(" ")
        assert "PAUSED" in c.status_line()

    def test_works_without_audio(self):
        c = _controller(audio=None)
        c.handle_key(" ")
        c.handle_key("RIGHT")
        c.handle_key("m")  # no crash without a device
        assert c.muted


class TestUpscalerHotSwap:
    def test_cycle_applies_to_sink(self):
        from hdrtv_tpu.pipeline.shell import ShellController

        calls = []

        class Sink:
            def set_scale(self, upscaler, **kw):
                calls.append(upscaler)
                return True

        class Runner:
            sink = Sink()

            def stop(self):
                pass

        ctl = ShellController(Runner(), source=None)
        msg = ctl.handle_key("u")
        assert "fsr" in msg and calls == ["fsr"]
        ctl.handle_key("u")
        assert calls[-1] == "ssim_superres"

    def test_cycle_without_mpv_pane(self):
        from hdrtv_tpu.pipeline.shell import ShellController

        class Runner:
            sink = object()  # null sink: no set_scale

            def stop(self):
                pass

        ctl = ShellController(Runner(), source=None)
        assert "no mpv pane" in ctl.handle_key("u")
