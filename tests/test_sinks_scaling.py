"""Display scaling policy + mpv sink startup ladder / SDR pane routing."""

import os
import stat

import numpy as np
import pytest


class TestScalingPolicy:
    def test_fit_with_aspect_never_upscales(self):
        from hdrtv_tpu.pipeline.scaling import fit_with_aspect

        assert fit_with_aspect(1920, 1080, 1280, 720) == (1280, 720)
        assert fit_with_aspect(640, 360, 1920, 1080) == (640, 360)  # no upscale
        w, h = fit_with_aspect(1921, 1080, 1280, 720)
        assert w % 2 == 0 and h % 2 == 0

    def test_kernel_selection(self):
        from hdrtv_tpu.pipeline.scaling import select_scale_kernel

        # no upscale → bicubic (gui_scaling.py:69-80)
        assert select_scale_kernel(1920, 1080, 1920, 1080) == "bicubic"
        assert select_scale_kernel(1280, 720, 3840, 2160, "FSR") == "fsr"
        assert select_scale_kernel(1280, 720, 3840, 2160, "SSimSuperRes") == "ssim_superres"
        assert select_scale_kernel(1280, 720, 3840, 2160) == "ewa_lanczossharp"

    def test_antiring_tiers(self):
        from hdrtv_tpu.pipeline.scaling import select_scale_antiring

        assert select_scale_antiring(1920, 1080, 1920, 1080) == 0.0
        # FSR >2x from 720p → 0.16; ≤2x → 0 (gui_scaling.py:90-99)
        assert select_scale_antiring(1280, 720, 3840, 2160, "fsr") == 0.16
        assert select_scale_antiring(1280, 720, 1920, 1080, "fsr") == 0.0
        # 540p lanczossharp: base 0.30 − 0.05
        assert select_scale_antiring(960, 540, 1920, 1080, "ewa_lanczossharp") == 0.25
        assert select_scale_antiring(1280, 720, 1920, 1080, "bicubic") == 0.22

    def test_cas_strength(self):
        from hdrtv_tpu.pipeline.scaling import select_cas_strength

        assert select_cas_strength(1920, 1080, 1920, 1080) == 0.0
        assert select_cas_strength(1280, 720, 3840, 2160, using_fsr=True) == 0.0
        assert select_cas_strength(960, 540, 1920, 1080, scale_kernel="ewa_lanczossharp") == pytest.approx(0.24)

    def test_mpv_args(self):
        from hdrtv_tpu.pipeline.scaling import mpv_scale_args

        args = mpv_scale_args(960, 540, 1920, 1080)
        assert args[0] == "--scale=ewa_lanczossharp"
        assert any(a.startswith("--scale-antiring=") for a in args)
        same = mpv_scale_args(1920, 1080, 1920, 1080)
        assert same[0] == "--scale=bicubic"
        # dscale policy rides along unconditionally (gui_mpv_widget.py:571-574)
        assert "--dscale=mitchell" in same
        assert "--dscale-antiring=0.20" in same

    def test_dscale_env_overrides(self, monkeypatch):
        from hdrtv_tpu.pipeline.scaling import mpv_scale_args

        monkeypatch.setenv("HDRTVNET_MPV_DSCALE", "hermite")
        args = mpv_scale_args(1920, 1080, 1920, 1080)
        assert "--dscale=hermite" in args
        # SDR pane keeps its own kernel var with a plain mitchell default —
        # it does NOT inherit the HDR override (gui_mpv_widget.py:205-212)
        sdr = mpv_scale_args(1920, 1080, 1920, 1080, hdr=False)
        assert "--dscale=mitchell" in sdr
        monkeypatch.setenv("HDRTVNET_MPV_SDR_DSCALE", "off")
        sdr2 = mpv_scale_args(1920, 1080, 1920, 1080, hdr=False)
        assert not any(a.startswith("--dscale") for a in sdr2)

    def test_shader_chain_when_glsl_present(self, tmp_path):
        from hdrtv_tpu.pipeline.scaling import mpv_scale_args

        (tmp_path / "FSR.glsl").write_text("// fsr")
        args = mpv_scale_args(1280, 720, 3840, 2160, "FSR", shader_dir=str(tmp_path))
        assert any(a.startswith("--glsl-shader=") and a.endswith("FSR.glsl") for a in args)
        # FSR residual scale = ewa_lanczossharp (gui_mpv_widget.py:595-600)
        assert "--scale=ewa_lanczossharp" in args
        (tmp_path / "SSimSuperRes.glsl").write_text("// s")
        args_ssim = mpv_scale_args(1280, 720, 3840, 2160, "SSimSuperRes", shader_dir=str(tmp_path))
        # SSimSuperRes pairs with spline36 (gui_mpv_widget.py:588-590)
        assert "--scale=spline36" in args_ssim
        # absent shader → EWA fallback, no shader flag
        args2 = mpv_scale_args(1280, 720, 3840, 2160, "FSR", shader_dir=str(tmp_path / "nope"))
        assert not any(a.startswith("--glsl-shader") for a in args2)
        assert "--scale=ewa_lanczossharp" in args2

    def test_shader_chain_order_and_film_grain(self, tmp_path, monkeypatch):
        from hdrtv_tpu.pipeline.scaling import mpv_scale_args, shader_chain

        for name in ("SSimDownscaler.glsl", "FSR.glsl", "filmgrain.glsl"):
            (tmp_path / name).write_text("// s")
        chain = shader_chain("fsr", film_grain=True, shader_dir=str(tmp_path))
        # reference order: SSimDownscaler → upscaler → film grain
        # (gui_mpv_widget.py:371-388 _build_shader_paths)
        assert [p.rsplit("/", 1)[1] for p in chain] == [
            "SSimDownscaler.glsl", "FSR.glsl", "filmgrain.glsl",
        ]
        args = mpv_scale_args(
            1280, 720, 3840, 2160, "FSR", shader_dir=str(tmp_path), film_grain=True
        )
        shaders = [a for a in args if a.startswith("--glsl-shader=")]
        assert len(shaders) == 3 and shaders[-1].endswith("filmgrain.glsl")
        # HDRTVNET_MPV_SSIM_DOWNSCALER=0 drops the downscaler entry
        monkeypatch.setenv("HDRTVNET_MPV_SSIM_DOWNSCALER", "0")
        chain2 = shader_chain("fsr", film_grain=True, shader_dir=str(tmp_path))
        assert [p.rsplit("/", 1)[1] for p in chain2] == ["FSR.glsl", "filmgrain.glsl"]
        # film grain alone needs no upscale shader
        chain3 = shader_chain("bicubic", film_grain=True, shader_dir=str(tmp_path))
        assert [p.rsplit("/", 1)[1] for p in chain3] == ["filmgrain.glsl"]

    def test_letterbox(self):
        from hdrtv_tpu.pipeline.scaling import letterbox_bgr

        frame = np.full((100, 100, 3), 200, np.uint8)  # square into 16:9
        out = letterbox_bgr(frame, 192, 108)
        assert out.shape == (108, 192, 3)
        assert out[:, 0].max() == 0 and out[:, -1].max() == 0  # side bars
        assert out[54, 96].min() > 150  # center content
        assert letterbox_bgr(frame, 100, 100) is frame


FAKE_MPV = """#!/bin/sh
# fake mpv: refuses quality options {refuse}, else consumes the fifo
for a in "$@"; do
  case "$a" in {refuse}) exit 1;; esac
done
eval last=\\${{$#}}
exec cat "$last" > /dev/null
"""


def _install_fake_mpv(tmp_path, monkeypatch, refuse: str):
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    mpv = bindir / "mpv"
    mpv.write_text(FAKE_MPV.format(refuse=refuse))
    mpv.chmod(mpv.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")


class TestMpvLadder:
    def test_full_quality_startup(self, tmp_path, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import MpvPipeSink

        _install_fake_mpv(tmp_path, monkeypatch, refuse="--never-refused")
        sink = MpvPipeSink(64, 32, 30.0)
        try:
            assert sink.startup_notes == []
            sink.show(np.zeros((32, 64, 3), np.uint16))
        finally:
            sink.close()

    def test_dither_fallback(self, tmp_path, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import MpvPipeSink

        _install_fake_mpv(tmp_path, monkeypatch, refuse="--dither*")
        sink = MpvPipeSink(64, 32, 30.0)
        try:
            assert sink.startup_notes and "dither" in sink.startup_notes[0]
        finally:
            sink.close()

    def test_deband_fallback(self, tmp_path, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import MpvPipeSink

        _install_fake_mpv(tmp_path, monkeypatch, refuse="--dither*|--deband*")
        sink = MpvPipeSink(64, 32, 30.0)
        try:
            assert any("deband" in n for n in sink.startup_notes)
        finally:
            sink.close()

    def test_total_failure_raises_not_hangs(self, tmp_path, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import MpvPipeSink

        _install_fake_mpv(tmp_path, monkeypatch, refuse="*")  # refuses everything
        with pytest.raises(RuntimeError, match="mpv startup failed"):
            MpvPipeSink(64, 32, 30.0)

    def test_make_sink_falls_back_to_null(self, tmp_path, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import NullSink, make_sink

        _install_fake_mpv(tmp_path, monkeypatch, refuse="*")
        sink = make_sink("mpv", 64, 32, 30.0)
        assert isinstance(sink, NullSink)

    def test_make_sink_mpv_failure_takes_file_rung_when_path_given(
        self, tmp_path, monkeypatch
    ):
        """The documented ladder is mpv → file → null: an mpv startup failure
        with a capture path must land on the FILE rung, not silently discard
        the requested capture (round-4 review fix)."""
        from hdrtv_tpu.pipeline.sinks import FileSink, make_sink

        _install_fake_mpv(tmp_path, monkeypatch, refuse="*")
        path = str(tmp_path / "golden.rgb48")
        sink = make_sink("mpv", 64, 32, 30.0, path=path)
        assert isinstance(sink, FileSink)
        sink.show(np.zeros((32, 64, 3), np.uint16))
        sink.close()
        assert os.path.getsize(path) == 32 * 64 * 3 * 2


class TestSideBySide:
    def test_panes_and_routing(self, tmp_path, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import SideBySideSink

        _install_fake_mpv(tmp_path, monkeypatch, refuse="--never-refused")
        sink = SideBySideSink(64, 32, 30.0)
        try:
            sink.show_sdr(np.zeros((32, 64, 3), np.uint8))
            sink.show(np.zeros((32, 64, 3), np.uint16))
            assert sink.frames == 1
        finally:
            sink.close()

    def test_runner_routes_sdr_pane(self):
        """A sink exposing show_sdr receives the source frame per shown frame."""
        from hdrtv_tpu.pipeline.runner import PipelineRunner
        from hdrtv_tpu.pipeline.source import SyntheticSource

        class _Proc:
            def process_rgb48_device(self, flat_u8):
                import jax.numpy as jnp

                return flat_u8.astype(jnp.uint16) * 257

        class _Sink:
            def __init__(self):
                self.hdr, self.sdr = [], []

            def show(self, rgb48, pts=None):
                self.hdr.append(rgb48.shape)

            def show_sdr(self, bgr, pts=None):
                self.sdr.append(bgr.shape)

        src = SyntheticSource(64, 32, fps=30, frames=4)
        sink = _Sink()
        m = PipelineRunner(src, _Proc(), sink, realtime=False, max_frames=4).run()
        assert m.frames == 4
        assert len(sink.hdr) == 4 and len(sink.sdr) == 4
        assert sink.sdr[0] == (32, 64, 3)


class TestMpvQualityKnobs:
    def test_quality_arg_families(self, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import _quality_args

        args = _quality_args()
        assert "--deband=yes" in args and "--deband-iterations=3" in args
        assert "--dither-depth=10" in args and "--dither=fruit" in args
        assert "--dither-size-fruit=6" in args and "--temporal-dither=yes" in args

        monkeypatch.setenv("HDRTVNET_MPV_DEBAND_THRESHOLD", "64")
        monkeypatch.setenv("HDRTVNET_MPV_DITHER_ALGO", "ordered")
        monkeypatch.setenv("HDRTVNET_MPV_TEMPORAL_DITHER", "0")
        args = _quality_args()
        assert "--deband-threshold=64" in args and "--dither=ordered" in args
        assert not any(a.startswith("--dither-size-fruit") for a in args)
        assert not any(a.startswith("--temporal-dither") for a in args)

        monkeypatch.setenv("HDRTVNET_MPV_DITHER", "0")
        monkeypatch.setenv("HDRTVNET_MPV_DEBAND", "0")
        args = _quality_args()
        assert not any(a.startswith(("--dither", "--deband", "--temporal-dither")) for a in args)

    def test_live_jitter_buffer_args(self, tmp_path, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import make_sink

        _install_fake_mpv(tmp_path, monkeypatch, refuse="--never-refused")
        monkeypatch.setenv("HDRTVNET_LIVE_CAPTURE_MPV_BUFFER_FRAMES", "4")
        sink = make_sink("mpv", 64, 32, 30.0, live=True)
        try:
            joined = " ".join(sink.proc.args if isinstance(sink.proc.args, list) else [])
            assert f"--demuxer-max-bytes={4 * 64 * 32 * 6}" in joined
        finally:
            sink.close()


class TestDisableMpv:
    def test_disable_mpv_falls_to_file_or_null(self, tmp_path, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import FileSink, NullSink, make_sink

        monkeypatch.setenv("HDRTVNET_DISABLE_MPV", "1")
        s = make_sink("mpv", 32, 32, 30.0, path=str(tmp_path / "o.rgb48"))
        assert isinstance(s, FileSink)
        s.close()
        s2 = make_sink("side-by-side", 32, 32, 30.0)
        assert isinstance(s2, NullSink)


class TestLiveQualityArgs:
    def test_live_interpolation_family(self, monkeypatch):
        from hdrtv_tpu.pipeline.sinks import _quality_args

        live = _quality_args(live=True)
        assert "--interpolation=yes" in live
        assert "--tscale=hermite" in live
        assert any(a.startswith("--tscale-blur=1.4") for a in live)
        assert "--video-sync=display-resample" in live
        # file playback keeps interpolation off by default
        assert "--interpolation=yes" not in _quality_args(live=False)
        monkeypatch.setenv("HDRTVNET_LIVE_MPV_INTERPOLATION", "0")
        assert "--interpolation=yes" not in _quality_args(live=True)
        monkeypatch.setenv("HDRTVNET_LIVE_MPV_INTERPOLATION", "1")
        monkeypatch.setenv("HDRTVNET_LIVE_MPV_TSCALE", "catmull-rom")
        assert "--tscale=catmull_rom" in _quality_args(live=True)


IPC_FAKE_MPV = r'''#!/usr/bin/env python3
# fake mpv serving the JSON IPC: answers get_property video-out-params with
# a BT.2020/PQ snapshot; consumes the fifo on a thread.
import json, socket, sys, threading
ipc = fifo = None
for a in sys.argv[1:]:
    if a.startswith("--input-ipc-server="):
        ipc = a.split("=", 1)[1]
args = [a for a in sys.argv[1:] if not a.startswith("--")]
fifo = args[-1] if args else None
def drain():
    with open(fifo, "rb") as f:
        while f.read(65536):
            pass
threading.Thread(target=drain, daemon=True).start()
srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
srv.bind(ipc); srv.listen(1)
conn, _ = srv.accept()
buf = b""
while True:
    data = conn.recv(4096)
    if not data:
        break
    buf += data
    while b"\n" in buf:
        line, buf = buf.split(b"\n", 1)
        try:
            req = json.loads(line)
        except ValueError:
            continue
        rid = req.get("request_id", 0)
        resp = {"request_id": rid, "error": "success",
                "data": {"primaries": "bt.2020", "gamma": "pq", "colorlevels": "full"}}
        conn.sendall(json.dumps(resp).encode() + b"\n")
'''


class TestHdrConfirmation:
    def test_vo_confirmation_via_ipc(self, tmp_path, monkeypatch):
        import time as _time

        import numpy as np

        from hdrtv_tpu.pipeline.sinks import MpvPipeSink

        bindir = tmp_path / "bin"
        bindir.mkdir()
        mpv = bindir / "mpv"
        mpv.write_text(IPC_FAKE_MPV)
        mpv.chmod(mpv.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

        sink = MpvPipeSink(64, 32, 30.0)
        try:
            sink.show(np.zeros((32, 64, 3), np.uint16))
            info = sink.hdr_info()
            assert info["hdr_vo_confirmed"] and info["primaries"] == "bt.2020"
            deadline = _time.monotonic() + 5.0
            while not sink.hdr_confirmed and _time.monotonic() < deadline:
                _time.sleep(0.1)
            assert sink.hdr_confirmed  # the monitor saw BT.2020+PQ
        finally:
            sink.close()


class TestScaleHotSwap:
    def test_set_scale_over_ipc(self, tmp_path, monkeypatch):
        import numpy as np

        from hdrtv_tpu.pipeline.sinks import MpvPipeSink

        bindir = tmp_path / "bin"
        bindir.mkdir()
        mpv = bindir / "mpv"
        # reuse the IPC fake: it accepts set_property silently (no response
        # needed) and answers get_property
        mpv.write_text(IPC_FAKE_MPV)
        mpv.chmod(mpv.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

        sink = MpvPipeSink(64, 32, 30.0)
        try:
            sink.show(np.zeros((32, 64, 3), np.uint16))
            assert sink.set_scale("ewa_lanczossharp", out_size=(128, 64))
        finally:
            sink.close()


class TestCasInVf:
    def test_cas_joins_vf_when_policy_applies(self, tmp_path, monkeypatch):
        import numpy as np

        from hdrtv_tpu.pipeline.sinks import MpvPipeSink

        _install_fake_mpv(tmp_path, monkeypatch, refuse="--never-refused")
        # 540p → 1080p with the EWA kernel: CAS 0.24 per the policy tiers
        sink = MpvPipeSink(960, 540, 30.0, out_size=(1920, 1080),
                           upscaler="ewa_lanczossharp")
        try:
            sink.show(np.zeros((540, 960, 3), np.uint16))
        finally:
            sink.close()
        # FSR: CAS stays out of the chain (gui_scaling.py:113-138)
        sink2 = MpvPipeSink(960, 540, 30.0, out_size=(1920, 1080), upscaler="fsr")
        sink2.close()


class TestY4MFileSink:
    def test_file_rung_y4m_path_is_playable(self, tmp_path):
        from hdrtv_tpu.bench.y4m import Y4MReader
        from hdrtv_tpu.pipeline.sinks import Y4MFileSink, make_sink

        path = str(tmp_path / "cap.y4m")
        sink = make_sink("file", 64, 32, 24.0, path=path)
        assert isinstance(sink, Y4MFileSink)
        rng = np.random.RandomState(0)
        for _ in range(3):
            sink.show((rng.rand(32, 64, 3) * 65535).astype(np.uint16))
        sink.close()
        with Y4MReader(path) as rd:
            assert rd.frame_count == 3
            assert rd.fmt.ctag == "422p10" and abs(rd.fps - 24.0) < 1e-6
            assert rd.read_rgb_unit(2).shape == (32, 64, 3)
        # Y4M can't carry PQ/BT.2020 tags — the capture must ship the same
        # color sidecar the export path writes (else downstream defaults to
        # bt709 and renders wrong colors)
        import json

        with open(path + ".json") as f:  # same suffix the export path uses
            side = json.load(f)
        assert side["color"]["transfer"] == "smpte2084"
        assert side["color"]["primaries"] == "bt2020"
        assert "containerize_with" in side

    def test_file_rung_raw_unchanged(self, tmp_path):
        from hdrtv_tpu.pipeline.sinks import FileSink, make_sink

        sink = make_sink("file", 8, 8, 30.0, path=str(tmp_path / "cap.rgb48"))
        assert isinstance(sink, FileSink)
        sink.close()
