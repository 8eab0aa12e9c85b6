"""Export pipeline tests (ffmpeg-less environment → raw/png16 fallbacks)."""

import json
import os

import numpy as np
import jax.numpy as jnp


class FakeProcessor:
    def warmup_compile(self, w, h, **kw):
        return 0.0

    def process_rgb48_device(self, frame):
        return frame.astype(jnp.uint16) * 257


class TestExport:
    def test_raw_export_with_sidecar(self, tmp_path):
        from hdrtv_tpu.pipeline.export import ExportConfig, export_video
        from hdrtv_tpu.pipeline.source import SyntheticSource

        src = SyntheticSource(64, 32, fps=24, frames=5)
        cfg = ExportConfig(output=str(tmp_path / "master.mov"), codec="prores")
        stats = export_video(None, FakeProcessor(), cfg, source=src)
        assert stats["frames"] == 5
        assert stats["codec"] == "raw"  # no ffmpeg → fallback ladder
        raw_path = stats["output"]
        assert os.path.getsize(raw_path) == 5 * 64 * 32 * 3 * 2
        with open(raw_path + ".json") as f:
            sidecar = json.load(f)
        assert sidecar["color"]["transfer"] == "smpte2084"
        assert "zscale" in sidecar["containerize_with"]

    def test_png16_export(self, tmp_path):
        from hdrtv_tpu.pipeline.export import ExportConfig, export_video
        from hdrtv_tpu.pipeline.source import SyntheticSource

        src = SyntheticSource(48, 32, fps=24, frames=3)
        cfg = ExportConfig(output=str(tmp_path / "frames"), codec="png16")
        stats = export_video(None, FakeProcessor(), cfg, source=src)
        assert stats["frames"] == 3
        files = sorted(os.listdir(tmp_path / "frames"))
        assert len(files) == 3
        import cv2

        img = cv2.imread(str(tmp_path / "frames" / files[0]), cv2.IMREAD_UNCHANGED)
        assert img.dtype == np.uint16

    def test_ffmpeg_command_contract(self):
        """The ProRes chain matches the reference export filter contract
        (gui_export.py:948-1023)."""
        from hdrtv_tpu.pipeline.export import ffmpeg_hdr10_command

        cmd = " ".join(ffmpeg_hdr10_command(1920, 1080, 23.976, "out.mov"))
        for token in (
            "rgb48le",
            "matrixin=gbr",
            "transferin=smpte2084",
            "primariesin=bt2020",
            "dither=error_diffusion",
            "npl=1001",
            "yuv422p10le",
            "prores_ks",
            "-profile:v 3",
            "prores_metadata",
        ):
            assert token in cmd, token
