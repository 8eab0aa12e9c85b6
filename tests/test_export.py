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

    def process_rgb48_batch(self, frames, *, mesh=None):
        return np.asarray(frames, dtype=np.uint16) * 257


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

    def test_batched_export_matches_single(self, tmp_path):
        from hdrtv_tpu.pipeline.export import ExportConfig, export_video
        from hdrtv_tpu.pipeline.source import SyntheticSource

        stats = export_video(
            None, FakeProcessor(),
            ExportConfig(output=str(tmp_path / "b.rgb48"), codec="raw", batch=4),
            source=SyntheticSource(64, 32, fps=24, frames=10),  # 10 % 4 != 0 → tail batch
        )
        assert stats["frames"] == 10
        a = np.fromfile(tmp_path / "b.rgb48", dtype=np.uint16)
        stats2 = export_video(
            None, FakeProcessor(),
            ExportConfig(output=str(tmp_path / "s.rgb48"), codec="raw", batch=1),
            source=SyntheticSource(64, 32, fps=24, frames=10),
        )
        b = np.fromfile(tmp_path / "s.rgb48", dtype=np.uint16)
        np.testing.assert_array_equal(a, b)

    def test_batched_export_real_model_on_mesh(self, tmp_path, ):
        """Real processor, batch sharded over the 8-device CPU mesh."""
        import os

        from hdrtv_tpu.pipeline.export import ExportConfig, export_video
        from hdrtv_tpu.pipeline.source import SyntheticSource
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        weights = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
        proc = HDRTVNetTPU(weights, precision="fp32", persistent_cache=False)
        stats = export_video(
            None, proc,
            ExportConfig(output=str(tmp_path / "m.rgb48"), codec="raw", batch=8, use_mesh=True),
            source=SyntheticSource(64, 32, fps=24, frames=8),
        )
        assert stats["frames"] == 8
        data = np.fromfile(tmp_path / "m.rgb48", dtype=np.uint16)
        assert data.size == 8 * 64 * 32 * 3

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
