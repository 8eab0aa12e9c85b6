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

    def test_multihost_range_source_and_single_host(self, tmp_path):
        """hosts=1 farm == plain export (fast in-process sanity)."""
        from hdrtv_tpu.pipeline.export import (
            ExportConfig, export_video, export_video_multihost,
        )
        from hdrtv_tpu.pipeline.source import SyntheticSource

        cfg1 = ExportConfig(output=str(tmp_path / "a.mov"), codec="raw")
        s1 = export_video(None, FakeProcessor(), cfg1, source=SyntheticSource(64, 32, frames=7))
        cfgF = ExportConfig(output=str(tmp_path / "b.mov"), codec="raw")
        sF = export_video_multihost(
            None, FakeProcessor(), cfgF, hosts=1, host_id=0,
            source=SyntheticSource(64, 32, frames=7),
        )
        assert sF["frames"] == s1["frames"] == 7 and sF["concatenated"]
        a = (tmp_path / "a.mov.rgb48").read_bytes()
        b = (tmp_path / "b.mov.rgb48").read_bytes()
        assert a == b

    def test_two_process_farm_bit_identical(self, tmp_path):
        """Two *processes* export halves of a real file source; host 0
        reassembles; the raw master is bit-identical to a single-host export
        (VERDICT r2 item 5)."""
        import subprocess
        import sys

        import cv2

        vid = str(tmp_path / "clip.avi")
        wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 12, (96, 64))
        rng = np.random.RandomState(0)
        for i in range(10):
            frame = np.full((64, 96, 3), i * 20 % 255, np.uint8)
            frame[:, : 8 * (i + 1)] = 250
            wr.write(frame)
        wr.release()

        weights = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")
        script = (
            "import sys\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')  # axon plugin ignores the env var\n"
            "from hdrtv_tpu.pipeline.export import ExportConfig, export_video, export_video_multihost\n"
            "from hdrtv_tpu.runtime.processor import HDRTVNetTPU\n"
            "vid, weights, out, hosts, hid = sys.argv[1:6]\n"
            "proc = HDRTVNetTPU(weights, precision='fp32', persistent_cache=False)\n"
            "cfg = ExportConfig(output=out, codec='raw')\n"
            "if int(hosts) == 1:\n"
            "    export_video(vid, proc, cfg)\n"
            "else:\n"
            "    export_video_multihost(vid, proc, cfg, hosts=int(hosts), host_id=int(hid))\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        single = str(tmp_path / "single.mov")
        farm = str(tmp_path / "farm.mov")
        procs = [
            subprocess.Popen([sys.executable, "-c", script, vid, weights, farm, "2", str(h)],
                             env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
            for h in (0, 1)
        ]
        rc_single = subprocess.run(
            [sys.executable, "-c", script, vid, weights, single, "1", "0"],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)), timeout=300,
        ).returncode
        for p in procs:
            assert p.wait(timeout=300) == 0
        assert rc_single == 0
        a = (tmp_path / "single.mov.rgb48").read_bytes()
        b = (tmp_path / "farm.mov.rgb48").read_bytes()
        assert len(a) == 10 * 96 * 64 * 3 * 2
        assert a == b

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


class TestY4MExport:
    def test_y4m_export_playable_master(self, tmp_path):
        from hdrtv_tpu.bench.y4m import Y4MReader, ycbcr_to_rgb_unit
        from hdrtv_tpu.pipeline.export import ExportConfig, export_video
        from hdrtv_tpu.pipeline.source import SyntheticSource

        src = SyntheticSource(64, 32, fps=24, frames=4)
        cfg = ExportConfig(output=str(tmp_path / "master.mov"), codec="y4m")
        stats = export_video(None, FakeProcessor(), cfg, source=src)
        assert stats["frames"] == 4 and stats["codec"] == "y4m"
        out = stats["output"]
        assert out.endswith(".y4m")
        with Y4MReader(out) as rd:
            # reference chain's intermediate format: 4:2:2 10-bit limited
            assert rd.fmt.ctag == "422p10" and not rd.fmt.full_range
            assert rd.frame_count == 4
            assert abs(rd.fps - 24.0) < 1e-6
            rgb = rd.read_rgb_unit(0, matrix="bt2020nc")
            assert rgb.shape == (32, 64, 3)
        with open(out + ".json") as f:
            sidecar = json.load(f)
        assert sidecar["color"]["transfer"] == "smpte2084"
        assert "prores" in sidecar["containerize_with"]

    def test_y4m_multihost_concat_lossless(self, tmp_path):
        from hdrtv_tpu.bench.y4m import Y4MReader
        from hdrtv_tpu.pipeline.export import (
            ExportConfig, export_video, export_video_multihost,
        )
        from hdrtv_tpu.pipeline.source import SyntheticSource

        mk = lambda: SyntheticSource(32, 16, fps=30, frames=6)
        single = ExportConfig(output=str(tmp_path / "one.y4m"), codec="y4m")
        export_video(None, FakeProcessor(), single, source=mk())

        farm = ExportConfig(output=str(tmp_path / "farm.mov"), codec="y4m")
        for host in (1, 0):  # host 0 concatenates, so run it last
            export_video_multihost(
                None, FakeProcessor(), farm, hosts=2, host_id=host,
                source=mk(), wait_timeout=30.0,
            )
        final = str(tmp_path / "farm.y4m")
        with open(final + ".json") as f:
            sc = json.load(f)
        assert "farm.y4m" in sc["containerize_with"]  # final, not the segment
        with Y4MReader(final) as a, Y4MReader(str(tmp_path / "one.y4m")) as b:
            assert a.frame_count == b.frame_count == 6
            for i in range(6):
                for pa, pb in zip(a.read_planes(i), b.read_planes(i)):
                    np.testing.assert_array_equal(pa, pb)

    def test_writer_sized_from_processed_frame_not_source(self, tmp_path):
        """Letterboxing processors emit at processing dims; fixed-stride
        writers must size from the frames, not the source (regression:
        cli export --resolution 540p on a smaller source)."""
        from hdrtv_tpu.pipeline.export import ExportConfig, export_video
        from hdrtv_tpu.pipeline.source import SyntheticSource

        class UpscalingProcessor(FakeProcessor):
            def process_rgb48_device(self, frame):
                out = jnp.zeros((64, 96, 3), jnp.uint16)
                return out + frame.astype(jnp.uint16).max()

        src = SyntheticSource(48, 24, fps=24, frames=2)  # source ≠ output dims
        cfg = ExportConfig(output=str(tmp_path / "m.mov"), codec="raw")
        stats = export_video(None, UpscalingProcessor(), cfg, source=src)
        assert os.path.getsize(stats["output"]) == 2 * 96 * 64 * 3 * 2
        with open(stats["output"] + ".json") as f:
            sc = json.load(f)
        assert (sc["width"], sc["height"]) == (96, 64)


class TestExportFailureHandling:
    """Round-4 review fixes: honest failure reporting in export_video and
    the multihost planner."""

    def test_write_failure_surfaces_root_cause_and_closes_source(self, tmp_path):
        """When every write fails (writer construction error), export_video
        must raise the ROOT-CAUSE error — not a secondary close()-time one —
        and still close the source."""
        import pytest

        from hdrtv_tpu.pipeline.export import ExportConfig, export_video
        from hdrtv_tpu.pipeline.source import SyntheticSource

        src = SyntheticSource(64, 32, fps=24, frames=2)
        closed = []
        orig_close = src.close
        src.close = lambda: (closed.append(True), orig_close())[1]
        # output inside a directory that doesn't exist → _RawWriter __init__
        # raises on every frame in the writer thread
        cfg = ExportConfig(output=str(tmp_path / "nope" / "master.mov"), codec="raw")
        with pytest.raises(FileNotFoundError):
            export_video(None, FakeProcessor(), cfg, source=src)
        assert closed  # source.close() ran despite the failure

    def test_multihost_rejects_unknown_frame_count(self, tmp_path):
        """A source reporting 0 frames must fail loudly instead of producing
        an empty 'successful' farm export (cv2 reports 0 for some streams)."""
        import pytest

        from hdrtv_tpu.pipeline.export import ExportConfig, export_video_multihost

        class ZeroCountSource:
            width, height, fps, frame_count = 64, 32, 24.0, 0

            def read_with_meta(self, timeout=5.0):
                return None

            def seek(self, n):
                pass

            def close(self):
                pass

        cfg = ExportConfig(output=str(tmp_path / "farm.mov"), codec="raw")
        with pytest.raises(ValueError, match="frame count"):
            export_video_multihost(
                None, FakeProcessor(), cfg, hosts=2, host_id=0,
                source=ZeroCountSource(),
            )

    def test_y4m_writer_suffix_case_insensitive(self, tmp_path):
        """_Y4MWriter must treat .Y4M as already-suffixed (the multihost
        planner's lowercase check and the writer must agree)."""
        from hdrtv_tpu.pipeline.export import ExportConfig, _Y4MWriter

        cfg = ExportConfig(output=str(tmp_path / "OUT.Y4M"), codec="y4m")
        wtr = _Y4MWriter(cfg, 64, 32, 24.0)
        assert wtr.path == str(tmp_path / "OUT.Y4M")
        wtr.write(np.zeros((32, 64, 3), np.uint16))
        wtr.close()
        assert os.path.getsize(wtr.path) > 0

    def test_multihost_raw_sidecar_references_final_master(self, tmp_path):
        """The reassembled raw master's sidecar must containerize the FINAL
        concatenation, not segment 0 (round-4 fix)."""
        from hdrtv_tpu.pipeline.export import ExportConfig, export_video_multihost
        from hdrtv_tpu.pipeline.source import SyntheticSource

        cfg = ExportConfig(output=str(tmp_path / "farm.mov"), codec="raw")
        for hid in (1, 0):  # host 1 first so host 0's wait is instant
            stats = export_video_multihost(
                None, FakeProcessor(), cfg, hosts=2, host_id=hid,
                source=SyntheticSource(64, 32, fps=24, frames=6),
            )
        final = stats["output"]
        with open(final + ".json") as f:
            sidecar = json.load(f)
        assert "seg000" not in sidecar["containerize_with"]
        assert final in sidecar["containerize_with"]
