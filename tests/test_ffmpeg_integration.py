"""Binary-gated integration tests for the FFmpeg subprocess paths.

The command *construction* is covered unconditionally elsewhere
(test_bench.py, test_export.py); these tests push real bytes through
ffmpeg/ffprobe — the exact GT decode (gui_hdr_io.py:205-487 parity), the
PTS guard, and the export chain's color tags (gui_export.py:948-1023) —
and skip with a reason where the binaries are absent (VERDICT r2 item 7).
"""

import json
import shutil
import subprocess

import numpy as np
import pytest

ffmpeg = shutil.which("ffmpeg")
ffprobe = shutil.which("ffprobe")

pytestmark = pytest.mark.skipif(
    ffmpeg is None or ffprobe is None,
    reason="ffmpeg/ffprobe not installed in this environment",
)

W, H, FPS, N = 96, 64, 25.0, 20


def _make_u16_frames() -> np.ndarray:
    """Deterministic 16-bit frames whose values exceed 8-bit precision:
    frame i carries the code value 257*i + 100 (not representable after an
    8-bit round trip)."""
    frames = np.zeros((N, H, W, 3), np.uint16)
    for i in range(N):
        frames[i] = 257 * i + 100
        frames[i, :, : 4 * (i + 1), 0] = 40_000 + 13 * i
    return frames


@pytest.fixture(scope="module")
def clip16(tmp_path_factory):
    """Losslessly-coded 16-bit clip (ffv1/gbrp16le): u16 precision must
    survive the decode path bit-exactly."""
    path = str(tmp_path_factory.mktemp("ffclip") / "gt16.mkv")
    frames = _make_u16_frames()
    proc = subprocess.Popen(
        [
            ffmpeg, "-y", "-v", "error",
            "-f", "rawvideo", "-pix_fmt", "rgb48le", "-s", f"{W}x{H}", "-r", str(FPS),
            "-i", "pipe:0",
            "-c:v", "ffv1", "-pix_fmt", "gbrp16le",
            path,
        ],
        stdin=subprocess.PIPE,
    )
    proc.stdin.write(frames.tobytes())
    proc.stdin.close()
    assert proc.wait(timeout=60) == 0
    return path, frames


class TestExactDecode:
    def test_probe_video(self, clip16):
        from hdrtv_tpu.bench.hdr_io import probe_video

        path, _ = clip16
        info = probe_video(path)
        assert (info["width"], info["height"]) == (W, H)
        assert abs(info["fps"] - FPS) < 0.01

    def test_read_frames_exact_u16_bitexact(self, clip16):
        """The batched exact decode returns the original 16-bit code values
        — proof the GT path never flattens to 8 bits."""
        from hdrtv_tpu.bench.hdr_io import read_frames_exact

        path, frames = clip16
        got = read_frames_exact(path, [3, 11, 17])
        assert sorted(got) == [3, 11, 17]
        for idx, arr in got.items():
            np.testing.assert_array_equal(arr, frames[idx])
            assert arr.dtype == np.uint16
            assert int(arr.max()) > 255  # would be impossible after a u8 hop

    def test_read_frame_fast_pts_guard_accepts_correct_frame(self, clip16):
        from hdrtv_tpu.bench.hdr_io import read_frame_fast

        path, frames = clip16
        got = read_frame_fast(path, 13)
        assert got is not None
        np.testing.assert_array_equal(got, frames[13])

    def test_read_frame_fast_rejects_out_of_range_seek(self, clip16):
        """A target far past EOF decodes nothing near the requested PTS —
        the guard must return None, never a silently wrong frame."""
        from hdrtv_tpu.bench.hdr_io import read_frame_fast

        path, _ = clip16
        assert read_frame_fast(path, 10_000) is None


class TestExportChain:
    def test_prores_export_color_tags(self, tmp_path):
        """One real export through the reference filter chain; ffprobe must
        report the HDR10 color triplet (gui_export.py:948-1023)."""
        from hdrtv_tpu.pipeline.export import ExportConfig, export_video
        from hdrtv_tpu.pipeline.source import SyntheticSource

        class _Passthrough:
            def warmup_compile(self, *a, **k):
                return 0.0

            def process_rgb48_device(self, frame):
                import jax.numpy as jnp

                return frame.astype(jnp.uint16) * 257

        out = str(tmp_path / "master.mov")
        stats = export_video(
            None, _Passthrough(),
            ExportConfig(output=out, codec="prores"),
            source=SyntheticSource(W, H, fps=24, frames=6),
        )
        assert stats["codec"] == "prores" and stats["frames"] == 6
        probe = subprocess.run(
            [
                ffprobe, "-v", "error", "-select_streams", "v:0",
                "-show_entries",
                "stream=codec_name,color_primaries,color_transfer,color_space,pix_fmt",
                "-of", "json", out,
            ],
            capture_output=True, text=True, timeout=30,
        )
        st = json.loads(probe.stdout)["streams"][0]
        assert st["codec_name"] == "prores"
        assert st["color_primaries"] == "bt2020"
        assert st["color_transfer"] == "smpte2084"
        assert st["color_space"] == "bt2020nc"
        assert st["pix_fmt"].startswith("yuv422p10")

    def test_multihost_concat_prores(self, tmp_path):
        """Two-segment farm with the containerized codec: the concat
        demuxer reassembly must produce a playable stream with N frames."""
        from hdrtv_tpu.parallel.multihost import concat_command, segment_paths
        from hdrtv_tpu.pipeline.export import ExportConfig, export_video
        from hdrtv_tpu.pipeline.source import SyntheticSource

        class _Passthrough:
            def warmup_compile(self, *a, **k):
                return 0.0

            def process_rgb48_device(self, frame):
                import jax.numpy as jnp

                return frame.astype(jnp.uint16) * 257

        out = str(tmp_path / "farm.mov")
        segs = segment_paths(out, 2)
        for h, (s, e) in enumerate(((0, 5), (5, 10))):
            src = SyntheticSource(W, H, fps=24, frames=10)
            src.seek(s)
            src.frame_count = e
            export_video(
                None, _Passthrough(),
                ExportConfig(output=segs[h], codec="prores"),
                source=src,
            )
        cmd = concat_command(segs, out, str(tmp_path / "list.txt"))
        subprocess.run(cmd, check=True, capture_output=True, timeout=60)
        probe = subprocess.run(
            [
                ffprobe, "-v", "error", "-count_frames", "-select_streams", "v:0",
                "-show_entries", "stream=nb_read_frames", "-of", "csv=p=0", out,
            ],
            capture_output=True, text=True, timeout=60,
        )
        assert probe.stdout.strip() == "10"
