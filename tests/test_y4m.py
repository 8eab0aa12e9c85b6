"""Y4M native GT path: container round-trips, color conversion, reader wiring.

The reference's exact GT decode is ffmpeg rgb48le (gui_hdr_io.py:205-487);
bench/y4m.py is the binary-free equivalent for *.y4m sources, keeping
10-bit GT at 10 bits in CI (the cv2 fallback flattens to 8)."""

import numpy as np
import pytest

from hdrtv_tpu.bench import y4m


def _write(path, frames_rgb01, ctag="444p10", fps=30.0, full_range=False):
    h, w = frames_rgb01[0].shape[:2]
    with y4m.Y4MWriter(str(path), w, h, fps=fps, ctag=ctag, full_range=full_range) as wr:
        for f in frames_rgb01:
            wr.write_rgb_unit(f)
    return str(path)


class TestContainer:
    def test_planes_roundtrip_bit_exact(self, tmp_path):
        rng = np.random.RandomState(0)
        path = str(tmp_path / "a.y4m")
        planes = [
            tuple(rng.randint(0, 1024, (16, 32) if i == 0 else (16, 32), np.uint16) for i in range(3))
            for _ in range(3)
        ]
        with y4m.Y4MWriter(path, 32, 16, ctag="444p10") as wr:
            for p in planes:
                wr.write_planes(*p)
        with y4m.Y4MReader(path) as rd:
            assert rd.frame_count == 3
            assert rd.fmt.bits == 10 and rd.fmt.dtype == np.dtype("<u2")
            # random access out of order
            for idx in (2, 0, 1):
                got = rd.read_planes(idx)
                for a, b in zip(got, planes[idx]):
                    np.testing.assert_array_equal(a, b)

    def test_420p10_geometry_and_roundtrip(self, tmp_path):
        rng = np.random.RandomState(1)
        path = str(tmp_path / "b.y4m")
        ypl = rng.randint(0, 1024, (16, 32), np.uint16)
        cpl = rng.randint(0, 1024, (8, 16), np.uint16)
        with y4m.Y4MWriter(path, 32, 16, ctag="420p10") as wr:
            wr.write_planes(ypl, cpl, cpl + 1)
        with y4m.Y4MReader(path) as rd:
            assert rd.fmt.chroma_shape == (8, 16)
            gy, gcb, gcr = rd.read_planes(0)
            np.testing.assert_array_equal(gy, ypl)
            np.testing.assert_array_equal(gcb, cpl)
            np.testing.assert_array_equal(gcr, cpl + 1)

    def test_bad_marker_and_range(self, tmp_path):
        path = str(tmp_path / "c.y4m")
        with y4m.Y4MWriter(path, 8, 8, ctag="444") as wr:
            wr.write_planes(*(np.zeros((8, 8), np.uint8),) * 3)
        with y4m.Y4MReader(path) as rd:
            with pytest.raises(IndexError):
                rd.read_planes(1)
        with pytest.raises(ValueError):
            y4m.Y4MWriter(str(tmp_path / "d.y4m"), 8, 8, ctag="440")

    def test_probe(self, tmp_path):
        path = _write(tmp_path / "p.y4m", [np.zeros((16, 32, 3), np.float32)] * 4,
                      fps=23.976)
        from hdrtv_tpu.bench.hdr_io import probe_video

        info = probe_video(path)
        assert (info["width"], info["height"], info["frames"]) == (32, 16, 4)
        assert abs(info["fps"] - 23.976) < 1e-3


class TestColor:
    def test_rgb_roundtrip_10bit_limited(self, tmp_path):
        rng = np.random.RandomState(2)
        rgb = rng.rand(16, 32, 3).astype(np.float32)
        path = _write(tmp_path / "r.y4m", [rgb])
        with y4m.Y4MReader(path) as rd:
            got = rd.read_rgb_unit(0)
        # 10-bit limited-range YCbCr: worst-case round-trip error a couple of
        # chroma quantization steps (1/224/4 per channel through the matrix)
        assert np.abs(got - rgb).max() < 3.0 / 876.0

    def test_rgb_roundtrip_full_range(self, tmp_path):
        rng = np.random.RandomState(3)
        rgb = rng.rand(8, 16, 3).astype(np.float32)
        path = _write(tmp_path / "f.y4m", [rgb], full_range=True)
        with y4m.Y4MReader(path) as rd:
            assert rd.fmt.full_range
            got = rd.read_rgb_unit(0)
        assert np.abs(got - rgb).max() < 3.0 / 1023.0

    def test_ten_bit_precision_survives(self, tmp_path):
        """Two greys 1 LSB apart at 10 bits must decode distinguishably —
        the capability the 8-bit cv2 fallback cannot provide."""
        v = 500
        grey = lambda code: np.full((8, 8), code, np.uint16)
        path = str(tmp_path / "t.y4m")
        with y4m.Y4MWriter(path, 8, 8, ctag="444p10") as wr:
            wr.write_planes(grey(v), grey(512), grey(512))
            wr.write_planes(grey(v + 1), grey(512), grey(512))
        with y4m.Y4MReader(path) as rd:
            a, b = rd.read_rgb_unit(0), rd.read_rgb_unit(1)
        d = float(np.abs(b - a).max())
        assert 0.0 < d < 1.0 / 255.0  # sub-8-bit step, nonzero

    def test_flat_chroma_420_exact(self, tmp_path):
        """Flat-color frames survive 4:2:0 subsampling exactly (box-filter
        down + bilinear up are both identity on constants)."""
        rgb = np.full((16, 32, 3), 0.0, np.float32)
        rgb[..., 0], rgb[..., 1], rgb[..., 2] = 0.7, 0.3, 0.5
        path = _write(tmp_path / "g.y4m", [rgb], ctag="420p10")
        with y4m.Y4MReader(path) as rd:
            got = rd.read_rgb_unit(0)
        assert np.abs(got - rgb).max() < 3.0 / 876.0
        assert np.abs(got - got[0, 0]).max() < 1e-6  # stays flat

    def test_matrix_coefficients_differ(self, tmp_path):
        rgb = np.zeros((8, 8, 3), np.float32)
        rgb[..., 0] = 1.0  # pure red separates kr=0.2627 from kr=0.2126
        y20, _, _ = y4m.rgb_unit_to_ycbcr(rgb, bits=10, matrix="bt2020nc")
        y709, _, _ = y4m.rgb_unit_to_ycbcr(rgb, bits=10, matrix="bt709")
        assert abs(int(y20[0, 0]) - round(0.2627 * 219 * 4 + 64)) <= 1
        assert abs(int(y709[0, 0]) - round(0.2126 * 219 * 4 + 64)) <= 1


class TestGroundTruthReader:
    def test_y4m_native_exact(self, tmp_path):
        from hdrtv_tpu.bench.gt_sync import HDRGroundTruthReader

        rng = np.random.RandomState(4)
        frames = [rng.rand(16, 32, 3).astype(np.float32) for _ in range(3)]
        path = _write(tmp_path / "gt.y4m", frames, fps=24.0)
        r = HDRGroundTruthReader(path)
        try:
            assert r.decode_method == "y4m-native-exact-10bit"
            assert r.exact and r.frame_count == 3 and abs(r.fps - 24.0) < 1e-6
            for i, want in enumerate(frames):
                got = r.read_unit_rgb(i)
                assert got is not None and got.shape == (16, 32, 3)
                assert np.abs(got - want).max() < 3.0 / 876.0
            assert r.read_unit_rgb(3) is None  # past EOF → None, like cv2 path
            # fast read aliases the same native decode
            np.testing.assert_array_equal(r.read_unit_rgb_fast(1), r.read_unit_rgb(1))
            r.prefetch_exact([0, 1])  # no-op, must not require ffmpeg
        finally:
            r.close()

    def test_mode_env_ignored_for_y4m(self, tmp_path, monkeypatch):
        from hdrtv_tpu.bench.gt_sync import HDRGroundTruthReader

        monkeypatch.setenv("HDRTVNET_BENCHMARK_HDR_GT_MODE", "fast")
        path = _write(tmp_path / "gt2.y4m", [np.zeros((8, 8, 3), np.float32)])
        r = HDRGroundTruthReader(path)
        try:
            assert r.exact and r.decode_method.startswith("y4m-native-exact")
        finally:
            r.close()
