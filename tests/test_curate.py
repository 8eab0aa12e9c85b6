"""Dataset curation: hard-frame mining + teacher-pair generation."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_png(path, rgb01):
    bgr = (np.clip(rgb01, 0, 1)[..., ::-1] * 255).astype(np.uint8)
    cv2.imwrite(str(path), bgr)


def _easy_pair(h=48, w=64):
    """Mid-gray textured content — low hardness."""
    rng = np.random.RandomState(3)
    img = 0.3 + 0.2 * rng.rand(h, w, 3)
    return img, img * 1.1


def _hard_pair(h=48, w=64):
    """Large flat very-bright + clipped region — high hardness."""
    sdr = np.full((h, w, 3), 0.85, np.float32)
    hdr = np.full((h, w, 3), 0.99, np.float32)
    sdr[h // 2 :] = 0.02  # dark/bright contrast
    hdr[h // 2 :] = 0.02
    return sdr, hdr


class TestScoring:
    def test_hard_beats_easy(self):
        from hdrtv_tpu.data.curate import score_hard_pair

        easy = score_hard_pair(*_easy_pair())
        hard = score_hard_pair(*_hard_pair())
        assert hard["score"] > easy["score"] * 2
        assert hard["clipped_pct"] > 0.3
        assert hard["very_bright_flat_pct"] > 0.3

    def test_repeat_weights_by_rank(self):
        from hdrtv_tpu.data.curate import repeat_for_rank

        n = 100
        assert repeat_for_rank(0, n, 4) == 4
        assert repeat_for_rank(20, n, 4) == 3
        assert repeat_for_rank(90, n, 4) == 2
        assert repeat_for_rank(0, n, 1) == 1


class TestMineHardFrames:
    def test_mining_ranks_and_writes_manifest(self, tmp_path):
        from hdrtv_tpu.data.curate import mine_hard_frames

        sdr_dir, hdr_dir = tmp_path / "sdr", tmp_path / "hdr"
        sdr_dir.mkdir(), hdr_dir.mkdir()
        se, he = _easy_pair()
        sh, hh = _hard_pair()
        _write_png(sdr_dir / "easy.png", se)
        _write_png(hdr_dir / "easy.png", he)
        _write_png(sdr_dir / "hard.png", sh)
        _write_png(hdr_dir / "hard.png", hh)

        out = tmp_path / "mined"
        manifest = mine_hard_frames(str(sdr_dir), str(hdr_dir), str(out), top=2)
        assert manifest["total_pairs"] == 2
        assert manifest["replay"][0]["name"] == "hard.png"  # ranked first
        assert manifest["replay"][0]["repeat"] >= manifest["replay"][1]["repeat"]
        assert os.path.isfile(out / "manifest.json")
        assert os.path.isfile(out / "ranked.csv")
        with open(out / "manifest.json") as f:
            assert json.load(f)["hard_count"] == 2

    def test_stem_fallback_matching(self, tmp_path):
        from hdrtv_tpu.data.curate import paired_image_paths

        sdr_dir, hdr_dir = tmp_path / "sdr", tmp_path / "hdr"
        sdr_dir.mkdir(), hdr_dir.mkdir()
        _write_png(sdr_dir / "a.png", _easy_pair()[0])
        _write_png(hdr_dir / "a.jpg", _easy_pair()[1])  # different extension
        pairs = paired_image_paths(str(sdr_dir), str(hdr_dir))
        assert len(pairs) == 1 and pairs[0][1].suffix == ".jpg"

    def test_empty_dirs_raise(self, tmp_path):
        from hdrtv_tpu.data.curate import paired_image_paths

        (tmp_path / "sdr").mkdir(), (tmp_path / "hdr").mkdir()
        with pytest.raises(FileNotFoundError):
            paired_image_paths(str(tmp_path / "sdr"), str(tmp_path / "hdr"))


class _FakeTeacher:
    """process_rgb48 stand-in: identity SDR → u16 expansion."""

    def process_rgb48(self, bgr_u8):
        rgb = bgr_u8[..., ::-1].astype(np.float32) / 255.0
        return (rgb * 65535 + 0.5).astype(np.uint16)


class TestTeacherPairs:
    def _video(self, tmp_path, n=12):
        path = str(tmp_path / "movie.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (64, 48))
        for i in range(n):
            w.write(np.full((48, 64, 3), (i * 20) % 255, np.uint8))
        w.release()
        return path

    def test_pairs_written_and_roundtrip(self, tmp_path):
        from hdrtv_tpu.data.curate import make_teacher_pairs

        video = self._video(tmp_path)
        out = tmp_path / "pairs"
        m = make_teacher_pairs(video, _FakeTeacher(), str(out), num_frames=4)
        assert m["count"] == 4
        first = m["pairs"][0]
        sdr = cv2.imread(first["sdr"], cv2.IMREAD_UNCHANGED)
        teacher = cv2.imread(first["teacher"], cv2.IMREAD_UNCHANGED)
        assert sdr.dtype == np.uint8 and teacher.dtype == np.uint16
        assert sdr.shape[:2] == teacher.shape[:2]
        # identity teacher: u16 ≈ u8 expanded
        np.testing.assert_allclose(
            teacher.astype(np.float32) / 65535.0, sdr.astype(np.float32) / 255.0, atol=0.01
        )

    def test_explicit_frames(self, tmp_path):
        from hdrtv_tpu.data.curate import make_teacher_pairs

        video = self._video(tmp_path)
        m = make_teacher_pairs(video, _FakeTeacher(), str(tmp_path / "p"), frames=[0, 5])
        assert [p["frame"] for p in m["pairs"]] == [0, 5]


class TestCurateCLI:
    def test_mine_cli(self, tmp_path, capsys):
        from hdrtv_tpu.cli import main

        sdr_dir, hdr_dir = tmp_path / "sdr", tmp_path / "hdr"
        sdr_dir.mkdir(), hdr_dir.mkdir()
        _write_png(sdr_dir / "x.png", _hard_pair()[0])
        _write_png(hdr_dir / "x.png", _hard_pair()[1])
        rc = main([
            "mine-hard-frames", "--sdr-dir", str(sdr_dir), "--hdr-dir", str(hdr_dir),
            "--out", str(tmp_path / "out"),
        ])
        assert rc == 0
        assert json.loads(capsys.readouterr().out)["total_pairs"] == 1
