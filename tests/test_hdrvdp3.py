"""HDR-VDP3 bridge: PQ encoding + external command-template contract."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


class TestPQEncode:
    def test_range_and_monotonicity(self):
        from hdrtv_tpu.bench.hdrvdp3 import pq_encode_u16

        ramp = np.linspace(0, 1, 64, dtype=np.float32).reshape(1, 64, 1).repeat(3, -1)
        codes = pq_encode_u16(ramp)
        assert codes.dtype == np.uint16
        assert codes[0, 0, 0] == 0
        assert (np.diff(codes[0, :, 0].astype(np.int64)) >= 0).all()
        # 1000-nit peak is ~0.7518 in PQ signal (BT.2100)
        assert abs(codes[0, -1, 0] / 65535.0 - 0.7518) < 0.01

    def test_peak_nits_scales_signal(self):
        from hdrtv_tpu.bench.hdrvdp3 import pq_encode_u16

        one = np.ones((1, 1, 3), np.float32)
        assert pq_encode_u16(one, peak_nits=100.0)[0, 0, 0] < pq_encode_u16(one, peak_nits=1000.0)[0, 0, 0]


class TestBridge:
    def _imgs(self):
        rng = np.random.RandomState(0)
        return rng.rand(8, 12, 3).astype(np.float32), rng.rand(8, 12, 3).astype(np.float32)

    def test_disabled_without_env(self, monkeypatch):
        from hdrtv_tpu.bench.hdrvdp3 import HDRVDP3_CMD_ENV, hdrvdp3_score

        monkeypatch.delenv(HDRVDP3_CMD_ENV, raising=False)
        score, status = hdrvdp3_score(*self._imgs())
        assert score is None and "disabled" in status

    def test_fake_octave_scores(self, monkeypatch):
        """A command template standing in for the Octave bridge: verifies the
        pair files are written and the last stdout float is parsed."""
        from hdrtv_tpu.bench.hdrvdp3 import HDRVDP3_CMD_ENV, hdrvdp3_score

        monkeypatch.setenv(
            HDRVDP3_CMD_ENV,
            "test -f {test} && test -f {reference} && echo 'Q = 8.753 ({encoding})'",
        )
        score, status = hdrvdp3_score(*self._imgs())
        assert status == "ok" and score == pytest.approx(8.753)

    def test_failing_command_reports_exit(self, monkeypatch):
        from hdrtv_tpu.bench.hdrvdp3 import HDRVDP3_CMD_ENV, hdrvdp3_score

        monkeypatch.setenv(HDRVDP3_CMD_ENV, "sh -c 'echo boom >&2; exit 3'")
        score, status = hdrvdp3_score(*self._imgs())
        assert score is None and "exit 3" in status and "boom" in status

    def test_no_float_in_output(self, monkeypatch):
        from hdrtv_tpu.bench.hdrvdp3 import HDRVDP3_CMD_ENV, hdrvdp3_score

        monkeypatch.setenv(HDRVDP3_CMD_ENV, "echo no-score-here")
        score, status = hdrvdp3_score(*self._imgs())
        assert score is None and status == "no score in output"
