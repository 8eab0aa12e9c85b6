"""Tests for the supervised benchmark wrapper (bench/wrapper.py) — the
reference GUI bench dialog's contract: child isolation, live streaming,
playback lock, cancel, batch-CSV result table (gui_playback_benchmark.py)."""

import os
import sys
import textwrap

import pytest

from hdrtv_tpu.bench import wrapper as W


@pytest.fixture()
def lock_env(tmp_path, monkeypatch):
    monkeypatch.setenv("HDRTVNET_CACHE_DIR", str(tmp_path / "cache"))
    return tmp_path


def _child_script(tmp_path, body: str) -> list[str]:
    path = tmp_path / "child.py"
    path.write_text(textwrap.dedent(body))
    return [sys.executable, str(path)]


def test_wrapper_streams_lines_and_parses_batch_csv(lock_env, tmp_path):
    out_dir = tmp_path / "session"
    out_dir.mkdir()
    argv = _child_script(tmp_path, f"""
        import csv, os
        print("run 1 starting")
        print("run 1 fps=50.0")
        with open(os.path.join({str(out_dir)!r}, "batch.csv"), "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["resolution", "precision", "fps", "model_ms", "ring_ms"])
            wr.writerow(["1080p", "FP16", "52.9", "18.9", "21.0"])
            wr.writerow(["720p", "FP16", "107.0", "9.3", "10.1"])
        print("batch CSV: " + os.path.join({str(out_dir)!r}, "batch.csv"))
    """)
    seen = []
    w = W.PlaybackBenchmarkWrapper(argv=argv, on_line=seen.append, out_dir=str(out_dir))
    rc = w.run()
    assert rc == 0
    assert any("run 1 fps=50.0" in line for line in seen)  # live streaming
    rows = w.batch_rows()
    assert [r["resolution"] for r in rows] == ["1080p", "720p"]
    table = w.render_table(rows)
    assert "1080p" in table and "fps" in table


def test_wrapper_holds_lock_during_run_and_releases(lock_env, tmp_path):
    lock = W.playback_lock_path()
    argv = _child_script(tmp_path, f"""
        import os
        print("locked" if os.path.exists({lock!r}) else "unlocked")
    """)
    w = W.PlaybackBenchmarkWrapper(argv=argv)
    assert w.run() == 0
    assert "locked" in w.lines  # the child observed the lock
    assert not os.path.exists(lock)  # released after the run
    assert not W.is_playback_locked()


def test_wrapper_budget_kills_hung_child(lock_env, tmp_path):
    argv = _child_script(tmp_path, """
        import sys, time
        print("sleeping", flush=True)
        time.sleep(60)
        print("never printed")
    """)
    w = W.PlaybackBenchmarkWrapper(argv=argv, budget_s=1.5)
    rc = w.run()
    assert w.canceled
    assert rc != 0
    assert "never printed" not in w.lines
    assert not os.path.exists(W.playback_lock_path())


def test_stale_lock_does_not_count(lock_env):
    lock = W.playback_lock_path()
    os.makedirs(os.path.dirname(lock), exist_ok=True)
    with open(lock, "w") as f:
        f.write("999999999")  # dead pid
    assert not W.is_playback_locked()
    with open(lock, "w") as f:
        f.write(str(os.getpid()))  # live pid
    assert W.is_playback_locked()


def test_cli_convert_refuses_under_lock(lock_env, monkeypatch, capsys):
    from hdrtv_tpu import cli

    lock = W.playback_lock_path()
    os.makedirs(os.path.dirname(lock), exist_ok=True)
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    monkeypatch.delenv("HDRTVNET_IGNORE_PLAYBACK_LOCK", raising=False)
    rc = cli.main(["convert", "--display", "null",
                   "--frames", "1", "--resolution", "540p"])
    assert rc == 2
    assert "playback lock" in capsys.readouterr().err


def test_db_dma_width_default(monkeypatch):
    """Round-5 on-chip A/B: double-buffered halo DMA wins at 1080p tiles
    (19.44 vs 19.97 ms) and loses at 544p (5.57 vs 5.43) — the default is
    width-dependent, the env a forcing override."""
    from hdrtv_tpu.ops.conv_kernels import _db_dma

    monkeypatch.delenv("HDRTV_DB_DMA", raising=False)
    assert _db_dma(960) and _db_dma(512)      # 1080p/720p tiles: on
    assert not _db_dma(480) and not _db_dma(0)  # 544p and under: off
    monkeypatch.setenv("HDRTV_DB_DMA", "0")
    assert not _db_dma(960)
    monkeypatch.setenv("HDRTV_DB_DMA", "1")
    assert _db_dma(128)
