"""Plumbing tests for the driver-facing bench harness (bench.py).

Round 3's driver bench failed rc=124 with no JSON at all — the one outcome
bench.py must never produce. These tests run the REAL harness end-to-end on
CPU (tiny shape) and prove: (a) the happy path prints exactly one valid
metric JSON line, (b) a wedged/failing attempt still yields an error JSON
within its budget, (c) the child budget enforcement kills a hung attempt.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "bench.py")


def _run(env_extra, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(
        {
            "HDRTV_BENCH_PLATFORM": "cpu",
            "HDRTV_BENCH_HEIGHT": "64",
            "HDRTV_BENCH_WIDTH": "128",
            "HDRTV_BENCH_FRAMES": "3",
        }
    )
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=os.path.dirname(BENCH),
    )
    lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {proc.stdout!r}"
    return proc.returncode, json.loads(lines[0])


def test_bench_happy_path_emits_metric_json():
    rc, line = _run({})
    assert rc == 0
    assert line["metric"] == "1080p_nohg_bf16_fps"
    assert line["unit"] == "fps"
    assert line["value"] > 0
    assert line["vs_baseline"] > 0
    # Cache transparency in the scored artifact (round 5): the JSON must say
    # whether the number came from a warm persistent-cache hit and which
    # detection path said so — not leave that to compile_s inference.
    assert "cache_hit" in line
    assert "cache_detect" in line


def test_bench_probe_failure_is_honest_error_json():
    # An unknown platform makes the probe child die instantly — the parent
    # RETRIES probes across the budget (round-5: the relay's failure mode is
    # flapping), then must still print the metric JSON with an error, the
    # probe-attempt history, and exit nonzero. Budgets tightened so the
    # retry loop exhausts in seconds.
    rc, line = _run(
        {
            "HDRTV_BENCH_PLATFORM": "definitely_not_a_platform",
            "HDRTV_BENCH_TIMEOUT_S": "200",
            "HDRTV_BENCH_PROBE_PAUSE_S": "1",
        }
    )
    assert rc != 0
    assert line["value"] == 0.0
    assert "error" in line and "probe" in line["error"]
    # Evidence-bearing error JSON (VERDICT r4 weak #1): at least two probe
    # attempts were made (retry, not single-shot surrender).
    assert len(line.get("probe_attempts", [])) >= 2


def test_bench_budget_kills_hung_attempt():
    # 1-second budgets: every child is killed mid-startup; the parent must
    # finish quickly with an error JSON rather than hanging (rc=124 class).
    rc, line = _run(
        {
            "HDRTV_BENCH_PROBE_BUDGET_S": "1",
            "HDRTV_BENCH_TURBO_BUDGET_S": "1",
            "HDRTV_BENCH_TIMEOUT_S": "30",
        },
        timeout=120,
    )
    assert rc != 0
    assert line["value"] == 0.0
    assert "error" in line


def test_child_turbo_clears_inherited_disable_pallas(monkeypatch, capsys):
    """An inherited HDRTV_DISABLE_PALLAS must not silently turn the turbo
    headline into a lax measurement (round-4 review fix)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod_t", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.delenv("HDRTV_BENCH_PLATFORM", raising=False)
    seen = {}

    def fake_measure():
        seen["dp"] = os.environ.get("HDRTV_DISABLE_PALLAS")
        return {"fps": 1.0}

    monkeypatch.setattr(bench, "measure_fps", fake_measure)
    monkeypatch.setenv("HDRTV_DISABLE_PALLAS", "1")
    bench._child_main("turbo")
    assert seen["dp"] is None
    # and the lax child sets it
    monkeypatch.delenv("HDRTV_DISABLE_PALLAS", raising=False)
    bench._child_main("lax")
    assert seen["dp"] == "1"
    capsys.readouterr()


def test_sigterm_reaps_inflight_child():
    """An outer SIGTERM of the parent (e.g. `timeout N python bench.py` with
    N below the self-cap) must not orphan the in-flight session-leader child
    — an orphaned child keeps the TPU busy and starves later probes
    (round-5 incident)."""
    import signal
    import time

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(
        {
            "HDRTV_BENCH_PLATFORM": "cpu",
            "HDRTV_BENCH_HEIGHT": "64",
            "HDRTV_BENCH_WIDTH": "128",
            # enormous frame count: the turbo child stays in flight for
            # minutes on CPU, so the parent is reliably mid-communicate()
            "HDRTV_BENCH_FRAMES": "2000000",
            "HDRTV_BENCH_TIMEOUT_S": "600",
        }
    )
    proc = subprocess.Popen(
        [sys.executable, BENCH],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, cwd=os.path.dirname(BENCH), start_new_session=True,
    )
    children: list[int] = []
    try:
        deadline = time.time() + 180
        while time.time() < deadline and not children:
            try:
                with open(f"/proc/{proc.pid}/task/{proc.pid}/children") as f:
                    children = [int(p) for p in f.read().split()]
            except OSError:
                break
            time.sleep(0.5)
        assert children, "no in-flight child appeared"
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=30)
        # give the SIGKILL a moment to land, then assert every child is gone
        deadline = time.time() + 10
        alive = children
        while time.time() < deadline and alive:
            alive = []
            for pid in children:
                try:
                    os.kill(pid, 0)
                    with open(f"/proc/{pid}/stat") as f:
                        if f.read().rsplit(")", 1)[-1].split()[0] != "Z":
                            alive.append(pid)
                except OSError:
                    pass
            time.sleep(0.5)
        assert not alive, f"orphaned children survived SIGTERM: {alive}"
    finally:
        for pid in children + [proc.pid]:
            try:
                os.killpg(pid, signal.SIGKILL)
            except OSError:
                pass
