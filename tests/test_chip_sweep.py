"""chip_sweep harness plumbing (CPU-only): step listing, budget kills of
whole process groups, status JSONL. The sweep owns the on-chip measurement
window after a relay outage — its kill logic must not orphan TPU holders."""

import json
import os
import subprocess
import sys
import time

TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "chip_sweep.py")


class TestChipSweep:
    def test_list_and_unknown_step(self):
        r = subprocess.run([sys.executable, TOOL, "--list"], capture_output=True, text=True)
        assert r.returncode == 0
        for name in ("bench_warm", "bench_verify", "modes_4k", "quality_matrix"):
            assert name in r.stdout
        r = subprocess.run(
            [sys.executable, TOOL, "--only", "nope"], capture_output=True, text=True
        )
        assert r.returncode == 2 and "unknown steps" in r.stderr

    def test_run_step_kills_process_group_on_budget(self, tmp_path, monkeypatch):
        import importlib.util

        spec = importlib.util.spec_from_file_location("chip_sweep", TOOL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(mod, "OUT", str(tmp_path))

        # a child that spawns ITS OWN grandchild writing a heartbeat file;
        # killpg must take the whole tree down
        hb = str(tmp_path / "hb")
        grand = tmp_path / "grand.py"
        grand.write_text(
            "import time\n"
            f"hb = {hb!r}\n"
            "while True:\n"
            "    open(hb, 'a').write('x')\n"
            "    time.sleep(0.2)\n"
        )
        child = tmp_path / "child.py"
        child.write_text(
            "import subprocess, sys, time\n"
            f"subprocess.Popen([sys.executable, {str(grand)!r}])\n"
            "time.sleep(60)\n"
        )
        t0 = time.time()
        ok = mod.run_step("sleeper", [sys.executable, str(child)], {}, budget=3)
        assert not ok and time.time() - t0 < 20
        time.sleep(1.0)
        size1 = os.path.getsize(hb) if os.path.exists(hb) else 0
        time.sleep(1.5)
        size2 = os.path.getsize(hb) if os.path.exists(hb) else 0
        assert size1 == size2, "grandchild survived the budget kill"
        recs = [json.loads(l) for l in open(tmp_path / "status.jsonl")]
        assert recs and recs[-1]["step"] == "sleeper" and recs[-1]["rc"] == -9

    def test_run_step_success_status(self, tmp_path, monkeypatch):
        import importlib.util

        spec = importlib.util.spec_from_file_location("chip_sweep", TOOL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(mod, "OUT", str(tmp_path))
        ok = mod.run_step("echo", [sys.executable, "-c", "print('hello')"], {}, budget=30)
        assert ok
        recs = [json.loads(l) for l in open(tmp_path / "status.jsonl")]
        assert recs[-1]["ok"] and "hello" in recs[-1]["tail"]

    def test_yield_kills_running_step_within_seconds(self, tmp_path, monkeypatch):
        """bench.py touches OUT/YIELD → the sweep must kill its in-flight
        step and report it yielded, well inside the step's budget (the
        cooperative chip handoff to the round driver's bench)."""
        import importlib.util
        import threading

        spec = importlib.util.spec_from_file_location("chip_sweep", TOOL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(mod, "OUT", str(tmp_path))

        def drop_flag():
            time.sleep(2)
            open(tmp_path / "YIELD", "w").close()

        threading.Thread(target=drop_flag, daemon=True).start()
        t0 = time.time()
        ok = mod.run_step("holder", [sys.executable, "-c", "import time; time.sleep(120)"],
                          {}, budget=300)
        assert not ok and time.time() - t0 < 30  # killed by yield, not budget
        recs = [json.loads(l) for l in open(tmp_path / "status.jsonl")]
        assert recs[-1]["step"] == "holder" and recs[-1].get("yielded")
        assert not os.path.exists(tmp_path / "step.pgid")  # cleaned up

    def test_yield_interrupts_relay_wait(self, tmp_path, monkeypatch):
        """A sweep stuck in the sparse relay-wait loop must exit rc=3 within
        seconds of YIELD instead of sleeping out its 10-min cycle."""
        import importlib.util
        import threading

        spec = importlib.util.spec_from_file_location("chip_sweep", TOOL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(mod, "OUT", str(tmp_path))
        monkeypatch.setattr(mod, "probe", lambda *a, **k: False)  # relay down

        def drop_flag():
            time.sleep(2)
            open(tmp_path / "YIELD", "w").close()

        threading.Thread(target=drop_flag, daemon=True).start()
        monkeypatch.setattr(sys, "argv", ["chip_sweep"])
        t0 = time.time()
        rc = mod.main()
        assert rc == 3 and time.time() - t0 < 60
        recs = [json.loads(l) for l in open(tmp_path / "status.jsonl")]
        assert any(r.get("out") == "yielded to bench.py" for r in recs)
        assert not os.path.exists(tmp_path / "driver.pid")  # cleaned up

    def test_bench_yield_handshake(self, tmp_path, monkeypatch):
        """bench.py's _yield_chip_sweep: drops the flag and waits for the
        recorded driver pid to exit; sweep children (HDRTV_SWEEP_CHILD) never
        signal their own parent."""
        import importlib.util

        bench_path = os.path.join(os.path.dirname(TOOL), "..", "bench.py")
        spec = importlib.util.spec_from_file_location("bench_mod", bench_path)
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)

        # a stand-in "sweep driver" that exits as soon as the flag appears
        proc = subprocess.Popen([
            sys.executable, "-c",
            "import os,sys,time\n"
            f"flag = os.path.join({str(tmp_path)!r}, 'YIELD')\n"
            "for _ in range(600):\n"
            "    if os.path.exists(flag): sys.exit(3)\n"
            "    time.sleep(0.1)\n",
        ])
        (tmp_path / "driver.pid").write_text(str(proc.pid))
        monkeypatch.setenv("HDRTV_SWEEP_DIR", str(tmp_path))
        try:
            # sweep child: must be a no-op (flag never dropped)
            monkeypatch.setenv("HDRTV_SWEEP_CHILD", "1")
            bench._yield_chip_sweep()
            assert not os.path.exists(tmp_path / "YIELD")
            monkeypatch.delenv("HDRTV_SWEEP_CHILD")
            t0 = time.time()
            bench._yield_chip_sweep()
            assert time.time() - t0 < 30  # driver saw the flag and exited
            assert proc.wait(timeout=10) == 3
        finally:
            if proc.poll() is None:
                proc.kill()

    def test_sweep_report_renders_all_row_types(self, tmp_path, monkeypatch):
        """tools/sweep_report.py is the transcription tool for sweep results;
        it must render bench_modes rows, bench.py metric lines, warm-cache
        status, and failures from status.jsonl + per-step logs."""
        import importlib.util

        tool = os.path.join(os.path.dirname(TOOL), "sweep_report.py")
        spec = importlib.util.spec_from_file_location("sweep_report", tool)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(mod, "OUT", str(tmp_path))

        with open(tmp_path / "status.jsonl", "w") as f:
            for rec in [
                {"step": "probe", "ok": True},
                {"step": "bench_warm", "ok": True, "rc": 0, "seconds": 900.0},
                {"step": "bench_verify", "ok": True, "rc": 0, "seconds": 120.0},
                {"step": "modes_1080_int8", "ok": True, "rc": 0, "seconds": 300.0},
                {"step": "modes_4k", "ok": False, "rc": -9, "seconds": 5400.0},
                {"step": "bench_device_resident_4k", "ok": True, "rc": 0, "seconds": 198.0},
                {"step": "sweep", "ok": True},
            ]:
                f.write(json.dumps(rec) + "\n")
        (tmp_path / "bench_warm.log").write_text(
            json.dumps({"warmed": True, "cache_hit_verified": True}) + "\n")
        (tmp_path / "bench_verify.log").write_text(
            json.dumps({"metric": "1080p_nohg_bf16_fps", "value": 50.56,
                        "unit": "fps", "vs_baseline": 1.731, "compile_s": 8.2}) + "\n")
        (tmp_path / "modes_1080_int8.log").write_text(
            "noise line\n" + json.dumps({
                "ms_per_frame": 18.8, "fps": 53.2, "mode": "nohg",
                "precision": "int8-full-qat", "resolution": "1080p",
                "native_int8": True}) + "\n")

        # cli bench --device-resident prints PRETTY-PRINTED (multi-line)
        # JSON — the report must still extract it (round-5 blob fallback).
        (tmp_path / "bench_device_resident_4k.log").write_text(
            "WARNING: platform banner\n" + json.dumps({
                "device_fps": 13.95, "device_model_ms": 71.706, "frames": 300,
                "compile_s": 168.1, "resolution": "3840x2160",
                "methodology": "device-resident"}, indent=2) + "\n")

        rep = mod.build_report()
        assert "warmed=True" in rep and "cache_hit_verified=True" in rep
        assert "| bench_device_resident_4k | device-resident 3840x2160 | 71.706 | 13.95 |" in rep
        assert "| bench_verify | 1080p_nohg_bf16_fps | 19.78 | 50.56 |" in rep
        assert "vs_baseline=1.731" in rep
        assert "nohg int8-full-qat 1080p | 18.8 | 53.2" in rep
        assert "| modes_4k | — | — | — | FAILED rc=-9" in rep
        assert "probe" not in rep.splitlines()[-3]  # probe/sweep rows omitted

    def test_deadline_skips_steps_that_cannot_finish(self, tmp_path, monkeypatch):
        """--deadline-epoch: the sweep must never hold the TPU into the
        round driver's own bench window — a step only starts if its WHOLE
        budget fits before the deadline (a mid-flight kill would wedge the
        relay), and the relay wait is capped to the deadline too."""
        import importlib.util

        spec = importlib.util.spec_from_file_location("chip_sweep", TOOL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(mod, "OUT", str(tmp_path))
        monkeypatch.setattr(mod, "probe", lambda *a, **k: True)  # relay "up"
        ran = []
        monkeypatch.setattr(
            mod, "run_step", lambda name, argv, env, budget: (ran.append(name), True)[1]
        )
        # fits: budget 5s vs ~60s to deadline; doesn't fit: budget 2400s
        monkeypatch.setattr(
            mod, "STEPS",
            [("fits", ["x"], {}, 5), ("too_big", ["x"], {}, 2400)],
        )
        monkeypatch.setattr(
            sys, "argv",
            ["chip_sweep", "--deadline-epoch", str(time.time() + 60)],
        )
        assert mod.main() == 0
        assert ran == ["fits"]
        recs = [json.loads(l) for l in open(tmp_path / "status.jsonl")]
        skipped = [r for r in recs if r["step"] == "too_big"]
        assert skipped and "skipped" in skipped[0]["out"]
        # no deadline → nothing skipped
        ran.clear()
        monkeypatch.setattr(sys, "argv", ["chip_sweep"])
        assert mod.main() == 0
        assert ran == ["fits", "too_big"]
