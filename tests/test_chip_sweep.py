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
