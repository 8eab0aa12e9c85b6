"""Round-4 on-chip checklist runner (relay-outage recovery automation).

The round-3/4 relay outages showed chip time is the scarce resource: when
the relay recovers, every chip-dependent deliverable should run unattended,
in priority order, with per-step budgets and wedge-aware recovery — instead
of hand-driving each measurement and losing the window to the next outage.

Operating rules baked in (verify skill round-3 addenda):
- ONE TPU process at a time: this orchestrator is that process; steps run
  sequentially as subprocesses with output to per-step logs.
- A killed in-flight compile can wedge the relay, so budgets are generous
  and sized to each step's known compile cost (4K ≈ 25-40 min cold).
- After any step failure, a bounded probe decides between continuing
  (step-specific failure) and pausing (relay wedge: sparse 10-min probes).

Usage (background, output to a file — never a foreground timeout):
    python tools/chip_sweep.py [--only step1,step2] [--list] \
        > /tmp/r4sweep/driver.log 2>&1

Results: logs + status.jsonl under logs/chip_sweep_r5/.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("HDRTV_SWEEP_DIR") or os.path.join(REPO, "logs", "chip_sweep_r5")

# Cooperative chip handoff: bench.py (the round driver's benchmark — the
# highest-priority chip user) touches OUT/YIELD before probing. The sweep
# checks the flag every ≤10 s — between probes, inside the relay-wait
# sleep, and DURING a running step (killing the step's process group) —
# and exits rc=3 within seconds, so the driver bench never shares the
# chip with a sweep step (one TPU process at a time). driver.pid /
# step.pgid let bench.py hard-kill a stuck sweep by recorded pid (never
# by pattern) if the flag isn't honored in time.

PROBE = (
    "import time,numpy as np,jax,jax.numpy as jnp;t0=time.time();"
    "x=jnp.ones((256,256),jnp.bfloat16);v=float(np.asarray((x@x).sum()));"
    "print(f'PROBE OK {v} {time.time()-t0:.1f}s')"
)

PY = sys.executable


def _bm(*extra: str) -> list[str]:
    return [PY, os.path.join(REPO, "tools", "bench_modes.py"), *extra]


# (name, argv, env overrides, budget_s). Order = priority: the driver bench
# must be green first (VERDICT #1), then the perf levers, then quality.
STEPS: list[tuple[str, list[str], dict, int]] = [
    ("smoke", [PY, os.path.join(REPO, "tools", "tpu_smoke.py")], {}, 1500),
    # --warm internal worst case: 2×2400 s populate + 2×900 s verify.
    ("bench_warm", [PY, os.path.join(REPO, "bench.py"), "--warm"], {}, 7500),
    ("bench_verify", [PY, os.path.join(REPO, "bench.py")], {}, 1800),
    # HDRTV_DB_DMA probe: the double-buffered halo DMA conv3 path is opt-in
    # until proven on real Mosaic (80cab31). Small first, then 1080p A/B.
    ("dbdma_544_off", _bm("--height", "544", "--width", "960"), {"HDRTV_DB_DMA": "0"}, 2400),
    ("dbdma_544_on", _bm("--height", "544", "--width", "960"), {"HDRTV_DB_DMA": "1"}, 2400),
    ("dbdma_1080_off", _bm(), {"HDRTV_DB_DMA": "0"}, 2400),
    ("dbdma_1080_on", _bm(), {"HDRTV_DB_DMA": "1"}, 2400),
    # Device trace for the roofline work (profile where the ~13 ms of
    # non-roofline 1080p time goes — VERDICT #3). The profiled jit
    # signature differs from the cached one: budget a fresh compile.
    ("trace_1080", _bm("--trace", os.path.join(REPO, "logs", "chip_sweep_r5", "trace_1080")), {}, 3600),
    # Post-outage revalidation sweep (VERDICT #7): refresh every headline.
    # The lax-only row is the GSPMD mesh path's per-chip numerator (the
    # program multi-chip GSPMD actually runs) AND bench.py's fallback rate —
    # last measured round 1 (~96 ms/1080p), never re-measured since.
    ("modes_1080_lax", _bm(), {"HDRTV_DISABLE_PALLAS": "1"}, 2400),
    # The real headline int8 row: shipped full-QAT checkpoint, native W8A8
    # megakernel path (r3: 18.80 ms). --precision int8 without a model only
    # revalidates the policy plumbing over fp32 weights.
    ("modes_1080_int8",
     _bm("--model", "/root/reference/src/models/weights/original/pytorch_int8/"
         "hr/HR_original_int8_full_qat.pt"), {}, 2400),
    ("modes_720", _bm("--height", "720", "--width", "1280"), {}, 2400),
    ("modes_hg", _bm("--hg"), {}, 3600),
    ("modes_4k", _bm("--height", "2160", "--width", "3840"), {}, 5400),
    # Batch-export throughput (VERDICT #6): unbounded vs bounded in-flight.
    ("batch8_unbounded", _bm("--batch", "8"), {"HDRTV_BATCH_INFLIGHT": "64"}, 2400),
    ("batch8_inflight4", _bm("--batch", "8"), {"HDRTV_BATCH_INFLIGHT": "4"}, 2400),
    ("batch8_inflight3", _bm("--batch", "8"), {"HDRTV_BATCH_INFLIGHT": "3"}, 2400),
    # Device-resident vs runner split (VERDICT r3 #8 / r4 #2): the honest
    # projection row next to the tunnel-dominated runner number.
    ("bench_device_resident",
     [PY, "-m", "hdrtv_tpu.cli", "bench", "--resolution", "1080p",
      "--precision", "FP16", "--device-resident-only", "--duration", "10"],
     {}, 2400),
    # The same honest device-resident row at the 4K north-star resolution
    # (round-5 close: the jit_step 4K pairs number is 72.65 ms; this runs
    # the PipelineRunner's own program).
    ("bench_device_resident_4k",
     [PY, "-m", "hdrtv_tpu.cli", "bench", "--resolution", "4K",
      "--precision", "FP16", "--device-resident-only", "--duration", "10"],
     {}, 5400),
    # Quality matrices (VERDICT #4): no-HG refresh + HG table + pseudo-GT.
    ("quality_matrix", [PY, os.path.join(REPO, "tools", "make_quality_matrix.py")], {}, 5400),
    ("gt_quality", [PY, os.path.join(REPO, "tools", "make_gt_quality.py"),
                    "--include-hg", "--size", "512x320", "--frames", "6"], {}, 5400),
    # Mosaic acceptance proof (VERDICT r4 #2/#4): compile every megakernel
    # call the 8-shard 4K shard_map programs dispatch, on the real chip
    # (compile-only — the per-shard shapes from logs/multichip/kernel_calls.pkl).
    ("mosaic_prove", [PY, os.path.join(REPO, "tools", "multichip_bringup.py"),
                      "prove", "--budget-s", "4800"], {}, 5400),
]


def yield_requested() -> bool:
    return os.path.exists(os.path.join(OUT, "YIELD"))


def log_status(rec: dict) -> None:
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(os.path.join(OUT, "status.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def probe(budget: int = 300) -> bool:
    proc = subprocess.Popen(
        [PY, "-c", PROBE], cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    deadline = time.monotonic() + budget
    while True:  # 10 s slices so a YIELD interrupts even a hung probe
        try:
            out, _ = proc.communicate(timeout=min(10, max(0.1, deadline - time.monotonic())))
            ok = proc.returncode == 0 and "PROBE OK" in (out or "")
            log_status({"step": "probe", "ok": ok, "out": (out or "").strip()[-120:]})
            return ok
        except subprocess.TimeoutExpired:
            if yield_requested() or time.monotonic() >= deadline:
                proc.kill()
                out, _ = proc.communicate()
                why = "yielded" if yield_requested() else "timeout"
                log_status({"step": "probe", "ok": False, "out": why})
                return False


def wait_for_relay(max_wait_s: int = 28800) -> bool:
    """Sparse probing during a wedge: one bounded probe every 10 min."""
    deadline = time.monotonic() + max_wait_s
    while time.monotonic() < deadline:
        if yield_requested():
            return False
        if probe():
            return True
        sleep_until = time.monotonic() + 600
        while time.monotonic() < min(sleep_until, deadline):
            if yield_requested():
                return False
            time.sleep(10)
    return False


def run_step(name: str, argv: list[str], env_over: dict, budget: int) -> bool:
    # HDRTV_SWEEP_CHILD: bench.py steps must not YIELD their own parent
    env = dict(os.environ, HDRTV_SWEEP_CHILD="1",
               **{k: str(v) for k, v in env_over.items()})
    log_path = os.path.join(OUT, f"{name}.log")
    t0 = time.time()
    with open(log_path, "w") as lf:
        lf.write(f"# {' '.join(argv)} env={env_over} budget={budget}s\n")
        lf.flush()
        # Own session + killpg on timeout (a bare subprocess kill leaves the
        # step's process tree holding the TPU). bench.py's attempt children
        # detach into their OWN sessions, which killpg cannot reach — so the
        # bench steps' budgets sit ABOVE bench.py's internal self-budgets
        # (6600 > 2×2400+2×600, 1800 > 1500) and bench.py reaps its own
        # children; the post-failure probe catches any survivor anyway.
        proc = subprocess.Popen(argv, cwd=REPO, env=env, stdout=lf,
                                stderr=subprocess.STDOUT, start_new_session=True)
        try:
            with open(os.path.join(OUT, "step.pgid"), "w") as pf:
                pf.write(str(proc.pid))
        except OSError:
            pass
        deadline = time.monotonic() + budget
        rc = None
        while rc is None:
            try:
                rc = proc.wait(timeout=min(10, max(0.1, deadline - time.monotonic())))
            except subprocess.TimeoutExpired:
                if yield_requested() or time.monotonic() >= deadline:
                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except (ProcessLookupError, PermissionError):
                        proc.kill()
                    proc.wait()
                    rc = -9
        try:
            os.remove(os.path.join(OUT, "step.pgid"))
        except OSError:
            pass
    dt = round(time.time() - t0, 1)
    tail = ""
    try:
        with open(log_path, "rb") as lf:
            lf.seek(0, os.SEEK_END)
            lf.seek(max(0, lf.tell() - 300))
            tail = lf.read().decode("utf-8", "replace").replace("\n", " | ")
    except OSError:
        pass
    rec = {"step": name, "ok": rc == 0, "rc": rc, "seconds": dt, "tail": tail}
    if yield_requested():
        rec["yielded"] = True
    log_status(rec)
    return rc == 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", help="comma list of step names to run")
    ap.add_argument("--list", action="store_true")
    ap.add_argument(
        "--deadline-epoch", type=float, default=None,
        help="unix time after which NO new step may start (and no step whose "
        "budget would cross it) — the sweep must never hold the TPU when the "
        "round driver's own bench.py runs (one TPU process at a time)",
    )
    args = ap.parse_args()
    if args.list:
        for name, argv, env_over, budget in STEPS:
            print(f"{name:20s} budget={budget:5d}s env={env_over} :: {' '.join(argv)}")
        return 0
    os.makedirs(OUT, exist_ok=True)
    try:
        os.setpgrp()  # group leader: killpg(driver.pid) reaches our probes too
    except OSError:
        pass
    # stale flag from a finished bench run must not instantly yield us
    try:
        os.remove(os.path.join(OUT, "YIELD"))
    except OSError:
        pass
    try:
        with open(os.path.join(OUT, "driver.pid"), "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    try:
        return _main_steps(args)
    finally:
        try:
            os.remove(os.path.join(OUT, "driver.pid"))
        except OSError:
            pass


def _main_steps(args) -> int:
    steps = STEPS
    if args.only:
        want = {s.strip() for s in args.only.split(",") if s.strip()}
        unknown = want - {n for n, *_ in STEPS}
        if unknown:
            print(f"unknown steps: {sorted(unknown)}", file=sys.stderr)
            return 2
        steps = [s for s in STEPS if s[0] in want]

    def _remaining() -> float:
        if args.deadline_epoch is None:
            return float("inf")
        return args.deadline_epoch - time.time()

    def _yielded() -> bool:
        if yield_requested():
            log_status({"step": "sweep", "ok": False, "out": "yielded to bench.py"})
            return True
        return False

    if not wait_for_relay(int(max(1, min(_remaining() - 600, 28800)))):
        if _yielded():
            return 3
        log_status({"step": "sweep", "ok": False, "out": "relay never recovered"})
        return 1
    for name, argv, env_over, budget in steps:
        # A running step shouldn't be killed (a killed in-flight compile can
        # wedge the relay), so a step only STARTS if its whole budget fits
        # before the deadline. A YIELD is the exception: starving the round
        # driver's bench is strictly worse than the wedge risk.
        if _yielded():
            return 3
        if budget > _remaining():
            log_status({"step": name, "ok": False,
                        "out": f"skipped: budget {budget}s > {int(max(0, _remaining()))}s to deadline"})
            continue
        ok = run_step(name, argv, env_over, budget)
        if not ok:
            if _yielded():
                return 3
            # The post-failure probe holds the chip up to 300 s — it too must
            # fit before the deadline (one TPU process at a time: the round
            # driver's bench.py owns the chip after --deadline-epoch).
            if _remaining() < 360:
                log_status({"step": name, "ok": False,
                            "out": "failed near deadline; yielding the chip"})
                break
            if not probe():
                # step failure + dead relay = wedge: pause sparsely, then go on
                log_status({"step": name, "ok": False, "out": "relay wedged; waiting"})
                if not wait_for_relay(int(max(1, min(_remaining() - 600, 28800)))):
                    if _yielded():
                        return 3
                    log_status({"step": "sweep", "ok": False, "out": "wedge never cleared"})
                    return 1
    log_status({"step": "sweep", "ok": True})
    return 0


if __name__ == "__main__":
    sys.exit(main())
