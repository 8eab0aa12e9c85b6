"""Headline benchmark: 1080p SDR→HDR10 frames/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": "1080p_nohg_bf16_fps", "value": N, "unit": "fps", "vs_baseline": R}

Baseline: the reference's best comparable number — 1080p no-HG FP16 TensorRT
at 34.23 ms/frame ≈ 29.2 FPS on an RTX 5060 Ti (BASELINE.md).

Measured path: the full fused per-frame program — uint8 frame → [0,1] RGB →
¼-res antialiased-bicubic cond → AGCM→LE (bf16, s2d turbo mode) → clamp →
u16 RGB48 pack — executed back-to-back with a data dependence between frames
(the packed output feeds the next frame) and a final device fetch.

Methodology note: on this runner, ``block_until_ready`` through the axon
relay does not wait for execution; a real device fetch does. The loop chains
n frames and times dispatch + final fetch, which was validated to scale
linearly in n (true sustained throughput).

Robustness (round 4): every device-touching step runs in a BUDGETED
SUBPROCESS so one bad attempt cannot consume the whole driver window
(round 3's failure mode: a 25-minute turbo RuntimeError followed by a cold
fallback compile → rc=124, no JSON at all). The sequence is:

  1. relay probe (tiny matmul + fetch, ~4 min budget) — a wedged relay is
     detected up front and reported as an honest error JSON;
  2. turbo attempt (Pallas megakernels, ~10 min budget — warm-cache loads
     are ~1 min; the budget fits one cold compile after a cache-less
     recovery and otherwise only matters when something is wrong);
  3. on failure, a re-probe then a no-pallas fallback with the remaining
     budget.

Total wall-clock is capped at HDRTV_BENCH_TIMEOUT_S (default 1500 s), far
under the driver's patience, and a JSON line is printed on every path.

Round 5 (VERDICT r4 item 1): the probe is now a RETRY LOOP across the whole
budget — the relay's observed failure mode is flapping, and round 4's
single-probe policy surrendered ~1250 s of budget after one failed attempt.
Every successful run also persists its number to logs/bench_last_good.json,
and every error JSON carries the probe-attempt history plus the last known
good measurement (clearly labeled metadata — never the scored metric).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

BASELINE_FPS = 1000.0 / 34.23  # reference 1080p no-HG FP16 (README.md:67)
METRIC = "1080p_nohg_bf16_fps"
_RESULT_TAG = "BENCH_RESULT "


def measure_fps(height: int | None = None, width: int | None = None, n: int | None = None) -> dict:
    # Shape/frame-count overrides exist for the CI plumbing test (CPU, tiny
    # shape); the driver-scored run always uses the 1080p defaults.
    height = height or int(os.environ.get("HDRTV_BENCH_HEIGHT", "1080") or 1080)
    width = width or int(os.environ.get("HDRTV_BENCH_WIDTH", "1920") or 1920)
    n = n or int(os.environ.get("HDRTV_BENCH_FRAMES", "60") or 60)
    import numpy as np

    import jax

    from hdrtv_tpu.runtime.engine import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_npz
    from hdrtv_tpu.models.layers import BF16
    from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48_pairs, s2d_transform_params

    here = os.path.dirname(os.path.abspath(__file__))
    params = load_npz(os.path.join(here, "weights", "hr_fp32.npz"))
    sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(params).items()}
    cfg = ModelConfig()

    def step(p, xr_u8):
        # Row-pair-plane contract: (Hb,2,Wb,6) u8 in → same-shape u16 RGB48
        # out. The same bytes as the decoder-buffer / feeder (H, 3W) rows —
        # the host view between the layouts is free — but the jit boundary
        # keeps the layout the megakernels use, skipping both boundary
        # retiles (~1.4 ms/frame at 1080p, round-5 device profile). The
        # chain feedback is a zero-valued scalar token OR'd into the input:
        # still data-dependent (frame i+1 waits on frame i's output), but
        # one lane-wasteful minor-6 elementwise pass cheaper than the old
        # full u16→u8 cast (0.58 ms/frame, round-5 profile).
        packed = ensemble_s2d_rgb48_pairs(p, xr_u8, None, cfg, policy=BF16)
        # One-byte in-place update on the DONATED input buffer (XLA aliases
        # u8-in → u8-out: same shape/dtype/layout): frame i+1's input waits
        # on frame i's output at zero bulk cost. `& 1` (not `& 0`) so XLA
        # cannot constant-fold the dependence away (round-5 lesson: the
        # folded token degraded to a 0.4 ms input copy with NO dependence).
        tok = (packed[0, 0, 0, 0] & jnp.uint16(1)).astype(jnp.uint8)
        nxt = jax.lax.dynamic_update_slice(
            xr_u8, tok.reshape(1, 1, 1, 1), (0, 0, 0, 0)
        )
        return packed, nxt

    rm = None
    if jax.default_backend() == "tpu" and os.environ.get("HDRTV_PIN_LAYOUTS") == "1":
        # Pin the boundary layouts row-major: kills the remaining relayout
        # copies (~0.3 ms), BUT executables with explicit entry Formats
        # fail with INVALID_ARGUMENT after a persistent-cache deserialize
        # on this runner's relay (round-5 isolation) — so the pin is
        # opt-in and the driver-scored default stays cache-safe.
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        rm = Format(Layout((0, 1, 2, 3)), SingleDeviceSharding(jax.devices()[0]))
        step = jax.jit(
            step, in_shardings=(None, rm), out_shardings=(rm, rm), donate_argnums=1
        )
    else:
        step = jax.jit(step, donate_argnums=1)

    frame_np = (
        (np.random.RandomState(0).rand(height, width * 3) * 255)
        .astype(np.uint8)
        .reshape(height // 2, 2, (width * 3) // 6, 6)
    )
    frame = jax.device_put(frame_np, rm) if rm is not None else jax.device_put(jnp.asarray(frame_np))
    # Observe jax's own persistent-cache hit/miss line for THIS program:
    # compile_s alone cannot distinguish a recompile from the axon relay's
    # slow first-load of a deserialized executable (measured round 4: the
    # lax program warm-loads in ~220-270 s with a logged cache HIT at ~8 s,
    # while turbo warm-loads in ~18 s — same cache, different load cost).
    import logging

    hits: list[str] = []

    class _HitFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            if "cache hit for 'jit_step'" in msg:
                hits.append("hit")
            elif "CACHE MISS for 'jit_step'" in msg:
                hits.append("miss")
            return True

    comp_logger = logging.getLogger("jax._src.compiler")
    prev_level = comp_logger.level
    comp_logger.setLevel(logging.DEBUG)
    f = _HitFilter()
    comp_logger.addFilter(f)
    t_c0 = time.perf_counter()
    try:
        packed, frame = step(sp, frame)
        _ = np.asarray(packed[:2, :2])  # warm + force first execution
    finally:
        comp_logger.removeFilter(f)
        comp_logger.setLevel(prev_level)
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    f = frame
    for _ in range(n):
        packed, f = step(sp, f)
    _ = np.asarray(packed[:2, :2])  # fetch forces the chain to complete
    dt = (time.perf_counter() - t0) / n
    out = {"fps": 1.0 / dt, "compile_s": round(compile_s, 1)}
    if hits:
        out["cache_hit"] = hits[0] == "hit"
        out["cache_detect"] = "log"
    else:
        # The jax._src.compiler log line was not seen (private API — a jax
        # upgrade may reword it); callers fall back to the compile-time
        # threshold, which round 4 showed is wrong for slow warm-loads.
        out["cache_detect"] = "time-fallback"
    return out


def _child_probe() -> dict:
    """Tiny matmul + fetch — proves the relay dispatches AND returns data."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jnp.ones((256, 256), jnp.bfloat16)
    # Sum in f32 and compare with tolerance: the probe tests the relay,
    # not the backend's reduction-accumulator precision.
    val = float(np.asarray((x @ x).astype(jnp.float32).sum()))
    return {"ok": abs(val - 256.0**3) < 1.0, "probe_s": round(time.perf_counter() - t0, 1),
            "device": str(jax.devices()[0].platform)}


def _child_main(mode: str) -> None:
    platform = os.environ.get("HDRTV_BENCH_PLATFORM")  # "cpu" = CI plumbing test
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    try:
        if mode == "probe":
            out = _child_probe()
        else:
            if mode == "lax":
                os.environ["HDRTV_DISABLE_PALLAS"] = "1"
            else:
                # An inherited HDRTV_DISABLE_PALLAS would silently turn the
                # turbo headline into a lax measurement.
                os.environ.pop("HDRTV_DISABLE_PALLAS", None)
            out = measure_fps()
    except BaseException as exc:  # noqa: BLE001 — the parent wants the reason
        print(_RESULT_TAG + json.dumps({"error": f"{type(exc).__name__}: {exc}"[:400]}), flush=True)
        raise SystemExit(1)
    print(_RESULT_TAG + json.dumps(out), flush=True)


_INFLIGHT_PGIDS: list[int] = []  # session-leader pgids of in-flight children


def _reap_inflight_and_die(signum, frame) -> None:
    """SIGTERM/SIGINT/SIGHUP handler (parent modes only): kill the in-flight
    child's process group before dying. Children run as session leaders so a
    budget SIGKILL can reach the whole attempt — which also means an OUTER
    kill of the parent (e.g. a driver/operator `timeout N python bench.py`
    with N below the 1500 s self-cap) would otherwise ORPHAN the child,
    leaving it holding the TPU and starving every later probe (observed
    round 5: an orphaned `--child turbo` blocked relay probes until killed
    by pid)."""
    for pgid in list(_INFLIGHT_PGIDS):
        try:
            os.killpg(pgid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
    signal.signal(signum, signal.SIG_DFL)
    os.kill(os.getpid(), signum)


def _install_reaper() -> None:
    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            signal.signal(sig, _reap_inflight_and_die)
        except (ValueError, OSError):  # non-main thread / exotic platform
            pass


def _run_child(mode: str, budget_s: float) -> dict:
    """Run one attempt in its own process group with a hard kill budget."""
    if budget_s <= 0:
        return {"error": f"no budget left for {mode} attempt"}
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        start_new_session=True, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    _INFLIGHT_PGIDS.append(proc.pid)
    killed = False
    try:
        out, _ = proc.communicate(timeout=budget_s)
    except subprocess.TimeoutExpired:
        killed = True
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        out, _ = proc.communicate()
    finally:
        try:
            _INFLIGHT_PGIDS.remove(proc.pid)
        except ValueError:
            pass
    result: dict = {}
    for line in (out or "").splitlines():
        if line.startswith(_RESULT_TAG):
            try:
                result = json.loads(line[len(_RESULT_TAG):])
            except json.JSONDecodeError:
                pass
    if killed:
        result.setdefault("error", f"{mode} attempt exceeded {budget_s:.0f}s budget (killed)")
        result["timeout"] = True
    elif proc.returncode != 0:
        result.setdefault("error", f"{mode} attempt exited rc={proc.returncode}")
    if "error" in result:
        sys.stderr.write(f"bench: {mode}: {result['error']}\n")
    return result


_LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "logs", "bench_last_good.json"
)


def _save_last_good(value: float, extra: dict | None) -> None:
    """Persist a successful measurement so a later relay-outage round still
    transmits evidence (informative metadata in the error JSON, never the
    scored metric)."""
    if os.environ.get("HDRTV_BENCH_PLATFORM"):
        return  # CI plumbing mode (tiny CPU shape) — not a real measurement
    rec = {
        "fps": round(value, 2),
        "vs_baseline": round(value / BASELINE_FPS, 3),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **{k: v for k, v in (extra or {}).items() if k in ("compile_s", "path")},
    }
    try:
        os.makedirs(os.path.dirname(_LAST_GOOD_PATH), exist_ok=True)
        tmp = _LAST_GOOD_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, _LAST_GOOD_PATH)
    except OSError:
        pass


def _load_last_good() -> dict | None:
    try:
        with open(_LAST_GOOD_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _emit(value: float, extra: dict | None = None, ok: bool = True) -> None:
    line = {
        "metric": METRIC,
        "value": round(value, 2),
        "unit": "fps",
        "vs_baseline": round(value / BASELINE_FPS, 3),
    }
    if extra:
        line.update(extra)
    if ok and value > 0:
        _save_last_good(value, extra)
    elif not ok:
        last = _load_last_good()
        if last:
            # Clearly-labeled evidence of the last bench.py-measured good
            # number (VERDICT r4 weak #1) — metadata, not the metric.
            line["last_good_fps"] = last.get("fps")
            line["last_good_ts"] = last.get("ts")
    print(json.dumps(line), flush=True)
    raise SystemExit(0 if ok else 1)


def warm() -> None:
    """Populate the persistent XLA cache for BOTH bench programs (turbo and
    lax-fallback 1080p) with generous budgets — the committed round-end step
    that keeps the driver's bench run compile-free (VERDICT r3 item 1b).
    Prints one status JSON line; exits 0 only if both programs now load warm.
    """
    budget = float(os.environ.get("HDRTV_WARM_BUDGET_S", "2400") or 2400)
    out = {}
    for mode in ("turbo", "lax"):  # pass 1: populate (may cold-compile)
        res = _run_child(mode, budget)
        out[mode] = {k: res.get(k) for k in ("fps", "compile_s", "cache_hit", "error") if k in res}
    ok = all("fps" in v for v in out.values())
    warm_ok = False
    if ok:
        # pass 2: verify — the child reports jax's own persistent-cache
        # hit/miss line for the bench program. compile_s alone cannot tell a
        # recompile from the relay's slow warm-load (the lax program
        # warm-loads in ~220-270 s WITH a cache hit; turbo in ~18 s), so the
        # time check is only the fallback when no hit/miss line was seen.
        # 900 s default: PERF_NOTES r4 records lax warm-loads of 216-578 s
        # through the relay; 600 s left no headroom for the slow tail.
        verify_budget = float(os.environ.get("HDRTV_WARM_VERIFY_BUDGET_S", "900") or 900)
        for mode in ("turbo", "lax"):
            res = _run_child(mode, verify_budget)
            out[mode + "_verify"] = {
                k: res.get(k)
                for k in ("fps", "compile_s", "cache_hit", "cache_detect", "error")
                if k in res
            }
        warm_ok = all(
            out.get(m + "_verify", {}).get(
                "cache_hit", out.get(m + "_verify", {}).get("compile_s", 1e9) < 60
            )
            for m in ("turbo", "lax")
        )
    print(json.dumps({"warmed": ok, "cache_hit_verified": warm_ok, **out}), flush=True)
    raise SystemExit(0 if ok and warm_ok else 1)


def _yield_chip_sweep() -> None:
    """Ask a running tools/chip_sweep.py to release the chip (one TPU process
    at a time — the driver bench outranks the unattended sweep). The sweep
    polls OUT/YIELD every ≤10 s, kills its in-flight step, and exits; if it
    doesn't within the grace window, kill it by its RECORDED pids (never by
    pattern)."""
    if os.environ.get("HDRTV_SWEEP_CHILD"):
        return  # we ARE a sweep step — never yield our own parent
    out = os.environ.get("HDRTV_SWEEP_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "logs", "chip_sweep_r5"
    )

    def _alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except OSError:
            return False
        try:  # a zombie (exited, unreaped by its parent) is NOT holding the chip
            with open(f"/proc/{pid}/stat") as f:
                return f.read().rsplit(")", 1)[-1].split()[0] != "Z"
        except (OSError, IndexError):
            return True

    pid_path = os.path.join(out, "driver.pid")
    try:
        with open(pid_path) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return
    if not _alive(pid):
        return
    try:
        with open(os.path.join(out, "YIELD"), "w") as f:
            f.write(str(time.time()))
    except OSError:
        pass
    grace = float(os.environ.get("HDRTV_BENCH_YIELD_WAIT_S", "60") or 60)
    deadline = time.time() + grace
    while time.time() < deadline:
        if not _alive(pid):
            return  # sweep exited cleanly
        time.sleep(2)
    sys.stderr.write("bench: chip_sweep ignored YIELD; killing recorded pids\n")
    try:
        with open(os.path.join(out, "step.pgid")) as f:
            os.killpg(int(f.read().strip()), signal.SIGKILL)
    except (OSError, ValueError):
        pass
    try:
        os.killpg(pid, signal.SIGKILL)  # driver (setpgrp leader) + its probes
    except (OSError, ValueError):
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            pass
    time.sleep(5)


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--warm":
        _install_reaper()
        _yield_chip_sweep()
        warm()
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        _child_main(sys.argv[2])
        return

    _install_reaper()
    _yield_chip_sweep()
    total_s = float(os.environ.get("HDRTV_BENCH_TIMEOUT_S", "1500") or 1500)
    probe_s = float(os.environ.get("HDRTV_BENCH_PROBE_BUDGET_S", "150") or 150)
    # 750 s fits a COLD turbo compile (observed 455-709 s on the remote
    # helper across round-4/5 sessions) if the relay recovers after an
    # outage with no warm cache — probe + turbo 750 still leaves the lax
    # fallback several minutes of the 1500 s total, and warm runs never
    # come near the cap.
    turbo_s = float(os.environ.get("HDRTV_BENCH_TURBO_BUDGET_S", "750") or 750)
    t_start = time.perf_counter()

    def remaining(margin: float = 30.0) -> float:
        return total_s - (time.perf_counter() - t_start) - margin

    # 1. Relay health: RETRY LOOP across the budget (VERDICT r4 item 1a).
    #    The relay's observed failure mode is flapping on minute-to-hour
    #    scales; a healthy probe returns in ~15 s, so each bounded attempt
    #    costs probe_s at worst and the loop keeps trying — with a pause
    #    between attempts to give the relay a recovery window — until a
    #    probe succeeds or only the turbo budget's worth of time is left.
    probe_history: list[dict] = []

    def _probe_until(reserve: float) -> bool:
        pause = float(os.environ.get("HDRTV_BENCH_PROBE_PAUSE_S", "45") or 45)
        while True:
            left = remaining() - reserve
            if left <= 10:
                return False
            res = _run_child("probe", min(probe_s, remaining()))
            probe_history.append({
                "ok": bool(res.get("ok")),
                "probe_s": res.get("probe_s"),
                "error": res.get("error"),
                "t": round(time.perf_counter() - t_start),
            })
            if res.get("ok"):
                return True
            if remaining() - reserve > pause + 10:
                time.sleep(pause)

    # Reserve enough for a warm turbo attempt (~60 s) — a probe success with
    # zero seconds left would be useless; but when the cache may be cold the
    # caller would rather have probed longer than to half-start a compile.
    turbo_reserve = float(os.environ.get("HDRTV_BENCH_TURBO_RESERVE_S", "90") or 90)
    if not _probe_until(turbo_reserve):
        _emit(0.0, {"error": "relay probe never succeeded within budget",
                    "probe_attempts": probe_history[-8:]}, ok=False)

    # 2. Turbo (Pallas megakernel) attempt — the headline path.
    turbo = _run_child("turbo", min(turbo_s, remaining()))
    if "fps" in turbo:
        _emit(turbo["fps"], {"compile_s": turbo.get("compile_s"),
                             "cache_hit": turbo.get("cache_hit"),
                             "cache_detect": turbo.get("cache_detect")})

    # 2b. One retry after a transient failure: if the relay still probes
    #     healthy and the budget allows, a mid-attempt relay hiccup (not a
    #     real bug) deserves a second chance at the headline number.
    relay_ok = _probe_until(turbo_reserve)
    if relay_ok and remaining() > 120:
        turbo2 = _run_child("turbo", min(turbo_s, remaining()))
        if "fps" in turbo2:
            _emit(turbo2["fps"], {"compile_s": turbo2.get("compile_s"),
                                  "cache_hit": turbo2.get("cache_hit"),
                                  "cache_detect": turbo2.get("cache_detect"),
                                  "retried": True})
        turbo["error"] = (turbo.get("error", "?") + " | retry: "
                          + turbo2.get("error", "?"))
    elif not relay_ok and probe_history and not probe_history[-1]["ok"]:
        _emit(0.0, {"error": "relay wedged after turbo failure: "
                    + turbo.get("error", ""),
                    "probe_attempts": probe_history[-8:]}, ok=False)

    # 3. Lax fallback with whatever budget is left.
    lax = _run_child("lax", remaining(60.0))
    if "fps" in lax:
        _emit(lax["fps"], {"compile_s": lax.get("compile_s"),
                           "cache_hit": lax.get("cache_hit"),
                           "cache_detect": lax.get("cache_detect"),
                           "path": "lax-fallback",
                           "turbo_error": turbo.get("error")})
    _emit(0.0, {"error": "turbo: " + turbo.get("error", "?")
                + " | lax: " + lax.get("error", "?"),
                "probe_attempts": probe_history[-8:]}, ok=False)


if __name__ == "__main__":
    main()
