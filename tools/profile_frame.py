"""Profile the fused 1080p frame program on the real TPU chip.

Captures a jax.profiler device trace of n chained frame steps, then parses
the relay's ``plugins/profile/*/*.trace.json.gz`` event dump into a per-HLO
and per-category time breakdown (the round-1 methodology from PERF_NOTES.md).

Usage:
    python tools/profile_frame.py [--height 1080] [--width 1920] [--n 20]
    python tools/profile_frame.py --parse /tmp/hdrtv_trace   # re-parse only
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

# Run as `python tools/profile_frame.py` from anywhere: the repo root (one
# level up) must be importable, but PYTHONPATH can break axon plugin
# discovery on this runner — so append at runtime instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(log_dir: str, height: int, width: int, n: int) -> None:
    import jax

    from hdrtv_tpu.runtime.engine import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_npz
    from hdrtv_tpu.models.layers import BF16
    from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48_pairs, s2d_transform_params

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_npz(os.path.join(here, "weights", "hr_fp32.npz"))
    sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(params).items()}
    cfg = ModelConfig()

    # The PRODUCT program: (Hb,2,Wb,6) u8 pair planes in → same-shape u16
    # out, boundary layouts pinned row-major, scalar-token chain feedback —
    # exactly the program bench.py measures (round-5 pairs boundary).
    def step(p, xr_u8):
        packed = ensemble_s2d_rgb48_pairs(p, xr_u8, None, cfg, policy=BF16)
        # Non-foldable one-byte DUS on the donated input (see bench.py).
        tok = (packed[0, 0, 0, 0] & jnp.uint16(1)).astype(jnp.uint8)
        nxt = jax.lax.dynamic_update_slice(
            xr_u8, tok.reshape(1, 1, 1, 1), (0, 0, 0, 0)
        )
        return packed, nxt

    rm = None
    if jax.default_backend() == "tpu" and os.environ.get("HDRTV_PIN_LAYOUTS") == "1":
        # Opt-in only: pinned entry Formats break the persistent-cache
        # deserialize on this relay (see bench.py / processor.pairs_format).
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
    packed, frame = step(sp, frame)
    _ = np.asarray(packed[:2, :2])  # force warm execution

    jax.profiler.start_trace(log_dir)
    f = frame
    for _ in range(n):
        packed, f = step(sp, f)
    _ = np.asarray(packed[:2, :2])
    jax.profiler.stop_trace()
    print(f"trace written to {log_dir}", flush=True)


CATEGORIES = [
    ("pallas", re.compile(r"fused_block_conv3|fused_sft|custom-call|pallas|tpu_custom_call")),
    ("conv", re.compile(r"^%?(convolution|conv)")),
    ("copy", re.compile(r"^%?copy")),
    ("reshape", re.compile(r"^%?(reshape|transpose|bitcast)")),
    ("dot", re.compile(r"^%?dot")),
    ("select", re.compile(r"select|compare|maximum")),
    ("fusion", re.compile(r"^%?(fusion|loop_|input_|output_)")),
]


def parse(log_dir: str, top: int = 40) -> None:
    files = sorted(
        glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not files:
        print(f"no trace files under {log_dir}", file=sys.stderr)
        sys.exit(1)
    path = files[-1]
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # Device-side complete events: pid of TPU core tracks; aggregate by name.
    per_op: dict[str, float] = collections.defaultdict(float)
    per_op_count: dict[str, int] = collections.defaultdict(int)
    # identify device pids: process_name metadata containing "TPU" or "/device"
    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
    dev_pids = {
        pid
        for pid, name in proc_names.items()
        if "TPU" in name or "Device" in name or "/device" in name.lower()
    }
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        if name.startswith("$") or name in ("", "IDLE"):
            continue
        per_op[name] += ev.get("dur", 0)
        per_op_count[name] += 1
    total = sum(per_op.values())
    cats: dict[str, float] = collections.defaultdict(float)
    for name, us in per_op.items():
        for cat, rx in CATEGORIES:
            if rx.search(name):
                cats[cat] += us
                break
        else:
            cats["other"] += us
    print(f"== {os.path.basename(path)}: total device-op time {total/1e3:.2f} ms ==")
    print("-- categories (ms) --")
    for cat, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:10s} {us/1e3:9.2f}")
    print(f"-- top {top} ops (ms, count) --")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/1e3:9.3f}  x{per_op_count[name]:<4d} {name[:140]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--log-dir", default="/tmp/hdrtv_trace")
    ap.add_argument("--parse", metavar="DIR", help="parse an existing trace dir only")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if args.parse:
        parse(args.parse, args.top)
        return
    capture(args.log_dir, args.height, args.width, args.n)
    parse(args.log_dir, args.top)


if __name__ == "__main__":
    main()
