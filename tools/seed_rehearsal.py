"""Rehearse the committed cache seed on a simulated fresh machine.

The driver's round-end bench must start warm even after a machine rebuild
(only the git tree survives). The mechanism: warmed TPU executables are
committed under ``.engine_cache_seed/`` and ``enable_persistent_cache``
copies them into the runtime cache root at startup. This tool PROVES the
mechanism end-to-end (VERDICT r4 item 8): it moves the runtime cache root
aside (the fresh-machine state), runs the real ``python bench.py`` — which
must seed from the committed directory and warm-load — then merges the
original root back.

Run on the chip (one TPU job at a time — not while a sweep step runs):
    python tools/seed_rehearsal.py

Exit 0 = the driver bench would start warm on a fresh machine.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdrtv_tpu.runtime.engine import default_cache_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    root = default_cache_root()
    bak = root + f".rehearsal_{int(time.time())}"
    had_root = os.path.isdir(root)
    if had_root:
        os.rename(root, bak)
        print(f"rehearsal: moved {root} -> {bak}")
    try:
        t0 = time.time()
        # Outer timeout must exceed bench.py's internal 1500 s self-cap:
        # killing the parent first would orphan its detached children on
        # the chip (bench.py reaps its own on budget).
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=1800,
        )
        dt = time.time() - t0
        line = next((l for l in out.stdout.splitlines() if l.startswith("{")), "{}")
        res = json.loads(line)
        print(f"rehearsal: bench rc={out.returncode} wall={dt:.0f}s -> {line}")
        warm = res.get("value", 0) > 0 and (res.get("compile_s") or 1e9) < 150
        verdict = {
            "ok": bool(warm),
            "value": res.get("value"),
            "compile_s": res.get("compile_s"),
            "wall_s": round(dt, 1),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        path = os.path.join(REPO, "logs", "multichip", "seed_rehearsal.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(verdict, f)
        print(f"rehearsal: {'WARM — seed works' if warm else 'NOT WARM'} -> {path}")
        return 0 if warm else 1
    finally:
        # Merge the original root back (rehearsal entries win on conflict —
        # they are the same content-keyed bytes anyway).
        if had_root:
            os.makedirs(root, exist_ok=True)
            for name in os.listdir(bak):
                dst = os.path.join(root, name)
                if not os.path.exists(dst):
                    shutil.move(os.path.join(bak, name), dst)
            shutil.rmtree(bak, ignore_errors=True)
            print(f"rehearsal: merged original cache back into {root}")


if __name__ == "__main__":
    sys.exit(main())
