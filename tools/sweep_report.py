"""Summarize a chip_sweep run into a PERF_NOTES-ready markdown table.

Reads logs/chip_sweep_r5/status.jsonl + per-step logs, extracts every JSON
result line (bench_modes ms/frame rows, bench.py metric lines, warm-cache
status), and prints a dated markdown section. Append the output to
PERF_NOTES.md after eyeballing it:

    python tools/sweep_report.py            # print
    python tools/sweep_report.py --append   # append to PERF_NOTES.md
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("HDRTV_SWEEP_DIR") or os.path.join(REPO, "logs", "chip_sweep_r5")


def _json_lines(path: str) -> list[dict]:
    rows = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and line.endswith("}"):
                    try:
                        rows.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    except OSError:
        pass
    return rows


def _json_blobs(path: str) -> list[dict]:
    """Multi-line JSON objects (the cli bench --device-resident output is
    pretty-printed); used only as a fallback when no single-line rows parse."""
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        return []
    dec = json.JSONDecoder()
    out, i = [], 0
    while True:
        j = text.find("{", i)
        if j < 0:
            break
        try:
            obj, end = dec.raw_decode(text[j:])
        except json.JSONDecodeError:
            i = j + 1
            continue
        if isinstance(obj, dict):
            out.append(obj)
            i = j + max(end, 1)
        else:
            i = j + 1
    return out


def build_report() -> str:
    records = _json_lines(os.path.join(OUT, "status.jsonl"))
    status = {r["step"]: r for r in records}
    lines = [
        f"## Chip-sweep results ({time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())})",
        "",
        "Driver: tools/chip_sweep.py (post-outage revalidation — every row",
        "below is a fresh on-chip measurement, logs/chip_sweep_r5/).",
        "",
        "| step | config | ms/frame | fps | note |",
        "|---|---|---|---|---|",
    ]
    order = [r["step"] for r in records]
    seen = set()
    for step in order:
        if step in seen or step in ("probe", "sweep"):
            continue
        seen.add(step)
        st = status.get(step, {})
        log = os.path.join(OUT, f"{step}.log")
        results = _json_lines(log)
        if not st.get("ok"):
            lines.append(f"| {step} | — | — | — | FAILED rc={st.get('rc')} ({st.get('seconds', '?')}s) |")
            continue
        if not results:
            # Fallback for pretty-printed output, narrowed to the
            # device-resident schema (quality logs hold preset arrays
            # that are summarized in QUALITY.md, not here).
            results = [r for r in _json_blobs(log) if "device_fps" in r]
        if not results:
            lines.append(f"| {step} | — | — | — | ok, no JSON row ({st.get('seconds', '?')}s) |")
            continue
        for r in results:
            if "device_fps" in r:
                cfg = f"device-resident {r.get('resolution', '')}".strip()
                lines.append(
                    f"| {step} | {cfg} | {r.get('device_model_ms')} | {r['device_fps']} "
                    f"| frames={r.get('frames')} compile_s={r.get('compile_s')} |"
                )
            elif "ms_per_frame" in r:
                cfg = f"{r.get('mode', '?')} {r.get('precision', '')} {r.get('resolution', '')}".strip()
                if r.get("batch"):
                    cfg += f" batch={r['batch']}"
                fps = r.get("fps", r.get("frames_per_sec", ""))
                lines.append(f"| {step} | {cfg} | {r['ms_per_frame']} | {fps} | native_int8={r.get('native_int8')} |")
            elif "metric" in r:
                lines.append(
                    f"| {step} | {r['metric']} | {round(1000.0 / r['value'], 2) if r.get('value') else '—'} "
                    f"| {r.get('value')} | vs_baseline={r.get('vs_baseline')} compile_s={r.get('compile_s')} |"
                )
            elif "warmed" in r:
                lines.append(
                    f"| {step} | warm-cache | — | — | warmed={r['warmed']} "
                    f"cache_hit_verified={r.get('cache_hit_verified')} |"
                )
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--append", action="store_true", help="append to PERF_NOTES.md")
    args = ap.parse_args()
    report = build_report()
    print(report)
    if args.append:
        with open(os.path.join(REPO, "PERF_NOTES.md"), "a") as f:
            f.write("\n" + report)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
