"""Save warmed TPU cache entries into the committed seed directory.

The round machine is rebuilt between rounds (only the git tree persists),
so a cache warmed at round end is gone when the next round's driver runs
``bench.py``. This tool copies the TPU executables of the headline bench
programs from the runtime cache root into ``.engine_cache_seed/`` for
committing; ``enable_persistent_cache`` seeds them back on every startup
(hdrtv_tpu/runtime/engine.py:seed_cache).

Selection: by default only entries written *after* this process's parent
warm run started would be ambiguous, so instead we take a snapshot-diff
approach: ``--since <epoch>`` keeps entries mtime-newer than the given
time; ``--min-bytes`` (default 200 KB) filters out the small metric/test
programs so only the big frame programs (the multi-minute compiles worth
seeding) are committed.

Usage:
    python tools/save_cache_seed.py --since 1787100000
    python tools/save_cache_seed.py            # all large entries
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdrtv_tpu.runtime.engine import default_cache_root, default_seed_root


def entry_backend(path: str) -> str:
    """Best-effort backend tag of a cache entry ('tpu' / 'cpu' / 'unknown').

    Entries are compressed serialized executables; the platform name
    appears in the first ~200 KB once decompressed. CPU entries (written
    by the test suite) are useless as seeds — the cache key encodes the
    backend, so they can never be hit on the chip and only bloat git."""
    import zlib

    try:
        data = open(path, "rb").read()
    except OSError:
        return "unknown"
    head = None
    try:
        import zstandard

        head = zstandard.ZstdDecompressor().decompress(data, max_output_size=200_000)
    except Exception:
        try:
            head = zlib.decompressobj().decompress(data, 200_000)
        except Exception:
            return "unknown"
    if b"tpu" in head:
        return "tpu"
    if b"cpu" in head:
        return "cpu"
    return "unknown"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--since", type=float, default=0.0,
                    help="only entries modified after this unix time")
    ap.add_argument("--min-bytes", type=int, default=200_000,
                    help="skip entries smaller than this (test/metric jits)")
    ap.add_argument("--max-total-mb", type=float, default=256.0,
                    help="refuse to grow the seed dir beyond this")
    ap.add_argument("--prune", action="store_true",
                    help="remove seed entries absent from the runtime cache "
                    "root (superseded by a recompile under a new content key "
                    "— they can never be hit again and only bloat git)")
    args = ap.parse_args()

    root = default_cache_root()
    seed = default_seed_root()
    os.makedirs(seed, exist_ok=True)
    pruned = 0
    if args.prune and os.path.isdir(root):
        live = set(os.listdir(root))
        for name in os.listdir(seed):
            if name.endswith("-cache") and name not in live:
                os.remove(os.path.join(seed, name))
                pruned += 1
    copied, skipped, total = 0, 0, 0
    entries = []
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            if not name.endswith("-cache"):
                continue
            path = os.path.join(root, name)
            st = os.stat(path)
            if st.st_mtime < args.since or st.st_size < args.min_bytes:
                skipped += 1
                continue
            if entry_backend(path) != "tpu":
                skipped += 1
                continue
            entries.append((name, path, st.st_size))
    budget = args.max_total_mb * 1e6
    # The cap bounds the SEED DIR's total size, not just this run's additions:
    # start from the existing contents and only count bytes actually copied
    # (repeated runs across rounds must not grow past the stated cap).
    total = sum(
        os.path.getsize(os.path.join(seed, n))
        for n in os.listdir(seed)
        if os.path.isfile(os.path.join(seed, n))
    )
    for name, path, size in sorted(entries, key=lambda e: -e[2]):
        dst = os.path.join(seed, name)
        if os.path.exists(dst):
            continue
        if total + size > budget:
            skipped += 1
            continue
        tmp = dst + ".seedtmp"
        shutil.copyfile(path, tmp)
        os.replace(tmp, dst)
        copied += 1
        total += size
    print(f"seeded {copied} entries (seed dir now {total/1e6:.1f} MB) into {seed}; "
          f"skipped {skipped}, pruned {pruned}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
