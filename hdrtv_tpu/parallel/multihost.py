"""Multi-host scale-out: jax.distributed wiring + the export-farm plan.

The reference is strictly single-machine (SURVEY.md §2.8). The natural
multi-host axis for this workload is DCN-level *frame-range* parallelism:
video frames are independent, so an export/benchmark farm assigns each host
a contiguous frame range (ICI handles the within-host mesh; DCN carries no
activations at all — only the final encoded segments are concatenated,
which FFmpeg's concat demuxer does losslessly for ProRes segments).

``initialize_distributed`` wires ``jax.distributed`` from standard
coordinator env vars; ``plan_frame_ranges`` computes the per-host
assignment; ``segment_paths``/``concat_command`` give the losless
re-assembly contract.
"""

from __future__ import annotations

import os

__all__ = [
    "initialize_distributed",
    "plan_frame_ranges",
    "segment_paths",
    "concat_command",
]


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env contract
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, as used
    by jax.distributed.initialize's auto-detection). Returns True when a
    multi-process runtime was started; False for the single-host case."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return False  # single host — nothing to do
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True


def plan_frame_ranges(n_frames: int, n_hosts: int) -> list[tuple[int, int]]:
    """Contiguous [start, end) frame ranges per host, balanced to ±1 frame.

    Contiguity matters: each host decodes sequentially from its start frame
    (one backward seek), and its output segment is a valid standalone clip.
    """
    if n_hosts <= 0:
        raise ValueError("n_hosts must be positive")
    base, extra = divmod(max(0, n_frames), n_hosts)
    ranges = []
    start = 0
    for h in range(n_hosts):
        size = base + (1 if h < extra else 0)
        ranges.append((start, start + size))
        start += size
    return ranges


def segment_paths(output: str, n_hosts: int) -> list[str]:
    """Per-host segment names: ``out.mov`` → ``out.seg000.mov`` …"""
    root, ext = os.path.splitext(output)
    return [f"{root}.seg{h:03d}{ext}" for h in range(n_hosts)]


def concat_command(segments: list[str], output: str, list_path: str) -> list[str]:
    """FFmpeg concat-demuxer command reassembling the segments losslessly
    (stream copy — no re-encode, bit-exact for intra-only codecs like the
    export chain's ProRes)."""
    with open(list_path, "w") as f:
        for seg in segments:
            # Concat-demuxer quoting: a single quote inside a quoted string
            # is written as '\'' (close, escaped quote, reopen).
            path = os.path.abspath(seg).replace("'", "'\\''")
            f.write(f"file '{path}'\n")
    return [
        "ffmpeg", "-y", "-f", "concat", "-safe", "0",
        "-i", list_path, "-c", "copy", output,
    ]
