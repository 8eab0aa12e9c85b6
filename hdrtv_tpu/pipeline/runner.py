"""Realtime pipeline runner — the PipelineWorker equivalent.

Maps the reference's worker design (gui_pipeline_worker.py:563-1146 +
frame_processing + feeders) onto JAX's async dispatch model:

  decode thread ─► paced main loop ─► jit dispatch (async) ─► in-flight ring
      ─► feeder thread (device→host fetch + sink)

The reference needed pinned rings, CUDA events and converter streams to
overlap H2D / compute / convert / D2H; XLA's asynchronous dispatch gives the
same overlap if the host never blocks: the main loop en-queues jitted calls
(which return immediately) into a small in-flight ring, and only the feeder
thread calls ``np.asarray`` (the device→host fence). Ring depth plays the
role of the 3-slot pinned ring (VIDEO_PLAYBACK_BUFFER_FRAMES,
gui_config.py:380-390).

Runtime metrics mirror gui_pipeline_worker_runtime_metrics.py: trimmed-mean
FPS over presentation stamps, per-stage model latency, drop counts.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time

import numpy as np

from hdrtv_tpu.pipeline.pacing import PresentationClock
from hdrtv_tpu.utils.env import env_int


@dataclasses.dataclass
class RuntimeMetrics:
    fps: float = 0.0
    fps_1pct_low: float = 0.0
    model_ms: float = 0.0
    frames: int = 0
    dropped: int = 0
    realtime_factor: float = 0.0
    device_mem_mb: float = 0.0  # whole-app VRAM analog (runtime_metrics.py:28-78)
    host_rss_mb: float = 0.0


def _device_memory_mb() -> float:
    """Device memory in use (bytes_in_use when the backend reports it)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        return round(stats.get("bytes_in_use", 0) / 1e6, 1)
    except Exception:
        return 0.0


def _host_rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024, 1)
    except OSError:
        pass
    return 0.0


def trimmed_mean_fps(stamps: list[float], trim: float = 0.05) -> float:
    """FPS from presentation timestamps, trimming outlier intervals
    (gui_pipeline_worker_runtime_metrics.py:28-78 methodology)."""
    if len(stamps) < 3:
        return 0.0
    iv = np.diff(np.asarray(stamps))
    iv = np.sort(iv)
    k = int(len(iv) * trim)
    core = iv[k : len(iv) - k] if len(iv) > 2 * k else iv
    mean = float(np.mean(core))
    return 1.0 / mean if mean > 0 else 0.0


def one_percent_low_fps(stamps: list[float]) -> float:
    """1%-low FPS (worst 1% frame intervals — cli_playback_benchmark.py:332-362)."""
    if len(stamps) < 10:
        return 0.0
    iv = np.sort(np.diff(np.asarray(stamps)))
    worst = iv[-max(1, len(iv) // 100) :]
    mean = float(np.mean(worst))
    return 1.0 / mean if mean > 0 else 0.0


class PipelineRunner:
    """Paced realtime loop: source → processor → sink.

    ``processor`` must expose ``process_rgb48_device(jnp uint8 HWC) -> device
    array`` (HDRTVNetTPU). ``realtime=False`` runs flat-out (export /
    benchmark mode).
    """

    def __init__(
        self,
        source,
        processor,
        sink,
        *,
        realtime: bool = True,
        ring: int | None = None,
        max_frames: int | None = None,
    ):
        self.source = source
        self.processor = processor
        self.sink = sink
        self.realtime = realtime
        self.ring = ring or env_int("HDRTVNET_VIDEO_PLAYBACK_BUFFER_FRAMES", 3, lo=1, hi=24)
        self.max_frames = max_frames
        self.clock = PresentationClock(getattr(source, "fps", 30.0))
        self.metrics = RuntimeMetrics()
        self._stamps: list[float] = []
        self._stop = threading.Event()

    def stop(self):
        self._stop.set()

    def run(self) -> RuntimeMetrics:
        import jax.numpy as jnp

        inflight: queue.Queue = queue.Queue(maxsize=self.ring)
        feeder_done = threading.Event()
        model_ms: list[float] = []

        def feeder():
            """Fetch completed device frames and hand them to the sink.

            The np.asarray here is the only host↔device fence in the steady
            state — the reference's feeder-thread/ready-event pattern
            (gui_pipeline_worker_feeders.py:313-496)."""
            while True:
                item = inflight.get()
                if item is None:
                    break
                dev_out, pts, t_submit = item
                host = np.asarray(dev_out)
                model_ms.append((time.monotonic() - t_submit) * 1e3)
                self.sink.show(host, pts)
                self._stamps.append(time.monotonic())
            feeder_done.set()

        fthread = threading.Thread(target=feeder, daemon=True, name="hdr-feeder")
        fthread.start()

        processed = 0
        t_start = time.monotonic()
        media_seconds = 0.0
        if self.realtime:
            self.clock.start()
        try:
            while not self._stop.is_set():
                if self.max_frames is not None and processed >= self.max_frames:
                    break
                if self.realtime:
                    skip = self.clock.wait_for_slot()
                    for _ in range(skip):
                        if self.source.read_with_meta() is None:
                            break
                    self.metrics.dropped = self.clock.dropped
                meta = self.source.read_with_meta()
                if meta is None:
                    break
                frame, idx, pts = meta
                t_submit = time.monotonic()
                # Ship flat byte rows: same bytes, no 3-channel-minor tensor
                # at the device boundary (avoids XLA lane-padding relayouts).
                h = frame.shape[0]
                dev_out = self.processor.process_rgb48_device(
                    jnp.asarray(np.ascontiguousarray(frame).reshape(h, -1))
                )
                inflight.put((dev_out, pts, t_submit))  # blocks when ring full
                processed += 1
                media_seconds = pts
        finally:
            inflight.put(None)
            feeder_done.wait(timeout=10.0)

        wall = time.monotonic() - t_start
        self.metrics.device_mem_mb = _device_memory_mb()
        self.metrics.host_rss_mb = _host_rss_mb()
        self.metrics.frames = processed
        self.metrics.fps = trimmed_mean_fps(self._stamps)
        self.metrics.fps_1pct_low = one_percent_low_fps(self._stamps)
        self.metrics.model_ms = float(np.mean(model_ms)) if model_ms else 0.0
        if wall > 0 and processed:
            self.metrics.realtime_factor = (processed / getattr(self.source, "fps", 30.0)) / wall
        return self.metrics
