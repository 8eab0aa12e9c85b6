"""Display/output sinks for RGB48 HDR frames.

The reference's display is an embedded libmpv fed raw RGB48 over a Windows
named pipe, tagged ``primaries=bt.2020:gamma=pq``
(gui_mpv_widget.py:671-831, 996-1014). The delivery *contract* is kept —
rawvideo rgb48le at the source FPS with the BT.2020/PQ tag — re-hosted on
POSIX: a FIFO feeding an external mpv process (``MpvPipeSink``), a file sink
for golden captures, and a null sink for headless benchmarks
(cli_display.py:51 fallback ladder).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import threading
import queue

import numpy as np


class NullSink:
    """Counts frames; the headless benchmark display."""

    def __init__(self):
        self.frames = 0
        self.bytes = 0

    def show(self, rgb48: np.ndarray, pts: float | None = None) -> None:
        self.frames += 1
        self.bytes += rgb48.nbytes

    def close(self) -> None:
        pass


class FileSink:
    """Raw rgb48le stream to a file (pipe-format golden captures)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self.frames = 0

    def show(self, rgb48: np.ndarray, pts: float | None = None) -> None:
        # uint16 native little-endian == rgb48le on every supported platform.
        self._f.write(np.ascontiguousarray(rgb48).tobytes())
        self.frames += 1

    def close(self) -> None:
        self._f.close()


class MpvPipeSink:
    """External mpv fed raw RGB48 through a FIFO with the HDR tag contract.

    mpv args mirror the reference HDR pane: rawvideo demuxer,
    ``--vf=format=colorlevels=full:primaries=bt.2020:gamma=pq``
    (gui_mpv_widget.py:996-1014). A writer thread decouples the 12 MB/frame
    pipe writes from the compute loop (named-pipe writer thread,
    :671-831).
    """

    def __init__(
        self,
        width: int,
        height: int,
        fps: float,
        *,
        extra_args: tuple = (),
        drop_to_latest: bool = False,
    ):
        if shutil.which("mpv") is None:
            raise RuntimeError("mpv not found on PATH")
        self.width, self.height, self.fps = width, height, fps
        self.drop_to_latest = drop_to_latest
        self.dropped = 0
        self._dir = tempfile.mkdtemp(prefix="hdrtv_mpv_")
        self.fifo = os.path.join(self._dir, "video.fifo")
        os.mkfifo(self.fifo)
        self.proc = subprocess.Popen(
            [
                "mpv",
                "--no-config",
                "--demuxer=rawvideo",
                f"--demuxer-rawvideo-w={width}",
                f"--demuxer-rawvideo-h={height}",
                f"--demuxer-rawvideo-fps={fps}",
                "--demuxer-rawvideo-mp-format=rgb48le",
                "--vf=format=colorlevels=full:primaries=bt.2020:gamma=pq",
                "--keep-open=no",
                *extra_args,
                self.fifo,
            ],
            stdin=subprocess.DEVNULL,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        self._fifo_fd = open(self.fifo, "wb")
        self._queue: queue.Queue = queue.Queue(maxsize=3)
        self._stop = threading.Event()
        self._writer = threading.Thread(target=self._write_loop, daemon=True, name="mpv-pipe-writer")
        self._writer.start()
        self.frames = 0

    def _write_loop(self):
        while not self._stop.is_set():
            try:
                buf = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if buf is None:
                break
            try:
                self._fifo_fd.write(buf)
            except BrokenPipeError:
                self._stop.set()

    def show(self, rgb48: np.ndarray, pts: float | None = None) -> None:
        if self._stop.is_set():
            return
        buf = np.ascontiguousarray(rgb48).tobytes()
        if self.drop_to_latest:
            # Live mode: a slow display must not stall the pipeline — drop
            # the oldest queued frame instead (drop-to-latest feeder policy,
            # gui_pipeline_worker_feeders.py:73-104).
            while True:
                try:
                    self._queue.put_nowait(buf)
                    break
                except queue.Full:
                    try:
                        self._queue.get_nowait()
                        self.dropped += 1
                    except queue.Empty:
                        pass
        else:
            self._queue.put(buf)  # file-paced playback: backpressure is correct
        self.frames += 1

    def close(self) -> None:
        try:
            self._queue.put(None, timeout=0.2)
        except queue.Full:
            self._stop.set()
        self._writer.join(timeout=2.0)
        try:
            self._fifo_fd.close()
        except Exception:
            pass
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=2.0)
            except subprocess.TimeoutExpired:
                self.proc.kill()
        shutil.rmtree(self._dir, ignore_errors=True)


def make_sink(
    kind: str, width: int, height: int, fps: float, path: str | None = None, *, live: bool = False
):
    """Sink factory with the reference's fallback ladder: mpv → file → null.

    ``live=True`` selects the live-feeder delivery policy (drop-to-latest
    instead of backpressure — gui_pipeline_worker_feeders.py:73-104)."""
    kind = (kind or "null").lower()
    if kind == "mpv":
        try:
            return MpvPipeSink(width, height, fps, drop_to_latest=live)
        except Exception:
            kind = "null"
    if kind == "file":
        return FileSink(path or "out.rgb48")
    return NullSink()
