"""Media probing: HDR-input detection, active-picture (letterbox) detection.

The reference probes sources with ffprobe (gui_media_probe.py:178: reject or
bypass HDR input; :377-633: active-picture detection feeding the stable GT
crop). Without ffprobe in this environment, HDR detection falls back to
container/bit-depth heuristics via cv2, with the ffprobe field contract kept
for when it exists.
"""

from __future__ import annotations

import dataclasses
import json
import shutil
import subprocess

import numpy as np


@dataclasses.dataclass
class MediaInfo:
    width: int
    height: int
    fps: float
    frame_count: int
    is_hdr: bool
    color_transfer: str = ""
    color_primaries: str = ""
    pix_fmt: str = ""


_HDR_TRANSFERS = {"smpte2084", "arib-std-b67"}
_HDR_PRIMARIES = {"bt2020"}


def probe_media(path: str) -> MediaInfo:
    """ffprobe when available (authoritative), cv2 fallback otherwise."""
    if shutil.which("ffprobe"):
        try:
            out = subprocess.run(
                [
                    "ffprobe", "-v", "quiet", "-select_streams", "v:0",
                    "-show_entries",
                    "stream=width,height,avg_frame_rate,nb_frames,color_transfer,color_primaries,pix_fmt",
                    "-of", "json", path,
                ],
                capture_output=True, check=True, timeout=15,
            )
            stream = json.loads(out.stdout)["streams"][0]
            num, _, den = (stream.get("avg_frame_rate") or "30/1").partition("/")
            fps = float(num) / max(1.0, float(den or 1))
            transfer = str(stream.get("color_transfer") or "")
            primaries = str(stream.get("color_primaries") or "")
            return MediaInfo(
                width=int(stream.get("width") or 0),
                height=int(stream.get("height") or 0),
                fps=fps,
                frame_count=int(stream.get("nb_frames") or 0),
                is_hdr=transfer in _HDR_TRANSFERS or primaries in _HDR_PRIMARIES,
                color_transfer=transfer,
                color_primaries=primaries,
                pix_fmt=str(stream.get("pix_fmt") or ""),
            )
        except (subprocess.SubprocessError, KeyError, ValueError, json.JSONDecodeError):
            pass

    import cv2

    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise IOError(f"cannot probe: {path}")
        info = MediaInfo(
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            fps=float(cap.get(cv2.CAP_PROP_FPS) or 30.0),
            frame_count=int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0),
            is_hdr=False,  # cv2 decodes to 8-bit; no transfer metadata
        )
        return info
    finally:
        cap.release()


def detect_active_picture(
    frames: list[np.ndarray], *, black_level_ratio: float = 0.02, min_signal_ratio: float = 0.01
) -> tuple[int, int, int, int]:
    """Stable letterbox crop over several frames: (top, bottom, left, right)
    bounds of the active picture (gui_media_probe.py:377-633 role).

    Uses the intersection-of-signal rule: a row/column is active if it has
    signal in ANY probe frame — the crop is the union of per-frame actives,
    so scene changes don't flicker the crop.
    """
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    row_active = np.zeros(h, bool)
    col_active = np.zeros(w, bool)
    for frame in frames:
        peak = 255.0 if frame.dtype == np.uint8 else float(frame.max() or 1.0)
        lum = frame.astype(np.float32).max(axis=2)
        mask = lum > peak * black_level_ratio
        row_active |= mask.mean(axis=1) > min_signal_ratio
        col_active |= mask.mean(axis=0) > min_signal_ratio
    if not row_active.any() or not col_active.any():
        return 0, h, 0, w
    top = int(np.argmax(row_active))
    bottom = h - int(np.argmax(row_active[::-1]))
    left = int(np.argmax(col_active))
    right = w - int(np.argmax(col_active[::-1]))
    return top, bottom, left, right


def should_bypass_processing(info: MediaInfo) -> bool:
    """HDR input → bypass the SDR→HDR model (HDR-input bypass path,
    gui_pipeline_worker frame_processing HDR-input handling)."""
    return bool(info.is_hdr)
