"""Separable antialiased resampling as MXU matrix products.

The reference computes the AGCM condition input as an antialiased bicubic
¼-resolution downsample (hdrtvnet_torch.py:2272-2287,
``F.interpolate(mode='bicubic', antialias=True)``). Matching it closely is
quality-critical: the classifier's global color vector — and therefore every
output pixel — depends on it (SURVEY.md §7 "hard parts").

TPU-first design: the torch/PIL antialias resample is a separable banded
linear map. We materialize the per-axis weight matrices (computed in float64
with the exact torch/PIL window/normalization semantics, including the
renormalized clipped windows at the borders) once per (in, out) size, then
apply them as two dense matmuls — which XLA tiles straight onto the MXU.
A 1080p→270p ¼-res cond costs two small GEMMs instead of a gather-heavy
interpolation graph.

Also provides area (box) resampling matching cv2.INTER_AREA for the metric
path (gui_objective_metrics.py:294-314 downscales metric pairs with
INTER_AREA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bicubic_aa(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Bicubic kernel with a=-0.5 (the torch/PIL antialias variant)."""
    ax = np.abs(x)
    r = np.zeros_like(ax)
    m1 = ax <= 1.0
    m2 = (ax > 1.0) & (ax < 2.0)
    r[m1] = ((a + 2.0) * ax[m1] - (a + 3.0)) * ax[m1] * ax[m1] + 1.0
    r[m2] = a * (((ax[m2] - 5.0) * ax[m2] + 8.0) * ax[m2] - 4.0)
    return r


def _bilinear(x: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.abs(x), 0.0, None)


@functools.lru_cache(maxsize=64)
def resample_matrix(
    in_size: int, out_size: int, scale: float, *, kernel: str = "bicubic_aa", antialias: bool = True
) -> np.ndarray:
    """(out_size, in_size) resampling matrix.

    Antialiased: the torch UpSampleAntialias weight computation (itself the
    PIL algorithm): center = scale*(i+0.5); window [int(center-support+0.5),
    int(center+support+0.5)) clipped to the image; weights
    filter((j - center + 0.5)/scale) normalized over the clipped window.

    antialias=False keeps the kernel at its native support (plain half-pixel
    sampling — torch F.interpolate default), still expressed as a matrix.
    """
    if kernel == "bicubic_aa":
        filt, half = _bicubic_aa, 2.0
    elif kernel == "bilinear":
        filt, half = _bilinear, 1.0
    else:
        raise ValueError(f"unknown kernel '{kernel}'")
    widen = antialias and scale >= 1.0
    support = half * scale if widen else half
    invscale = 1.0 / scale if widen else 1.0

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = scale * (i + 0.5)
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        j = np.arange(xmin, xmax, dtype=np.float64)
        w = filt((j - center + 0.5) * invscale)
        total = w.sum()
        if total != 0.0:
            w = w / total
        mat[i, xmin:xmax] = w
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=64)
def area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) box-filter matrix matching cv2.INTER_AREA for downscale."""
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for i in range(out_size):
        lo, hi = i * scale, (i + 1) * scale
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, in_size)):
            cover = min(hi, j + 1) - max(lo, j)
            if cover > 0:
                mat[i, j] = cover
        mat[i] /= mat[i].sum()
    return mat.astype(np.float32)


def _apply_separable(x: jax.Array, wh: np.ndarray, ww: np.ndarray) -> jax.Array:
    """x: (N, H, W, C) → (N, out_h, out_w, C) via two GEMMs (fp32 accum)."""
    wh_j = jnp.asarray(wh, dtype=jnp.float32)
    ww_j = jnp.asarray(ww, dtype=jnp.float32)
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    y = jnp.einsum("oh,nhwc->nowc", wh_j, x32, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,nowc->nopc", ww_j, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(orig_dtype)


def downsample_quarter_aa(x: jax.Array) -> jax.Array:
    """Antialiased bicubic ¼-res downsample — the AGCM condition input.

    Matches F.interpolate(scale_factor=0.25, mode='bicubic', antialias=True,
    recompute_scale_factor=False): scale is exactly 4, out = floor(in/4).
    """
    _, h, w, _ = x.shape
    return _apply_separable(x, resample_matrix(h, h // 4, 4.0), resample_matrix(w, w // 4, 4.0))


@functools.lru_cache(maxsize=8)
def _kron_i3(w: int, out_w: int, bgr: bool) -> np.ndarray:
    """(3w, 3·out_w) expansion of the W resample matrix over interleaved RGB
    byte rows: K[3wi+ci, 3jo+co] = ww[jo, wi]·δ(ci = flip(co))."""
    ww = resample_matrix(w, out_w, 4.0)  # exact scale 4 (torch semantics)
    k = np.zeros((3 * w, 3 * out_w), np.float32)
    for co in range(3):
        ci = 2 - co if bgr else co
        k[ci::3, co::3] = ww.T
    return k


def downsample_quarter_aa_flat(frame2d: jax.Array, *, bgr: bool = False) -> jax.Array:
    """(H, 3W) uint8 byte rows → (1, H/4, W/4, 3) f32 [0,1] — the AGCM cond
    input computed on the flat layout.

    Identical math to reshape + :func:`downsample_quarter_aa`, but the
    lane-padded (H, W, 3) f32 image (3 → 128 lanes, ~0.6 ms @1080p in the
    round-3 trace) never materializes: the H contraction runs on the flat
    (H, 3W) byte matrix and the W contraction uses the resample matrix
    kron-expanded over the interleaved RGB bytes (with the BGR flip folded
    in). Only the tiny (H/4, 3·W/4) result reshapes to channel-minor.
    """
    from hdrtv_tpu.parallel import halo as _halo

    if _halo.active():
        # Exact-scale-4 resample is shift-invariant with period 4, so the
        # shifted-window machinery applies with stride 4: the local matrix's
        # clipped/renormalized edge rows land exactly on the true frame
        # edges (edge devices' windows start/end there) and interior window
        # rows are pure shifts. Radius: bicubic-AA support = 2·4 = 8 px →
        # 24 bytes; multiples of 12 keep window starts on whole 4-px cells.
        w3l = frame2d.shape[1]
        rb = _halo.pick_radius(w3l, 24, mod=12, align=12)

        def stage(f):
            return downsample_quarter_aa_flat(f, bgr=bgr)

        return _halo.run_stage(
            stage, [frame2d], [1], need=rb, mod=12, align=12,
            out_axis=2, out_stride=12,
        )
    h, w3 = frame2d.shape
    w = w3 // 3
    wh = jnp.asarray(resample_matrix(h, h // 4, 4.0))
    k = jnp.asarray(_kron_i3(w, w // 4, bgr))
    x = frame2d.astype(jnp.float32) * (1.0 / 255.0)
    y = jnp.matmul(wh, x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.matmul(y, k, precision=jax.lax.Precision.HIGHEST)
    return y.reshape(1, h // 4, w // 4, 3)


def downsample_quarter_aa_pairs(xr: jax.Array, *, bgr: bool = False) -> jax.Array:
    """(Hb, 2, Wb, 6) uint8 row-pair planes → (1, H/4, W/4, 3) f32 [0,1].

    Same resample matrices (and the same H-then-W contraction order) as
    :func:`downsample_quarter_aa_flat`, applied directly to the row-pair
    plane layout via multi-contracting-dim ``dot_general`` — the flat
    (H, 3W) view never materializes on device.  This is the cond path of
    the pairs-boundary program (models/s2d.py ensemble_s2d_rgb48_pairs):
    the round-5 device profile attributed ~0.8 ms/frame at 1080p to the
    u8 (H, 3W) → (Hb, 2, Wb, 6) boundary retile alone.

    Index map: ``xr[i, a, j, m]`` is fine row ``2i+a``, byte column
    ``6j+m`` of the flat frame, so the H matrix reshapes to
    ``(H/4, Hb, 2)`` and the kron-expanded W matrix to
    ``(Wb, 6, 3·W/4)`` — both pure host-side reshapes of the exact
    matrices the flat path uses.
    """
    hb, _, wbp, _ = xr.shape
    h, w = 2 * hb, 2 * wbp
    wh = jnp.asarray(resample_matrix(h, h // 4, 4.0).reshape(h // 4, hb, 2))
    k = jnp.asarray(_kron_i3(w, w // 4, bgr).reshape(wbp, 6, 3 * (w // 4)))
    x = xr.astype(jnp.float32) * (1.0 / 255.0)
    y = jax.lax.dot_general(
        wh, x, (((1, 2), (0, 1)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )  # (H/4, Wb, 6)
    y = jax.lax.dot_general(
        y, k, (((1, 2), (0, 1)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )  # (H/4, 3·W/4)
    return y.reshape(1, h // 4, w // 4, 3)


def downsample_quarter_bilinear(x: jax.Array) -> jax.Array:
    """Non-antialiased bilinear ¼-res (the fast_condition_resize TRT shortcut,
    hdrtvnet_torch.py:2270-2276)."""
    _, h, w, _ = x.shape
    wh = resample_matrix(h, h // 4, 4.0, kernel="bilinear", antialias=False)
    ww = resample_matrix(w, w // 4, 4.0, kernel="bilinear", antialias=False)
    return _apply_separable(x, wh, ww)


def resize_area(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.INTER_AREA-equivalent downscale (metric-pair preparation)."""
    _, h, w, _ = x.shape
    return _apply_separable(x, area_matrix(h, out_h), area_matrix(w, out_w))


def resize_bicubic_aa(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """General antialiased bicubic resize (arbitrary scale)."""
    _, h, w, _ = x.shape
    return _apply_separable(
        x, resample_matrix(h, out_h, h / out_h), resample_matrix(w, out_w, w / out_w)
    )


def letterbox_plan(h: int, w: int, out_h: int, out_w: int):
    """Aspect-preserving fit: (new_h, new_w, pad_top, pad_left, scale) —
    gui_scaling.py:228 geometry (centered black padding)."""
    scale = min(out_w / max(w, 1), out_h / max(h, 1))
    new_w = max(1, int(round(w * scale)))
    new_h = max(1, int(round(h * scale)))
    return new_h, new_w, (out_h - new_h) // 2, (out_w - new_w) // 2, scale


def letterbox_rgb(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """(N,H,W,C) float → (N,out_h,out_w,C): aspect-preserving resize with
    centered zero padding. INTER_AREA down / bicubic up, matching the
    reference per-frame letterbox (gui_scaling.py:228-245)."""
    _, h, w, _ = x.shape
    if (h, w) == (out_h, out_w):
        return x
    new_h, new_w, top, left, scale = letterbox_plan(h, w, out_h, out_w)
    if scale < 1.0:
        y = resize_area(x, new_h, new_w)
    else:
        wh = resample_matrix(h, new_h, h / new_h, antialias=False)
        ww = resample_matrix(w, new_w, w / new_w, antialias=False)
        y = _apply_separable(x, wh, ww)
    return jnp.pad(y, ((0, 0), (top, out_h - new_h - top), (left, out_w - new_w - left), (0, 0)))


def letterbox_u8(frame: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """(H,W,3) uint8 → (out_h,out_w,3) uint8 letterbox (device-side)."""
    if frame.shape[:2] == (out_h, out_w):
        return frame
    y = letterbox_rgb(frame[None].astype(jnp.float32), out_h, out_w)[0]
    return jnp.clip(jnp.round(y), 0.0, 255.0).astype(jnp.uint8)
