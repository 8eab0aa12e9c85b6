"""Full-reference quality metrics as jitted device ops.

Mirrors /root/reference/src/gui_objective_metrics.py: PSNR and SSIM computed
on *linear* pairs (:440-474), ΔEITP via BT.2124 from display-referred nits
with a 1000-nit peak (:477-545), grade normalization (:387-437), and the
shared-black-border crop (:317-384). All NHWC/HWC fp32; SSIM reproduces
cv2.GaussianBlur(11, σ=1.5) with REFLECT_101 borders so numbers are
comparable with the reference's published metrics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hdrtv_tpu.ops.color import delta_e_itp
from hdrtv_tpu.utils.env import env_float

OBJECTIVE_HDR_PEAK_NITS = env_float("HDRTVNET_OBJECTIVE_HDR_PEAK_NITS", 1000.0, lo=1e-6)


# ---------------------------------------------------------------------------
# PSNR
# ---------------------------------------------------------------------------


def psnr(pred: jax.Array, ref: jax.Array) -> jax.Array:
    """PSNR on unit-range inputs; 99.0 cap for identical frames
    (gui_objective_metrics.py:440-447)."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32) - ref.astype(jnp.float32)))
    val = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-30))
    return jnp.where(mse <= 1e-12, jnp.float32(99.0), val)


# ---------------------------------------------------------------------------
# SSIM (cv2.GaussianBlur(11, 1.5) parity)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _gaussian_kernel_11(sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel(11, 1.5): exp(-x²/2σ²) normalized."""
    x = np.arange(11, dtype=np.float64) - 5.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _gauss_blur(img: jax.Array) -> jax.Array:
    """Separable 11×11 Gaussian with REFLECT_101 borders (cv2 default) over
    (..., H, W) single-channel images."""
    k = jnp.asarray(_gaussian_kernel_11())
    padded = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(5, 5), (5, 5)], mode="reflect")
    return _conv_separable(padded, k)


def _conv_separable(padded: jax.Array, k: jax.Array) -> jax.Array:
    """Apply 1-D kernel along W then H of a (..., H+10, W+10) padded image."""
    lead = padded.shape[:-2]
    h, w = padded.shape[-2], padded.shape[-1]
    x = padded.reshape((-1, 1, h, w)).astype(jnp.float32)  # NCHW for conv
    kw = k.reshape(1, 1, 1, -1)
    kh = k.reshape(1, 1, -1, 1)
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    return x.reshape(lead + x.shape[-2:])


def ssim_single(a: jax.Array, b: jax.Array) -> jax.Array:
    """_ssim_single_channel (gui_objective_metrics.py:450-466): Gaussian-window
    SSIM map mean, c1=0.01², c2=0.03², +1e-12 denominator epsilon."""
    c1, c2 = 0.01**2, 0.03**2
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mu_a, mu_b = _gauss_blur(a), _gauss_blur(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_a2 = _gauss_blur(a * a) - mu_a2
    sigma_b2 = _gauss_blur(b * b) - mu_b2
    sigma_ab = _gauss_blur(a * b) - mu_ab
    num = (2.0 * mu_ab + c1) * (2.0 * sigma_ab + c2)
    den = (mu_a2 + mu_b2 + c1) * (sigma_a2 + sigma_b2 + c2)
    return jnp.mean(num / (den + 1e-12))


def ssim(pred: jax.Array, ref: jax.Array) -> jax.Array:
    """Mean per-channel SSIM over the last (channel) axis of HWC inputs."""
    vals = [ssim_single(pred[..., c], ref[..., c]) for c in range(pred.shape[-1])]
    return jnp.mean(jnp.stack(vals))


# ---------------------------------------------------------------------------
# ΔEITP + grade normalization (linear-signal domain)
# ---------------------------------------------------------------------------


def delta_e_itp_unit(pred_rgb: jax.Array, ref_rgb: jax.Array, *, peak_nits: float | None = None) -> jax.Array:
    """ΔEITP from unit-range linear RGB signals scaled to display nits
    (_linear_bgr_to_absolute_rgb + _delta_e_itp, gui_objective_metrics.py:477-545)."""
    peak = float(peak_nits if peak_nits is not None else OBJECTIVE_HDR_PEAK_NITS)
    p = jnp.clip(pred_rgb.astype(jnp.float32), 0.0, 1.0) * peak
    r = jnp.clip(ref_rgb.astype(jnp.float32), 0.0, 1.0) * peak
    return delta_e_itp(p, r)


def grade_normalize(pred: jax.Array, ref: jax.Array) -> jax.Array:
    """Match pred's per-channel mean/std to ref (gui_objective_metrics.py:387-414).

    Operates on unit-range linear signals; returns the normalized pred.
    """
    p = pred.astype(jnp.float32)
    r = ref.astype(jnp.float32)
    mp = jnp.mean(p, axis=(-3, -2), keepdims=True)
    mr = jnp.mean(r, axis=(-3, -2), keepdims=True)
    sp = jnp.std(p, axis=(-3, -2), keepdims=True)
    sr = jnp.std(r, axis=(-3, -2), keepdims=True)
    gain = jnp.where(sp < 1e-6, 1.0, sr / jnp.maximum(sp, 1e-12))
    bias = mr - gain * mp
    return jnp.clip(p * gain + bias, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Shared black-border crop (host-side; shapes are data-dependent)
# ---------------------------------------------------------------------------


def crop_shared_black_borders(
    pred: np.ndarray,
    ref: np.ndarray,
    *,
    min_border_px: int = 8,
    black_level_ratio: float = 0.002,
) -> tuple[np.ndarray, np.ndarray, bool]:
    """Crop shared near-black letterbox borders (gui_objective_metrics.py:317-384).

    Host-side numpy (crop sizes are data-dependent → cannot live under jit);
    inputs HWC unit-range or integer frames.
    """
    if pred.shape[:2] != ref.shape[:2] or pred.ndim < 3:
        return pred, ref, False
    peak = 1.0 if np.issubdtype(pred.dtype, np.floating) else float(np.iinfo(pred.dtype).max)
    thresh = max(2.0 / 255.0 * (255.0 if peak == 1.0 else 1.0), peak * black_level_ratio)
    if peak == 1.0:
        thresh = max(2.0 / 255.0, black_level_ratio)
    h, w = pred.shape[:2]
    min_row = max(4, int(round(w * 0.01)))
    min_col = max(4, int(round(h * 0.01)))

    def bounds(frame):
        fmax = frame.astype(np.float32).max(axis=2)
        mask = fmax > thresh
        if not mask.any():
            return None
        rows = (np.count_nonzero(mask, axis=1) >= min_row)
        cols = (np.count_nonzero(mask, axis=0) >= min_col)
        if not rows.any() or not cols.any():
            return None
        top = int(np.argmax(rows))
        bottom = h - int(np.argmax(rows[::-1]))
        left = int(np.argmax(cols))
        right = w - int(np.argmax(cols[::-1]))
        if bottom - top < 2 or right - left < 2:
            return None
        return top, bottom, left, right

    pb, rb = bounds(pred), bounds(ref)
    if pb is None and rb is None:
        return pred, ref, False
    if pb is None:
        top, bottom, left, right = rb
    elif rb is None:
        top, bottom, left, right = pb
    else:
        top, bottom = max(pb[0], rb[0]), min(pb[1], rb[1])
        left, right = max(pb[2], rb[2]), min(pb[3], rb[3])
    if max(top, h - bottom, left, w - right) < max(1, min_border_px):
        return pred, ref, False
    if bottom - top < 2 or right - left < 2:
        return pred, ref, False
    return (
        np.ascontiguousarray(pred[top:bottom, left:right]),
        np.ascontiguousarray(ref[top:bottom, left:right]),
        True,
    )


# ---------------------------------------------------------------------------
# Bundled metric evaluation (one jit, everything on device)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("peak_nits",))
def full_reference_metrics(
    pred_rgb: jax.Array, ref_rgb: jax.Array, *, peak_nits: float = 1000.0
) -> dict[str, jax.Array]:
    """PSNR/SSIM on linear pairs + ΔEITP (plain and grade-normalized) in one
    fused device computation — the _compute_full_reference_metrics core
    (gui_objective_metrics.py:617-677) without ever leaving the device."""
    pred = jnp.clip(pred_rgb.astype(jnp.float32), 0.0, 1.0)
    ref = jnp.clip(ref_rgb.astype(jnp.float32), 0.0, 1.0)
    norm = grade_normalize(pred, ref)
    return {
        "psnr": psnr(pred, ref),
        "ssim": ssim(pred, ref),
        "delta_e_itp": delta_e_itp_unit(pred, ref, peak_nits=peak_nits),
        "psnr_gn": psnr(norm, ref),
        "delta_e_itp_gn": delta_e_itp_unit(norm, ref, peak_nits=peak_nits),
    }
