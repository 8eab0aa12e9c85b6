"""Device-side color science: PQ (ST 2084), BT.709/BT.2020, ITP (BT.2124).

The playback-path color contract of the reference is learned by the network
(the [0,1] RGB output *is* the BT.2020/PQ code-value signal — SURVEY.md §2.1);
explicit PQ/ITP math exists in the metric path
(/root/reference/src/gui_objective_metrics.py:63-67, 486-545) and the
HDR-VDP3 bridge. These are the jitted equivalents, NHWC, fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# SMPTE ST 2084 (PQ) constants — gui_objective_metrics.py:63-67.
PQ_M1 = 2610.0 / 16384.0
PQ_M2 = 2523.0 / 32.0
PQ_C1 = 3424.0 / 4096.0
PQ_C2 = 2413.0 / 128.0
PQ_C3 = 2392.0 / 128.0

# BT.709 ↔ BT.2020 primaries conversion (linear light, D65). Host numpy so
# they embed as trace-time constants (Pallas kernels can't capture arrays).
BT709_TO_BT2020 = np.array(
    [
        [0.6274039, 0.3292830, 0.0433131],
        [0.0690973, 0.9195404, 0.0113623],
        [0.0163914, 0.0880133, 0.8955953],
    ],
    dtype=np.float32,
)
BT2020_TO_BT709 = np.array(
    [
        [1.6604910, -0.5876411, -0.0728499],
        [-0.1245505, 1.1328999, -0.0083494],
        [-0.0181508, -0.1005789, 1.1187297],
    ],
    dtype=np.float32,
)


def pq_oetf(luminance: jax.Array) -> jax.Array:
    """Absolute luminance (cd/m², 0..10000) → PQ code value [0,1].

    Matches _pq_oetf_absolute (gui_objective_metrics.py:486-492) including
    the denominator epsilon.
    """
    y = jnp.clip(luminance.astype(jnp.float32) / 10000.0, 0.0, 1.0)
    y_m1 = jnp.power(y, PQ_M1)
    num = PQ_C1 + PQ_C2 * y_m1
    den = 1.0 + PQ_C3 * y_m1
    return jnp.power(num / jnp.maximum(den, 1e-12), PQ_M2)


def pq_eotf(code: jax.Array) -> jax.Array:
    """PQ code value [0,1] → absolute luminance (cd/m²).

    Inverse used by the HDR-VDP3 bridge (scripts/hdrvdp3_bridge.py:145-229)
    to decode BT.2100 PQ into absolute nits.
    """
    e = jnp.clip(code.astype(jnp.float32), 0.0, 1.0)
    e_1m2 = jnp.power(e, 1.0 / PQ_M2)
    num = jnp.maximum(e_1m2 - PQ_C1, 0.0)
    den = PQ_C2 - PQ_C3 * e_1m2
    return 10000.0 * jnp.power(num / jnp.maximum(den, 1e-12), 1.0 / PQ_M1)


def bt709_oetf_inverse(v: jax.Array) -> jax.Array:
    """BT.1886-style SDR EOTF (gamma 2.4) — display-referred linearization."""
    return jnp.power(jnp.clip(v, 0.0, 1.0), 2.4)


def srgb_to_linear(v: jax.Array) -> jax.Array:
    v = jnp.clip(v, 0.0, 1.0)
    return jnp.where(v <= 0.04045, v / 12.92, jnp.power((v + 0.055) / 1.055, 2.4))


def apply_matrix(rgb: jax.Array, m: jax.Array) -> jax.Array:
    """Apply a 3×3 color matrix to (..., 3) RGB."""
    return jnp.einsum("...c,rc->...r", rgb, m)


def linear_rgb_to_itp(rgb_abs: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """BT.2124 Annex 1: display-referred linear BT.2020 RGB (cd/m²) → I, T, P.

    Matches _linear_rgb_to_itp (gui_objective_metrics.py:495-517) exactly,
    including the /4096 rational LMS and the T = 0.5·Ct scaling.
    """
    r, g, b = rgb_abs[..., 0], rgb_abs[..., 1], rgb_abs[..., 2]
    l = (1688.0 * r + 2146.0 * g + 262.0 * b) / 4096.0
    m = (683.0 * r + 2951.0 * g + 462.0 * b) / 4096.0
    s = (99.0 * r + 309.0 * g + 3688.0 * b) / 4096.0
    l_p, m_p, s_p = pq_oetf(l), pq_oetf(m), pq_oetf(s)
    i = 0.5 * l_p + 0.5 * m_p
    ct = (6610.0 * l_p - 13613.0 * m_p + 7003.0 * s_p) / 4096.0
    cp = (17933.0 * l_p - 17390.0 * m_p - 543.0 * s_p) / 4096.0
    return i, 0.5 * ct, cp


def delta_e_itp(pred_rgb_abs: jax.Array, ref_rgb_abs: jax.Array) -> jax.Array:
    """Mean ΔEITP (BT.2124) between two display-referred linear RGB images.

    720·sqrt(ΔI² + ΔT² + ΔP² + 1e-12) averaged in float64-equivalent accum
    (gui_objective_metrics.py:520-531; the reference means in float64 — we
    accumulate in fp32 which matches to ~1e-6 for image-sized reductions).
    """
    i1, t1, p1 = linear_rgb_to_itp(pred_rgb_abs)
    i2, t2, p2 = linear_rgb_to_itp(ref_rgb_abs)
    de = 720.0 * jnp.sqrt((i1 - i2) ** 2 + (t1 - t2) ** 2 + (p1 - p2) ** 2 + 1e-12)
    return jnp.mean(de)
