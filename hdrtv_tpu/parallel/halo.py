"""Manual W-halo exchange for shard_map execution of the turbo program.

GSPMD cannot partition Pallas ``tpu_custom_call``s, so the round-3 mesh path
forfeited every megakernel (runtime/processor.py round-3 note). Under
``jax.shard_map`` the kernels are legal — each device runs them on its local
shard — but every spatially-overlapping stage must fetch its own halo.

The mechanism here is **shifted windows**: before a stage of receptive
radius r, each device extends its W-shard to ``W + 2r`` columns via
``lax.ppermute`` with a *device-dependent global start*:

    interior device k : global cols [kW - r,        kW + W + r)
    left-edge  (k=0)  : global cols [0,             W + 2r)
    right-edge (k=n-1): global cols [nW - W - 2r,   nW)

Edge devices take their whole margin from their single neighbor, so the
window's outer boundary coincides with the TRUE frame boundary. That is the
load-bearing trick: every kernel's own edge handling (zero-pad masking,
reflect, resample-weight renormalization) applies *exactly* where the real
frame edge is, and interior window boundaries only ever influence output
columns that the device-dependent ``crop`` discards. No kernel needs to
learn about sharding — the fused Pallas megakernels run byte-identical
programs per shard.

After the stage, ``crop`` re-slices each device back to its canonical
``W/stride`` shard, so consecutive stages compose without global
bookkeeping. Alignment rules (all asserted):

- ``r % (4·stride_so_far)`` keeps window starts divisible for the s2d /
  stride-2 / quarter-res domains (a coarse-domain companion input uses
  ``r_coarse = r_fine / 2`` and stays aligned, including at edges);
- extended widths stay multiples of 8 so the megakernel eligibility
  checks (``_use_fused_kernel``, ``_mega_ok``) hold per shard;
- ``W_local >= 2r`` so edge devices can borrow their full margin from one
  neighbor.

No reference equivalent — the reference is single-GPU (SURVEY.md §2.8);
this is the designed 4K60 scale-out path (BASELINE.md north star).
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp
from jax import lax

_TLS = threading.local()


def axis_name() -> str | None:
    """The spatial mesh axis when tracing inside manual-shard mode."""
    return getattr(_TLS, "axis", None)


def active() -> bool:
    return getattr(_TLS, "axis", None) is not None


@contextlib.contextmanager
def manual_axis(name: str):
    """Mark the trace as running inside ``shard_map`` over spatial ``name``."""
    prev = getattr(_TLS, "axis", None)
    _TLS.axis = name
    try:
        yield
    finally:
        _TLS.axis = prev


@contextlib.contextmanager
def suspended():
    """Disable halo hooks while tracing the body of an already-haloed stage
    (a fused stage exchanges once; its inner primitives must not)."""
    prev = getattr(_TLS, "axis", None)
    _TLS.axis = None
    try:
        yield
    finally:
        _TLS.axis = prev


def _axis_n(name: str) -> int:
    return lax.psum(1, name)


def _starts(k, n: int, r: int):
    """(window offset into the gather buffer, crop offset of this device)."""
    # Gather buffer B = [left 2r | own W | right 2r]; window = B[off : off+W+2r]
    off = jnp.where(k == 0, 2 * r, jnp.where(k == n - 1, 0, r))
    return off


def ext(x: jax.Array, r: int, axis: int) -> jax.Array:
    """Extend the local W-shard to ``W + 2r`` columns (shifted window)."""
    name = axis_name()
    if not name or r == 0:
        return x
    n = _axis_n(name)
    if n == 1:
        return x
    w = x.shape[axis]
    assert w >= 2 * r, f"shard width {w} < 2r={2 * r} — too many devices for this stage"
    right_pairs = [(i, i + 1) for i in range(n - 1)]  # data moves toward +k
    left_pairs = [(i + 1, i) for i in range(n - 1)]  # data moves toward -k
    lh = lax.ppermute(lax.slice_in_dim(x, w - 2 * r, w, axis=axis), name, right_pairs)
    rh = lax.ppermute(lax.slice_in_dim(x, 0, 2 * r, axis=axis), name, left_pairs)
    buf = lax.concatenate([lh, x, rh], dimension=axis)
    k = lax.axis_index(name)
    off = _starts(k, n, r)
    starts = [0] * x.ndim
    starts[axis] = off
    sizes = list(x.shape)
    sizes[axis] = w + 2 * r
    return lax.dynamic_slice(buf, starts, sizes)


def crop(y: jax.Array, r: int, axis: int, *, stride: int = 1) -> jax.Array:
    """Undo ``ext`` after a stage: keep this device's canonical shard.

    ``stride``: the stage's spatial downscale (1 for same-res convs, 2 for
    the stride-2 down convs, 4 for the ¼-res condition downsample).
    ``r`` is the radius in *input* columns and must divide by ``stride``.
    """
    name = axis_name()
    if not name or r == 0:
        return y
    n = _axis_n(name)
    if n == 1:
        return y
    assert r % stride == 0, f"radius {r} not aligned to stride {stride}"
    rs = r // stride
    w_keep = y.shape[axis] - 2 * rs
    k = lax.axis_index(name)
    start = jnp.where(k == 0, 0, jnp.where(k == n - 1, 2 * rs, rs))
    starts = [0] * y.ndim
    starts[axis] = start
    sizes = list(y.shape)
    sizes[axis] = w_keep
    return lax.dynamic_slice(y, starts, sizes)


def gather_w(x: jax.Array, axis: int) -> jax.Array:
    """All-gather the W-shards into the full tensor (replicated).

    Used once per frame for the AGCM classifier input: the ¼-res condition
    image is a few MB and the classifier needs global statistics
    (InstanceNorm + global average pool, models/agcm.py:152-169) — gathering
    the small input and running the tiny classifier replicated is cheaper
    and simpler than sharding its global reductions."""
    name = axis_name()
    if not name:
        return x
    if _axis_n(name) == 1:
        return x
    return lax.all_gather(x, name, axis=axis, tiled=True)
