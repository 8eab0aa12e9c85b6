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


def make_shard_map(body, mesh, in_specs, out_specs):
    """``jax.shard_map`` across API generations (0.8 ``check_rep`` kwarg /
    0.9 keyword-only ``check_vma``); replication checking is off — the body
    mixes replicated params with sharded activations by design."""
    sm = getattr(jax, "shard_map", None)
    if sm is not None:
        # Probe the signature instead of catching TypeError: a genuine
        # argument error from the caller must surface, not be masked by a
        # legacy-import fallback.
        import inspect

        try:
            kw = inspect.signature(sm).parameters
        except (TypeError, ValueError):  # pragma: no cover — C-level callable
            kw = {}
        if "check_vma" in kw:
            return sm(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)
        if "check_rep" in kw:
            return sm(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_rep=False)
    from jax.experimental.shard_map import shard_map as sm  # jax < 0.8

    return sm(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
              check_rep=False)


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


def pick_radius(
    w_local: int, need: int, *, mod: int = 8, align: int = 2,
    coarse_w: int | None = None, coarse_mod: int = 8,
) -> int:
    """Smallest radius ≥ ``need`` that keeps the extended width eligible.

    ``mod``: the stage's extended-width divisibility requirement (8 for the
    stride-1 megakernels' ``_use_fused_kernel`` check, 16 for fused_down2's
    ``(wb/2) % 8``, 4·stride for resample windows). ``align``: radius
    granularity (2 keeps coarse-domain companion inputs at ``r/2`` aligned,
    4 for the ¼-res downsample). ``coarse_w``: when a half-res companion
    input is consumed by its OWN fused conv (not just folded into the fine
    kernel), its extended width ``coarse_w + r`` must satisfy ``coarse_mod``
    too — without this the merged-exchange window silently drops that conv
    to the lax path. All-static shape math — free at trace time.
    """
    r = max(need, align)
    r += (-r) % align
    for _ in range(4 * mod):
        if (w_local + 2 * r) % mod == 0 and (
            coarse_w is None or (coarse_w + r) % coarse_mod == 0
        ):
            return r
        r += align
    # Unreachable width/mod combination (odd shard width): the fused paths
    # reject such shapes themselves; return the plain aligned radius.
    return max(need, align) + (-max(need, align)) % align


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


def crop(y: jax.Array, r: int, axis: int, *, stride: int = 1, upscale: int = 1) -> jax.Array:
    """Undo ``ext`` after a stage: keep this device's canonical shard.

    ``stride``: the stage's spatial downscale (1 for same-res convs, 2 for
    the stride-2 down convs / HG encoder pools, 4 for the ¼-res condition
    downsample); ``upscale``: its spatial upscale (2 for the HG decoder's
    conv+PixelShuffle blocks). ``r`` is the radius in *input* columns;
    ``r·upscale`` must divide by ``stride``.
    """
    name = axis_name()
    if not name or r == 0:
        return y
    n = _axis_n(name)
    if n == 1:
        return y
    assert (r * upscale) % stride == 0, f"radius {r}·{upscale} not aligned to stride {stride}"
    rs = r * upscale // stride
    w_keep = y.shape[axis] - 2 * rs
    k = lax.axis_index(name)
    start = jnp.where(k == 0, 0, jnp.where(k == n - 1, 2 * rs, rs))
    starts = [0] * y.ndim
    starts[axis] = start
    sizes = list(y.shape)
    sizes[axis] = w_keep
    return lax.dynamic_slice(y, starts, sizes)


def _slice_local(y: jax.Array, out_axis: int, name: str) -> jax.Array:
    """This device's canonical shard of a replicated (gathered) result."""
    n = _axis_n(name)
    k = lax.axis_index(name)
    w_out = y.shape[out_axis] // n
    starts = [0] * y.ndim
    starts[out_axis] = k * w_out
    sizes = list(y.shape)
    sizes[out_axis] = w_out
    return lax.dynamic_slice(y, starts, sizes)


def run_stage(
    fn,
    inputs,
    waxes,
    *,
    need: int,
    mod: int = 8,
    align: int = 2,
    out_axis: int,
    out_stride: int = 1,
    out_upscale: int = 1,
    coarse_idx=(),
    coarse_conv: bool = False,
):
    """Run one spatially-overlapping stage under manual sharding.

    ``fn(*inputs)`` is the unmodified single-device stage (lax or Pallas);
    ``waxes[i]`` is input i's W axis; ``coarse_idx`` marks half-resolution
    companion inputs (they get radius r/2, keeping window starts aligned).
    ``coarse_conv``: the first coarse input is consumed by its own fused
    conv, so its extended width must stay mod-8 eligible (see pick_radius).
    Wide shards use shifted-window ext→fn→crop; shards narrower than 2r
    (the deep tiny UNet levels on small meshes) fall back to
    gather→replicated fn→slice, which is exact and cheap at those sizes.
    Tuple-returning stages have every element cropped on ``out_axis``;
    ``None`` inputs and a ``None`` result pass through untouched.
    """
    if not active():
        return fn(*inputs)
    name = axis_name()
    # The radius eligibility math is in the FINE domain: measure w on the
    # first non-coarse input (the coarse_conv merge sites pass the coarse
    # companion first, and its ext width is w_c + r, not w_c + 2r).
    fine_i = next(
        (i for i, x in enumerate(inputs) if x is not None and i not in coarse_idx),
        0,
    )
    w = inputs[fine_i].shape[waxes[fine_i]]
    coarse_w = None
    if coarse_conv and coarse_idx:
        ci = coarse_idx[0]
        if inputs[ci] is not None:
            coarse_w = inputs[ci].shape[waxes[ci]]
    r = pick_radius(w, need, mod=mod, align=align, coarse_w=coarse_w)
    if _axis_n(name) == 1:
        with suspended():
            return fn(*inputs)
    if w >= 2 * r:
        ext_in = [
            None if x is None else ext(x, r // 2 if i in coarse_idx else r, waxes[i])
            for i, x in enumerate(inputs)
        ]
        with suspended():
            y = fn(*ext_in)
        if y is None:
            return None
        if isinstance(y, tuple):
            return tuple(
                crop(e, r, out_axis, stride=out_stride, upscale=out_upscale) for e in y
            )
        return crop(y, r, out_axis, stride=out_stride, upscale=out_upscale)
    full = [None if x is None else gather_w(x, waxes[i]) for i, x in enumerate(inputs)]
    with suspended():
        y = fn(*full)
    if y is None:
        return None
    if isinstance(y, tuple):
        return tuple(_slice_local(e, out_axis, name) for e in y)
    return _slice_local(y, out_axis, name)


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
