"""HG composite in the s2d (space-to-depth) execution domain.

The natural-path HG composite (models/hdrtvnet.py hg_composite →
models/hg.py hg_apply, Hallucination_arch.py semantics) runs the
full-resolution stages at 32 natural channels — 1/4 MXU lane occupancy and
three full-res HBM round trips. Here the *level-1* stages execute in the
block domain of the base model's s2d output, so nothing ever leaves s2d
layout at full resolution:

- highlight mask: lane-side max over sub-position channel triplets;
- /32 reflect pad: a grid-level gather (even sizes keep natural row parity,
  so each padded sub-position row maps to one source grid row);
- ``conv1``: w_s2d_s1-transformed (12→256) with BN stats tiled 4×;
- ``maxpool1``: the 2×2 natural max is exactly a max over the 4 sub-position
  lane groups — free of spatial movement;
- encoder levels 2-6 and the decoder through ``conv9`` run natural at grid
  resolution and below (≥64-channel convs XLA already executes well);
- ``Up_conv5``: PixelShuffle folded into the conv's output permutation
  (w_ps_permute) — its output *is* the full-res s2d tensor;
- ``conv10``/``conv_last``: 1×1s as block-diagonal s2d mixes, with the
  concat row order rewired at transform time (s2d concat is block-major,
  the natural transform expects per-sub-position interleave);
- composite: ``mask·out + img`` with the mask repeated over each
  sub-position's RGB triplet.

Exactness: every rewrite is a permutation/zero-insertion of the same math —
parity vs the natural path is tested to float tolerance
(tests/test_hg_s2d.py), including against a torch-generated golden.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hdrtv_tpu.models.hg import _conv_block, _up_block
from hdrtv_tpu.models.layers import F32, Params, Policy, conv2d, max_pool2, relu
from hdrtv_tpu.models.s2d import b_s2d, w_ps_permute, w_s2d_1x1, w_s2d_s1
from hdrtv_tpu.parallel import halo as _halo


def _stage(fn, x: jax.Array, *, pool: bool = False, up: bool = False) -> jax.Array:
    """Run one spatially-overlapping HG stage (3×3 conv radius 1) under
    manual W-sharding (parallel/halo.py shifted windows); identity when not
    inside shard_map.

    ``pool``: the stage ends in a 2×2 max pool — the halo radius must be
    even (crop divides by the stride) and window starts stay parity-aligned
    with the global pooling grid. ``up``: the stage ends in PixelShuffle ×2,
    doubling the crop radius in output columns. The 1×1 mixes (conv6-9,
    conv10, conv_last) and the fused tail are pointwise — no exchange.
    Shards narrower than 2r (the deep UNet levels on wide meshes) fall back
    to run_stage's gather→replicated→slice path, exact at those tiny sizes.
    """
    if not _halo.active():
        return fn(x)
    return _halo.run_stage(
        fn, [x], [2], need=1,
        mod=2 if pool else 1, align=2 if pool else 1,
        out_axis=2, out_stride=2 if pool else 1, out_upscale=2 if up else 1,
    )


def _stage_pair(fn, x: jax.Array, *, pool: bool) -> jax.Array:
    """Two chained 3×3 blocks under ONE shifted window (halves the per-stage
    ext materializations — PERF_NOTES round-4 merge design). ``pool``: the
    pair is conv→2×2 pool→conv (encoder): contamination accumulates
    1 (conv) + 1 (pool boundary) + 2 (half-res conv) ≤ radius 4, output
    stride 2, even radius keeps the pooling grid start-aligned. Without
    ``pool`` (conv1→subpos_max→conv2): two radius-1 convs → radius 2."""
    if not _halo.active():
        return fn(x)
    if pool:
        return _halo.run_stage(
            fn, [x], [2], need=4, mod=2, align=2, out_axis=2, out_stride=2
        )
    return _halo.run_stage(fn, [x], [2], need=2, mod=1, align=1, out_axis=2)

__all__ = [
    "hg_s2d_transform",
    "hg_s2d_apply",
    "hg_composite_s2d",
    "pad_reflect_s2d",
    "mask_s2d",
    "subpos_max",
]


def _permute_cat_rows(w_t: np.ndarray, parts: tuple[int, ...]) -> np.ndarray:
    """Reorder a w_s2d_1x1 row axis from natural block-major (sub-position
    major over the *concatenated* natural channels) to the layout produced by
    concatenating the pieces' s2d tensors (piece-major, then sub-position)."""
    total = sum(parts)
    perm = []
    for pi, cn in enumerate(parts):
        off = sum(parts[:pi])
        for s in range(4):
            perm.extend(s * total + off + c for c in range(cn))
    # perm[r_ours] = natural block-major row feeding our row r_ours.
    return w_t[:, :, np.asarray(perm), :]


def hg_s2d_transform(params: dict) -> dict:
    """Transform the ``hg.*`` weights for s2d execution; pass the rest through.

    Level-1 layers get the s2d rewrites; deeper levels keep natural weights
    (they run at grid resolution and below, where XLA convs are efficient).
    """
    out: dict[str, np.ndarray] = {}
    handled: set[str] = set()

    def take(k):
        handled.add(k)
        return np.asarray(params[k], np.float32)

    def fold_bn(layer: str) -> tuple[np.ndarray, np.ndarray]:
        """Fold eval-mode BN into the conv's weight/bias (exact — the
        reference's own fusedbn load path does the same fold)."""
        w, b = take(f"{layer}.0.weight"), take(f"{layer}.0.bias")
        if f"{layer}.1.running_mean" in params:
            mean = take(f"{layer}.1.running_mean")
            var = take(f"{layer}.1.running_var")
            gamma = take(f"{layer}.1.weight")
            beta = take(f"{layer}.1.bias")
            scale = gamma / np.sqrt(var + 1e-5)
            w = w * scale[None, None, None, :]
            b = b * scale + (beta - mean * scale)
        return w, b

    _BN_BLOCKS = (
        "hg.conv1", "hg.conv2", "hg.conv3_1", "hg.conv3_2", "hg.conv4_1",
        "hg.conv4_2", "hg.conv5_1", "hg.conv5_2", "hg.conv_code1", "hg.conv_code2",
    )
    if "hg.conv1.0.weight" in params:
        for blk in _BN_BLOCKS:
            if f"{blk}.0.weight" not in params:
                continue
            w, b = fold_bn(blk)
            if blk == "hg.conv1":
                w, b = w_s2d_s1(w), b_s2d(b)
            out[f"{blk}.0.weight"] = w
            out[f"{blk}.0.bias"] = b
    if "hg.Up_conv5.0.weight" in params:
        out["hg.Up_conv5.0.weight"] = w_ps_permute(take("hg.Up_conv5.0.weight"))
        b = take("hg.Up_conv5.0.bias")
        out["hg.Up_conv5.0.bias"] = w_ps_permute(b.reshape(1, 1, 1, -1))[0, 0, 0]
    if "hg.conv10.weight" in params:
        w = take("hg.conv10.weight")  # (1,1,2*cn,3): concat(up5_cn, c1_cn)
        cn = w.shape[2] // 2
        out["hg.conv10.weight"] = _permute_cat_rows(w_s2d_1x1(w), (cn, cn))
        out["hg.conv10.bias"] = b_s2d(take("hg.conv10.bias"))
    if "hg.conv_last.weight" in params:
        w = take("hg.conv_last.weight")  # (1,1,6,3): concat(u_3, img_3)
        out["hg.conv_last.weight"] = _permute_cat_rows(w_s2d_1x1(w), (3, 3))
        out["hg.conv_last.bias"] = b_s2d(take("hg.conv_last.bias"))
    for k, v in params.items():
        if k not in handled:
            out[k] = np.asarray(v)
    return out


def subpos_max(x: jax.Array) -> jax.Array:
    """2×2 natural max pool of an s2d tensor = max over the 4 sub-position
    lane groups: (N,Hb,Wb,4C) → natural (N,Hb,Wb,C)."""
    n, h, w, c4 = x.shape
    return x.reshape(n, h, w, 4, c4 // 4).max(axis=3)


def mask_s2d(base_s2d: jax.Array, r: float = 0.75, thresh: float = 0.1) -> jax.Array:
    """make_mask (HG_Composite_arch.py:77-84) on the s2d base output:
    (N,Hb,Wb,12) → (N,Hb,Wb,4) — one mask lane per sub-position."""
    n, h, w, _ = base_s2d.shape
    m = base_s2d.reshape(n, h, w, 4, 3).max(axis=-1)
    m = jnp.clip((m - r) / (1.0 - r), 0.0, 1.0)
    return (m > thresh).astype(base_s2d.dtype)


def pad_reflect_s2d(x: jax.Array, pgh: int, pgw: int) -> jax.Array:
    """Bottom/right reflect pad by ``pgh``/``pgw`` *grid* rows/cols of an s2d
    tensor — equal to s2d(pad_reflect(d2s(x), 2·pgh, 2·pgw)).

    Even natural sizes keep row parity under reflection (natural padded row
    2(Hb+j)+a mirrors 2(Hb−1−j) for a=0 and 2(Hb−2−j)+1 for a=1), so each
    sub-position of a padded grid row is a plain reversed grid-row slice.
    """
    if pgh == 0 and pgw == 0:
        return x
    n, hb, wb, c4 = x.shape
    if pgh > hb - 1 or pgw > wb - 1:
        # Reflection reads up to hb-1-pgh; beyond that numpy-style negative
        # starts would silently clamp and crash later with a confusing
        # concat shape mismatch.
        raise ValueError(
            f"frame too small for HG /32 reflect padding: s2d grid {hb}x{wb} "
            f"cannot reflect-pad by ({pgh},{pgw}) grid rows/cols"
        )
    cn = c4 // 4
    xa = x.reshape(n, hb, wb, 2, 2, cn)
    if pgh:
        a0 = xa[:, hb - pgh : hb][:, ::-1][:, :, :, 0:1]  # row j ← grid hb−1−j, a=0
        a1 = xa[:, hb - 1 - pgh : hb - 1][:, ::-1][:, :, :, 1:2]  # ← hb−2−j, a=1
        xa = jnp.concatenate([xa, jnp.concatenate([a0, a1], axis=3)], axis=1)
    if pgw:
        b0 = xa[:, :, wb - pgw : wb][:, :, ::-1][:, :, :, :, 0:1]
        b1 = xa[:, :, wb - 1 - pgw : wb - 1][:, :, ::-1][:, :, :, :, 1:2]
        xa = jnp.concatenate([xa, jnp.concatenate([b0, b1], axis=4)], axis=2)
    return xa.reshape(n, hb + pgh, wb + pgw, c4)


def _conv3_fused(
    p: Params, name: str, x: jax.Array, *, relu_after: bool, policy: Policy,
    pool_out: bool = False,
) -> jax.Array:
    """3×3 natural conv block. BN is folded at transform time, so conv+ReLU
    is the whole block; ``pool_out`` applies the following 2×2 max pool.

    Deliberately lax, not Pallas: on v5e the layout copies XLA inserts
    around Pallas boundaries inside the HG cost more than the kernels save
    (measured 82.1 ms lax vs 85.4 ms kernels at 1080p; conv+pool fused
    epilogue 85.4 — PERF_NOTES round 2) — the round-1 "pallas only where
    XLA is weak" lesson again.
    """
    y = conv2d(p, name, x, padding=1, policy=policy)
    if relu_after:
        y = relu(y)
    return max_pool2(y) if pool_out else y


def _conv_block_f(
    p: Params, name: str, x: jax.Array, *, policy: Policy, pool_out: bool = False
) -> jax.Array:
    if f"{name}.1.running_mean" in p:  # un-folded checkpoint: BN between
        y = _conv_block(p, name, x, policy=policy)
        return max_pool2(y) if pool_out else y
    return _conv3_fused(p, f"{name}.0", x, relu_after=True, policy=policy, pool_out=pool_out)


def _up_block_f(p: Params, name: str, x: jax.Array, *, policy: Policy) -> jax.Array:
    if f"{name}.1.weight" in p:  # resizeconv layout → natural helper
        return _up_block(p, name, x, policy=policy)
    from hdrtv_tpu.models.layers import pixel_shuffle

    # ReLU commutes with PixelShuffle (elementwise vs permutation).
    return pixel_shuffle(_conv3_fused(p, f"{name}.0", x, relu_after=True, policy=policy), 2)


def hg_s2d_apply(
    p: Params, img_s2d: jax.Array, mask4: jax.Array, *, policy: Policy = F32,
    pack: bool = False, tail_on: bool | None = None,
) -> jax.Array:
    """Hallucination_Generator.forward over s2d level-1 tensors.

    ``img_s2d``: (N,Hbp,Wbp,12) — the /16-grid-padded s2d base output;
    ``mask4``: (N,Hbp,Wbp,4). Returns the composited s2d output (…,12), or
    with ``pack`` (and the fused tail eligible) packed u16 (N,Hbp,2,Wbp,6)
    RGB48 rows straight from the tail kernel.
    """
    img_s2d = policy.cast(img_s2d)

    # Level 1 in s2d: conv1 (12→256, BN folded) + relu. hg_s2d_transform
    # always folds conv1's BN when it builds the s2d weight, so there is no
    # unfolded-BN case here (the natural 64-ch stats could not broadcast
    # against the 256-ch s2d activation anyway).
    def _conv1(x):
        return relu(conv2d(p, "hg.conv1.0", x, padding=1, policy=policy))

    # Levels 1-6 + decoder to conv9: natural tensors at grid res and below
    # (hg_apply verbatim, with maxpool1 as the sub-position lane max and the
    # ≥128-channel convs on the Pallas block kernel). Under manual
    # W-sharding, chained blocks share one halo window (_stage_pair) —
    # conv1+conv2 are the two grid-resolution (biggest-tensor) stages, and
    # each encoder level's conv→pool→conv pair exchanges once.
    def _blk(name, pool=False):
        return lambda x: _conv_block_f(p, name, x, policy=policy, pool_out=pool)

    def _pair(n1, n2):
        return lambda x: _blk(n2)(_blk(n1, True)(x))

    c1_c2 = _stage_pair(
        lambda x: ((c := _conv1(x)), _conv_block_f(p, "hg.conv2", subpos_max(c), policy=policy)),
        img_s2d, pool=False,
    )
    c1, c2 = c1_c2
    c3 = _stage_pair(_pair("hg.conv3_1", "hg.conv3_2"), c2, pool=True)
    c4 = _stage_pair(_pair("hg.conv4_1", "hg.conv4_2"), c3, pool=True)
    c5 = _stage_pair(_pair("hg.conv5_1", "hg.conv5_2"), c4, pool=True)
    code = _stage_pair(_pair("hg.conv_code1", "hg.conv_code2"), c5, pool=True)

    def _upb(name):
        return lambda x: _up_block_f(p, name, x, policy=policy)

    u = jnp.concatenate((_stage(_upb("hg.Up_conv1"), code, up=True), c5), axis=-1)
    u = conv2d(p, "hg.conv6", u, policy=policy)  # 1×1 — pointwise
    u = jnp.concatenate((_stage(_upb("hg.Up_conv2"), u, up=True), c4), axis=-1)
    u = conv2d(p, "hg.conv7", u, policy=policy)
    u = jnp.concatenate((_stage(_upb("hg.Up_conv3"), u, up=True), c3), axis=-1)
    u = conv2d(p, "hg.conv8", u, policy=policy)
    u = jnp.concatenate((_stage(_upb("hg.Up_conv4"), u, up=True), c2), axis=-1)
    u = conv2d(p, "hg.conv9", u, policy=policy)  # natural (N,Hbp,Wbp,64)

    # Up_conv5 with the PS fold: output IS the full-res s2d tensor.
    up5 = _stage(lambda x: relu(conv2d(p, "hg.Up_conv5.0", x, padding=1, policy=policy)), u)

    from hdrtv_tpu.utils.env import env_bool

    # In split-program execution (runtime/processor.py HG split: base and HG
    # stages are separate jits) the tail kernel is the only Mosaic module in
    # its program and compiles within budget — callers pass ``tail_on=True``
    # there. The single-jit default stays OFF: that program's 1080p compile
    # never finished on the round-2 runner (>23 min in the remote Mosaic
    # helper, base megakernels + tail in one budget).
    tail_ok = (
        pack
        and env_bool("HDRTV_HG_TAIL", bool(tail_on))
        and (jax.default_backend() == "tpu" or env_bool("HDRTV_MEGAKERNEL_INTERPRET", False))
        and up5.shape[0] == 1
        and up5.shape[2] % 8 == 0
    )
    if tail_ok:
        # One HBM pass: concat-free 1×1s + composite + RGB48 pack
        # (the profiled concat pad/max + relayout + pack-transpose bucket).
        from hdrtv_tpu.ops.megakernel import fused_hg_tail

        return fused_hg_tail(
            policy.cast(up5[0]), policy.cast(c1[0]), img_s2d[0], mask4[0],
            p["hg.conv10.weight"][0, 0], p["hg.conv10.bias"],
            p["hg.conv_last.weight"][0, 0], p["hg.conv_last.bias"],
        )[None]

    # 1×1 mixes over concats (weights concat-permuted at transform time).
    # A concat-free two-dot form in plain XLA measured SLOWER on v5e (the
    # matmul operands force relayouts the 1×1-conv path avoids) — keep the
    # convs on the unpacked path.
    cat = jnp.concatenate((up5, c1), axis=-1)
    u10 = conv2d(p, "hg.conv10", cat, policy=policy)  # (…,12)
    out = conv2d(p, "hg.conv_last", jnp.concatenate((u10, img_s2d), axis=-1), policy=policy)
    mask_rep = jnp.repeat(mask4, 3, axis=-1).astype(out.dtype)
    comp = mask_rep * out + img_s2d
    if pack:
        from hdrtv_tpu.models.s2d import _pack_rgb48_s2d_flat

        n, hb, wb, _ = comp.shape
        return _pack_rgb48_s2d_flat(comp[0]).reshape(hb, 2, wb, 6)[None]
    return comp


def hg_composite_s2d(
    p: Params, base_s2d: jax.Array, cfg, *, policy: Policy = F32, pack: bool = False,
    tail_on: bool | None = None,
) -> jax.Array:
    """Mask → /16-grid reflect pad → HG → crop, over the s2d base output
    (HG_Composite_arch.py:86-107 in the block domain). With ``pack`` the
    result is the flat u16 RGB48 byte rows (2Hb, 6Wb) — the delivery
    contract — straight from the fused tail when eligible (the crop is then
    a u16 row/col slice)."""
    n, hb, wb, _ = base_s2d.shape
    mask4 = mask_s2d(base_s2d, r=cfg.mask_r)
    pgh = (16 - hb % 16) % 16
    pgw = (16 - wb % 16) % 16
    # Under manual W-sharding only the LAST shard may own the true right
    # edge; per-shard reflect W-padding would fabricate interior edges. The
    # processor gates mesh eligibility on wb % (16·n_sp) == 0 so pgw is 0
    # here (H is unsharded — pgh pads identically on every shard).
    assert not (_halo.active() and pgw), (
        f"sharded HG needs W/2 divisible by 16 per shard (wb={wb})"
    )
    base_pad = pad_reflect_s2d(base_s2d, pgh, pgw)
    mask_pad = pad_reflect_s2d(mask4, pgh, pgw)
    out = hg_s2d_apply(p, base_pad, mask_pad, policy=policy, pack=pack, tail_on=tail_on)
    if pack:
        packed = out[0]  # (Hbp, 2, Wbp, 6)
        if pgh or pgw:
            packed = packed[:hb, :, :wb, :]
        return packed.reshape(2 * hb, wb * 6)
    if pgh or pgw:
        out = out[:, :hb, :wb, :]
    return out
