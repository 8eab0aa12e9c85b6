"""Turnkey multi-chip bring-up + single-chip Mosaic acceptance proof.

The 4K60 north star (BASELINE.md) is the shard_map manual-halo megakernel
ladder (PERF_NOTES round-3/4): single-chip 4K ms divided across spatial
shards. This runner has ONE physical chip, so the ladder cannot be measured
here — but its last *software* risk can be retired on one chip: does Mosaic
accept the megakernels at the exact per-shard (halo-extended) shapes the
8-shard 4K program dispatches? Off-chip the kernels cannot compile at all
(Mosaic is TPU-only), and interpret-mode under multi-device shard_map
deadlocks inside jax (PERF_NOTES round-4) — hence this three-mode tool:

  record  (CPU, no chip)   Trace the REAL shard_map programs (no-HG turbo +
                           HG composite split) on an 8-device virtual mesh
                           at the ladder's exact 4K geometry, with a spy on
                           every megakernel entry point. Every kernel call's
                           argument specs (shapes/dtypes + static kwargs)
                           are recorded and pickled.
  prove   (real chip)      Re-invoke each unique recorded kernel call with
                           dummy operands and ``jit(...).lower().compile()``
                           for the TPU target — a compile-only Mosaic
                           acceptance check of the sharded kernel shapes.
                           Writes logs/multichip/mosaic_acceptance.json.
  run     (n≥2 chips)      The turnkey hardware bring-up: build
                           ``spatial_mesh(n)``, run the shard_map turbo and
                           HG programs at 4K through the product path
                           (``HDRTVNetTPU.process_rgb48``), validate ≤1 LSB
                           vs the single-device program, measure per-chip
                           ms/frame (chained dispatches + one fetch), and
                           emit the real ladder row JSON.

No reference equivalent — the reference is single-GPU (SURVEY.md §2.8).

Usage:
    python tools/multichip_bringup.py record [--height 2160 --width 3840]
    python tools/multichip_bringup.py prove        # on the chip, background
    python tools/multichip_bringup.py run [--frames 30] [--no-parity]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.environ.get("HDRTV_BRINGUP_DIR") or os.path.join(REPO, "logs", "multichip")
CALLS_PATH = os.path.join(OUT_DIR, "kernel_calls.pkl")
ACCEPT_PATH = os.path.join(OUT_DIR, "mosaic_acceptance.json")

# Every Pallas entry point the turbo/HG programs dispatch (models/s2d.py,
# models/hg_s2d.py import these function-locally, so module setattr
# intercepts them).
KERNELS = {
    "megakernel": [
        "fused_agcm_head", "fused_cond_chain", "fused_tail", "fused_down2",
        "fused_sft_conv3_v2", "fused_resblock", "fused_trunk3",
        "fused_mix_chain", "fused_hg_tail",
    ],
    "conv_kernels": ["fused_block_conv3"],
}


def _kernel_module(name: str):
    import hdrtv_tpu.ops.conv_kernels as ck
    import hdrtv_tpu.ops.megakernel as mk

    return mk if name in KERNELS["megakernel"] else ck


def _spec_leaf(x):
    """Tracers → ShapeDtypeStruct; concrete statics stay as values."""
    import jax

    if isinstance(x, jax.core.Tracer):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        # Concrete array operand (e.g. precomputed constants) — keep only
        # the spec; values never matter for a compile-only proof.
        return jax.ShapeDtypeStruct(tuple(x.shape), x.dtype)
    return x


def _spec_key(name: str, spec) -> str:
    return f"{name} {spec!r}"


# ---------------------------------------------------------------------------
# record
# ---------------------------------------------------------------------------


def record(height: int, width: int, n_shards: int) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_shards}"
    )
    # Force megakernel eligibility off-TPU; tracing never executes the
    # interpret-mode kernels, so the shard_map interpret deadlock is moot.
    os.environ["HDRTV_MEGAKERNEL_INTERPRET"] = "1"
    # ...and the per-conv fused kernels too (recorder-only escape in
    # models/s2d.py _use_fused_kernel — the mega env alone keeps them lax).
    os.environ["HDRTV_FORCE_FUSED_TRACE"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hdrtv_tpu.parallel.mesh import spatial_mesh
    from hdrtv_tpu.runtime.processor import HDRTVNetTPU
    from tools.bench_modes import synth_hg_ckpt

    calls: dict[str, tuple] = {}

    def _install_spies():
        for mod_name, names in KERNELS.items():
            for name in names:
                mod = _kernel_module(name)
                orig = getattr(mod, name)

                def spy(*args, __orig=orig, __name=name, **kwargs):
                    spec = jax.tree_util.tree_map(_spec_leaf, (args, kwargs))
                    calls.setdefault(_spec_key(__name, spec), (__name, spec))
                    return __orig(*args, **kwargs)

                setattr(mod, name, spy)

    _install_spies()
    # The kernels lower for real during trace; on CPU only interpret mode can
    # lower a pallas_call (never executed here — spies fire at trace time).
    from jax.experimental import pallas as _pl  # noqa: F401 — ensures pltpu import works
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    mesh = spatial_mesh(n_shards)
    h, w = height, width
    flat_sds = jax.ShapeDtypeStruct((h, w * 3), jnp.uint8)

    # no-HG turbo program at the ladder geometry
    proc = HDRTVNetTPU(
        os.path.join(REPO, "weights", "hr_fp32.npz"),
        precision="fp16", persistent_cache=False, mesh=mesh,
    )
    assert proc._mesh_manual_ok(h, w * 3), "shard_map path not eligible at this size"
    n0 = len(calls)
    proc._mesh_flat_fn_manual(h, w * 3).lower(proc.params, flat_sds)
    print(f"record: no-HG turbo {w}x{h}/{n_shards} shards → "
          f"{len(calls) - n0} unique kernel calls", flush=True)

    # HG composite split programs
    hg_path = os.path.join(OUT_DIR, "synth_hg_bringup.npz")
    os.makedirs(OUT_DIR, exist_ok=True)
    if not os.path.exists(hg_path):
        synth_hg_ckpt(hg_path)
    proc_hg = HDRTVNetTPU(
        hg_path, precision="fp16", use_hg=True, persistent_cache=False, mesh=mesh,
    )
    if proc_hg._mesh_manual_ok(h, w * 3):
        n0 = len(calls)
        fn = proc_hg._mesh_hg_fn_manual(h, w * 3)
        base_jit = getattr(fn, "base_jit", None)
        hg_jit = getattr(fn, "hg_jit", None)
        if base_jit is None:
            print("record: WARNING — _mesh_hg_fn_manual does not expose its "
                  "jits; HG kernels not recorded", flush=True)
        else:
            lowered = base_jit.lower(proc_hg.params, flat_sds)
            base_sds = jax.ShapeDtypeStruct(
                lowered.out_info.shape, lowered.out_info.dtype
            )
            hg_jit.lower(proc_hg.params, base_sds)
            print(f"record: HG split {w}x{h}/{n_shards} shards → "
                  f"{len(calls) - n0} more unique kernel calls", flush=True)
    else:
        print(f"record: HG shard_map ineligible at {w}x{h}/{n_shards}", flush=True)

    with open(CALLS_PATH, "wb") as f:
        pickle.dump(
            {"geometry": {"height": h, "width": w, "n_shards": n_shards},
             "calls": list(calls.values())},
            f,
        )
    print(f"record: {len(calls)} unique kernel calls → {CALLS_PATH}", flush=True)
    return 0


# ---------------------------------------------------------------------------
# prove
# ---------------------------------------------------------------------------


def prove(budget_s: float) -> int:
    import jax
    import jax.numpy as jnp

    from hdrtv_tpu.runtime.engine import enable_persistent_cache

    enable_persistent_cache()
    with open(CALLS_PATH, "rb") as f:
        rec = pickle.load(f)
    calls = rec["calls"]
    platform = jax.devices()[0].platform
    results, t_start = [], time.monotonic()
    for i, (name, spec) in enumerate(calls):
        if time.monotonic() - t_start > budget_s:
            results.append({"kernel": name, "ok": False, "error": "budget exhausted"})
            continue
        fn = getattr(_kernel_module(name), name)
        leaves, treedef = jax.tree_util.tree_flatten(spec)
        arr_idx = [j for j, l in enumerate(leaves)
                   if isinstance(l, jax.ShapeDtypeStruct)]

        def call(*arrs, __fn=fn, __leaves=leaves, __treedef=treedef, __idx=arr_idx):
            ls = list(__leaves)
            for j, a in zip(__idx, arrs):
                ls[j] = a
            args, kwargs = jax.tree_util.tree_unflatten(__treedef, ls)
            return __fn(*args, **kwargs)

        arrs = [jnp.ones(leaves[j].shape, leaves[j].dtype) for j in arr_idx]
        row = {"kernel": name,
               "arg_shapes": [list(leaves[j].shape) for j in arr_idx[:4]]}
        t0 = time.monotonic()
        try:
            jax.jit(call).lower(*arrs).compile()
            row.update(ok=True, compile_s=round(time.monotonic() - t0, 1))
        except Exception as exc:  # noqa: BLE001 — acceptance log wants the reason
            row.update(ok=False, compile_s=round(time.monotonic() - t0, 1),
                       error=f"{type(exc).__name__}: {exc}"[:500])
        results.append(row)
        print(f"prove [{i + 1}/{len(calls)}] {name}: "
              f"{'OK' if row['ok'] else 'FAIL'} {row['compile_s']}s", flush=True)
    ok = all(r.get("ok") for r in results)
    out = {
        "geometry": rec["geometry"],
        "platform": platform,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "all_accepted": ok,
        "n_calls": len(results),
        "results": results,
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(ACCEPT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"prove: {'ALL ACCEPTED' if ok else 'FAILURES'} "
          f"({len(results)} calls) → {ACCEPT_PATH}", flush=True)
    return 0 if ok else 1


# ---------------------------------------------------------------------------
# run (real multi-chip hardware)
# ---------------------------------------------------------------------------


def run(height: int, width: int, frames: int, parity: bool, use_hg: bool) -> int:
    import numpy as np

    import jax

    from hdrtv_tpu.parallel.mesh import spatial_mesh
    from hdrtv_tpu.runtime.engine import enable_persistent_cache
    from hdrtv_tpu.runtime.processor import HDRTVNetTPU

    enable_persistent_cache()
    n = len(jax.devices())
    if n < 2:
        print(f"run: only {n} device(s) — this mode needs multi-chip hardware; "
              "use 'record'+'prove' on a single chip", file=sys.stderr)
        return 2
    model = os.path.join(REPO, "weights", "hr_fp32.npz")
    if use_hg:
        from tools.bench_modes import synth_hg_ckpt

        model = os.path.join(OUT_DIR, "synth_hg_bringup.npz")
        os.makedirs(OUT_DIR, exist_ok=True)
        if not os.path.exists(model):
            synth_hg_ckpt(model)
    mesh = spatial_mesh(n)
    proc = HDRTVNetTPU(model, precision="fp16", use_hg=use_hg, mesh=mesh)
    h, w = height, width
    if not proc._mesh_manual_ok(h, w * 3):
        print(f"run: shard_map ineligible at {w}x{h} over {n} shards "
              f"(need W % {32 if use_hg else 16}·n == 0)", file=sys.stderr)
        return 2
    rng = np.random.RandomState(0)
    frame = (rng.rand(h, w, 3) * 255).astype(np.uint8)

    row: dict = {"n_chips": n, "height": h, "width": w, "use_hg": use_hg,
                 "device": str(jax.devices()[0].device_kind)}
    if parity:
        single = HDRTVNetTPU(model, precision="fp16", use_hg=use_hg)
        ref = np.asarray(single.process_rgb48(frame)).astype(np.int32)
        got = np.asarray(proc.process_rgb48(frame)).astype(np.int32)
        row["parity_max_lsb"] = int(np.abs(ref - got).max())
        print(f"run: parity vs single device: max |Δ| = {row['parity_max_lsb']} LSB",
              flush=True)

    # Warm + measure: chained data-dependent dispatches, one final fetch
    # (through a relay, block_until_ready does not wait — PERF_NOTES).
    flat = jax.device_put(frame.reshape(h, w * 3))
    out = proc._mesh_rgb48_flat(flat)
    _ = np.asarray(out[:2, :2])
    t0 = time.perf_counter()
    cur = out
    for _ in range(frames):
        nxt = proc._mesh_rgb48_flat((cur % 256).astype(np.uint8) if isinstance(cur, np.ndarray)
                                    else (cur % 256).astype("uint8"))
        cur = nxt
    _ = np.asarray(cur[:2, :2])
    dt = (time.perf_counter() - t0) / frames * 1000.0
    row.update(ms_per_frame=round(dt, 2), fps=round(1000.0 / dt, 2),
               ts=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"ladder_{n}chip_{w}x{h}{'_hg' if use_hg else ''}.json")
    with open(path, "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row), flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["record", "prove", "run"])
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--hg", action="store_true")
    ap.add_argument("--no-parity", action="store_true")
    ap.add_argument("--budget-s", type=float, default=5400.0,
                    help="prove-mode wall budget; remaining calls are marked")
    args = ap.parse_args()
    if args.mode == "record":
        return record(args.height, args.width, args.shards)
    if args.mode == "prove":
        return prove(args.budget_s)
    return run(args.height, args.width, args.frames, not args.no_parity, args.hg)


if __name__ == "__main__":
    sys.exit(main())
