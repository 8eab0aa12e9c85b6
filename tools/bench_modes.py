"""On-chip mode benchmark: {no-HG, HG} × {bf16, int8} × resolution.

Times the full per-frame program through the production ``HDRTVNetTPU``
dispatcher (including the round-3 split HG execution), with the round-1
methodology: chain n data-dependent dispatches, fetch a slice of the final
output, divide by n (the axon relay's ``block_until_ready`` does not wait
for execution — only a fetch does; validated linear in n).

Usage:
    python tools/bench_modes.py                        # 1080p no-HG bf16
    python tools/bench_modes.py --hg                   # 1080p HG (split)
    python tools/bench_modes.py --hg --no-split        # single-program HG
    python tools/bench_modes.py --height 2160 --width 3840
    HDRTVNET_NATIVE_INT8=1 python tools/bench_modes.py --model <int8.pt>
    python tools/bench_modes.py --hg --trace /tmp/hg_trace   # profile too
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def synth_hg_ckpt(path: str, nf: int = 64, base_ckpt: str | None = None) -> str:
    """Combined base+HG checkpoint with *synthetic* HG weights.

    The reference does not ship eager HG weights in-repo (they are
    downloaded at app start — required_clone_assets.py; zero egress here),
    so HG *timing* runs use correctly-shaped random weights at the reference
    architecture (Hallucination_arch.py:53-90, nf=64): timing is
    value-independent. Quality work uses the golden-tested fixtures instead.
    ``base_ckpt``: optional base checkpoint (.pt — e.g. the shipped int8 QAT
    HR) replacing the default fp32 base, int8 codes/scales preserved for the
    native-int8 HG-composite timing row.
    """
    import numpy as np

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.RandomState(0)
    p: dict[str, np.ndarray] = {}
    if base_ckpt:
        from hdrtv_tpu.models.import_torch import load_checkpoint

        bp, _ = load_checkpoint(base_ckpt, use_hg=False)
        for k, v in bp.items():
            p[f"base.{k}"] = np.asarray(v)
    else:
        with np.load(os.path.join(here, "weights", "hr_fp32.npz")) as z:
            for k in z.files:
                p[f"base.{k}"] = z[k]

    def conv(name, ci, co, k=3, bn=False):
        p[f"{name}.weight"] = (rng.randn(k, k, ci, co) * 0.05).astype(np.float32)
        p[f"{name}.bias"] = (rng.randn(co) * 0.01).astype(np.float32)
        if bn:
            base = name.rsplit(".", 1)[0]
            p[f"{base}.1.running_mean"] = (rng.randn(co) * 0.01).astype(np.float32)
            p[f"{base}.1.running_var"] = (1 + rng.rand(co) * 0.1).astype(np.float32)
            p[f"{base}.1.weight"] = (1 + rng.randn(co) * 0.01).astype(np.float32)
            p[f"{base}.1.bias"] = (rng.randn(co) * 0.01).astype(np.float32)

    # Encoder conv_blocks (conv+BN+ReLU)
    for name, ci, co in [
        ("conv1", 3, nf), ("conv2", nf, 2 * nf),
        ("conv3_1", 2 * nf, 4 * nf), ("conv3_2", 4 * nf, 4 * nf),
        ("conv4_1", 4 * nf, 8 * nf), ("conv4_2", 8 * nf, 8 * nf),
        ("conv5_1", 8 * nf, 8 * nf), ("conv5_2", 8 * nf, 8 * nf),
        ("conv_code1", 8 * nf, 8 * nf), ("conv_code2", 8 * nf, 8 * nf),
    ]:
        conv(f"hg.{name}.0", ci, co, bn=True)
    # Decoder: PS up blocks (conv ci→4co) + 1×1 mixes
    for name, ci, co in [
        ("Up_conv1.0", 8 * nf, 32 * nf), ("Up_conv2.0", 8 * nf, 32 * nf),
        ("Up_conv3.0", 4 * nf, 16 * nf), ("Up_conv4.0", 2 * nf, 8 * nf),
        ("Up_conv5.0", nf, 4 * nf),
    ]:
        conv(f"hg.{name}", ci, co)
    for name, ci, co in [
        ("conv6", 16 * nf, 8 * nf), ("conv7", 16 * nf, 4 * nf),
        ("conv8", 8 * nf, 2 * nf), ("conv9", 4 * nf, nf),
        ("conv10", 2 * nf, 3), ("conv_last", 6, 3),
    ]:
        conv(f"hg.{name}", ci, co, k=1)
    np.savez(path, **p)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--hg", action="store_true")
    ap.add_argument("--no-split", action="store_true", help="force single-program HG")
    ap.add_argument("--model", default=None, help="checkpoint (.pt/.npz)")
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--trace", metavar="DIR", default=None, help="jax.profiler trace dir")
    ap.add_argument(
        "--batch", type=int, default=0, metavar="B",
        help="batched-export throughput: keep B device-resident frame chains "
        "in flight (the cli export --batch dispatch pattern, "
        "processor._process_rgb48_batch_jit) and report frames/sec",
    )
    ap.add_argument(
        "--fold-chain", action="store_true",
        help="fold the next-frame derivation into the model jit (bench.py "
        "methodology — the %%256 chain op otherwise runs as separate jits, "
        "~0.7 ms @1080p / ~2.9 ms @4K of harness overhead in the number)",
    )
    args = ap.parse_args()

    if args.no_split:
        os.environ["HDRTV_HG_SPLIT"] = "0"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdrtv_tpu.runtime.engine import enable_persistent_cache
    from hdrtv_tpu.runtime.processor import HDRTVNetTPU

    enable_persistent_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.hg and args.model:
        # combined: the given base checkpoint (e.g. int8 QAT) + synthetic HG
        import hashlib

        tag = hashlib.sha1(args.model.encode()).hexdigest()[:8]
        model = f"/tmp/hdrtv_synth_hg_{tag}.npz"
        if not os.path.exists(model):
            synth_hg_ckpt(model, base_ckpt=args.model)
    elif args.model:
        model = args.model
    elif args.hg:
        model = "/tmp/hdrtv_synth_hg.npz"
        if not os.path.exists(model):
            synth_hg_ckpt(model)
    else:
        model = os.path.join(here, "weights", "hr_fp32.npz")
    t0 = time.perf_counter()
    proc = HDRTVNetTPU(model, precision=args.precision, use_hg=args.hg)
    print(
        f"model={os.path.basename(model)} turbo={proc.turbo} "
        f"native_int8={proc.native_int8} predeq={proc.predequantized} "
        f"split={proc._hg_split_active(args.height, args.width * 3)} "
        f"load={time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    h, w = args.height, args.width
    frame = jax.device_put(
        jnp.asarray((np.random.RandomState(0).rand(h, w * 3) * 255).astype(np.uint8))
    )
    if args.batch:
        # Batched-export throughput: B independent device-resident chains,
        # dispatched round-robin exactly like _process_rgb48_batch_jit
        # (async per-frame programs — XLA pipelines the B in-flight chains).
        b = args.batch
        rng = np.random.RandomState(0)
        outs = [
            proc.process_rgb48_device(
                jax.device_put(jnp.asarray((rng.rand(h, w * 3) * 255).astype(np.uint8)))
            )
            for _ in range(b)
        ]
        _ = [np.asarray(o[:2, :2]) for o in outs]  # compile + settle

        def batch_rounds(n):
            t0 = time.perf_counter()
            cur = outs
            for _ in range(n):
                cur = [
                    proc.process_rgb48_device((o % 256).astype(jnp.uint8)) for o in cur
                ]
            _ = [np.asarray(o[:2, :2]) for o in cur]
            return (time.perf_counter() - t0) / (n * b)

        batch_rounds(2)
        dt = batch_rounds(max(4, args.n // b))
        print(
            json.dumps(
                {
                    "mode": "batch-export",
                    "batch": b,
                    "precision": args.precision,
                    "native_int8": proc.native_int8,
                    "resolution": f"{w}x{h}",
                    "ms_per_frame": round(dt * 1e3, 2),
                    "frames_per_sec": round(1.0 / dt, 2),
                }
            ),
            flush=True,
        )
        return
    if args.fold_chain:
        if proc._hg_split_active(h, w * 3):
            raise SystemExit("--fold-chain supports the single-program (no-HG) path")

        @jax.jit
        def folded(f):
            o = proc._rgb48_flat_body(f)
            return o, (o % 256).astype(jnp.uint8)

        t0 = time.perf_counter()
        out, nxt0 = folded(frame)
        _ = np.asarray(out[:2, :2])
        print(f"first execution (compile) {time.perf_counter() - t0:.1f}s", flush=True)

        def chain(n):
            t0 = time.perf_counter()
            o, nxt = out, nxt0
            for _ in range(n):
                o, nxt = folded(nxt)
            _ = np.asarray(o[:2, :2])
            return (time.perf_counter() - t0) / n
    else:
        t0 = time.perf_counter()
        out = proc.process_rgb48_device(frame)
        _ = np.asarray(out[:2, :2])
        print(f"first execution (compile) {time.perf_counter() - t0:.1f}s", flush=True)

        def chain(n):
            t0 = time.perf_counter()
            nxt = (out % 256).astype(jnp.uint8)
            o = out
            for _ in range(n):
                o = proc.process_rgb48_device(nxt)
                nxt = (o % 256).astype(jnp.uint8)
            _ = np.asarray(o[:2, :2])
            return (time.perf_counter() - t0) / n

    chain(4)  # settle
    dt = chain(args.n)
    print(
        json.dumps(
            {
                "mode": ("hg" if args.hg else "nohg")
                + ("-nosplit" if args.no_split else "")
                + ("-foldchain" if args.fold_chain else ""),
                "precision": args.precision,
                "native_int8": proc.native_int8,
                "resolution": f"{w}x{h}",
                "ms_per_frame": round(dt * 1e3, 2),
                "fps": round(1.0 / dt, 2),
            }
        ),
        flush=True,
    )

    if args.trace:
        jax.profiler.start_trace(args.trace)
        chain(10)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
