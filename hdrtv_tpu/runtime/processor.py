"""HDRTVNetTPU — the inference runtime (reference ``HDRTVNetTorch`` API).

Public surface mirrors hdrtvnet_torch.py:1513,2239-2480:
``preprocess / infer / postprocess / process / process_timed /
process_rgb48 / warmup_compile`` — but the implementation is one fused XLA
program per (resolution, precision, output) signature:

    uint8 BGR frame ──► f32/255 + BGR→RGB ──► ¼-res AA-bicubic cond (GEMM)
        ──► AGCM→LE[→HG] ──► clamp ──► u16 RGB48 pack (Pallas)

The frame enters the device once (3 MB @1080p) and only the packed output
leaves. There is no CUDA-graph/TensorRT split: ``jax.jit`` + the persistent
XLA cache play both roles (runtime/engine.py). ``process`` returns BGR uint8
for cv2-style consumers (reference postprocess parity, :2352-2368);
``process_rgb48`` is the HDR delivery path used by feeders
(gui_pipeline_worker_feeders.py:193-235).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from hdrtv_tpu.models.hdrtvnet import ModelConfig, model_apply
from hdrtv_tpu.models.import_torch import load_checkpoint, load_npz
from hdrtv_tpu.models.layers import Policy, policy_for
from hdrtv_tpu.models.s2d import (
    ensemble_s2d,
    ensemble_s2d_rgb48_flat,
    ensemble_s2d_rgb48_pairs,
    s2d_transform_params,
)
from hdrtv_tpu.ops.pack import pack_rgb48
from hdrtv_tpu.ops.resize import downsample_quarter_aa, downsample_quarter_bilinear
from hdrtv_tpu.runtime import engine as engine_mod
from hdrtv_tpu.utils.env import env_bool


class HDRTVNetTPU:
    """Real-time SDR→HDR10 converter on TPU.

    Parameters mirror the reference constructor: ``model_path`` (reference
    ``.pt`` or converted ``.npz``), ``precision`` token, ``use_hg``/``hg_path``
    for the composite, plus the condition-path shortcuts
    (``fast_condition_resize``, ``fast_zero_condition`` —
    hdrtvnet_torch.py:2263-2276).
    """

    def __init__(
        self,
        model_path: str,
        *,
        precision: str = "fp16",
        use_hg: bool | None = None,
        hg_path: str | None = None,
        fast_condition_resize: bool | None = None,
        fast_zero_condition: bool | None = None,
        persistent_cache: bool = True,
        turbo: bool | None = None,
        predequantize: bool | None = None,
        proc_resolution: tuple[int, int] | None = None,
        cfg_overrides: dict[str, Any] | None = None,
        mesh: Any | None = None,
    ):
        self.model_path = model_path
        self.precision = precision
        # Processing resolution (W, H): frames are letterboxed on device to
        # this size before inference — the per-frame letterbox the reference
        # applies in its worker (gui_scaling.py:228, frame_processing:168).
        self.proc_resolution = tuple(proc_resolution) if proc_resolution else None
        self.policy: Policy = policy_for(precision)
        if fast_condition_resize is None:
            # reference name HDRTVNET_FAST_COND_RESIZE (hdrtvnet_torch.py:1541);
            # the long form is kept for back-compat with earlier rounds
            fast_condition_resize = env_bool("HDRTVNET_FAST_COND_RESIZE", False) or env_bool(
                "HDRTVNET_FAST_CONDITION_RESIZE", False
            )
        if fast_zero_condition is None:
            # reference name HDRTVNET_ZERO_COND (hdrtvnet_torch.py:1544)
            fast_zero_condition = env_bool("HDRTVNET_ZERO_COND", False) or env_bool(
                "HDRTVNET_FAST_ZERO_CONDITION", False
            )
        self.fast_condition_resize = fast_condition_resize
        self.fast_zero_condition = fast_zero_condition

        if persistent_cache:
            engine_mod.enable_persistent_cache()

        if model_path.endswith(".npz"):
            from hdrtv_tpu.models.import_torch import load_npz_meta, npz_arch_dict

            params = load_npz(model_path)
            # sidecar <stem>.json keeps converted checkpoints self-describing
            arch = npz_arch_dict(load_npz_meta(model_path))
            if use_hg is None:
                use_hg = bool(arch.get("use_hg", False))
            cfg = ModelConfig.from_arch_dict(arch, use_hg=bool(use_hg), **(cfg_overrides or {}))
        else:
            params, cfg = load_checkpoint(
                model_path, hg_path=hg_path, use_hg=use_hg, **(cfg_overrides or {})
            )
        self.cfg = cfg
        # Pre-dequantize (reference mode, hdrtvnet_torch.py:444-512): int8
        # weights expand to float once at load — full-speed execution of the
        # QAT weights. Default on for int8 checkpoints (the reference's AMD
        # auto→on policy); HDRTVNET_PREDEQUANTIZE=0 keeps the eager W8A8
        # fake-quant path for bit-faithful validation.
        has_int8 = any(k.endswith(".weight_int8") for k in params)
        raw_int8 = params if has_int8 else None
        if predequantize is None:
            predequantize = env_bool("HDRTVNET_PREDEQUANTIZE", True)
        self.predequantized = bool(predequantize and has_int8)
        if self.predequantized:
            from hdrtv_tpu.quant.int8 import predequantize_params

            params = predequantize_params(params)
            has_int8 = False
        # Turbo = exact space-to-depth execution (models/s2d.py): ~128-lane
        # channel occupancy instead of 32 — the TPU-native fast path. Only the
        # release arch is transformed; other archs fall back to normal mode.
        if turbo is None:
            turbo = env_bool("HDRTVNET_TPU_TURBO", True)
        self.turbo = bool(
            turbo
            and (
                not cfg.use_hg
                or (cfg.hg_arch == "pixelshuffle" and "hg.conv1.0.weight" in params)
            )
            and cfg.classifier == "color_condition"
            and cfg.le_arch == "sft"
            and not cfg.post_correction
            and not has_int8
        )
        self._nat_params = None
        self.native_int8 = False
        if self.turbo:
            # Keep the natural-layout params too: odd-sized frames fall back
            # to the untransformed model (safe path).
            self._nat_params = jax.device_put({k: jnp.asarray(v) for k, v in params.items()})
            params = s2d_transform_params(params, cfg)
            if self.predequantized and raw_int8 is not None and env_bool("HDRTVNET_NATIVE_INT8", True):
                # Native W8A8: s2d-transformed int8 weights ride the MXU's
                # int8 path in the megakernels; layers the kernels can't
                # quantize keep the pre-dequantized float weights.
                from hdrtv_tpu.models.s2d import attach_native_int8

                params = attach_native_int8(params, raw_int8)
                self.native_int8 = any(k.endswith(".qweight") for k in params)
        # Spatial mesh mode (VERDICT r2 item 3): one frame's W dimension
        # sharded over the mesh's spatial axis — the designed 4K60 scale-out
        # path. GSPMD partitions the lax s2d program (automatic halo exchange
        # for the 3×3 convs); the Pallas megakernels are skipped in this mode
        # because XLA cannot partition custom calls.
        self.mesh = mesh
        self._mesh_fns: dict[tuple, Any] = {}
        if mesh is not None:
            from hdrtv_tpu.parallel.mesh import replicate_params

            self.params = replicate_params({k: jnp.asarray(v) for k, v in params.items()}, mesh)
        else:
            self.params = jax.device_put({k: jnp.asarray(v) for k, v in params.items()})
        self.model_hash = engine_mod.model_fingerprint(params)
        self.registry = engine_mod.EngineRegistry() if persistent_cache else None
        self._timings: dict[str, float] = {}
        self._mesh_batch_fns: dict[int, Any] = {}
        self._mesh_lax_traced: set[tuple[int, int]] = set()

    # ------------------------------------------------------------------
    # Fused stages (traced per static frame shape)
    # ------------------------------------------------------------------

    def _cond_of(self, x: jax.Array) -> jax.Array:
        if self.fast_zero_condition:
            n, h, w, c = x.shape
            return jnp.zeros((n, h // 4, w // 4, c), x.dtype)
        if self.fast_condition_resize:
            return downsample_quarter_bilinear(x)
        return downsample_quarter_aa(x)

    def _letterbox(self, frame_u8: jax.Array) -> jax.Array:
        """Device-side letterbox to the processing resolution (if set)."""
        if self.proc_resolution is None:
            return frame_u8
        pw, ph = self.proc_resolution
        if frame_u8.shape[:2] == (ph, pw):
            return frame_u8
        from hdrtv_tpu.ops.resize import letterbox_u8

        return letterbox_u8(frame_u8, ph, pw)

    def _pre(self, frame_u8: jax.Array) -> tuple[jax.Array, jax.Array]:
        """uint8 HWC BGR → ([0,1] RGB NHWC, ¼-res cond)."""
        frame_u8 = self._letterbox(frame_u8)
        x = frame_u8[None, ..., ::-1].astype(jnp.float32) * (1.0 / 255.0)
        return x, self._cond_of(x)

    def _net(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        if self.turbo:
            # s2d mode needs /8-divisible dims (every UNet level must keep an
            # integral block grid — e.g. 540p's /4 level is 135, odd).
            if x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0:
                return ensemble_s2d(self.params, x, cond, self.cfg, policy=self.policy)
            return model_apply(self._nat_params, x, cond, self.cfg, policy=self.policy)
        return model_apply(self.params, x, cond, self.cfg, policy=self.policy)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _process_rgb48_jit(self, frame_u8: jax.Array) -> jax.Array:
        x, cond = self._pre(frame_u8)
        out = self._net(x, cond)
        return pack_rgb48(out[0])

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _process_rgb48_flat_jit(self, frame2d_u8: jax.Array) -> jax.Array:
        """Flat byte-row program: (H, 3W) u8 BGR rows → (H, 3W) u16 RGB48.

        The hot path — keeps 3-channel-minor tensors off the jit boundary
        (XLA lane-padding relayouts cost ~4 ms/frame at 1080p) and folds the
        BGR→RGB flip into the head kernel weights. The host views the same
        bytes as (H, W, 3) for free.
        """
        return self._rgb48_flat_body(frame2d_u8)

    def _rgb48_flat_body(self, frame2d_u8: jax.Array) -> jax.Array:
        h, w3 = frame2d_u8.shape
        if self.proc_resolution is not None and (h, w3 // 3) != (
            self.proc_resolution[1], self.proc_resolution[0]
        ):
            frame2d_u8 = self._letterbox(frame2d_u8.reshape(h, w3 // 3, 3)).reshape(
                self.proc_resolution[1], self.proc_resolution[0] * 3
            )
            h, w3 = frame2d_u8.shape
        if self.turbo and h % 8 == 0 and (w3 // 3) % 8 == 0:
            if self.fast_zero_condition or self.fast_condition_resize:
                cond = self._cond_of(
                    frame2d_u8.reshape(h, w3 // 3, 3)[None, ..., ::-1].astype(jnp.float32)
                    * (1.0 / 255.0)
                )
            else:
                # default AA cond computes on the flat byte rows inside
                # (models/s2d.py _cond_quarter_flat) — the lane-padded
                # (H,W,3) f32 image never materializes
                cond = None
            return ensemble_s2d_rgb48_flat(
                self.params, frame2d_u8, cond, self.cfg, policy=self.policy, bgr=True
            )
        x, cond = self._pre(frame2d_u8.reshape(h, w3 // 3, 3))
        out = self._net(x, cond)
        return pack_rgb48(out[0]).reshape(h, w3)

    # -- Split HG execution: base model and HG composite as two programs. --
    # One jit would put the base megakernel fleet AND the fused HG tail in a
    # single Mosaic compile budget — that compile never finished on the
    # round-2 runner (>25 min, PERF_NOTES.md). Split, each program compiles
    # in minutes and the tail kernel (concat-free 1×1s + composite + RGB48
    # pack) runs by default. Staging the 12-channel s2d base through HBM
    # between the jits costs one extra dispatch (~0.3 ms).

    def _hg_split_active(self, h: int, w3: int) -> bool:
        if not (self.turbo and self.cfg.use_hg and "hg.conv1.0.weight" in self.params):
            return False
        if not env_bool("HDRTV_HG_SPLIT", True):
            return False
        if self.proc_resolution is not None:
            w3, h = self.proc_resolution[0] * 3, self.proc_resolution[1]
        return h % 8 == 0 and (w3 // 3) % 8 == 0

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _hg_base_flat_jit(self, frame2d_u8: jax.Array) -> jax.Array:
        """(H, 3W) u8 BGR rows → base s2d output (1, Hb, Wb, 12)."""
        from hdrtv_tpu.models.s2d import ensemble_s2d_base_flat

        h, w3 = frame2d_u8.shape
        if self.proc_resolution is not None and (h, w3 // 3) != (
            self.proc_resolution[1], self.proc_resolution[0]
        ):
            frame2d_u8 = self._letterbox(frame2d_u8.reshape(h, w3 // 3, 3)).reshape(
                self.proc_resolution[1], self.proc_resolution[0] * 3
            )
        return ensemble_s2d_base_flat(
            self.params, frame2d_u8, policy=self.policy, bgr=True
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _hg_rest_flat_jit(self, base_s2d: jax.Array) -> jax.Array:
        """Base s2d output → HG composite → (H, 3W) u16 RGB48 rows."""
        from hdrtv_tpu.models.hg_s2d import hg_composite_s2d

        return hg_composite_s2d(
            self.params, base_s2d, self.cfg, policy=self.policy, pack=True, tail_on=True
        )

    # -- Spatial mesh inference: the W-sharded single-frame program. --

    def _mesh_flat_fn_manual(self, h: int, w3: int):
        """shard_map variant: per-shard Pallas megakernels + explicit
        shifted-window halo exchange (parallel/halo.py).

        GSPMD cannot partition ``tpu_custom_call``, so the automatic path
        (below) forfeits every megakernel; under shard_map each device runs
        the full turbo program on its W-shard, exchanging only conv halos
        (≤1 LSB vs single-device on the virtual mesh, tests/test_parallel.py
        TestShardMapTurbo). This is the designed 4K60 scale-out path."""
        key = ("shard_map", h, w3)
        fn = self._mesh_fns.get(key)
        if fn is not None:
            return fn
        from jax.sharding import PartitionSpec as P

        from hdrtv_tpu.parallel import halo

        cfg, policy = self.cfg, self.policy

        def local_body(params, flat_local):
            with halo.manual_axis("spatial"):
                return ensemble_s2d_rgb48_flat(
                    params, flat_local, None, cfg, policy=policy, bgr=True
                )

        sm = halo.make_shard_map(
            local_body, self.mesh, (P(), P(None, "spatial")), P(None, "spatial")
        )
        fn = jax.jit(sm)
        self._mesh_fns[key] = fn
        return fn

    def _mesh_hg_fn_manual(self, h: int, w3: int):
        """shard_map HG composite: the two-program split (base jit + HG jit,
        mirroring _hg_base_flat_jit/_hg_rest_flat_jit so each per-shard
        program carries the same Mosaic module count as the proven
        single-chip split), every megakernel incl. the fused HG tail per
        shard, halos exchanged at the 16 spatial HG stages
        (models/hg_s2d.py _stage) and the base conv boundaries."""
        key = ("shard_map_hg", h, w3)
        fn = self._mesh_fns.get(key)
        if fn is not None:
            return fn
        from jax.sharding import PartitionSpec as P

        from hdrtv_tpu.models.hg_s2d import hg_composite_s2d
        from hdrtv_tpu.models.s2d import ensemble_s2d_base_flat
        from hdrtv_tpu.parallel import halo

        cfg, policy = self.cfg, self.policy

        def base_body(params, flat_local):
            with halo.manual_axis("spatial"):
                return ensemble_s2d_base_flat(params, flat_local, policy=policy, bgr=True)

        def hg_body(params, base_local):
            with halo.manual_axis("spatial"):
                return hg_composite_s2d(
                    params, base_local, cfg, policy=policy, pack=True, tail_on=True
                )

        base_sm = halo.make_shard_map(
            base_body, self.mesh,
            (P(), P(None, "spatial")), P(None, None, "spatial", None),
        )
        hg_sm = halo.make_shard_map(
            hg_body, self.mesh,
            (P(), P(None, None, "spatial", None)), P(None, "spatial"),
        )
        base_jit, hg_jit = jax.jit(base_sm), jax.jit(hg_sm)

        def fn(params, flat_dev):
            return hg_jit(params, base_jit(params, flat_dev))

        # Exposed for AOT tooling (tools/multichip_bringup.py lowers each
        # program separately for the Mosaic shape-acceptance proof).
        fn.base_jit, fn.hg_jit = base_jit, hg_jit
        self._mesh_fns[key] = fn
        return fn

    def _mesh_manual_ok(self, h: int, w3: int) -> bool:
        n_sp = self.mesh.shape.get("spatial", 1)
        w = w3 // 3
        if not (self.turbo and env_bool("HDRTV_MESH_SHARD_MAP", True) and h % 8 == 0):
            return False
        if self.cfg.use_hg:
            # HG composite: per-shard BLOCK width divisible by 16 — no
            # reflect W-pad (only the last shard owns the true right edge)
            # and the 4 encoder pools divide evenly on every shard
            # (models/hg_s2d.py _stage). W % (32·n_sp) == 0 ⇒ the base
            # program's own 16·n_sp constraint holds too.
            return "hg.conv1.0.weight" in self.params and w % (32 * n_sp) == 0
        return w % (16 * n_sp) == 0

    def _mesh_flat_fn(self, h: int, w3: int):
        """GSPMD-sharded flat program for one (post-letterbox) frame shape.

        The exact lax s2d program partitions over the spatial axis with
        automatic halo exchange (validated to ≤1 LSB on the 8-device virtual
        mesh — tests/test_parallel.py)."""
        key = (h, w3)
        fn = self._mesh_fns.get(key)
        if fn is not None:
            return fn
        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48
        from hdrtv_tpu.parallel.mesh import flat_sharding

        fsh = flat_sharding(self.mesh)

        def body(flat):
            hh, ww3 = flat.shape
            frame = flat.reshape(hh, ww3 // 3, 3)[..., ::-1]  # BGR→RGB
            from hdrtv_tpu.ops.resize import downsample_quarter_aa

            cond = downsample_quarter_aa(frame[None].astype(jnp.float32) * (1.0 / 255.0))
            out = ensemble_s2d_rgb48(
                self.params, frame, cond, self.cfg, policy=self.policy, mega=False
            )
            return out.reshape(hh, ww3)

        fn = jax.jit(body, in_shardings=fsh, out_shardings=fsh)
        self._mesh_fns[key] = fn
        return fn

    def _mesh_rgb48_flat(self, flat_dev: jax.Array) -> jax.Array:
        from hdrtv_tpu.parallel.mesh import flat_sharding

        h, w3 = flat_dev.shape
        if self.proc_resolution is not None and (h, w3 // 3) != (
            self.proc_resolution[1], self.proc_resolution[0]
        ):
            # Letterbox on the default device before sharding (cheap vs the
            # model; keeps the sharded program single-shape).
            flat_dev = self._letterbox_flat_jit(flat_dev)
            h, w3 = flat_dev.shape
        n_sp = self.mesh.shape["spatial"]
        if not (self.turbo and (w3 // 3) % (8 * n_sp) == 0 and h % 8 == 0):
            raise ValueError(
                f"mesh spatial inference needs the turbo arch and W divisible "
                f"by 8×spatial axis (got {w3 // 3}px over {n_sp} devices)"
            )
        flat_dev = jax.device_put(flat_dev, flat_sharding(self.mesh))
        if self._mesh_manual_ok(h, w3):
            if self.cfg.use_hg:
                return self._mesh_hg_fn_manual(h, w3)(self.params, flat_dev)
            return self._mesh_flat_fn_manual(h, w3)(self.params, flat_dev)
        fn = self._mesh_flat_fn(h, w3)
        key = (h, w3)
        if key in self._mesh_lax_traced:
            return fn(flat_dev)
        # Trace-time guard: the W-sharded GSPMD program must stay pure lax —
        # GSPMD cannot partition Pallas custom calls (it would replicate
        # them, silently serializing the mesh). env_bool is read while
        # tracing, so force the lax path for this program's first (tracing)
        # call ONLY — mutating the process-global env on every frame would
        # race any concurrent trace of a turbo program.
        prev = os.environ.get("HDRTV_DISABLE_PALLAS")
        os.environ["HDRTV_DISABLE_PALLAS"] = "1"
        try:
            out = fn(flat_dev)
        finally:
            if prev is None:
                os.environ.pop("HDRTV_DISABLE_PALLAS", None)
            else:
                os.environ["HDRTV_DISABLE_PALLAS"] = prev
        self._mesh_lax_traced.add(key)
        return out

    @functools.partial(jax.jit, static_argnums=0)
    def _letterbox_flat_jit(self, flat: jax.Array) -> jax.Array:
        h, w3 = flat.shape
        return self._letterbox(flat.reshape(h, w3 // 3, 3)).reshape(
            self.proc_resolution[1], self.proc_resolution[0] * 3
        )

    def _dispatch_rgb48_flat(self, flat_dev: jax.Array) -> jax.Array:
        """Host-level dispatcher for the flat byte-row contract: the single
        fused program, the two-program HG split, or the W-sharded mesh
        program when a mesh is attached."""
        h, w3 = flat_dev.shape
        if self.mesh is not None and self.mesh.shape.get("spatial", 1) > 1:
            return self._mesh_rgb48_flat(flat_dev)
        if self._hg_split_active(h, w3):
            return self._hg_rest_flat_jit(self._hg_base_flat_jit(flat_dev))
        return self._process_rgb48_flat_jit(flat_dev)

    # -- Row-pair-plane boundary: the no-HG turbo hot path. --

    def wants_pairs(self, h: int, w: int) -> bool:
        """True when frames at (h, w) should ship as (Hb, 2, Wb, 6) u8 pair
        planes instead of (H, 3W) flat rows — same bytes, free host-side
        view (``flat.reshape(h//2, 2, w//2, 6)``), but the jit boundary
        keeps the layout the megakernels consume/emit, removing both
        boundary retiles the round-5 device profile measured (~1.4 ms/frame
        at 1080p). Feeders (pipeline/runner.py _submit, bench/playback.py
        run_device_resident) call this before device_put."""
        if not (self.turbo and env_bool("HDRTV_PAIRS_BOUNDARY", True)):
            return False
        if self.mesh is not None and self.mesh.shape.get("spatial", 1) > 1:
            return False
        if self.cfg.use_hg:
            return False
        if self.fast_zero_condition or self.fast_condition_resize:
            return False
        if self.proc_resolution is not None and (
            w, h
        ) != self.proc_resolution:
            return False  # device letterbox runs on the flat layout
        # /8 grid for the megakernels; /4 halves for the pairs cond path.
        return h % 8 == 0 and w % 8 == 0

    @property
    def pairs_format(self):
        """Pinned row-major (jax Format) for the pair-plane boundary, or
        None when unavailable/disabled. Without the pin, XLA picks
        `{2,0,3,1}`-style entry layouts for the rank-4 minor-6 arrays and
        inserts relayout copies against the kernels' row-major constraint
        (round-5 layout probe, logs/chip_sweep_r5/layout_probe2.log).

        DEFAULT OFF (HDRTV_PIN_LAYOUTS=0): executables compiled with
        explicit entry Formats execute fine when freshly compiled but fail
        with `INVALID_ARGUMENT: TPU backend error` after a persistent-cache
        serialize→deserialize round trip on this runner's relay (round-5
        isolation: default-layout entries round-trip, pinned entries do
        not — logs/chip_sweep_r5/*probe*.log). Opt in on hardware whose
        cache round-trips custom layouts."""
        if not env_bool("HDRTV_PIN_LAYOUTS", False):
            return None
        fmt = getattr(self, "_pairs_fmt", None)
        if fmt is None:
            if jax.default_backend() != "tpu":
                return None
            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding

            fmt = Format(Layout((0, 1, 2, 3)), SingleDeviceSharding(jax.devices()[0]))
            self._pairs_fmt = fmt
        return fmt

    def put_frame(self, flat_np: np.ndarray) -> jax.Array:
        """Host (H, 3W) u8 byte rows → the device array the dispatcher
        wants: pinned-layout (Hb,2,Wb,6) pair planes when eligible (a free
        host view + one linear H2D transfer), flat rows otherwise."""
        h, w = flat_np.shape[0], flat_np.shape[1] // 3
        if self.wants_pairs(h, w):
            xr = flat_np.reshape(h // 2, 2, w // 2, 6)
            fmt = self.pairs_format
            if fmt is not None:
                return jax.device_put(xr, fmt)
            return jnp.asarray(xr)
        return jnp.asarray(flat_np)

    def _process_rgb48_pairs_jit(self, xr_u8: jax.Array) -> jax.Array:
        """(Hb, 2, Wb, 6) u8 BGR pair planes → same-shape u16 RGB48, with
        the jit boundary layouts pinned row-major on TPU."""
        fn = getattr(self, "_pairs_jit", None)
        if fn is None:

            def body(xr):
                return ensemble_s2d_rgb48_pairs(
                    self.params, xr, None, self.cfg, policy=self.policy, bgr=True
                )

            fmt = self.pairs_format
            if fmt is not None:
                fn = jax.jit(body, in_shardings=fmt, out_shardings=fmt, donate_argnums=0)
            else:
                fn = jax.jit(body, donate_argnums=0)
            self._pairs_jit = fn
        return fn(xr_u8)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _process_bgr_u8_jit(self, frame_u8: jax.Array) -> jax.Array:
        x, cond = self._pre(frame_u8)
        out = self._net(x, cond)
        v = jnp.clip(out[0].astype(jnp.float32), 0.0, 1.0) * 255.0 + 0.5
        return v.astype(jnp.uint8)[..., ::-1]  # RGB→BGR

    @functools.partial(jax.jit, static_argnums=0)
    def _pre_jit(self, frame_u8: jax.Array):
        return self._pre(frame_u8)

    @functools.partial(jax.jit, static_argnums=0)
    def _infer_jit(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        return self._net(x, cond)

    @functools.partial(jax.jit, static_argnums=0)
    def _post_jit(self, out: jax.Array) -> jax.Array:
        v = jnp.clip(out[0].astype(jnp.float32), 0.0, 1.0) * 255.0 + 0.5
        return v.astype(jnp.uint8)[..., ::-1]

    # ------------------------------------------------------------------
    # Reference-parity public API
    # ------------------------------------------------------------------

    def preprocess(self, frame_bgr: np.ndarray):
        return self._pre_jit(jnp.asarray(frame_bgr))

    def infer(self, input_cond):
        x, cond = input_cond
        return self._infer_jit(x, cond)

    def postprocess(self, output) -> np.ndarray:
        return np.asarray(self._post_jit(output))

    def process(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Full frame → BGR uint8 (SDR-range preview path)."""
        return np.asarray(self._process_bgr_u8_jit(jnp.asarray(frame_bgr)))

    def process_rgb48(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Full frame → uint16 RGB48 PQ code values (HDR delivery path).

        With ``proc_resolution`` set, the frame is letterboxed on device and
        the output is at the processing resolution (reference behavior)."""
        h, w, _ = frame_bgr.shape
        flat = np.ascontiguousarray(frame_bgr).reshape(h, w * 3)  # free view
        if self.wants_pairs(h, w):
            out = np.asarray(self._process_rgb48_pairs_jit(self.put_frame(flat)))
            return out.reshape(h, w, 3)  # free view of the same u16 bytes
        out = np.asarray(self._dispatch_rgb48_flat(jnp.asarray(flat)))
        return out.reshape(out.shape[0], out.shape[1] // 3, 3)

    def process_rgb48_device(self, frame_u8_dev: jax.Array) -> jax.Array:
        """Device-resident variant for the pipelined runner (no host sync).

        Accepts (Hb, 2, Wb, 6) pair planes (preferred when ``wants_pairs``
        — feeders make the free host view before device_put), (H, 3W) flat
        byte rows, or (H, W, 3); returns the matching shape in uint16.
        """
        if frame_u8_dev.ndim == 4:
            return self._process_rgb48_pairs_jit(frame_u8_dev)
        if frame_u8_dev.ndim == 2:
            return self._dispatch_rgb48_flat(frame_u8_dev)
        return self._process_rgb48_jit(frame_u8_dev)

    def _process_rgb48_batch_jit(self, frames_u8: jax.Array) -> jax.Array:
        """(N,H,W,3) BGR u8 → (N,H,W,3) u16 RGB48 — export/benchmark
        throughput path.

        Dispatches the *flat byte-row* program per frame (async — XLA
        pipelines the chain; one compile shared with the realtime path).
        Two rejected designs, both measured: a batched NHWC formulation kept
        3-minor tensors on the jit boundary (1.36 s/frame at 1080p from
        lane-padding relayouts), and a ``lax.map`` over the flat body never
        finished the Mosaic remote compile on this runner (>30 min).

        In-flight depth is bounded (HDRTV_BATCH_INFLIGHT, default 4): with
        8+ unconstrained chains, XLA keeps every chain's input/intermediates
        live at once and per-frame time regressed 19.78 → 25.37 ms at 1080p
        (HBM working-set contention, PERF_NOTES round 3). Frame i takes a
        data-dependent no-op token from frame i-K's output, so at most K
        chains' buffers are ever live while the dispatch stays fully async
        (no host syncs)."""
        from hdrtv_tpu.utils.env import env_int

        n, h, w, _ = frames_u8.shape
        k_inflight = max(1, env_int("HDRTV_BATCH_INFLIGHT", 4))
        flat = frames_u8.reshape(n, h, w * 3)
        outs: list[jax.Array] = []
        for i in range(n):
            f = flat[i]
            if i >= k_inflight:
                # zero-valued but data-dependent on the (i-K)-th output:
                # serializes allocation lifetimes without a device fence
                tok = (outs[i - k_inflight][0, 0] & jnp.uint16(0)).astype(jnp.uint8)
                f = f | tok
            outs.append(self._dispatch_rgb48_flat(f))
        # Derive the output frame shape from the outputs: with
        # proc_resolution set, the flat program letterboxes internally and
        # (oh, ow) differ from the input (h, w).
        stacked = jnp.stack(outs)
        return stacked.reshape(n, stacked.shape[1], stacked.shape[2] // 3, 3)

    def _batch_mesh_fn(self, mesh):
        """Mesh DP: each device lax.maps its local frame shard (shard_map
        over the data axis — SURVEY.md §2.8 green-field parallelism).
        Validated on the virtual CPU mesh; on hardware where the Mosaic
        compile of a mapped kernel body is prohibitive, pair per-host
        dispatch chaining with parallel/multihost.py instead."""
        from jax.sharding import PartitionSpec as P

        from hdrtv_tpu.parallel import halo

        def per_shard(flat_local):
            return jax.lax.map(self._rgb48_flat_body, flat_local)

        # halo.make_shard_map handles both shard_map API generations
        # (jax.experimental.shard_map/check_rep vs jax.shard_map/check_vma).
        sharded = halo.make_shard_map(per_shard, mesh, (P("data"),), P("data"))

        @jax.jit
        def run(frames_u8):
            n, h, w, _ = frames_u8.shape
            out = sharded(frames_u8.reshape(n, h, w * 3))
            # Output frame shape comes from the program (letterboxed when
            # proc_resolution is set), not from the input.
            return out.reshape(n, out.shape[1], out.shape[2] // 3, 3)

        return run

    def process_rgb48_batch(self, frames_bgr: np.ndarray, *, mesh=None) -> np.ndarray:
        """Batched conversion; with ``mesh``, frames are sharded over the
        data axis (frame-batch DP — SURVEY.md §2.8 green-field axis). A batch
        not divisible by the data axis is padded with repeats of the last
        frame and trimmed after — mesh DP is never silently dropped."""
        arr = jnp.asarray(frames_bgr)
        if mesh is not None:
            from hdrtv_tpu.parallel.mesh import frame_sharding

            n = arr.shape[0]
            pad = (-n) % mesh.shape["data"]
            if pad:
                arr = jnp.concatenate([arr, jnp.repeat(arr[-1:], pad, axis=0)], axis=0)
            fn = self._mesh_batch_fns.get(id(mesh))
            if fn is None:
                fn = self._batch_mesh_fn(mesh)
                self._mesh_batch_fns[id(mesh)] = fn
            arr = jax.device_put(arr, frame_sharding(mesh, spatial=False))
            return np.asarray(fn(arr))[:n]
        return np.asarray(self._process_rgb48_batch_jit(arr))

    @functools.partial(jax.jit, static_argnums=0)
    def _passthrough_jit(self, frame_u8: jax.Array) -> jax.Array:
        # HDR-input bypass: the source is already the PQ signal — scale u8
        # code values to u16 without running the model (HDR-input bypass
        # path, gui_pipeline_worker_frame_processing HDR-input handling).
        return frame_u8[..., ::-1].astype(jnp.uint16) * jnp.uint16(257)

    def passthrough_rgb48(self, frame_bgr: np.ndarray) -> np.ndarray:
        return np.asarray(self._passthrough_jit(jnp.asarray(frame_bgr)))

    def passthrough_rgb48_device(self, frame_u8_dev: jax.Array) -> jax.Array:
        return self._passthrough_jit(frame_u8_dev)

    def process_timed(self, frame_bgr: np.ndarray):
        """(output, pre_ms, infer_ms, post_ms) with device fences between
        stages — reference process_timed (hdrtvnet_torch.py:2380-2399)."""
        t0 = time.perf_counter()
        x, cond = self._pre_jit(jnp.asarray(frame_bgr))
        jax.block_until_ready((x, cond))
        t1 = time.perf_counter()
        out = self._infer_jit(x, cond)
        jax.block_until_ready(out)
        t2 = time.perf_counter()
        res = np.asarray(self._post_jit(out))
        t3 = time.perf_counter()
        return res, (t1 - t0) * 1e3, (t2 - t1) * 1e3, (t3 - t2) * 1e3

    # ------------------------------------------------------------------
    # Warmup / engine management
    # ------------------------------------------------------------------

    def warmup_compile(self, width: int = 1920, height: int = 1080, *, rgb48: bool = True) -> float:
        """Compile the fused program for one resolution (the engine build).

        With the persistent cache enabled a warm hit costs ~0.1s; a cold
        build is recorded in the engine registry with the model fingerprint
        (reference metadata validation, hdrtvnet_torch.py:2992-3073).
        """
        dummy = jnp.zeros((height, width, 3), jnp.uint8)
        key = engine_mod.EngineRecord.make_key(
            self.model_hash, width, height, f"{self.precision}{'-hg' if self.cfg.use_hg else ''}"
        )
        t0 = time.perf_counter()
        if self.mesh is not None and self.mesh.shape.get("spatial", 1) > 1:
            jax.block_until_ready(self._mesh_rgb48_flat(jnp.zeros((height, width * 3), jnp.uint8)))
        elif rgb48:
            # Warm the program the runner/host API actually dispatch: the
            # pair-plane program when eligible, else the flat byte-row
            # program (incl. the HG split when active). Warming the NHWC
            # _process_rgb48_jit here would leave the first real frame
            # paying the full cold compile.
            if self.wants_pairs(height, width):
                jax.block_until_ready(
                    self._process_rgb48_pairs_jit(
                        jnp.zeros((height // 2, 2, width // 2, 6), jnp.uint8)
                    )
                )
            else:
                jax.block_until_ready(
                    self._dispatch_rgb48_flat(jnp.zeros((height, width * 3), jnp.uint8))
                )
        else:
            jax.block_until_ready(self._process_bgr_u8_jit(dummy))
        dt = time.perf_counter() - t0
        if self.registry is not None:
            self.registry.record(
                engine_mod.EngineRecord(
                    key=key,
                    model_hash=self.model_hash,
                    width=width,
                    height=height,
                    precision=self.precision,
                    use_hg=self.cfg.use_hg,
                    jax_version=jax.__version__,
                    device_kind=jax.devices()[0].device_kind,
                    compile_seconds=dt,
                    created=time.time(),
                )
            )
        self._timings[key] = dt
        return dt

    def with_proc_resolution(self, proc_resolution: tuple[int, int] | None) -> "HDRTVNetTPU":
        """Shallow clone with a different processing resolution.

        Shares device params; jit traces are keyed by object identity, so the
        clone re-traces (warm via the persistent cache) — the hot-swap path
        the reference drives through its compile cache (gui_pipeline_worker
        resolution gate)."""
        import copy

        clone = copy.copy(self)
        clone.proc_resolution = tuple(proc_resolution) if proc_resolution else None
        clone._timings = {}
        return clone

    def end_profiling(self):  # reference API parity (hdrtvnet_torch.py:2471)
        return None
