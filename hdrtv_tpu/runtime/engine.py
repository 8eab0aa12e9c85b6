"""Engine cache — XLA persistent compilation cache with validated metadata.

The reference ships per-resolution TensorRT ``.engine`` files plus JSON
metadata re-validated on every load (model hash, versions, device
fingerprint, build policy — hdrtvnet_torch.py:2636-3073, 8393-8426) and a
shared timing cache. The TPU-native equivalent is the XLA persistent
compilation cache: compiled executables are keyed by HLO + compile options +
jaxlib version, so staleness detection is built into the key. This module
adds the UX around it: a stable cache root, engine *metadata* records keyed
``{model}_{WxH}_{mode}`` for list/clear/warm tooling, and model-hash
fingerprints so a swapped checkpoint is visible in ``engines list``.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time

import jax

from hdrtv_tpu.utils.env import env_str

_CACHE_ENABLED = False
_DEBUGINFO_STRIPPED = False


def _strip_mosaic_debuginfo() -> None:
    """Make Pallas kernel payloads edit-stable so the persistent cache
    survives source changes.

    Root cause (round 3, measured): the Mosaic kernel module embedded in
    each ``tpu_custom_call`` is serialized *with* MLIR location info, so any
    edit that shifts line numbers in a kernel-defining file changes every
    payload byte-for-byte → new cache key → full recompile of every program
    using Pallas kernels (the "HG misses the cache every run" mystery:
    verified by hashing the lowered StableHLO before/after inserting one
    comment line — hashes differed; with strip-debuginfo they are
    identical). Tradeoff: Mosaic compile errors lose source locations — set
    ``HDRTV_STRIP_KERNEL_DEBUGINFO=0`` while debugging a kernel.
    """
    global _DEBUGINFO_STRIPPED
    from hdrtv_tpu.utils.env import env_bool

    if _DEBUGINFO_STRIPPED or not env_bool("HDRTV_STRIP_KERNEL_DEBUGINFO", True):
        return
    try:
        import jax._src.tpu_custom_call as tcc
        from jaxlib.mlir.passmanager import PassManager
    except ImportError:
        return
    orig = tcc._lower_mosaic_module_to_asm

    def stripped(module, *args, **kwargs):
        with module.operation.context:
            PassManager.parse("builtin.module(strip-debuginfo)").run(module.operation)
        return orig(module, *args, **kwargs)

    tcc._lower_mosaic_module_to_asm = stripped
    _DEBUGINFO_STRIPPED = True


def default_cache_root() -> str:
    # HDRTVNET_CACHE_DIR is the reference's project cache-root override
    # (windows_runtime.py:542-552); the engine-specific var wins when both set
    root = env_str("HDRTVNET_ENGINE_CACHE_DIR") or env_str("HDRTVNET_CACHE_DIR")
    if root:
        return root
    return os.path.join(os.path.expanduser("~"), ".cache", "hdrtv_tpu", "engines")


def default_seed_root() -> str:
    """Committed cache-seed directory inside the repo.

    The runtime cache root (``~/.cache``) does not survive a machine
    rebuild, but the git tree does — so warmed executables for the headline
    bench programs are committed under ``.engine_cache_seed/`` and copied
    into the runtime root on :func:`enable_persistent_cache`. XLA's cache
    key already encodes HLO + compile options + jaxlib version, so a stale
    seed entry is simply never hit (it cannot poison anything)."""
    root = env_str("HDRTV_ENGINE_SEED_DIR")
    if root:
        return root
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".engine_cache_seed")


def seed_cache(root: str, seed: str | None = None) -> int:
    """Copy committed seed entries into the runtime cache root (idempotent;
    entries are content-keyed files so same-name == same-bytes). Returns the
    number of entries copied."""
    import shutil

    seed = seed or default_seed_root()
    if not os.path.isdir(seed):
        return 0
    n = 0
    for name in os.listdir(seed):
        if not name.endswith("-cache"):
            continue
        dst = os.path.join(root, name)
        if os.path.exists(dst):
            continue
        try:
            # Copy to a temp file and os.replace() into place: bench children
            # are SIGKILLed on budget overrun, and a kill mid-copy must not
            # leave a truncated entry that later runs skip as 'existing'.
            tmp = dst + ".seedtmp"
            shutil.copyfile(os.path.join(seed, name), tmp)
            os.replace(tmp, dst)
            n += 1
        except OSError:
            try:
                os.remove(tmp)
            except OSError:
                pass
            continue
    return n


def enable_persistent_cache(root: str | None = None) -> str:
    """Point XLA's persistent compilation cache at the engine root.

    Compiles slower than ~1s are persisted; warm loads take ~100ms instead of
    the multi-minute TensorRT builds the reference schedules dialogs around.
    """
    global _CACHE_ENABLED
    _strip_mosaic_debuginfo()
    root = root or default_cache_root()
    os.makedirs(root, exist_ok=True)
    seed_cache(root)
    jax.config.update("jax_compilation_cache_dir", root)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _CACHE_ENABLED = True
    return root


def model_fingerprint(params: dict) -> str:
    """Order-independent hash of parameter names/shapes/bytes (truncated)."""
    h = hashlib.sha256()
    import numpy as np

    for k in sorted(params):
        v = np.asarray(params[k])
        h.update(k.encode())
        h.update(str(v.shape).encode())
        h.update(str(v.dtype).encode())
        # Hash a strided sample: cheap but catches weight swaps.
        flat = v.reshape(-1)
        h.update(flat[:: max(1, flat.size // 4096)].tobytes())
    return h.hexdigest()[:16]


@dataclasses.dataclass
class EngineRecord:
    """Metadata for one compiled (model, resolution, mode) signature."""

    key: str
    model_hash: str
    width: int
    height: int
    precision: str
    use_hg: bool
    jax_version: str
    device_kind: str
    compile_seconds: float
    created: float

    @staticmethod
    def make_key(model_tag: str, width: int, height: int, mode: str) -> str:
        # Mirrors the reference cache key shape {model}_{WxH}_{mode}
        # (hdrtvnet_torch.py:4201-4246).
        return f"{model_tag}_{width}x{height}_{mode}"


class EngineRegistry:
    """JSON metadata index over the persistent cache (list/clear/validate)."""

    def __init__(self, root: str | None = None):
        self.root = root or default_cache_root()
        os.makedirs(self.root, exist_ok=True)
        self.index_path = os.path.join(self.root, "engines.json")

    def _load(self) -> dict:
        try:
            with open(self.index_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def _save(self, data: dict) -> None:
        tmp = self.index_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=2, sort_keys=True)
        os.replace(tmp, self.index_path)

    def record(self, rec: EngineRecord) -> None:
        data = self._load()
        data[rec.key] = dataclasses.asdict(rec)
        self._save(data)

    def lookup(self, key: str) -> EngineRecord | None:
        entry = self._load().get(key)
        return EngineRecord(**entry) if entry else None

    def list(self) -> list[EngineRecord]:
        return [EngineRecord(**v) for v in self._load().values()]

    def validate(self, key: str, model_hash: str) -> bool:
        """Reference-style fingerprint check: stale model hash ⇒ rebuild
        (the XLA cache key already covers version/device changes)."""
        rec = self.lookup(key)
        return bool(rec and rec.model_hash == model_hash)

    _CACHE_ENTRY = None  # compiled lazily (regex)

    @staticmethod
    def _is_cache_artifact(name: str) -> bool:
        """Only files this cache plausibly created: the metadata index and
        XLA persistent-cache entries (``jit_*`` / long hash names). A user
        pointing HDRTVNET_ENGINE_CACHE_DIR at a shared directory must not
        lose unrelated files to ``engines clear``."""
        import re

        if name in ("engines.json", "engines.json.tmp"):
            return True
        if name.startswith("jit_") or name.startswith("pjit_"):
            return True
        return bool(re.fullmatch(r"[0-9a-f_\-]{32,}(\.[a-z0-9]+)?", name))

    def clear(self) -> int:
        """Drop metadata and cached executables (engine cache clear tool,
        gui_playback_runtime.py:2115). Non-cache files are left alone."""
        count = 0
        for name in os.listdir(self.root):
            path = os.path.join(self.root, name)
            if os.path.isfile(path) and self._is_cache_artifact(name):
                os.remove(path)
                count += 1
        return count


def timed_compile(fn, *args, **kwargs):
    """AOT compile a jitted function; returns (compiled, seconds)."""
    t0 = time.perf_counter()
    compiled = fn.lower(*args, **kwargs).compile()
    return compiled, time.perf_counter() - t0
