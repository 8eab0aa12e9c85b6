"""Device-mesh parallelism: frame-batch DP × spatial W-sharding.

The reference is single-GPU; its only concurrency is host threads + CUDA
streams (SURVEY.md §2.8). Scale-out here is green-field TPU design:

- **data axis**: independent frames sharded across chips — export/benchmark
  throughput scales linearly (each frame is independent; zero collectives
  beyond the parameter broadcast).
- **spatial axis**: the W dimension of one frame sharded across chips for
  single-frame latency (4K+). Convs over spatially-sharded inputs get their
  halo exchanges inserted automatically by GSPMD — the conv equivalent of
  context parallelism, riding ICI.

Validated on an 8-device virtual CPU mesh in tests and by the driver's
``dryrun_multichip`` (no multi-chip hardware in CI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor2(n: int) -> tuple[int, int]:
    """Split n into (a, b), a·b = n, preferring square-ish with a ≤ b."""
    best = (1, n)
    for a in range(1, int(np.sqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def make_mesh(
    n_devices: int | None = None,
    *,
    axes: tuple[str, str] = ("data", "spatial"),
    devices: list | None = None,
) -> Mesh:
    """2-D mesh over the first n devices: data (frame batch) × spatial (W)."""
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    a, b = _factor2(len(devs))
    arr = np.asarray(devs).reshape(a, b)
    return Mesh(arr, axes)


def spatial_mesh(n_devices: int | None = None, *, devices: list | None = None) -> Mesh:
    """1×N mesh putting every device on the spatial axis — the single-frame
    latency configuration (``cli convert --mesh spatial``)."""
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs).reshape(1, len(devs)), ("data", "spatial"))


def flat_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the flat byte-row contract (H, 3W): columns over the
    spatial axis. 3W/n_sp stays channel-aligned whenever n_sp divides W, so
    a flat column shard IS a W-pixel shard."""
    return NamedSharding(mesh, P(None, "spatial"))


def frame_sharding(mesh: Mesh, *, batch: bool = True, spatial: bool = True) -> NamedSharding:
    """Sharding for NHWC frame batches: N over data, W over spatial.

    W (not H) is the sharded spatial dim: RGB48 delivery is row-major, so
    W-sharding keeps each device's output rows contiguous per row-block, and
    the LE UNet's deepest feature map still has W/8 ≥ lanes at 1080p+.
    """
    spec = P("data" if batch else None, None, "spatial" if spatial else None, None)
    return NamedSharding(mesh, spec)


def replicate_params(params: dict, mesh: Mesh) -> dict:
    """Replicate the parameter pytree across the mesh (CNN weights are small —
    ~1.4M params for the no-HG model; replication is the right call)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def shard_frames(x: jax.Array, mesh: Mesh, *, spatial: bool = True) -> jax.Array:
    return jax.device_put(x, frame_sharding(mesh, spatial=spatial))


def sharded_apply(fn, mesh: Mesh, *, spatial: bool = True):
    """jit ``fn(params, batch, cond)`` with mesh-aware input/output shardings.

    GSPMD partitions the convolution graph (halo exchange for 3×3 kernels,
    all-reduce for global pools) — no hand-written collectives needed.
    """
    out_sharding = frame_sharding(mesh, spatial=spatial)
    return jax.jit(
        fn,
        in_shardings=(NamedSharding(mesh, P()), out_sharding, out_sharding),
        out_shardings=out_sharding,
    )
