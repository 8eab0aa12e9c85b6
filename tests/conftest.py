"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated the standard JAX way — 8 virtual CPU devices
via ``xla_force_host_platform_device_count`` — since real multi-chip TPU
hardware is not available in CI (SURVEY.md §4). Must run before jax backends
initialize, hence the env mutation at conftest import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; jax.config wins.
jax.config.update("jax_platforms", "cpu")

import tempfile  # noqa: E402

# Hermetic chip-sweep handoff dir: bench.py tests run main() end-to-end,
# whose _yield_chip_sweep would otherwise signal (and kill) a REAL
# tools/chip_sweep.py waiting on the relay via logs/chip_sweep_r4.
os.environ.setdefault("HDRTV_SWEEP_DIR", tempfile.mkdtemp(prefix="sweepdir_test_"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


def load_fixture(name: str) -> dict:
    path = os.path.join(FIXTURES, name)
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest failed to create 8 virtual CPU devices"
    return devs


@pytest.fixture(autouse=True)
def _isolated_prefs(tmp_path, monkeypatch):
    # keep .gui_prefs.json-analog writes out of the real home dir, and keep
    # tests independent of any previously-persisted settings
    monkeypatch.setenv("HDRTVNET_PREFS_PATH", str(tmp_path / "prefs.json"))
