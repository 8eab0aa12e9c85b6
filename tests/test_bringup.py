"""Tests for tools/multichip_bringup.py — the multi-chip bring-up tool.

The Mosaic-acceptance proof (VERDICT r4 item 4) records every megakernel
call of the 8-shard shard_map programs off-chip, then compiles each on the
real chip. These tests cover the off-chip half: the recorder-only fused-path
escape, the HG program introspection hook, and a tiny end-to-end record run.
"""

import os
import pickle
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "multichip_bringup.py")


def test_use_fused_kernel_trace_escape(monkeypatch):
    """HDRTV_FORCE_FUSED_TRACE lets the recorder route eligible convs to the
    fused path off-TPU (trace-only); without it the gate stays closed."""
    import jax.numpy as jnp

    from hdrtv_tpu.models.s2d import _use_fused_kernel

    x = jnp.zeros((1, 16, 16, 128), jnp.bfloat16)
    w = jnp.zeros((3, 3, 128, 128), jnp.bfloat16)
    monkeypatch.delenv("HDRTV_FORCE_FUSED_TRACE", raising=False)
    assert not _use_fused_kernel(x, w)  # CPU backend → closed
    monkeypatch.setenv("HDRTV_FORCE_FUSED_TRACE", "1")
    assert _use_fused_kernel(x, w)
    # The escape must not override an explicit Pallas kill switch.
    monkeypatch.setenv("HDRTV_DISABLE_PALLAS", "1")
    assert not _use_fused_kernel(x, w)


def test_mesh_hg_fn_exposes_component_jits(cpu_devices, tmp_path):
    """The HG shard_map closure must expose base_jit/hg_jit for AOT lowering
    (tools/multichip_bringup.py record lowers each program separately)."""
    from hdrtv_tpu.parallel.mesh import spatial_mesh
    from hdrtv_tpu.runtime.processor import HDRTVNetTPU
    from tools.bench_modes import synth_hg_ckpt

    path = str(tmp_path / "hg.npz")
    synth_hg_ckpt(path, nf=4)
    proc = HDRTVNetTPU(
        path, precision="fp32", use_hg=True, persistent_cache=False,
        mesh=spatial_mesh(2),
    )
    h, w = 64, 128
    if not proc._mesh_manual_ok(h, w * 3):
        pytest.skip("HG shard_map ineligible at test size")
    fn = proc._mesh_hg_fn_manual(h, w * 3)
    assert hasattr(fn, "base_jit") and hasattr(fn, "hg_jit")


def test_record_tiny_geometry_end_to_end(tmp_path):
    """`record` on a tiny 2-shard geometry produces a pickle with calls from
    several distinct kernels (subprocess — it forces platform + env)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["HDRTV_BRINGUP_DIR"] = str(tmp_path)  # never clobber the committed 4K record
    out = subprocess.run(
        [sys.executable, TOOL, "record",
         "--height", "128", "--width", "256", "--shards", "2"],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    calls_path = str(tmp_path / "kernel_calls.pkl")
    with open(calls_path, "rb") as f:
        rec = pickle.load(f)
    assert rec["geometry"]["n_shards"] == 2
    names = {n for n, _ in rec["calls"]}
    # The L0 mega sections must always be present; the deeper fleet depends
    # on per-shard width eligibility at this tiny size.
    assert "fused_agcm_head" in names and "fused_tail" in names
    assert len(rec["calls"]) >= 5, sorted(names)
