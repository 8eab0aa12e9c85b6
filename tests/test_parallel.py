"""Multi-device mesh tests on the 8-device virtual CPU mesh (conftest)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_params_cfg():
    from hdrtv_tpu.models.hdrtvnet import ModelConfig
    from hdrtv_tpu.models.import_torch import load_npz
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "weights", "hr_fp32.npz")
    params = {k: jnp.asarray(v) for k, v in load_npz(path).items()}
    return params, ModelConfig()


class TestMesh:
    def test_make_mesh_factorization(self, cpu_devices):
        from hdrtv_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        assert mesh.shape["data"] * mesh.shape["spatial"] == 8

    def test_sharded_inference_matches_single_device(self, tiny_params_cfg, cpu_devices):
        from hdrtv_tpu.models.hdrtvnet import ensemble_agcm_le
        from hdrtv_tpu.parallel.mesh import frame_sharding, make_mesh, replicate_params

        params, cfg = tiny_params_cfg
        mesh = make_mesh(8)
        rng = np.random.RandomState(0)
        # batch divisible by data axis, W divisible by spatial axis
        img = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
        cond = jnp.asarray(rng.rand(2, 8, 16, 3).astype(np.float32))

        ref = np.asarray(ensemble_agcm_le(params, img, cond, cfg))

        fsh = frame_sharding(mesh)
        p_repl = replicate_params(params, mesh)
        img_s = jax.device_put(img, fsh)
        cond_s = jax.device_put(cond, fsh)
        fn = jax.jit(lambda p, i, c: ensemble_agcm_le(p, i, c, cfg), out_shardings=fsh)
        out = np.asarray(fn(p_repl, img_s, cond_s))
        # GSPMD halo exchange must reproduce the single-device result.
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=0)

    def test_s2d_mode_shards_spatially(self, tiny_params_cfg, cpu_devices):
        """The turbo (s2d) forward must also partition under GSPMD —
        the 4K single-frame latency path (spatial W sharding)."""
        from hdrtv_tpu.models.s2d import ensemble_s2d, s2d_transform_params
        from hdrtv_tpu.parallel.mesh import frame_sharding, make_mesh, replicate_params
        import numpy as np

        params, cfg = tiny_params_cfg
        host = {k: np.asarray(v) for k, v in params.items()}
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host).items()}
        mesh = make_mesh(8)
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
        cond = jnp.asarray(rng.rand(2, 8, 16, 3).astype(np.float32))
        ref = np.asarray(ensemble_s2d(sp, img, cond, cfg))

        fsh = frame_sharding(mesh)
        out = np.asarray(
            jax.jit(lambda p, i, c: ensemble_s2d(p, i, c, cfg), out_shardings=fsh)(
                replicate_params(sp, mesh), jax.device_put(img, fsh), jax.device_put(cond, fsh)
            )
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=0)

    def test_rgb48_program_shards_spatially(self, tiny_params_cfg, cpu_devices):
        """The FULL rgb48 frame program (u8 frame → u16 RGB48 PQ codes,
        cond resize + model + pack) must partition under GSPMD spatial
        W-sharding and reproduce the single-device codes (≤1 LSB: fp
        reassociation at the u16 rounding boundary)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48, s2d_transform_params
        from hdrtv_tpu.parallel.mesh import make_mesh, replicate_params

        params, cfg = tiny_params_cfg
        host = {k: np.asarray(v) for k, v in params.items()}
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host).items()}
        mesh = make_mesh(8)
        rng = np.random.RandomState(2)
        frame = jnp.asarray((rng.rand(32, 64, 3) * 255).astype(np.uint8))
        cond = jnp.asarray(rng.rand(1, 8, 16, 3).astype(np.float32))

        ref = np.asarray(ensemble_s2d_rgb48(sp, frame, cond, cfg))
        assert ref.dtype == np.uint16

        fsh = NamedSharding(mesh, P(None, "spatial", None))
        out = np.asarray(
            jax.jit(
                lambda p, f, c: ensemble_s2d_rgb48(p, f, c, cfg), out_shardings=fsh
            )(replicate_params(sp, mesh), jax.device_put(frame, fsh), cond)
        )
        assert out.shape == ref.shape and out.dtype == np.uint16
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1

    def test_processor_mesh_spatial_inference(self, cpu_devices):
        """The product mesh mode (HDRTVNetTPU(mesh=...) → cli convert
        --mesh spatial): W-sharded inference through the public API must
        reproduce the single-device output (VERDICT r2 item 3)."""
        import os

        from hdrtv_tpu.parallel.mesh import spatial_mesh
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        weights = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "weights", "hr_fp32.npz"
        )
        mesh = spatial_mesh(4)
        frame = (np.random.RandomState(3).rand(32, 64, 3) * 255).astype(np.uint8)
        pm = HDRTVNetTPU(weights, precision="fp32", persistent_cache=False, mesh=mesh)
        out = pm.process_rgb48(frame)
        ps = HDRTVNetTPU(weights, precision="fp32", persistent_cache=False)
        ref = ps.process_rgb48(frame)
        assert out.shape == ref.shape and out.dtype == np.uint16
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1  # fp reassociation across the shard boundary

    def test_dryrun_multichip_entry(self, cpu_devices):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (256, 384, 3)
        assert out.dtype == jnp.uint16


class TestMultihost:
    def test_frame_ranges_balanced_and_contiguous(self):
        from hdrtv_tpu.parallel.multihost import plan_frame_ranges

        ranges = plan_frame_ranges(100, 3)
        assert ranges == [(0, 34), (34, 67), (67, 100)]
        sizes = [e - s for s, e in ranges]
        assert max(sizes) - min(sizes) <= 1
        assert plan_frame_ranges(2, 4) == [(0, 1), (1, 2), (2, 2), (2, 2)]

    def test_segment_paths_and_concat(self, tmp_path):
        from hdrtv_tpu.parallel.multihost import concat_command, segment_paths

        segs = segment_paths(str(tmp_path / "out.mov"), 2)
        assert segs[0].endswith("out.seg000.mov") and segs[1].endswith("out.seg001.mov")
        lst = str(tmp_path / "list.txt")
        cmd = concat_command(segs, str(tmp_path / "out.mov"), lst)
        assert cmd[:4] == ["ffmpeg", "-y", "-f", "concat"]
        assert "-c" in cmd and "copy" in cmd  # lossless stream copy
        with open(lst) as f:
            assert f.read().count("file '") == 2

    def test_concat_list_escapes_single_quotes(self, tmp_path):
        """Paths with single quotes must be concat-demuxer-quoted, not
        written raw (ADVICE r2)."""
        from hdrtv_tpu.parallel.multihost import concat_command

        seg = tmp_path / "it's a clip.seg000.mov"
        lst = str(tmp_path / "list.txt")
        concat_command([str(seg)], str(tmp_path / "out.mov"), lst)
        with open(lst) as f:
            line = f.read().strip()
        assert line == "file '" + str(seg).replace("'", "'\\''") + "'"

    def test_initialize_single_host_noop(self, monkeypatch):
        from hdrtv_tpu.parallel.multihost import initialize_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert initialize_distributed() is False


class TestHGMeshSharding:
    def test_hg_composite_shards_spatially(self, tiny_params_cfg, cpu_devices):
        """The HG composite program (base + hallucination + mask composite,
        the 4K60 path's HG family) partitions under GSPMD W-sharding to the
        same result as a single device."""
        import os

        import numpy as np

        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import convert_state
        from hdrtv_tpu.models.s2d import ensemble_s2d, s2d_transform_params
        from hdrtv_tpu.parallel.mesh import frame_sharding, make_mesh, replicate_params

        params, _ = tiny_params_cfg
        fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures", "hg_mid.npz"))
        hg_raw = {k: fx[k] for k in fx.files if k.startswith("hg.")}
        cfg = ModelConfig(use_hg=True)
        host = {f"base.{k}": np.asarray(v) for k, v in params.items()}
        host.update({k: np.asarray(v) for k, v in convert_state(hg_raw).items()})
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host, cfg).items()}

        mesh = make_mesh(8)
        rng = np.random.RandomState(5)
        img = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
        cond = jnp.asarray(rng.rand(2, 8, 16, 3).astype(np.float32))
        ref = np.asarray(ensemble_s2d(sp, img, cond, cfg, mega=False))

        fsh = frame_sharding(mesh)
        out = np.asarray(
            jax.jit(
                lambda p, i, c: ensemble_s2d(p, i, c, cfg, mega=False), out_shardings=fsh
            )(replicate_params(sp, mesh), jax.device_put(img, fsh), jax.device_put(cond, fsh))
        )
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=0)

    def test_processor_mesh_spatial_hg_composite(self, cpu_devices, tmp_path):
        """Mesh mode with the HG composite: the full hallucination program
        W-shards through the public API (the HG row of the 4K60 path)."""
        import os

        from hdrtv_tpu.models.import_torch import convert_state, load_npz, save_npz
        from hdrtv_tpu.parallel.mesh import spatial_mesh
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        weights = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "weights", "hr_fp32.npz"
        )
        fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures", "hg_mid.npz"))
        comp = {f"base.{k}": v for k, v in load_npz(weights).items()}
        comp.update(convert_state({k: fx[k] for k in fx.files if k.startswith("hg.")}))
        path = str(tmp_path / "composite.npz")
        save_npz(path, comp, {"architecture": {"use_hg": True, "hg_nf": 16}})

        frame = (np.random.RandomState(7).rand(32, 64, 3) * 255).astype(np.uint8)
        pm = HDRTVNetTPU(path, precision="fp32", persistent_cache=False, mesh=spatial_mesh(4))
        out = pm.process_rgb48(frame)
        ps = HDRTVNetTPU(path, precision="fp32", persistent_cache=False)
        ref = ps.process_rgb48(frame)
        assert pm.cfg.use_hg and out.dtype == np.uint16
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1


class TestShardMapTurbo:
    """The shard_map manual-halo path (parallel/halo.py): per-shard turbo
    megakernels + explicit collective_permute halo exchange — the designed
    4K60 scale-out path (VERDICT r3 item 2). GSPMD cannot partition
    ``tpu_custom_call``; shard_map makes the Pallas megakernels legal on a
    mesh, so these gates are what let the sharded path keep turbo speed."""

    def _flat_frame(self, h, w, seed=0):
        rng = np.random.RandomState(seed)
        return jnp.asarray((rng.rand(h, w * 3) * 255).astype(np.uint8))

    def _shard_map_fn(self, cfg, mesh, policy=None):
        from jax.sharding import PartitionSpec as P

        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48_flat
        from hdrtv_tpu.parallel import halo

        def local_body(p, flat_local):
            with halo.manual_axis("spatial"):
                return ensemble_s2d_rgb48_flat(
                    p, flat_local, None, cfg, policy=policy or F32, bgr=True
                )

        return halo.make_shard_map(
            local_body, mesh, (P(), P(None, "spatial")), P(None, "spatial")
        )

    def test_shard_map_matches_single_device(self, tiny_params_cfg, cpu_devices):
        """Wide shards (the shifted-window ext→stage→crop path) and the
        narrow-shard gather fallback both reproduce the single-device turbo
        program to ≤1 LSB of u16."""
        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48_flat, s2d_transform_params
        from hdrtv_tpu.parallel.mesh import replicate_params, spatial_mesh

        params, cfg = tiny_params_cfg
        host = {k: np.asarray(v) for k, v in params.items()}
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host).items()}
        mesh = spatial_mesh(8)
        from hdrtv_tpu.models.layers import F32

        # 1024px → 128px shards: head/tail/resblocks take the shifted-window
        # path, the deep trunk3 stage (r=12 > W/16) takes the gather path.
        flat = self._flat_frame(64, 1024)
        ref = np.asarray(ensemble_s2d_rgb48_flat(sp, flat, None, cfg, policy=F32, bgr=True))
        sm = jax.jit(self._shard_map_fn(cfg, mesh))
        out = np.asarray(sm(replicate_params(sp, mesh), flat))
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max LSB diff {diff.max()}"

    def test_shard_map_program_census(self, tiny_params_cfg, cpu_devices):
        """The compiled shard_map program is halo exchange + the one designed
        classifier all-gather: collective-permutes for every conv boundary,
        and only a handful of small all-gathers (¼-res classifier input by
        design + narrow deep-level fallbacks)."""
        import re

        from hdrtv_tpu.models.s2d import s2d_transform_params
        from hdrtv_tpu.parallel.mesh import replicate_params, spatial_mesh

        params, cfg = tiny_params_cfg
        host = {k: np.asarray(v) for k, v in params.items()}
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host).items()}
        mesh = spatial_mesh(8)
        flat = self._flat_frame(64, 1024)
        sm = jax.jit(self._shard_map_fn(cfg, mesh))
        txt = sm.lower(replicate_params(sp, mesh), flat).compile().as_text()
        n_permute = len(re.findall(r"collective-permute\(", txt))
        n_gather = len(re.findall(r"all-gather\(", txt))
        n_reduce = len(re.findall(r"\ball-reduce\(", txt))
        assert n_permute > 0, "expected explicit halo collective-permutes"
        assert n_gather <= 6, f"{n_gather} all-gathers — manual halo regressed to gathers"
        assert n_reduce <= 1, f"{n_reduce} all-reduces in an inference program"

    def test_processor_dispatches_shard_map(self, cpu_devices):
        """The product mesh path (HDRTVNetTPU(mesh=…) → cli convert --mesh
        spatial) takes the shard_map program for conforming shapes and
        reproduces the single-device output."""
        import os

        from hdrtv_tpu.parallel.mesh import spatial_mesh
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        weights = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "weights", "hr_fp32.npz"
        )
        mesh = spatial_mesh(4)
        pm = HDRTVNetTPU(weights, precision="fp32", persistent_cache=False, mesh=mesh)
        h, w = 32, 16 * 4 * 2  # W % (16·n_sp) == 0 → shard_map-eligible
        assert pm._mesh_manual_ok(h, w * 3)
        frame = (np.random.RandomState(11).rand(h, w, 3) * 255).astype(np.uint8)
        out = pm.process_rgb48(frame)
        assert ("shard_map", h, w * 3) in pm._mesh_fns, "shard_map path not taken"
        ps = HDRTVNetTPU(weights, precision="fp32", persistent_cache=False)
        ref = ps.process_rgb48(frame)
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1

    def test_halo_ext_crop_roundtrip(self, cpu_devices):
        """ext→crop is the identity on the canonical shards, and a haloed
        3×3 conv equals the unsharded conv exactly (the halo mechanism in
        isolation, no model)."""
        from jax.sharding import PartitionSpec as P

        from hdrtv_tpu.parallel import halo
        from hdrtv_tpu.parallel.mesh import spatial_mesh

        mesh = spatial_mesh(8)
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.rand(1, 16, 256, 8).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 8, 8).astype(np.float32) - 0.5)

        def conv(v):
            return jax.lax.conv_general_dilated(
                v, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ref = np.asarray(conv(x))

        def local(v):
            with halo.manual_axis("spatial"):
                ext = halo.ext(v, 2, 2)
                y = conv(ext)
                return halo.crop(y, 2, 2)

        out = np.asarray(
            jax.jit(halo.make_shard_map(
                local, mesh, P(None, None, "spatial", None), P(None, None, "spatial", None)
            ))(x)
        )
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=0)

    def test_pick_radius_alignment(self):
        from hdrtv_tpu.parallel.halo import pick_radius

        # stride-1 megakernel stage on a 240px shard: extended width % 8
        r = pick_radius(240, 1, mod=8)
        assert r >= 1 and (240 + 2 * r) % 8 == 0 and r % 2 == 0
        # stride-2 stage: extended width % 16
        r = pick_radius(240, 2, mod=16)
        assert r >= 2 and (240 + 2 * r) % 16 == 0
        # byte-domain ¼-res downsample: radius multiple of 12 bytes
        r = pick_radius(720, 24, mod=12, align=12)
        assert r >= 24 and r % 12 == 0 and (720 + 2 * r) % 12 == 0
        # merged exchange whose coarse companion is consumed by its OWN
        # fused conv: the coarse extended width (w_c + r) must stay mod-8
        # too, or the up-convs silently drop to the lax path (round-4 fix)
        r = pick_radius(240, 4, mod=8, coarse_w=120)
        assert r >= 4 and (240 + 2 * r) % 8 == 0 and (120 + r) % 8 == 0 and r % 2 == 0
        r = pick_radius(120, 4, mod=8, coarse_w=60)
        assert r >= 4 and (120 + 2 * r) % 8 == 0 and (60 + r) % 8 == 0

    def test_run_stage_coarse_first_radius(self, cpu_devices):
        """run_stage must measure the FINE width for the radius pick even
        when the coarse companion is passed first, as at the two coarse_conv
        merge sites (round-4 review fix). Fine 44/shard + coarse 22/shard:
        the correct joint pick gives mod-8 ext widths for both; the pre-fix
        coarse-width math had no solution and fell through to an unchecked
        radius that broke fused-conv eligibility."""
        from jax.sharding import PartitionSpec as P

        from hdrtv_tpu.parallel import halo
        from hdrtv_tpu.parallel.mesh import spatial_mesh

        mesh = spatial_mesh(2)
        rng = np.random.RandomState(7)
        fine = jnp.asarray(rng.rand(1, 8, 88, 4).astype(np.float32))
        coarse = jnp.asarray(rng.rand(1, 8, 44, 4).astype(np.float32))
        seen = {}

        def stage(c, f):
            seen["coarse_ext"] = c.shape[2]
            seen["fine_ext"] = f.shape[2]
            return f

        def local(c, f):
            with halo.manual_axis("spatial"):
                return halo.run_stage(
                    stage, [c, f], [2, 2], need=4, mod=8, out_axis=2,
                    coarse_idx=(0,), coarse_conv=True,
                )

        spec = P(None, None, "spatial", None)
        out = np.asarray(
            jax.jit(halo.make_shard_map(local, mesh, (spec, spec), spec))(coarse, fine)
        )
        # identity stage → ext/crop must round-trip the fine tensor exactly
        np.testing.assert_array_equal(out, np.asarray(fine))
        # both extended widths megakernel-eligible (mod 8), halo actually used
        assert seen["fine_ext"] % 8 == 0 and seen["fine_ext"] > 44
        assert seen["coarse_ext"] % 8 == 0 and seen["coarse_ext"] > 22


class TestShardingEfficiency:
    def test_sharded_program_is_pure_halo_exchange(self, tiny_params_cfg, cpu_devices):
        """The W-sharded frame program must compile to neighbor
        collective-permutes ONLY — an all-gather or all-reduce would mean
        GSPMD fell off the halo-exchange partitioning (the 4K60 ladder's
        premise; census recorded in PERF_NOTES round 3)."""
        import os
        import re

        from jax.sharding import NamedSharding, PartitionSpec as P

        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48, s2d_transform_params
        from hdrtv_tpu.parallel.mesh import replicate_params, spatial_mesh

        params, cfg = tiny_params_cfg
        host = {k: np.asarray(v) for k, v in params.items()}
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host).items()}
        mesh = spatial_mesh(8)
        fsh = NamedSharding(mesh, P(None, "spatial", None))
        frame = jnp.asarray((np.random.RandomState(0).rand(32, 64, 3) * 255).astype(np.uint8))
        cond = jnp.asarray(np.random.RandomState(1).rand(1, 8, 16, 3).astype(np.float32))

        os.environ["HDRTV_DISABLE_PALLAS"] = "1"
        try:
            fn = jax.jit(lambda p, f, c: ensemble_s2d_rgb48(p, f, c, cfg, mega=False),
                         out_shardings=fsh)
            txt = fn.lower(
                replicate_params(sp, mesh), jax.device_put(frame, fsh), cond
            ).compile().as_text()
        finally:
            os.environ.pop("HDRTV_DISABLE_PALLAS", None)
        n_permute = len(re.findall(r"collective-permute\(", txt))
        n_gather = len(re.findall(r"all-gather\(", txt))
        n_reduce = len(re.findall(r"\ball-reduce\(", txt))
        assert n_permute > 0, "expected halo exchanges in the sharded program"
        assert n_gather == 0, f"{n_gather} all-gathers — halo partitioning regressed"
        assert n_reduce == 0, f"{n_reduce} all-reduces — halo partitioning regressed"

    def test_hg_mesh_program_census_no_involuntary_remat(self, tiny_params_cfg, cpu_devices):
        """The W-sharded HG composite must compile to collective-permutes
        only, with zero all-gathers — an all-gather is exactly what GSPMD's
        'involuntary full rematerialization' fallback emits (replicate, then
        re-partition). Shape floor: 64 px of W per spatial shard keeps every
        UNet level at least mesh-wide (the MULTICHIP_r03 warning was the
        64×128 dryrun shape violating this — swept in round 4)."""
        import os
        import re

        from jax.sharding import NamedSharding, PartitionSpec as P

        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import convert_state
        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48, s2d_transform_params
        from hdrtv_tpu.parallel.mesh import replicate_params, spatial_mesh

        params, _ = tiny_params_cfg
        fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures", "hg_mid.npz"))
        cfg = ModelConfig(use_hg=True)
        host = {f"base.{k}": np.asarray(v) for k, v in params.items()}
        host.update(convert_state({k: fx[k] for k in fx.files if k.startswith("hg.")}))
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host, cfg).items()}

        mesh = spatial_mesh(8)
        fsh = NamedSharding(mesh, P(None, "spatial", None))
        h, w = 64, 64 * 8
        frame = jnp.asarray((np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8))
        cond = jnp.asarray(np.random.RandomState(1).rand(1, h // 4, w // 4, 3).astype(np.float32))

        os.environ["HDRTV_DISABLE_PALLAS"] = "1"
        try:
            fn = jax.jit(lambda p, f, c: ensemble_s2d_rgb48(p, f, c, cfg, mega=False),
                         out_shardings=fsh)
            txt = fn.lower(
                replicate_params(sp, mesh), jax.device_put(frame, fsh), cond
            ).compile().as_text()
        finally:
            os.environ.pop("HDRTV_DISABLE_PALLAS", None)
        n_permute = len(re.findall(r"collective-permute\(", txt))
        n_gather = len(re.findall(r"all-gather\(", txt))
        n_reduce = len(re.findall(r"\ball-reduce\(", txt))
        assert n_permute > 0, "expected halo exchanges in the sharded HG program"
        assert n_gather == 0, f"{n_gather} all-gathers — involuntary remat is back"
        assert n_reduce == 0, f"{n_reduce} all-reduces — halo partitioning regressed"

    def test_train_step_census(self, tiny_params_cfg, cpu_devices):
        """The dryrun's sharded train step: gradient all-reduces are the only
        heavy collectives; no all-to-alls and at most a handful of small
        all-gathers (loss reduction over the replicated scalar). Gates the
        MULTICHIP artifact staying warning-free (VERDICT r3 item 5)."""
        import re

        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hdrtv_tpu.parallel.mesh import frame_sharding, make_mesh
        from hdrtv_tpu.train import TrainState, init_state, make_train_step

        params, cfg = tiny_params_cfg
        mesh = make_mesh(8)
        opt = optax.adam(2e-6)
        state = init_state({k: jnp.asarray(v) for k, v in params.items()}, opt)
        step = make_train_step(cfg, opt)
        repl = NamedSharding(mesh, P())
        fsh = frame_sharding(mesh)

        def wrapped(p, opt_state, img, cond, gt):
            st2, loss = step(TrainState(p, opt_state, 0), img, cond, gt)
            return st2.params, st2.opt_state, loss

        jit_step = jax.jit(wrapped, in_shardings=(repl, repl, fsh, fsh, fsh),
                           out_shardings=(repl, repl, NamedSharding(mesh, P())))
        dp, sp_ = mesh.shape["data"], mesh.shape["spatial"]
        rng = np.random.RandomState(0)
        b, h, w = dp, 32, 32 * sp_
        img = jax.device_put(jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)), fsh)
        cond = jax.device_put(jnp.asarray(rng.rand(b, h // 4, w // 4, 3).astype(np.float32)), fsh)
        gt = jax.device_put(jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)), fsh)
        txt = jit_step.lower(
            jax.device_put(state.params, repl), jax.device_put(state.opt_state, repl),
            img, cond, gt,
        ).compile().as_text()
        n_gather = len(re.findall(r"all-gather\(", txt))
        n_reduce = len(re.findall(r"\ball-reduce\(", txt))
        assert "all-to-all(" not in txt, "unexpected all-to-all in the train step"
        assert n_reduce > 0, "expected gradient all-reduces under DP"
        assert n_gather <= 4, f"{n_gather} all-gathers — train-step sharding regressed"

    def test_batch_dp_program_has_no_collectives(self, tiny_params_cfg, cpu_devices):
        """Frame-batch DP (independent frames on the data axis) must compile
        with NO cross-device collectives at all (beyond parameter broadcast
        at placement time) — linear export scaling's premise."""
        import re

        from jax.sharding import NamedSharding, PartitionSpec as P

        from hdrtv_tpu.models.s2d import ensemble_s2d, s2d_transform_params
        from hdrtv_tpu.parallel.mesh import make_mesh, replicate_params

        params, cfg = tiny_params_cfg
        host = {k: np.asarray(v) for k, v in params.items()}
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(host).items()}
        mesh = make_mesh(8, axes=("data", "spatial"))
        # all-data mesh: 8 frames, one per device
        from jax.sharding import Mesh
        import numpy as _np

        mesh = Mesh(_np.asarray(jax.devices()[:8]).reshape(8, 1), ("data", "spatial"))
        fsh = NamedSharding(mesh, P("data", None, None, None))
        rng = np.random.RandomState(4)
        img = jnp.asarray(rng.rand(8, 16, 32, 3).astype(np.float32))
        cond = jnp.asarray(rng.rand(8, 4, 8, 3).astype(np.float32))
        fn = jax.jit(lambda p, i, c: ensemble_s2d(p, i, c, cfg), out_shardings=fsh)
        txt = fn.lower(
            replicate_params(sp, mesh), jax.device_put(img, fsh), jax.device_put(cond, fsh)
        ).compile().as_text()
        for op in ("collective-permute(", "all-gather(", "all-reduce(", "all-to-all("):
            assert op not in txt, f"unexpected {op.rstrip('(')} in the DP program"


class TestShardMapHG:
    """shard_map manual-halo execution of the HG COMPOSITE (round 4): the
    16 spatial HG stages exchange shifted-window halos (models/hg_s2d.py
    _stage), the 1×1 mixes and the fused tail run pointwise per shard, and
    deep UNet levels narrower than 2r take run_stage's gather fallback.
    Extends the 4K60 scale-out path to the heaviest program family."""

    def _hg_params_cfg(self):
        import os

        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.hg_s2d import hg_s2d_transform
        from hdrtv_tpu.models.import_torch import convert_state

        fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures", "hg_mid.npz"))
        raw = convert_state({k: fx[k] for k in fx.files if k.startswith("hg.")})
        p = {k: jnp.asarray(v) for k, v in hg_s2d_transform(raw).items()}
        return p, ModelConfig(use_hg=True, hg_nf=16)

    def _sm(self, cfg, mesh):
        from jax.sharding import PartitionSpec as P

        from hdrtv_tpu.models.hg_s2d import hg_composite_s2d
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.parallel import halo

        def body(p, base_local):
            with halo.manual_axis("spatial"):
                return hg_composite_s2d(p, base_local, cfg, policy=F32, pack=True)

        return halo.make_shard_map(
            body, mesh, (P(), P(None, None, "spatial", None)), P(None, "spatial")
        )

    def test_hg_shard_map_matches_single_device(self, cpu_devices):
        """Bit-exact (u16) vs single device on the 8-device mesh, covering
        the H reflect-pad case (hb=24 → pgh=8) and deep-level gather
        fallbacks (per-shard block width 16 → 1-wide code level)."""
        from hdrtv_tpu.models.hg_s2d import hg_composite_s2d
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.parallel.mesh import replicate_params, spatial_mesh

        p, cfg = self._hg_params_cfg()
        mesh = spatial_mesh(8)
        rng = np.random.RandomState(0)
        for hb in (32, 24):
            base = jnp.asarray(rng.rand(1, hb, 128, 12).astype(np.float32))
            ref = np.asarray(hg_composite_s2d(p, base, cfg, policy=F32, pack=True))
            out = np.asarray(jax.jit(self._sm(cfg, mesh))(replicate_params(p, mesh), base))
            diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
            assert diff.max() <= 1, f"hb={hb}: max LSB diff {diff.max()}"

    def test_hg_shard_map_census(self, cpu_devices):
        """Halo exchange + bounded deep-level gathers, no all-reduces."""
        import re

        from hdrtv_tpu.parallel.mesh import replicate_params, spatial_mesh

        p, cfg = self._hg_params_cfg()
        mesh = spatial_mesh(8)
        base = jnp.asarray(np.random.RandomState(1).rand(1, 32, 128, 12).astype(np.float32))
        txt = (
            jax.jit(self._sm(cfg, mesh))
            .lower(replicate_params(p, mesh), base)
            .compile()
            .as_text()
        )
        n_permute = len(re.findall(r"collective-permute\(", txt))
        n_gather = len(re.findall(r"all-gather\(", txt))
        n_reduce = len(re.findall(r"\ball-reduce\(", txt))
        assert n_permute > 0, "expected explicit halo collective-permutes"
        assert n_gather <= 8, f"{n_gather} all-gathers — halo regressed to gathers"
        assert n_reduce <= 1, f"{n_reduce} all-reduces in an inference program"

    def test_processor_dispatches_hg_shard_map(self, cpu_devices, tmp_path):
        """HDRTVNetTPU(mesh=…) with an HG composite takes the two-program
        shard_map split for conforming shapes and reproduces the
        single-device composite to ≤1 LSB."""
        import os

        from hdrtv_tpu.models.import_torch import convert_state, load_npz, save_npz
        from hdrtv_tpu.parallel.mesh import spatial_mesh
        from hdrtv_tpu.runtime.processor import HDRTVNetTPU

        weights = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "weights", "hr_fp32.npz"
        )
        fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures", "hg_mid.npz"))
        comp = {f"base.{k}": v for k, v in load_npz(weights).items()}
        comp.update(convert_state({k: fx[k] for k in fx.files if k.startswith("hg.")}))
        path = str(tmp_path / "composite.npz")
        save_npz(path, comp, {"architecture": {"use_hg": True, "hg_nf": 16}})

        mesh = spatial_mesh(4)
        h, w = 64, 2 * 16 * 4 * 2  # (w/2) % (16·n_sp) == 0 → HG shard_map
        pm = HDRTVNetTPU(path, precision="fp32", persistent_cache=False, mesh=mesh)
        assert pm._mesh_manual_ok(h, w * 3)
        # widths that don't divide w % (32·n_sp) — incl. odd ones, which the
        # old (w//2) gate wrongly admitted — must fall back to GSPMD
        assert not pm._mesh_manual_ok(h, (w + 2) * 3)
        assert not pm._mesh_manual_ok(h, (w * 4 + 1) * 3)
        frame = (np.random.RandomState(13).rand(h, w, 3) * 255).astype(np.uint8)
        out = pm.process_rgb48(frame)
        assert ("shard_map_hg", h, w * 3) in pm._mesh_fns, "HG shard_map path not taken"
        ps = HDRTVNetTPU(path, precision="fp32", persistent_cache=False)
        ref = ps.process_rgb48(frame)
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max LSB diff {diff.max()}"


class TestShardMapInt8:
    def test_int8_program_shard_map_matches_single_device(self, cpu_devices):
        """The native-int8-attached program keeps its halo geometry under
        shard_map (the halo hooks precede int8 dispatch in every stage), so
        the fastest single-chip precision scales over the mesh too. Lax
        body on the virtual mesh; the kernels' int8 math is bit-tested
        separately (tests/test_native_int8_program.py)."""
        import os

        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import (
            attach_native_int8,
            ensemble_s2d_rgb48_flat,
            s2d_transform_params,
        )
        from hdrtv_tpu.parallel import halo
        from hdrtv_tpu.parallel.mesh import replicate_params, spatial_mesh
        from hdrtv_tpu.quant.calibrate import calibrate
        from hdrtv_tpu.quant.int8 import predequantize_params, quantize_params
        from jax.sharding import PartitionSpec as P

        cfg = ModelConfig()
        fp32 = load_npz(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "weights", "hr_fp32.npz"
        ))
        q = quantize_params(fp32, mode="w8a8")
        yy, xx = np.mgrid[0:32, 0:48].astype(np.float32)
        q = calibrate(
            q,
            [np.stack([xx / 48, yy / 32, np.full_like(xx, 0.4)], -1)],
            cfg,
        )
        sp = attach_native_int8(dict(s2d_transform_params(predequantize_params(q), cfg)), q)
        sp = {k: jnp.asarray(v) for k, v in sp.items()}

        yy, xx = np.mgrid[0:32, 0:256].astype(np.float32)
        frame = (np.stack([xx / 256, yy / 32, 0.5 * (xx / 256 + yy / 32)], -1) * 255).astype(np.uint8)
        flat = jnp.asarray(frame.reshape(32, 256 * 3))
        ref = np.asarray(ensemble_s2d_rgb48_flat(sp, flat, None, cfg, policy=F32, bgr=True))

        mesh = spatial_mesh(8)

        def body(p, fl):
            with halo.manual_axis("spatial"):
                return ensemble_s2d_rgb48_flat(p, fl, None, cfg, policy=F32, bgr=True)

        sm = halo.make_shard_map(body, mesh, (P(), P(None, "spatial")), P(None, "spatial"))
        out = np.asarray(jax.jit(sm)(replicate_params(sp, mesh), flat))
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max LSB diff {diff.max()}"


class TestShardMapMegaGeometry:
    """Direct validation of the MEGA (turbo) code path's halo geometry —
    including the round-4 merged L1 exchanges (head→cond-chain→SFT1 and
    up_conv3→tail under single shifted windows). Mosaic kernels cannot run
    off-TPU and interpret-mode under multi-device shard_map deadlocks
    inside jax (PERF_NOTES round 4), so the megakernels are monkeypatched
    to their jnp _ref oracles: the mega DISPATCH + halo structure runs for
    real, the kernel math is bit-tested elsewhere (tests/test_megakernel)."""

    def _patch_kernels(self, monkeypatch):
        from hdrtv_tpu.models.s2d import d2s_blocks
        from hdrtv_tpu.ops import megakernel as mk

        def head_stub(xs, mods, *args, n_first, scale=1.0, out_dtype=None):
            if xs.ndim == 4:  # (Hb,2,Wb,6) row-pair planes → s2d channels
                xs = jnp.concatenate([xs[:, 0], xs[:, 1]], axis=-1)
            return mk.fused_agcm_head_ref(xs, mods, *args, n_first=n_first, scale=scale)

        def chain_stub(c0, weights, *, out_dtype=None, qargs=None):
            return mk.fused_cond_chain_ref(c0, weights, out_dtype=out_dtype)

        def sft_stub(x, cond, sft4, w, b, *, relu=False, skip=None, qargs=None, out_dtype=None):
            return mk.fused_sft_conv3_v2_ref(x, cond, sft4, w, b, relu=relu, skip=skip)

        def tail_stub(s, cond1, skip, sft, w_hr, b_hr, w_l, b_l, *,
                      pack=True, out_dtype=None, qargs_hr=None, up_coarse=None):
            if up_coarse is not None:
                s = d2s_blocks(up_coarse[None])[0] + s
            return mk.fused_tail_ref(s, cond1, skip, sft, w_hr, b_hr, w_l, b_l, pack=pack)

        monkeypatch.setattr(mk, "fused_agcm_head", head_stub)
        monkeypatch.setattr(mk, "fused_cond_chain", chain_stub)
        monkeypatch.setattr(mk, "fused_sft_conv3_v2", sft_stub)
        monkeypatch.setattr(mk, "fused_tail", tail_stub)
        monkeypatch.setenv("HDRTV_MEGAKERNEL_INTERPRET", "1")

    def test_mega_program_shard_map_matches_single_device(self, cpu_devices, monkeypatch):
        import os

        from jax.sharding import PartitionSpec as P

        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import (
            _mega_ok,
            ensemble_s2d_rgb48_flat,
            s2d_transform_params,
        )
        from hdrtv_tpu.parallel import halo
        from hdrtv_tpu.parallel.mesh import replicate_params, spatial_mesh

        self._patch_kernels(monkeypatch)
        weights = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "weights", "hr_fp32.npz"
        )
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(load_npz(weights)).items()}
        cfg = ModelConfig()
        h, w = 64, 1024
        assert _mega_ok(sp, (1, h // 2, w // 2, 12), F32), "mega path must be eligible"
        rng = np.random.RandomState(0)
        flat = jnp.asarray((rng.rand(h, w * 3) * 255).astype(np.uint8))
        ref = np.asarray(ensemble_s2d_rgb48_flat(sp, flat, None, cfg, policy=F32, bgr=True))

        mesh = spatial_mesh(8)

        def body(p, fl):
            with halo.manual_axis("spatial"):
                return ensemble_s2d_rgb48_flat(p, fl, None, cfg, policy=F32, bgr=True)

        sm = halo.make_shard_map(body, mesh, (P(), P(None, "spatial")), P(None, "spatial"))
        out = np.asarray(jax.jit(sm)(replicate_params(sp, mesh), flat))
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max LSB diff {diff.max()} ({(diff > 1).sum()} px)"

    def test_merged_windows_keep_fused_conv_eligibility(self, cpu_devices, monkeypatch):
        """Every 128-multiple conv inside the merged shifted windows must see
        a mod-8 extended width — otherwise on TPU it silently drops from the
        Pallas fused conv to the lax path (round-4 coarse_conv fix: the
        up-convs ride at r/2, so the joint radius pick must keep w_c + r
        mod-8 too)."""
        import os

        from jax.sharding import PartitionSpec as P

        from hdrtv_tpu.models import s2d as s2d_mod
        from hdrtv_tpu.models.hdrtvnet import ModelConfig
        from hdrtv_tpu.models.import_torch import load_npz
        from hdrtv_tpu.models.layers import F32
        from hdrtv_tpu.models.s2d import ensemble_s2d_rgb48_flat, s2d_transform_params
        from hdrtv_tpu.parallel import halo
        from hdrtv_tpu.parallel.mesh import replicate_params, spatial_mesh

        self._patch_kernels(monkeypatch)
        weights = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "weights", "hr_fp32.npz"
        )
        sp = {k: jnp.asarray(v) for k, v in s2d_transform_params(load_npz(weights)).items()}
        cfg = ModelConfig()
        h, w = 64, 1024

        bad: list[tuple] = []
        seen = [0]
        orig = s2d_mod._use_fused_kernel

        def spy(x, wgt):
            c, co = wgt.shape[2], wgt.shape[3]
            if c % 128 == 0 and co % 128 == 0 and x.shape[0] == 1:
                seen[0] += 1
                if x.shape[2] % 8 != 0:
                    bad.append((tuple(x.shape), tuple(wgt.shape)))
            return orig(x, wgt)

        monkeypatch.setattr(s2d_mod, "_use_fused_kernel", spy)
        flat = jnp.asarray(np.zeros((h, w * 3), np.uint8))
        mesh = spatial_mesh(8)

        def body(p, fl):
            with halo.manual_axis("spatial"):
                return ensemble_s2d_rgb48_flat(p, fl, None, cfg, policy=F32, bgr=True)

        sm = halo.make_shard_map(body, mesh, (P(), P(None, "spatial")), P(None, "spatial"))
        jax.jit(sm).lower(replicate_params(sp, mesh), flat)  # trace only
        assert seen[0] > 0, "spy saw no 128-multiple convs — vacuous test"
        assert not bad, f"fused-conv-ineligible ext widths under shard_map: {bad}"
