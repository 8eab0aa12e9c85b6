"""CLI surface tests (CPU; small synthetic media)."""

import json
import os

import numpy as np
import pytest

from hdrtv_tpu.cli import build_parser, main


WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights", "hr_fp32.npz")


class TestParser:
    def test_all_subcommands_parse(self):
        p = build_parser()
        for argv in [
            ["convert", "--display", "null", "--frames", "3"],
            ["bench", "--duration", "1"],
            ["engines", "list"],
            ["build-engines", "--resolutions", "540p"],
            ["quantize", "--model", "m.npz", "--out", "o.npz"],
            ["info", "--model", "m.npz"],
            ["export", "--video", "v.mp4"],
            ["export", "--video", "v.mp4", "--hosts", "4", "--host-id", "2"],
            ["convert", "--mesh", "spatial", "--display", "null"],
            ["live", "--capture", "synthetic", "--display", "null"],
        ]:
            args = p.parse_args(argv)
            assert callable(args.fn)

    def test_unknown_resolution_rejected(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["convert", "--resolution", "8K"])


class TestCommands:
    def test_info_on_npz(self, capsys):
        rc = main(["info", "--model", WEIGHTS])
        assert rc == 0
        raw = capsys.readouterr().out
        out = json.loads(raw[raw.index("{"):])
        assert out["tensors"] == 264
        assert out["layer_mix"].get("fp", 0) > 100

    def test_quantize_roundtrip(self, tmp_path, capsys):
        out_path = str(tmp_path / "int8.npz")
        rc = main([
            "quantize", "--model", WEIGHTS, "--out", out_path,
            "--mode", "w8a8", "--asymmetric", "--calib-frames", "1",
        ])
        assert rc == 0
        assert os.path.isfile(out_path)
        capsys.readouterr()  # clear quantize output
        rc = main(["info", "--model", out_path])
        out = capsys.readouterr().out
        info = json.loads(out[out.index("{"):])
        assert info["layer_mix"].get("w8a8-asym", 0) > 50

    def test_quantize_with_reference_layout(self, tmp_path, capsys):
        layout = "/root/reference/configs/qat_layouts/original_nohg_mixed_w8a8.txt"
        if not os.path.isfile(layout):
            pytest.skip("reference layout unavailable")
        out_path = str(tmp_path / "mixed.npz")
        rc = main([
            "quantize", "--model", WEIGHTS, "--out", out_path,
            "--layout", layout, "--calib-frames", "1",
        ])
        assert rc == 0
        capsys.readouterr()
        main(["info", "--model", out_path])
        out = capsys.readouterr().out
        info = json.loads(out[out.index("{"):])
        # mixed no-HG contract: 29 W8A8 layers (README.md:1130-1143)
        assert info["layer_mix"]["w8a8"] == 29

    def test_convert_synthetic_null_sink(self, capsys):
        rc = main([
            "convert", "--model", WEIGHTS, "--display", "null",
            "--resolution", "540p", "--frames", "2", "--no-realtime",
        ])
        assert rc == 0
        assert "frames=2" in capsys.readouterr().out

    def test_convert_start_frame_and_target_fps(self, capsys, tmp_path):
        # --start-frame seeks before the run; --target-fps overrides pacing
        # (main.py --target-fps, gui_app_entry.py --start-frame)
        import cv2
        import numpy as np

        clip = str(tmp_path / "clip.avi")
        wr = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"MJPG"), 24, (96, 64))
        for i in range(12):
            wr.write(np.full((64, 96, 3), 20 * (i % 12), np.uint8))
        wr.release()
        rc = main([
            "convert", "--model", WEIGHTS, "--video", clip, "--display", "null",
            "--resolution", "540p", "--frames", "2", "--no-realtime",
            "--start-frame", "5", "--target-fps", "120", "--prefetch", "0",
        ])
        assert rc == 0
        assert "frames=2" in capsys.readouterr().out

    def test_live_synthetic_null_sink(self, capsys):
        rc = main([
            "live", "--model", WEIGHTS, "--capture", "synthetic", "--display", "null",
            "--resolution", "540p", "--fps", "60", "--frames", "2",
        ])
        assert rc == 0
        assert "frames=2" in capsys.readouterr().out

    def test_live_bad_capture_spec(self, capsys):
        rc = main([
            "live", "--model", WEIGHTS, "--capture", "v4l2:/dev/video99",
            "--display", "null", "--resolution", "540p", "--frames", "1",
        ])
        assert rc == 2
        assert "unavailable" in capsys.readouterr().out

    def test_compare_snapshot(self, tmp_path, capsys):
        import cv2

        path = str(tmp_path / "clip.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (64, 32))
        for i in range(8):
            w.write(np.full((32, 64, 3), 40 + i * 10, np.uint8))
        w.release()
        out = str(tmp_path / "cmp")
        rc = main([
            "compare", "--model", WEIGHTS, "--video", path, "--gt", path,
            "--frame", "2", "--resolution", "540p", "--out", out,
        ])
        assert rc == 0
        body = json.loads(capsys.readouterr().out)
        assert os.path.isfile(body["sheet"])
        assert "psnr" in {k.lower().split("_")[0] for k in body["metrics"]} or body["metrics"]

    def test_preview_contact_sheet(self, tmp_path, capsys):
        import cv2

        path = str(tmp_path / "clip.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (64, 32))
        for i in range(20):
            w.write(np.full((32, 64, 3), i * 12 % 255, np.uint8))
        w.release()
        out = str(tmp_path / "sheet.png")
        rc = main(["preview", "--video", path, "--frames", "6", "--columns", "3",
                   "--thumb-width", "64", "--out", out])
        assert rc == 0
        sheet = cv2.imread(out)
        assert sheet is not None
        assert sheet.shape == (2 * 36, 3 * 64, 3)  # 2 rows × 3 cols of 64×36

    def test_engines_list_and_warm_smoke(self, capsys, tmp_path, monkeypatch):
        monkeypatch.setenv("HDRTVNET_ENGINE_CACHE_DIR", str(tmp_path))
        rc = main(["engines", "list"])
        assert rc == 0


class TestBenchTrace:
    def test_bench_with_device_trace(self, tmp_path, capsys):
        rc = main([
            "bench", "--model", WEIGHTS, "--resolution", "540p",
            "--duration", "0.3", "--no-realtime",
            "--out", str(tmp_path / "session"),
            "--trace", str(tmp_path / "trace"),
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "device trace written" in out
        assert os.path.isdir(tmp_path / "trace")


class TestPrefsPersistence:
    """.gui_prefs.json analog: convert restores unset flags from prefs and
    persists the settings a session ended with (gui_settings_preview.py)."""

    def test_save_load_roundtrip(self, tmp_path, monkeypatch):
        from hdrtv_tpu.utils.prefs import load_prefs, prefs_path, save_prefs

        monkeypatch.setenv("HDRTVNET_PREFS_PATH", str(tmp_path / "p.json"))
        assert load_prefs() == {}
        save_prefs(precision="INT8 Full (QAT)", resolution="720p")
        assert load_prefs()["precision"] == "INT8 Full (QAT)"
        save_prefs(display="null")  # merge keeps earlier keys
        got = load_prefs()
        assert got["resolution"] == "720p" and got["display"] == "null"
        assert prefs_path() == str(tmp_path / "p.json")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            save_prefs(nonsense=1)

    def test_convert_persists_and_restores(self, tmp_path, monkeypatch, capsys):
        from hdrtv_tpu.utils.prefs import load_prefs

        monkeypatch.setenv("HDRTVNET_PREFS_PATH", str(tmp_path / "p.json"))
        rc = main([
            "convert", "--model", WEIGHTS, "--display", "null",
            "--resolution", "540p", "--frames", "2", "--no-realtime",
        ])
        assert rc == 0
        assert load_prefs()["resolution"] == "540p"
        capsys.readouterr()
        # second run without --resolution restores 540p from prefs
        rc = main([
            "convert", "--model", WEIGHTS, "--display", "null",
            "--frames", "2", "--no-realtime",
        ])
        assert rc == 0
        assert "960x540" in capsys.readouterr().out

    def test_explicit_flags_beat_prefs(self, tmp_path, monkeypatch, capsys):
        from hdrtv_tpu.utils.prefs import save_prefs

        monkeypatch.setenv("HDRTVNET_PREFS_PATH", str(tmp_path / "p.json"))
        save_prefs(resolution="1080p")
        rc = main([
            "convert", "--model", WEIGHTS, "--display", "null",
            "--resolution", "540p", "--frames", "2", "--no-realtime",
        ])
        assert rc == 0
        assert "960x540" in capsys.readouterr().out


class TestFiguresCommand:
    """cli figures — the scripts/render_mpv_preview_figures.py role."""

    def test_figures_end_to_end(self, tmp_path, capsys):
        import cv2

        from hdrtv_tpu.bench import hdr_io

        d = tmp_path / "sess" / "frames" / "f000003"
        d.mkdir(parents=True)
        rng = np.random.RandomState(5)
        cv2.imwrite(str(d / "sdr.png"), rng.randint(0, 255, (36, 64, 3), np.uint8))
        for k in ("hdr_gt.tiff", "hdr_convert.tiff"):
            hdr_io.write_tiff16(str(d / k),
                                rng.randint(0, 65535, (36, 64, 3)).astype(np.uint16))
        rc = main([
            "figures", "--input", str(tmp_path / "sess"),
            "--out", str(tmp_path / "figs"), "--render-size", "128x72",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["frames"] == 1
        sheet = cv2.imread(
            str(tmp_path / "figs" / "frames__f000003" / "contact_sheet.png"))
        assert sheet is not None and sheet.shape[1] == 3 * 128 + 8

    def test_figures_bad_render_size(self, tmp_path):
        rc = main(["figures", "--input", str(tmp_path), "--out",
                   str(tmp_path / "o"), "--render-size", "x"])
        assert rc == 2


class TestQualityQueueCommand:
    """cli quality --queue — the reference's benchmark-queue sweep."""

    @staticmethod
    def _clip(tmp_path, name="clip.avi"):
        import cv2

        path = str(tmp_path / name)
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (64, 32))
        rng = np.random.RandomState(2)
        for i in range(30):
            w.write(rng.randint(0, 255, (32, 64, 3), np.uint8))
        w.release()
        return path

    def test_queue_runs_presets(self, tmp_path, capsys):
        path = self._clip(tmp_path)
        rc = main([
            "quality", "--model", WEIGHTS, "--video", path, "--gt", path,
            "--resolution", "540p", "--frames", "2", "--no-validate-gt",
            "--out", str(tmp_path / "out"), "--queue", "FP16",
        ])
        assert rc == 0
        lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()
                 if ln.startswith("{")]
        assert [s["precision"] for s in lines] == ["FP16"]
        assert os.path.isdir(lines[0]["session_dir"])

    def test_quality_e2e_y4m_gt_validation_and_offset(self, tmp_path, capsys):
        """Full no-binary quality path: cli quality WITHOUT --no-validate-gt
        against a y4m HDR GT (native probe + PQ sidecar) whose content leads
        the SDR clip by 2 frames — validation must detect HDR, find the +2
        sync offset, and feed it into the scoring frame map (round-4 e2e)."""
        import cv2

        from hdrtv_tpu.bench.y4m import Y4MWriter
        from hdrtv_tpu.pipeline.export import _y4m_sidecar

        rng = np.random.RandomState(7)
        frames = rng.randint(0, 255, (32, 32, 64, 3), np.uint8)  # distinct
        sdr_path = str(tmp_path / "clip.avi")
        w = cv2.VideoWriter(sdr_path, cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (64, 32))
        for i in range(30):
            w.write(frames[i])
        w.release()
        # GT: same content with 2 lead frames → SDR i pairs with GT i+2
        gt_path = str(tmp_path / "gt.y4m")
        gw = Y4MWriter(gt_path, 64, 32, fps=25.0, ctag="422p10")
        gw.write_rgb_unit(np.zeros((32, 64, 3), np.float32), matrix="bt2020nc")
        gw.write_rgb_unit(np.zeros((32, 64, 3), np.float32), matrix="bt2020nc")
        for i in range(30):
            gw.write_rgb_unit(
                frames[i][..., ::-1].astype(np.float32) / 255.0, matrix="bt2020nc"
            )
        gw.close()
        with open(gt_path + ".json", "w") as f:
            json.dump(_y4m_sidecar(gt_path), f)

        rc = main([
            "quality", "--model", WEIGHTS, "--video", sdr_path, "--gt", gt_path,
            "--resolution", "540p", "--frames", "2",
            "--out", str(tmp_path / "out"),
        ])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "GT validated" in out
        assert "+2 frames" in out  # offset found and reported
        summary = json.loads(out[out.index("{"):])  # single-run indented JSON
        assert os.path.isdir(summary["session_dir"])
        assert summary["mean_psnr"] is not None

    def test_queue_rejects_unknown_preset(self, tmp_path, capsys):
        path = self._clip(tmp_path)
        rc = main([
            "quality", "--model", WEIGHTS, "--video", path, "--gt", path,
            "--frames", "1", "--no-validate-gt", "--queue", "NOPE",
        ])
        assert rc == 2
        assert "unknown precision presets" in capsys.readouterr().out


class TestSessionsCommand:
    """cli sessions — result-viewer analog (metadata + summary reloading)."""

    def test_lists_quality_and_playback(self, tmp_path, capsys):
        qdir = tmp_path / "benchmark_sessions" / "clip" / "x__FP16__540p__n2"
        qdir.mkdir(parents=True)
        (qdir / "summary.json").write_text(json.dumps({
            "source": "clip", "precision": "FP16", "resolution": "540p",
            "frames": [1, 2], "mean_psnr": 41.2, "mean_ssim": 0.99,
            "mean_delta_e_itp": 1.5, "gt_decode": "cv2",
        }))
        pdir = tmp_path / "playback_sessions" / "cli"
        pdir.mkdir(parents=True)
        (pdir / "session.json").write_text(json.dumps({
            "config": {"precision_key": "FP16", "resolution_key": "1080p"},
            "fps": 47.0, "fps_1pct_low": 40.1, "model_ms": 20.0,
            "frames": 700, "dropped": 0,
        }))
        rc = main(["sessions", "--roots", str(tmp_path), "--json"])
        assert rc == 0
        rows = json.loads(capsys.readouterr().out)
        kinds = sorted(r["kind"] for r in rows)
        assert kinds == ["playback", "quality"]
        rc = main(["sessions", "--roots", str(tmp_path)])
        out = capsys.readouterr().out
        assert rc == 0 and "psnr=41.2" in out and "fps=47.0" in out

    def test_empty(self, tmp_path, capsys):
        rc = main(["sessions", "--roots", str(tmp_path / "nope")])
        assert rc == 1
        assert "no sessions" in capsys.readouterr().out


class TestAssets:
    def test_inventory_and_validation(self, tmp_path, monkeypatch, capsys):
        import importlib

        monkeypatch.setenv("HDRTVNET_WEIGHTS_ROOT", str(tmp_path))
        import hdrtv_tpu.config as config

        importlib.reload(config)  # weight paths re-root to tmp
        try:
            from hdrtv_tpu.utils.assets import missing_assets, validate_file

            missing = missing_assets()
            assert missing and all(a.status == "missing" for a in missing)
            # validation contract: size + HTML sniff (required_clone_assets.py:194)
            small = tmp_path / "small.pt"
            small.write_bytes(b"x" * 10)
            assert validate_file(str(small), min_size_bytes=1024) == "too_small"
            html = tmp_path / "page.pt"
            html.write_bytes(b"<!DOCTYPE html><html>err</html>" + b"\0" * 2048)
            assert validate_file(str(html), min_size_bytes=1024) == "html_page"
            good = tmp_path / "w.pt"
            good.write_bytes(b"\x80\x02" + b"\0" * 2048)
            assert validate_file(str(good), min_size_bytes=1024) == "ok"
        finally:
            monkeypatch.delenv("HDRTVNET_WEIGHTS_ROOT")
            importlib.reload(config)

    def test_require_gate(self, tmp_path, monkeypatch):
        import importlib

        import pytest

        monkeypatch.setenv("HDRTVNET_WEIGHTS_ROOT", str(tmp_path))
        import hdrtv_tpu.config as config

        importlib.reload(config)
        try:
            from hdrtv_tpu.utils.assets import require_assets_or_raise

            require_assets_or_raise()  # gate off → no raise
            monkeypatch.setenv("HDRTVNET_REQUIRE_CLONE_ASSETS", "1")
            with pytest.raises(RuntimeError, match="required weight"):
                require_assets_or_raise()
        finally:
            monkeypatch.delenv("HDRTVNET_WEIGHTS_ROOT")
            importlib.reload(config)


class TestSplitSources:
    def test_split_composite(self, tmp_path):
        import torch

        from hdrtv_tpu.models.import_torch import load_npz, load_npz_meta, split_source_checkpoint

        state = {
            "base.AGCM.HRconv.weight": torch.zeros(4, 3, 1, 1),
            "base.LE.conv_first.weight": torch.ones(8, 3, 3, 3),
            "hg.conv1.0.weight": torch.full((8, 4, 3, 3), 2.0),
            "hg.low_out.weight": torch.zeros(3, 8, 1, 1),
        }
        ckpt = {
            "state_dict": state,
            "architecture": {"use_hg": True, "nf": 32, "hg_nf": 64, "act_type": "relu"},
            "w8a8_layers": ["base.LE.conv_first", "hg.conv1.0"],
            "fp16_layers": ["base.AGCM.HRconv", "hg.low_out"],
        }
        src = tmp_path / "composite.pt"
        torch.save(ckpt, str(src))
        hr_out, hg_out = str(tmp_path / "hr.npz"), str(tmp_path / "hg.npz")
        hr_keys, hg_keys = split_source_checkpoint(str(src), hr_out, hg_out)
        assert hr_keys == ["AGCM.HRconv.weight", "LE.conv_first.weight"]
        assert hg_keys == ["conv1.0.weight", "low_out.weight"]
        # prefix-filtered quant metadata (split_tensorrt_sources.py:26-40)
        hr_meta, hg_meta = load_npz_meta(hr_out), load_npz_meta(hg_out)
        assert hr_meta["w8a8_layers"] == ["LE.conv_first"]
        assert hr_meta["fp16_layers"] == ["AGCM.HRconv"]
        assert hg_meta["w8a8_layers"] == ["conv1.0"]
        assert hr_meta["architecture"]["use_hg"] is False
        # tensors survive the round trip
        hr = load_npz(hr_out)
        assert hr["LE.conv_first.weight"].sum() == 8 * 3 * 3 * 3

    def test_non_composite_rejected(self, tmp_path):
        import pytest
        import torch

        from hdrtv_tpu.models.import_torch import split_source_checkpoint

        torch.save({"state_dict": {"LE.w": torch.zeros(1)}}, str(tmp_path / "hr.pt"))
        with pytest.raises(ValueError, match="no hg"):
            split_source_checkpoint(str(tmp_path / "hr.pt"), str(tmp_path / "a.npz"), str(tmp_path / "b.npz"))

    def test_npz_sidecar_arch_roundtrip(self, tmp_path):
        from hdrtv_tpu.models.import_torch import (
            load_npz_meta, npz_arch_dict, save_npz,
        )
        import numpy as np

        p = str(tmp_path / "m.npz")
        save_npz(p, {"w": np.zeros(3)}, {"architecture": {"nf": 16, "le_arch": "sft_lite"}})
        arch = npz_arch_dict(load_npz_meta(p))
        assert arch == {"nf": 16, "le_arch": "sft_lite"}
        # flat golden-fixture sidecars read as a bare arch dict
        save_npz(p, {"w": np.zeros(3)}, {"nf": 8, "use_hg": False})
        assert npz_arch_dict(load_npz_meta(p))["nf"] == 8


class TestPresets:
    def test_availability_and_fp8_gate(self, monkeypatch, capsys):
        from hdrtv_tpu.cli import main

        assert main(["presets"]) == 0
        out = capsys.readouterr().out
        assert "FP16" in out and "available" in out
        monkeypatch.setenv("HDRTVNET_SHOW_FP8", "0")
        from hdrtv_tpu.config import available_precisions, precision_is_available

        assert not precision_is_available("FP8 Mixed (QAT)")
        assert "FP16" in available_precisions()


class TestTimingInterval:
    def test_periodic_timing_reports(self, capsys):
        rc = main([
            "convert", "--model", WEIGHTS, "--display", "null",
            "--resolution", "540p", "--frames", "8", "--no-realtime",
            "--timing-interval", "3", "--warmup", "2",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "[timing] frames=" in out
        assert "fps_1p_low=" in out


class TestBenchMatrix:
    def test_batch_matrix(self, tmp_path, capsys):
        rc = main([
            "bench", "--model", WEIGHTS, "--duration", "0.3", "--no-realtime",
            "--resolutions", "540p", "--runs", "FP16", "FP32",
            "--out", str(tmp_path / "batch"),
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "batch CSV" in out and "FP32" in out
        import csv as _csv

        with open(tmp_path / "batch" / "batch.csv") as f:
            rows = list(_csv.DictReader(f))
        assert len(rows) == 2
        assert {r["precision"] for r in rows} == {"FP16", "FP32"}


class TestDoctor:
    def test_doctor_report(self, capsys):
        rc = main(["doctor"])
        out = capsys.readouterr().out
        report = json.loads(out)
        assert "issues" in report and "details" in report
        assert report["details"]["device_count"] >= 1
        assert rc in (0, 3)

    def test_doctor_no_device(self, capsys):
        rc = main(["doctor", "--no-device"])
        report = json.loads(capsys.readouterr().out)
        assert "platform" not in report["details"]
        assert rc in (0, 3)


class TestPrecisionAliases:
    def test_short_run_names_resolve(self):
        # the reference CLI's _RUN_PRESETS short names map onto the GUI
        # labels (cli_playback_benchmark.py:72-260)
        from hdrtv_tpu.config import resolve_precision_key

        assert resolve_precision_key("fp16") == "FP16"
        assert resolve_precision_key("int8-mixed-qat") == "INT8 Mixed (QAT)"
        assert resolve_precision_key("int8_full_qat_film") == "INT8 Full (QAT) (Film)"
        assert resolve_precision_key("fp8-mixed-ptq") == "FP8 Mixed (PTQ)"
        assert resolve_precision_key("INT8 Full (QAT)") == "INT8 Full (QAT)"
        assert resolve_precision_key("unknown-thing") == "unknown-thing"
        assert resolve_precision_key(None) is None

    def test_convert_accepts_short_name(self, capsys):
        rc = main([
            "convert", "--model", WEIGHTS, "--precision", "fp32",
            "--display", "null", "--resolution", "540p", "--frames", "1",
            "--no-realtime",
        ])
        assert rc == 0
        assert "frames=1" in capsys.readouterr().out
