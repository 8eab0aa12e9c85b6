"""Generate golden parity fixtures from the reference implementation.

Dev-time tool: requires the public reference checkout (read-only) at
/root/reference and torch. Runs the *reference* torch models on fixed random
inputs and stores inputs/outputs (NHWC, fp32) as small ``.npz`` fixtures under
``tests/fixtures/``. The test suite then checks the JAX models against these
fixtures without needing torch or the reference tree at test time.

Usage:  python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REF = os.environ.get("HDRTV_REFERENCE_ROOT", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURES = os.path.join(HERE, "..", "tests", "fixtures")


def _nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def main() -> None:
    sys.path.insert(0, os.path.join(REF, "src"))
    import torch

    from models.hdrtvnet_modules.Ensemble_AGCM_LE_arch import Ensemble_AGCM_LE
    from models.hdrtvnet_modules.Hallucination_arch import Hallucination_Generator

    os.makedirs(FIXTURES, exist_ok=True)
    rng = np.random.RandomState(0)

    # --- Ensemble (AGCM → LE) with the shipped release weights ------------
    net = Ensemble_AGCM_LE(classifier="color_condition", cond_c=6, nf=32, weighting_network=False)
    sd = torch.load(
        os.path.join(REF, "src/models/weights/original/HR.pt"),
        map_location="cpu",
        weights_only=True,
    )
    net.load_state_dict(sd, strict=True)
    net.eval()

    img = rng.rand(1, 3, 64, 96).astype(np.float32)
    cond = rng.rand(1, 3, 16, 24).astype(np.float32)
    with torch.no_grad():
        out, _ = net((torch.from_numpy(img), torch.from_numpy(cond)))
        agcm_out, _ = net.AGCM((torch.from_numpy(img), torch.from_numpy(cond)))
    np.savez_compressed(
        os.path.join(FIXTURES, "ensemble_fp32.npz"),
        img=_nhwc(img),
        cond=_nhwc(cond),
        out=_nhwc(out.numpy()),
        agcm_out=_nhwc(agcm_out.numpy()),
    )
    print("ensemble_fp32.npz written; out range", out.min().item(), out.max().item())

    # --- Tiny HG generator (seeded init; BN running stats randomized) ------
    torch.manual_seed(1234)
    hg = Hallucination_Generator(in_nc=3, out_nc=3, nf=8, sf=2)
    # Give BatchNorms non-trivial eval statistics so the BN math is exercised.
    with torch.no_grad():
        for m in hg.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy((rng.rand(m.num_features).astype(np.float32) * 0.5 + 0.75)))
    hg.eval()
    hg_img = rng.rand(1, 3, 64, 96).astype(np.float32)
    hg_mask = (rng.rand(1, 1, 64, 96) > 0.8).astype(np.float32)
    with torch.no_grad():
        hg_out = hg((torch.from_numpy(hg_img), torch.from_numpy(hg_mask)))
    state = {f"hg.{k}": v.numpy() for k, v in hg.state_dict().items()}
    np.savez_compressed(
        os.path.join(FIXTURES, "hg_tiny.npz"),
        img=_nhwc(hg_img),
        mask=_nhwc(hg_mask),
        out=_nhwc(hg_out.numpy()),
        **state,
    )
    print("hg_tiny.npz written; out range", hg_out.min().item(), hg_out.max().item())

    # --- Architecture variant goldens (seeded random init, tiny sizes) -----
    import torch.nn as nn

    from models.hdrtvnet_modules.Condition_arch import ConditionNet
    from models.hdrtvnet_modules.Ensemble_AGCM_LE_arch import Ensemble_AGCM_LE as Ens
    from models.hdrtvnet_modules.Hallucination_arch import Hallucination_Generator_Direct

    var_img = rng.rand(1, 3, 32, 48).astype(np.float32)
    # classifier pools ÷32 — keep the condition large enough for InstanceNorm
    var_cond = rng.rand(1, 3, 32, 48).astype(np.float32)

    agcm_variants = {
        "plain": "agcm_plain",
        "affine": "agcm_affine",
        "lite8": "agcm_lite_8",
        "spatial": "spatial_h4_wide8_x2",
        "spatialmix": "spatial_mix_h4_wide8_x2",
    }
    blobs = {"img": _nhwc(var_img), "cond": _nhwc(var_cond)}
    for tag, classifier in agcm_variants.items():
        torch.manual_seed(hash(tag) % 2**31)
        net = ConditionNet(nf=16, classifier=classifier, cond_c=6).eval()
        with torch.no_grad():
            out, _ = net((torch.from_numpy(var_img), torch.from_numpy(var_cond)))
        blobs[f"{tag}__out"] = _nhwc(out.numpy())
        for k, v in net.state_dict().items():
            blobs[f"{tag}__sd__{k}"] = v.numpy()
    np.savez_compressed(os.path.join(FIXTURES, "agcm_variants.npz"), **blobs)
    print("agcm_variants.npz written")

    # LE arch-family ensembles + lowrank AGCM
    blobs = {"img": _nhwc(var_img), "cond": _nhwc(var_cond)}
    for tag, kwargs in {
        "cleantrunk": dict(le_arch="cleantrunk"),
        "lowrank4": dict(classifier="lowrank_4"),
        "cleantrunk_deep8": dict(le_arch="cleantrunk_deep8"),
        "wide64x4": dict(le_arch="cleantrunk_wide64x4"),
        "selectsft23": dict(le_arch="selectsft23"),
        "bottleneck_heavy": dict(le_arch="bottleneck_heavy"),
        "flatall8": dict(le_arch="cleantrunk_flatall8"),
        "plainflatlinear8": dict(le_arch="plainflatlinear8"),
        "plainbottleneck": dict(le_arch="plainbottleneckh8wide24x2"),
        "conddirect": dict(le_arch="conddirecth4wide24x2"),
        "condgatedirect": dict(le_arch="condgatedirecth4wide24x2"),
    }.items():
        torch.manual_seed(77)
        net = Ens(classifier=kwargs.get("classifier", "color_condition"), cond_c=6, nf=16,
                  weighting_network=False, le_arch=kwargs.get("le_arch", "sft")).eval()
        sd = net.state_dict()
        if tag == "lowrank4":
            # exercise the SVD remap: build from a plain HRconv checkpoint
            torch.manual_seed(78)
            full = Ens(classifier="color_condition", cond_c=6, nf=16, weighting_network=False).eval()
            sd = full.state_dict()
            net.load_state_dict(sd, strict=False)
            sd_save = sd
        else:
            sd_save = sd
        with torch.no_grad():
            out, _ = net((torch.from_numpy(var_img), torch.from_numpy(var_cond)))
        blobs[f"{tag}__out"] = _nhwc(out.numpy())
        for k, v in sd_save.items():
            blobs[f"{tag}__sd__{k}"] = v.numpy()
    np.savez_compressed(os.path.join(FIXTURES, "ensemble_variants.npz"), **blobs)
    print("ensemble_variants.npz written")

    # HG direct variant (compiler-first low-res island)
    torch.manual_seed(99)
    hgd = Hallucination_Generator_Direct(nf=8, trunk_depth=2, wide_nf=16, bottleneck_scale=4).eval()
    hg_img2 = rng.rand(1, 3, 32, 48).astype(np.float32)
    hg_mask2 = (rng.rand(1, 1, 32, 48) > 0.7).astype(np.float32)
    with torch.no_grad():
        out = hgd((torch.from_numpy(hg_img2), torch.from_numpy(hg_mask2)))
    blobs = {"img": _nhwc(hg_img2), "mask": _nhwc(hg_mask2), "out": _nhwc(out.numpy())}
    for k, v in hgd.state_dict().items():
        blobs[f"sd__{k}"] = v.numpy()
    np.savez_compressed(os.path.join(FIXTURES, "hg_direct.npz"), **blobs)
    print("hg_direct.npz written")

    # --- Objective-metric goldens (reference gui_objective_metrics math) ---
    import gui_objective_metrics as gom

    rng_m = np.random.RandomState(55)
    pred_bgr = (rng_m.rand(96, 128, 3) * 65535).astype(np.uint16)
    ref_bgr = np.clip(
        pred_bgr.astype(np.float32) + rng_m.randn(96, 128, 3) * 2000, 0, 65535
    ).astype(np.uint16)
    np.savez_compressed(
        os.path.join(FIXTURES, "metrics_golden.npz"),
        pred_bgr=pred_bgr,
        ref_bgr=ref_bgr,
        psnr=np.float64(gom._psnr_bgr(pred_bgr, ref_bgr)),
        ssim=np.float64(gom._ssim_bgr(pred_bgr, ref_bgr)),
        delta_e_itp=np.float64(gom._delta_e_itp_bgr(pred_bgr, ref_bgr)),
    )
    print("metrics_golden.npz written")

    # --- Bicubic+antialias ¼-res condition downsample golden ---------------
    import torch.nn.functional as TF

    frame = rng.rand(1, 3, 96, 128).astype(np.float32)
    with torch.no_grad():
        ds = TF.interpolate(
            torch.from_numpy(frame), scale_factor=0.25, mode="bicubic",
            align_corners=False, recompute_scale_factor=False, antialias=True,
        )
        ds_bilinear = TF.interpolate(
            torch.from_numpy(frame), scale_factor=0.25, mode="bilinear",
            align_corners=False, recompute_scale_factor=False,
        )
    np.savez_compressed(
        os.path.join(FIXTURES, "cond_resize.npz"),
        frame=_nhwc(frame),
        quarter_bicubic_aa=_nhwc(ds.numpy()),
        quarter_bilinear=_nhwc(ds_bilinear.numpy()),
    )
    print("cond_resize.npz written")


if __name__ == "__main__":
    main()
