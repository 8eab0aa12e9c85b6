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
