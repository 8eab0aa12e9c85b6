"""Unit tests for color/metric/pack/resize ops (scipy/numpy oracles)."""

import numpy as np
import jax.numpy as jnp


class TestColor:
    def test_pq_roundtrip(self):
        from hdrtv_tpu.ops.color import pq_eotf, pq_oetf

        nits = jnp.asarray(np.logspace(-3, 4, 256, dtype=np.float32))
        code = pq_oetf(nits)
        back = pq_eotf(code)
        np.testing.assert_allclose(np.asarray(back), np.asarray(nits), rtol=2e-3)

    def test_pq_reference_points(self):
        from hdrtv_tpu.ops.color import pq_oetf

        # ST-2084 anchor points: 100 nits ≈ 0.508, 1000 nits ≈ 0.7518.
        code = np.asarray(pq_oetf(jnp.asarray([100.0, 1000.0, 10000.0])))
        assert abs(code[0] - 0.5081) < 1e-3
        assert abs(code[1] - 0.7518) < 1e-3
        assert abs(code[2] - 1.0) < 1e-6

    def test_gamut_matrices_inverse(self):
        from hdrtv_tpu.ops.color import BT2020_TO_BT709, BT709_TO_BT2020

        prod = np.asarray(BT709_TO_BT2020) @ np.asarray(BT2020_TO_BT709)
        np.testing.assert_allclose(prod, np.eye(3), atol=1e-4)

    def test_gamut_rows_sum_to_one(self):
        # White point preservation: D65 white maps to white.
        from hdrtv_tpu.ops.color import BT709_TO_BT2020

        np.testing.assert_allclose(np.asarray(BT709_TO_BT2020).sum(axis=1), 1.0, atol=1e-4)

    def test_delta_e_itp_zero_for_identical(self):
        from hdrtv_tpu.ops.color import delta_e_itp

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32) * 1000.0)
        de = float(delta_e_itp(img, img))
        assert de < 1e-2

    def test_delta_e_itp_reference_impl(self):
        """Cross-check against a direct numpy transcription of BT.2124."""
        from hdrtv_tpu.ops.color import delta_e_itp

        rng = np.random.RandomState(1)
        a = rng.rand(8, 8, 3).astype(np.float32) * 800.0
        b = a + rng.randn(8, 8, 3).astype(np.float32) * 20.0

        m1, m2 = 2610.0 / 16384.0, 2523.0 / 32.0
        c1, c2, c3 = 3424.0 / 4096.0, 2413.0 / 128.0, 2392.0 / 128.0

        def pq(y):
            y = np.clip(y / 10000.0, 0, 1)
            ym = np.power(y, m1)
            return np.power((c1 + c2 * ym) / np.maximum(1 + c3 * ym, 1e-12), m2)

        def itp(rgb):
            r, g, b_ = rgb[..., 0], rgb[..., 1], rgb[..., 2]
            l = (1688 * r + 2146 * g + 262 * b_) / 4096
            m = (683 * r + 2951 * g + 462 * b_) / 4096
            s = (99 * r + 309 * g + 3688 * b_) / 4096
            lp, mp, sp = pq(l), pq(m), pq(s)
            i = 0.5 * lp + 0.5 * mp
            t = 0.5 * (6610 * lp - 13613 * mp + 7003 * sp) / 4096
            p = (17933 * lp - 17390 * mp - 543 * sp) / 4096
            return i, t, p

        i1, t1, p1 = itp(np.clip(a, 0, None))
        i2, t2, p2 = itp(np.clip(b, 0, None))
        expect = float(np.mean(720.0 * np.sqrt((i1 - i2) ** 2 + (t1 - t2) ** 2 + (p1 - p2) ** 2 + 1e-12)))
        got = float(delta_e_itp(jnp.asarray(np.clip(a, 0, None)), jnp.asarray(np.clip(b, 0, None))))
        assert abs(got - expect) < max(1e-3, expect * 1e-4)


class TestMetrics:
    def test_psnr_known_value(self):
        from hdrtv_tpu.ops.metrics import psnr

        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        assert abs(float(psnr(a, b)) - 20.0) < 1e-3  # mse=0.01 → 20 dB

    def test_psnr_identical_caps_at_99(self):
        from hdrtv_tpu.ops.metrics import psnr

        a = jnp.full((8, 8, 3), 0.5)
        assert float(psnr(a, a)) == 99.0

    def test_ssim_identical_is_one(self):
        from hdrtv_tpu.ops.metrics import ssim

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
        assert abs(float(ssim(img, img)) - 1.0) < 1e-5

    def test_ssim_matches_cv2_gaussian(self):
        cv2 = __import__("cv2")
        from hdrtv_tpu.ops.metrics import ssim_single

        rng = np.random.RandomState(2)
        a = rng.rand(48, 64).astype(np.float32)
        b = np.clip(a + rng.randn(48, 64).astype(np.float32) * 0.05, 0, 1)

        def cv2_ssim(a, b):
            c1, c2 = 0.01**2, 0.03**2
            blur = lambda x: cv2.GaussianBlur(x, (11, 11), 1.5)
            mu_a, mu_b = blur(a), blur(b)
            sa = blur(a * a) - mu_a * mu_a
            sb = blur(b * b) - mu_b * mu_b
            sab = blur(a * b) - mu_a * mu_b
            num = (2 * mu_a * mu_b + c1) * (2 * sab + c2)
            den = (mu_a**2 + mu_b**2 + c1) * (sa + sb + c2)
            return float(np.mean(num / (den + 1e-12), dtype=np.float64))

        expect = cv2_ssim(a, b)
        got = float(ssim_single(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - expect) < 1e-5

    def test_grade_normalize_matches_stats(self):
        from hdrtv_tpu.ops.metrics import grade_normalize

        rng = np.random.RandomState(3)
        pred = rng.rand(32, 32, 3).astype(np.float32) * 0.5
        ref = rng.rand(32, 32, 3).astype(np.float32) * 0.8 + 0.1
        out = np.asarray(grade_normalize(jnp.asarray(pred), jnp.asarray(ref)))
        # After normalization (pre-clip) means should be close to ref's.
        assert abs(out.mean() - ref.mean()) < 0.02

    def test_black_border_crop(self):
        from hdrtv_tpu.ops.metrics import crop_shared_black_borders

        img = np.zeros((100, 200, 3), np.uint8)
        img[20:80, :, :] = 128  # letterboxed active area
        ref = img.copy()
        p, r, cropped = crop_shared_black_borders(img, ref)
        assert cropped
        assert p.shape[0] == 60 and p.shape[1] == 200

    def test_full_reference_metrics_bundle(self):
        from hdrtv_tpu.ops.metrics import full_reference_metrics

        rng = np.random.RandomState(4)
        a = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
        b = jnp.clip(a + 0.02, 0, 1)
        m = full_reference_metrics(a, b)
        assert 25.0 < float(m["psnr"]) < 99.0
        assert 0.5 < float(m["ssim"]) <= 1.0
        assert float(m["delta_e_itp"]) > 0.0


class TestMetricsGoldenParity:
    """Metric values must match the reference implementation on the same pair
    (fixture computed by tools/make_goldens.py from gui_objective_metrics)."""

    def _fx(self):
        from tests.conftest import load_fixture

        return load_fixture("metrics_golden.npz")

    def test_psnr_matches_reference(self):
        from hdrtv_tpu.ops.metrics import psnr

        fx = self._fx()
        pred = jnp.asarray(fx["pred_bgr"][..., ::-1].astype(np.float32) / 65535.0)
        ref = jnp.asarray(fx["ref_bgr"][..., ::-1].astype(np.float32) / 65535.0)
        assert abs(float(psnr(pred, ref)) - float(fx["psnr"])) < 1e-3

    def test_ssim_matches_reference(self):
        from hdrtv_tpu.ops.metrics import ssim

        fx = self._fx()
        pred = jnp.asarray(fx["pred_bgr"][..., ::-1].astype(np.float32) / 65535.0)
        ref = jnp.asarray(fx["ref_bgr"][..., ::-1].astype(np.float32) / 65535.0)
        assert abs(float(ssim(pred, ref)) - float(fx["ssim"])) < 1e-4

    def test_delta_e_itp_matches_reference(self):
        from hdrtv_tpu.ops.metrics import delta_e_itp_unit

        fx = self._fx()
        pred = jnp.asarray(fx["pred_bgr"][..., ::-1].astype(np.float32) / 65535.0)
        ref = jnp.asarray(fx["ref_bgr"][..., ::-1].astype(np.float32) / 65535.0)
        got = float(delta_e_itp_unit(pred, ref, peak_nits=1000.0))
        expect = float(fx["delta_e_itp"])
        assert abs(got - expect) < max(5e-3, expect * 1e-3)


class TestPack:
    def test_pack_rgb48_matches_ref(self):
        from hdrtv_tpu.ops.pack import pack_rgb48, pack_rgb48_ref

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.rand(2, 16, 128, 3).astype(np.float32) * 1.2 - 0.1)
        np.testing.assert_array_equal(np.asarray(pack_rgb48(x)), np.asarray(pack_rgb48_ref(x)))

    def test_pack_rounding(self):
        from hdrtv_tpu.ops.pack import pack_rgb48_ref

        x = jnp.asarray(np.array([[[0.0, 0.5, 1.0]]], np.float32))
        out = np.asarray(pack_rgb48_ref(x))
        assert out[0, 0, 0] == 0
        assert out[0, 0, 1] in (32768,)  # 0.5*65535+0.5 = 32768.0
        assert out[0, 0, 2] == 65535

    def test_colorimetric_white_maps_to_peak(self):
        from hdrtv_tpu.ops.pack import colorimetric_pq_pack_ref
        from hdrtv_tpu.ops.color import pq_oetf

        x = jnp.ones((1, 4, 4, 3), jnp.float32)
        out = np.asarray(colorimetric_pq_pack_ref(x, peak_nits=1000.0))
        expect = int(round(float(pq_oetf(jnp.asarray(1000.0))) * 65535.0 + 0.5))
        assert abs(int(out[0, 0, 0, 0]) - expect) <= 1


class TestResize:
    def test_quarter_aa_flat_parity(self):
        """Flat-layout cond downsample (round 3) ≡ reshape + channel-minor
        path, both RGB and BGR — the lane-padded (H,W,3) image is gone but
        the math must be identical."""
        from hdrtv_tpu.ops.resize import downsample_quarter_aa, downsample_quarter_aa_flat

        rng = np.random.RandomState(7)
        frame = rng.randint(0, 256, (32, 48 * 3), dtype=np.uint8)
        for bgr in (False, True):
            img = frame.reshape(32, 48, 3)
            if bgr:
                img = img[..., ::-1]
            want = np.asarray(
                downsample_quarter_aa(jnp.asarray(img[None]).astype(jnp.float32) / 255.0)
            )
            got = np.asarray(downsample_quarter_aa_flat(jnp.asarray(frame), bgr=bgr))
            np.testing.assert_allclose(got, want, atol=2e-6)

    def test_area_matches_cv2(self):
        cv2 = __import__("cv2")
        from hdrtv_tpu.ops.resize import resize_area

        rng = np.random.RandomState(6)
        img = rng.rand(64, 96, 3).astype(np.float32)
        expect = cv2.resize(img, (48, 32), interpolation=cv2.INTER_AREA)
        got = np.asarray(resize_area(jnp.asarray(img[None]), 32, 48))[0]
        np.testing.assert_allclose(got, expect, atol=1e-5)
