"""Golden tests: color conversions vs OpenCV.

Lab is load-bearing in motion and phase modes (reference MagnifyCore.hpp:88-90,
217-219); grayscale and u8 conversion must be bit-exact (GrayscaleProcessor.cpp,
convertTo biases at MagnifyCore.hpp:153,202,276).
"""

import cv2
import numpy as np

import jax.numpy as jnp

from live_video_magnification_tpu.ops.color import (
    bgr_to_gray_u8,
    bgr_to_lab,
    lab_to_bgr,
    to_u8,
    u8_to_unit_f32,
)

RNG = np.random.default_rng(7)


def chw(img_hwc):
    return np.moveaxis(img_hwc, -1, 0)


def hwc(img_chw):
    return np.moveaxis(np.asarray(img_chw), 0, -1)


def test_bgr_to_lab_close_to_opencv():
    bgr = RNG.random((32, 32, 3)).astype(np.float32)
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2Lab)
    got = hwc(bgr_to_lab(jnp.asarray(chw(bgr))))
    # OpenCV's forward path uses a spline gamma table; exact-curve error < 0.5 Lab units.
    assert np.abs(got - ref).max() < 0.5


def test_lab_to_bgr_matches_opencv():
    bgr = RNG.random((32, 32, 3)).astype(np.float32)
    lab = cv2.cvtColor(bgr, cv2.COLOR_BGR2Lab)
    ref = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)
    got = hwc(lab_to_bgr(jnp.asarray(chw(lab))))
    assert np.abs(got - ref).max() < 2e-4


def test_roundtrip_u8_parity():
    """u8 -> Lab -> u8 round trip: max one LSB off vs OpenCV (PSNR >> 40 dB)."""
    u8 = RNG.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    bgr = (u8 / 255.0).astype(np.float32)
    ref = cv2.cvtColor(cv2.cvtColor(bgr, cv2.COLOR_BGR2Lab), cv2.COLOR_Lab2BGR)
    ref_u8 = np.clip(np.rint(ref * 255.0 + 1.0 / 255.0), 0, 255).astype(np.uint8)
    x = u8_to_unit_f32(jnp.asarray(chw(u8)))
    got = to_u8(lab_to_bgr(bgr_to_lab(x)), 255.0, 1.0 / 255.0)
    diff = hwc(got).astype(int) - ref_u8.astype(int)
    assert np.abs(diff).max() <= 1
    mse = (diff.astype(np.float64) ** 2).mean()
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    assert psnr > 60.0


def test_gray_u8_bit_exact():
    u8 = RNG.integers(0, 256, (48, 37, 3), dtype=np.uint8)
    ref = cv2.cvtColor(u8, cv2.COLOR_BGR2GRAY)
    got = np.asarray(bgr_to_gray_u8(jnp.asarray(chw(u8))))[0]
    np.testing.assert_array_equal(got, ref)


def test_to_u8_rounding_and_saturation():
    x = np.array([[-1.0, 0.0, 0.4999, 0.5, 1.5, 2.5, 254.6, 255.4, 300.0]], np.float32)
    ref = np.clip(np.rint(x), 0, 255).astype(np.uint8)  # cvRound = half-to-even
    got = np.asarray(to_u8(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_fast_gamma_close_to_transcendental(monkeypatch):
    """LVMT_FAST_GAMMA=1 (Newton-root gamma/cbrt, the --fast pairing) stays
    within f32-roundoff of the pow/cbrt path across the full u8 round trip
    and the Lab forward conversion."""
    bgr = RNG.random((48, 48, 3)).astype(np.float32)
    monkeypatch.delenv("LVMT_FAST_GAMMA", raising=False)
    ref_lab = hwc(bgr_to_lab(jnp.asarray(chw(bgr))))
    monkeypatch.setenv("LVMT_FAST_GAMMA", "1")
    got_lab = hwc(bgr_to_lab(jnp.asarray(chw(bgr))))
    assert np.abs(got_lab - ref_lab).max() < 1e-3  # Lab units (L in 0..100)

    u8 = RNG.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    x = u8_to_unit_f32(jnp.asarray(chw(u8)))
    got = to_u8(lab_to_bgr(bgr_to_lab(x)), 255.0, 1.0 / 255.0)
    monkeypatch.delenv("LVMT_FAST_GAMMA")
    ref = to_u8(lab_to_bgr(bgr_to_lab(x)), 255.0, 1.0 / 255.0)
    d = np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))
    assert d.max() <= 1  # one rounding LSB at most
