"""Golden tests: Riesz pyramid ops vs cv2 building blocks (RieszPyramid.cpp)."""

import cv2
import numpy as np

import jax.numpy as jnp

from live_video_magnification_tpu.ops.kernels import (
    RIESZ_BAND_KERNEL,
    RIESZ_HIGHPASS_9x9,
    RIESZ_LOWPASS_9x9,
)
from live_video_magnification_tpu.ops.riesz import (
    build_riesz_pyramid,
    clamped_arccos,
    collapse_riesz_pyramid,
    riesz_level_sizes,
)

RNG = np.random.default_rng(11)


def _f2d(img, kernel):
    return cv2.filter2D(img, cv2.CV_32F, kernel, borderType=cv2.BORDER_REFLECT_101)


def _cv_build(frame, levels):
    pyr = []
    octave = frame
    for _ in range(levels - 1):
        hp = _f2d(octave, RIESZ_HIGHPASS_9x9)
        pyr.append(
            (hp, _f2d(hp, RIESZ_BAND_KERNEL[None, :]), _f2d(hp, RIESZ_BAND_KERNEL[:, None]))
        )
        lp = _f2d(octave, 2.0 * RIESZ_LOWPASS_9x9)
        octave = lp[::2, ::2].copy()
    pyr.append(
        (octave, _f2d(octave, RIESZ_BAND_KERNEL[None, :]), _f2d(octave, RIESZ_BAND_KERNEL[:, None]))
    )
    return pyr


def test_build_riesz_pyramid_matches_cv():
    h, w, levels = 61, 77, 4
    frame = RNG.random((h, w)).astype(np.float32) * 100.0
    ref = _cv_build(frame, levels)
    got = build_riesz_pyramid(jnp.asarray(frame), levels)
    assert [g.lowpass.shape for g in got] == [r[0].shape for r in ref]
    assert [tuple(s) for s in riesz_level_sizes(h, w, levels)] == [r[0].shape for r in ref]
    for (r_lp, r_r, r_i), g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g.lowpass), r_lp, atol=2e-4)
        np.testing.assert_allclose(np.asarray(g.riesz.cos), r_r, atol=2e-4)
        np.testing.assert_allclose(np.asarray(g.riesz.sin), r_i, atol=2e-4)


def test_collapse_matches_cv():
    h, w, levels = 45, 53, 3
    frame = RNG.random((h, w)).astype(np.float32) * 100.0
    pyr = _cv_build(frame, levels)
    lowpasses = [p[0] for p in pyr]
    result = lowpasses[-1]
    for lvl in range(levels - 2, -1, -1):
        octave = lowpasses[lvl]
        up = cv2.resize(result, (octave.shape[1], octave.shape[0]),
                        interpolation=cv2.INTER_NEAREST)
        z = np.zeros_like(up)
        z[::2, ::2] = up[::2, ::2]
        result = _f2d(z, 2.0 * RIESZ_LOWPASS_9x9) + _f2d(octave, RIESZ_HIGHPASS_9x9)
    got = collapse_riesz_pyramid([jnp.asarray(x) for x in lowpasses])
    np.testing.assert_allclose(np.asarray(got), result, atol=5e-4)


def test_clamped_arccos_reference_quirk():
    """x < -1 -> -1.0 (NOT acos(-1) = pi); x > 1 -> 1.0 (RieszPyramid.cpp:8-23)."""
    x = np.array([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0, np.nan], np.float32)
    got = np.asarray(clamped_arccos(jnp.asarray(x)))
    assert got[0] == -1.0
    assert got[-2] == 1.0
    np.testing.assert_allclose(got[1:7][:-1], np.arccos(x[1:6]), atol=1e-6)
    assert np.isnan(got[-1])


def test_phase_difference_on_translating_sinusoid():
    """SURVEY §4(a): Riesz phase on a synthetic translating sinusoid.

    For a horizontal sinusoid translated by dx, the quaternionic phase
    difference magnitude should approximate 2*pi*f*dx, oriented horizontally
    (cos component carries it, sin component ~0)."""
    from live_video_magnification_tpu.ops.riesz import (
        build_riesz_pyramid,
        phase_difference_and_amplitude,
    )

    h, w = 64, 128
    freq = 1.0 / 16.0          # cycles per pixel
    dx = 0.5                   # pixels
    x = np.arange(w)[None, :] + np.zeros((h, 1))
    f0 = np.sin(2 * np.pi * freq * x).astype(np.float32)
    f1 = np.sin(2 * np.pi * freq * (x - dx)).astype(np.float32)

    p0 = build_riesz_pyramid(jnp.asarray(f0), 3)
    p1 = build_riesz_pyramid(jnp.asarray(f1), 3)
    pr = phase_difference_and_amplitude(p1[0], p0[0])
    # interior region, away from borders
    cos_c = np.asarray(pr.phase_diff.cos)[16:48, 32:96]
    sin_c = np.asarray(pr.phase_diff.sin)[16:48, 32:96]
    expected = 2 * np.pi * freq * dx
    measured = np.abs(cos_c).mean()
    assert abs(measured - expected) / expected < 0.2, (measured, expected)
    assert np.abs(sin_c).mean() < 0.1 * expected  # orientation is horizontal
