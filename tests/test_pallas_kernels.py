"""Pallas kernel equivalence vs the jnp reference ops (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from live_video_magnification_tpu.ops.conv import (
    correlate2d,
    correlate_cols,
    correlate_rows,
)
from live_video_magnification_tpu.ops.kernels import (
    RIESZ_BAND_KERNEL,
    RIESZ_HIGHPASS_9x9,
    RIESZ_LOWPASS_9x9,
)
from live_video_magnification_tpu.ops.pallas.riesz_build import riesz_build_level_fused

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("h,w", [(64, 128), (70, 130), (100, 101), (33, 257)])
def test_riesz_build_level_fused_matches_ops(h, w):
    octave = jnp.asarray(RNG.random((h, w)).astype(np.float32) * 100.0)
    hp_ref = correlate2d(octave, RIESZ_HIGHPASS_9x9)
    r_ref = correlate_rows(hp_ref, RIESZ_BAND_KERNEL)
    i_ref = correlate_cols(hp_ref, RIESZ_BAND_KERNEL)
    lp_ref = correlate2d(octave, 2.0 * RIESZ_LOWPASS_9x9)[::2, ::2]

    hp, r, i, sub = riesz_build_level_fused(octave, interpret=True)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hp_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(i), np.asarray(i_ref), atol=3e-4)
    assert sub.shape == lp_ref.shape
    np.testing.assert_allclose(np.asarray(sub), np.asarray(lp_ref), atol=3e-4)


@pytest.mark.parametrize("h,w", [(128, 128), (130, 250), (96, 200)])
def test_conv9_mxu_matches_correlate2d(h, w):
    from live_video_magnification_tpu.ops.pallas.conv9_mxu import conv9_mxu

    x = jnp.asarray(RNG.random((h, w)).astype(np.float32) * 10.0 - 5.0)
    ref = correlate2d(x, RIESZ_HIGHPASS_9x9)
    got = conv9_mxu(x, RIESZ_HIGHPASS_9x9, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("h,w", [(128, 128), (130, 250), (96, 200)])
def test_lp9_inject_mxu_matches_zero_inject_conv(h, w):
    from live_video_magnification_tpu.ops.pallas.conv9_mxu import lp9_inject_mxu
    from live_video_magnification_tpu.ops.resize import resize_nearest_even_inject

    sh, sw = h // 2, w // 2
    s = jnp.asarray(RNG.random((sh, sw)).astype(np.float32) * 10.0 - 5.0)
    z = resize_nearest_even_inject(s, (2 * sh, 2 * sw))
    ref = correlate2d(z, 2.0 * RIESZ_LOWPASS_9x9)
    got = lp9_inject_mxu(s, 2.0 * RIESZ_LOWPASS_9x9, (2 * sh, 2 * sw), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_collapse_mxu_path_matches_jnp():
    from live_video_magnification_tpu.ops.riesz import collapse_riesz_pyramid

    lows = [
        jnp.asarray(RNG.random(s).astype(np.float32)) for s in [(128, 256), (64, 128), (32, 64)]
    ]
    import live_video_magnification_tpu.ops.pallas.conv9_mxu as c9

    ref = collapse_riesz_pyramid(lows, use_pallas=False)
    # Force the MXU path in interpreter mode by monkeypatch-free call: the
    # public entry points accept interpret, so exercise them directly per level.
    hp = c9.conv9_mxu(lows[1], RIESZ_HIGHPASS_9x9, interpret=True)
    lp = c9.lp9_inject_mxu(lows[2], 2.0 * RIESZ_LOWPASS_9x9, (64, 128), interpret=True)
    mid = hp + lp
    hp0 = c9.conv9_mxu(lows[0], RIESZ_HIGHPASS_9x9, interpret=True)
    lp0 = c9.lp9_inject_mxu(mid, 2.0 * RIESZ_LOWPASS_9x9, (128, 256), interpret=True)
    got = hp0 + lp0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


@pytest.mark.parametrize("h,w", [(64, 128), (50, 70), (33, 257)])
def test_riesz_amplify_fused_matches_ops(h, w):
    from live_video_magnification_tpu.ops.pallas.riesz_amplify import riesz_amplify_fused
    from live_video_magnification_tpu.ops.riesz import (
        RieszLevel,
        amplify_level,
        normalize_phase,
    )
    from live_video_magnification_tpu.ops.temporal import CompExp

    r = lambda: jnp.asarray(RNG.random((h, w)).astype(np.float32) - 0.3)
    amplitude = jnp.abs(r()) + 0.05
    hi = CompExp(r(), r())
    lo = CompExp(r(), r())
    level = RieszLevel(r() * 50.0, CompExp(r(), r()))
    alpha, threshold = 30.0, 1.2

    from live_video_magnification_tpu.ops.riesz import amplitude_blur

    normalized = normalize_phase(hi, lo, amplitude, amplitude_blur(amplitude))
    ref = amplify_level(level, normalized, alpha, threshold)

    change = hi - lo
    got = riesz_amplify_fused(
        amplitude, change.cos, change.sin,
        level.lowpass, level.riesz.cos, level.riesz.sin,
        alpha, threshold, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("h,w", [(128, 128), (130, 250), (96, 200), (135, 240)])
def test_band5_mxu_matches_correlate_rows_cols(h, w):
    from live_video_magnification_tpu.ops.pallas.conv9_mxu import band5_mxu

    hp = jnp.asarray(RNG.random((h, w)).astype(np.float32) * 100.0 - 50.0)
    r_ref = correlate_rows(hp, RIESZ_BAND_KERNEL)
    i_ref = correlate_cols(hp, RIESZ_BAND_KERNEL)
    r, i = band5_mxu(hp, RIESZ_BAND_KERNEL, interpret=True)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(i), np.asarray(i_ref), atol=3e-4)


@pytest.mark.parametrize("h,w", [(128, 128), (130, 250), (97, 201), (135, 241)])
def test_lp9_decimate_mxu_matches_conv_subsample(h, w):
    from live_video_magnification_tpu.ops.pallas.conv9_mxu import lp9_decimate_mxu

    x = jnp.asarray(RNG.random((h, w)).astype(np.float32) * 100.0)
    ref = correlate2d(x, 2.0 * RIESZ_LOWPASS_9x9)[::2, ::2]
    got = lp9_decimate_mxu(x, 2.0 * RIESZ_LOWPASS_9x9, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)
