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
