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
