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


@pytest.mark.parametrize("h,w", [(128, 128), (130, 250), (97, 201)])
def test_conv9_mxu_svd_variant_matches_dense(h, w, monkeypatch):
    """LVMT_CONV9=svd — the exact rank-5 separable formulation (5 banded
    matmuls + VPU column taps) == correlate2d, both 9x9 kernels (round-4
    MXU-work-diet candidate)."""
    from live_video_magnification_tpu.ops.pallas.conv9_mxu import (
        _svd_factors,
        conv9_mxu,
        lp9_decimate_mxu,
    )

    col, row = _svd_factors(np.asarray(RIESZ_LOWPASS_9x9))
    assert col.shape[0] == 5  # exactly rank 5
    monkeypatch.setenv("LVMT_CONV9", "svd")
    x = jnp.asarray(RNG.random((h, w)).astype(np.float32) * 100.0 - 50.0)
    for k in (RIESZ_HIGHPASS_9x9, 2.0 * RIESZ_LOWPASS_9x9):
        ref = correlate2d(x, k)
        got = conv9_mxu(x, k, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=6e-4)
    ref = correlate2d(x, 2.0 * RIESZ_LOWPASS_9x9)[::2, ::2]
    got = lp9_decimate_mxu(x, 2.0 * RIESZ_LOWPASS_9x9, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=6e-4)


def test_hybrid_bf16_level_resolution(monkeypatch):
    """LVMT_MXU_DTYPE=hybrid keeps the finest level f32; hybrid-band keeps the
    Riesz band pair f32 everywhere (VERDICT round-3 item 4)."""
    from live_video_magnification_tpu.ops.riesz import _hybrid_bf16

    monkeypatch.setenv("LVMT_MXU_DTYPE", "hybrid")
    assert _hybrid_bf16(0) == (False, False)
    assert _hybrid_bf16(1) == (True, True)
    assert _hybrid_bf16(4) == (True, True)
    monkeypatch.setenv("LVMT_MXU_DTYPE", "hybrid-band")
    assert _hybrid_bf16(0) == (True, False)
    assert _hybrid_bf16(3) == (True, False)
    monkeypatch.setenv("LVMT_MXU_DTYPE", "bf16")
    assert _hybrid_bf16(0) == (None, None)  # env-driven inside the kernels
    monkeypatch.delenv("LVMT_MXU_DTYPE")
    assert _hybrid_bf16(0) == (None, None)


@pytest.mark.parametrize("h,w", [(64, 128), (50, 70), (130, 250)])
@pytest.mark.parametrize("preweighted", [False, True])
def test_riesz_amplify_mxu_matches_ops(h, w, preweighted):
    """The MXU-banded blur tail (riesz_amplify_mxu) == normalize_phase +
    amplify_level, both pre-weighted layouts (round-4 tail candidate)."""
    from live_video_magnification_tpu.ops.pallas.riesz_amplify_mxu import (
        riesz_amplify_mxu,
    )
    from live_video_magnification_tpu.ops.riesz import (
        RieszLevel,
        amplify_level,
        amplitude_blur,
        normalize_phase,
    )
    from live_video_magnification_tpu.ops.temporal import CompExp

    r = lambda: jnp.asarray(RNG.random((h, w)).astype(np.float32) - 0.3)
    amplitude = jnp.abs(r()) + 0.05
    hi = CompExp(r(), r())
    lo = CompExp(r(), r())
    level = RieszLevel(r() * 50.0, CompExp(r(), r()))
    alpha, threshold = 30.0, 1.2

    normalized = normalize_phase(hi, lo, amplitude, amplitude_blur(amplitude))
    ref = amplify_level(level, normalized, alpha, threshold)

    change = hi - lo
    if preweighted:
        cc, cs = change.cos * amplitude, change.sin * amplitude
    else:
        cc, cs = change.cos, change.sin
    got = riesz_amplify_mxu(
        amplitude, cc, cs,
        level.lowpass, level.riesz.cos, level.riesz.sin,
        alpha, threshold, interpret=True, preweighted=preweighted,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("h,w,preweighted", [(96, 200, False), (130, 250, True)])
def test_riesz_amplify_mxu_vert_mxu_matches_vpu(h, w, preweighted):
    """LVMT_TAIL_VERT=mxu (vertical 13-tap as one left-banded matmul per
    blur) == the vpu tap-accumulation formulation, both preweighted layouts
    (round-5 kernel lever: the vpu taps held the kernel at ~5.7x its traffic
    bound on chip)."""
    from live_video_magnification_tpu.ops.pallas.riesz_amplify_mxu import (
        riesz_amplify_mxu,
    )

    r = lambda: jnp.asarray(RNG.random((h, w)).astype(np.float32) - 0.3)
    amplitude = jnp.abs(r()) + 0.05
    cc, cs = r() * 0.4, r() * 0.4
    lp, rr, ri = r() * 50.0, r(), r()
    alpha, threshold = 30.0, 1.2

    ref = riesz_amplify_mxu(amplitude, cc, cs, lp, rr, ri, alpha, threshold,
                            interpret=True, preweighted=preweighted,
                            vert="vpu")
    got = riesz_amplify_mxu(amplitude, cc, cs, lp, rr, ri, alpha, threshold,
                            interpret=True, preweighted=preweighted,
                            vert="mxu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("db", ["0", "1"])
def test_riesz_amplify_mxu_packed_strips_bit_identical(db, monkeypatch):
    """LVMT_TAIL_PACK=1 (the three halo'd blur inputs stacked into one
    (3, Hp, Wp) array, ONE strided DMA per grid step) is bit-identical to
    the three-DMA layout, with and without the cross-step double buffer —
    the packing only changes how bytes move, never what is computed
    (round-5 DMA-issue-count probe, docs/ROUND5.md item 3)."""
    from live_video_magnification_tpu.ops.pallas.riesz_amplify_mxu import (
        riesz_amplify_mxu,
    )

    h, w = 100, 150
    r = lambda: jnp.asarray(RNG.random((h, w)).astype(np.float32) - 0.3)
    amplitude = jnp.abs(r()) + 0.05
    cc, cs = r() * 0.4, r() * 0.4
    lp, rr, ri = r() * 50.0, r(), r()
    alpha, threshold = 30.0, 1.2

    monkeypatch.setenv("LVMT_TAIL_DB", db)
    monkeypatch.setenv("LVMT_TAIL_PACK", "0")
    ref = riesz_amplify_mxu(amplitude, cc, cs, lp, rr, ri, alpha, threshold,
                            interpret=True)
    monkeypatch.setenv("LVMT_TAIL_PACK", "1")
    got = riesz_amplify_mxu(amplitude, cc, cs, lp, rr, ri, alpha, threshold,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_riesz_amplify_mxu_bf16_transients_close_to_f32():
    """LVMT_TAIL_IO=bf16 path: the kernel accepts bfloat16 amplitude/change
    planes (half the strip HBM bytes) and stays within bf16 quantization of
    the f32 result — the transients carry no cross-frame state, so the error
    cannot accumulate (round-5 fast-mode lever)."""
    from live_video_magnification_tpu.ops.pallas.riesz_amplify_mxu import (
        riesz_amplify_mxu,
    )

    h, w = 96, 200
    r = lambda: jnp.asarray(RNG.random((h, w)).astype(np.float32) - 0.3)
    amplitude = jnp.abs(r()) + 0.05
    cc, cs = r() * 0.4, r() * 0.4
    lp, rr, ri = r() * 50.0, r(), r()
    alpha, threshold = 30.0, 1.2

    ref = riesz_amplify_mxu(amplitude, cc, cs, lp, rr, ri, alpha, threshold,
                            interpret=True)
    got = riesz_amplify_mxu(
        amplitude.astype(jnp.bfloat16), cc.astype(jnp.bfloat16),
        cs.astype(jnp.bfloat16), lp, rr, ri, alpha, threshold, interpret=True)
    assert got.dtype == jnp.float32
    # bf16 has an 8-bit mantissa: relative tolerance ~1/256 against the
    # output scale (lowpass magnitude ~50)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.5,
                               rtol=2e-2)


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


def test_riesz_phase_df2_fused_matches_jnp():
    """riesz_phase_df2_fused == phase_difference_and_amplitude + 2x
    riesz_df2_step + the rebuild/zero selection + normalize pre-products."""
    import jax
    import jax.numpy as jnp

    from collections import namedtuple

    from live_video_magnification_tpu.ops.pallas.riesz_phase_fused import (
        riesz_phase_df2_fused,
    )

    # local stand-in for the kernel's per-filter (phase, reg0, reg1) layout;
    # the model state now shares one accumulator (RieszState.acc), but the
    # kernel interface remains two independent 6-tuples
    FilterLevelState = namedtuple("FilterLevelState", "phase reg0 reg1")
    from live_video_magnification_tpu.ops.riesz import (
        RieszLevel,
        phase_difference_and_amplitude,
    )
    from live_video_magnification_tpu.ops.temporal import (
        CompExp,
        butterworth_bandpass_coeffs,
        riesz_df2_step,
    )

    rng = np.random.default_rng(17)
    h, w = 40, 72  # deliberately not multiples of the tile/lane sizes
    mk = lambda: jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    cur = RieszLevel(mk(), CompExp(mk(), mk()))
    old = RieszLevel(mk(), CompExp(mk(), mk()))
    lo = FilterLevelState(CompExp(mk(), mk()), CompExp(mk(), mk()), CompExp(mk(), mk()))
    hi = FilterLevelState(CompExp(mk(), mk()), CompExp(mk(), mk()), CompExp(mk(), mk()))
    b_lo, a_lo = butterworth_bandpass_coeffs(0.7, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(3.0, 30.0)
    b_lo, a_lo = jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32)
    b_hi, a_hi = jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32)

    flat = lambda fl: (fl.phase.cos, fl.phase.sin, fl.reg0.cos, fl.reg0.sin,
                       fl.reg1.cos, fl.reg1.sin)

    for rebuild in (False, True):
        # jnp reference with the same selection semantics
        o = cur if rebuild else old
        mask = (lambda x: jnp.zeros_like(x)) if rebuild else (lambda x: x)
        lo_m = jax.tree.map(mask, lo)
        hi_m = jax.tree.map(mask, hi)
        pr = phase_difference_and_amplitude(cur, o, compute_blur=False)
        lo_res, lo_p, lo_r0, lo_r1 = riesz_df2_step(
            lo_m.phase, lo_m.reg0, lo_m.reg1, pr.phase_diff, b_lo, a_lo)
        hi_res, hi_p, hi_r0, hi_r1 = riesz_df2_step(
            hi_m.phase, hi_m.reg0, hi_m.reg1, pr.phase_diff, b_hi, a_hi)
        ref_wc = (hi_res.cos - lo_res.cos) * pr.amplitude
        ref_ws = (hi_res.sin - lo_res.sin) * pr.amplitude

        amp, wc, ws, lo6, hi6 = riesz_phase_df2_fused(
            cur.lowpass, cur.riesz.cos, cur.riesz.sin,
            old.lowpass, old.riesz.cos, old.riesz.sin,
            flat(lo), flat(hi), b_lo, a_lo, b_hi, a_hi,
            jnp.asarray(rebuild), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(amp), np.asarray(pr.amplitude),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(wc), np.asarray(ref_wc),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ws), np.asarray(ref_ws),
                                   atol=1e-5, rtol=1e-4)
        for got, want in zip(lo6, (lo_p.cos, lo_p.sin, lo_r0.cos, lo_r0.sin,
                                   lo_r1.cos, lo_r1.sin)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, rtol=1e-4)
        for got, want in zip(hi6, (hi_p.cos, hi_p.sin, hi_r0.cos, hi_r0.sin,
                                   hi_r1.cos, hi_r1.sin)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, rtol=1e-4)


def test_conv9_mxu_bf16_mode_close_to_f32(monkeypatch):
    """LVMT_MXU_DTYPE=bf16 (opt-in fast mode) must stay within bf16 rounding
    of the f32 banded path — the flag is threaded as a STATIC jit argument so
    both variants coexist in one process (the env is read per public call)."""
    import live_video_magnification_tpu.ops.pallas.conv9_mxu as c9
    from live_video_magnification_tpu.ops.kernels import RIESZ_LOWPASS_9x9

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(96, 128)).astype(np.float32) * 50.0)
    monkeypatch.delenv("LVMT_MXU_DTYPE", raising=False)
    ref = c9.conv9_mxu(x, RIESZ_LOWPASS_9x9, interpret=True)
    monkeypatch.setenv("LVMT_MXU_DTYPE", "bf16")
    got = c9.conv9_mxu(x, RIESZ_LOWPASS_9x9, interpret=True)
    d = np.abs(np.asarray(ref) - np.asarray(got))
    assert d.max() > 0  # the cast genuinely engaged (distinct trace)
    # |x| ~ 50, 81 taps summing to ~1: bf16 relative 2^-8 -> small absolute
    assert d.max() < 0.5, f"max diff {d.max()}"


@pytest.mark.parametrize("phase_fused", [True, False])
def test_riesz_step_with_all_pallas_kernels_matches_jnp_step(monkeypatch, phase_fused):
    """The full phase step with use_pallas=True, every Pallas entry point
    forced to interpret mode — exercises the real wiring (MXU build/collapse,
    riesz_phase_df2_fused, preweighted riesz_amplify_fused) vs the jnp step.
    Default (phase_fused=False) is the jnp phase front + fused blur/amplify
    tail; True swaps in the all-in-one phase Pallas kernel. The flag is now an
    explicit build-time argument, not a trace-time env read (ADVICE round-2)."""
    import functools
    import math

    import jax.numpy as jnp

    import live_video_magnification_tpu.ops.pallas.conv9_mxu as c9
    import live_video_magnification_tpu.ops.pallas.riesz_amplify as ra
    import live_video_magnification_tpu.ops.pallas.riesz_build as rb
    import live_video_magnification_tpu.ops.pallas.riesz_phase_fused as rpf
    from live_video_magnification_tpu.models import riesz as riesz_mode
    from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs
    from oracle import synthetic_clip

    for mod, name in [(c9, "conv9_mxu"), (c9, "band5_mxu"), (c9, "lp9_decimate_mxu"),
                      (c9, "lp9_inject_mxu"), (ra, "riesz_amplify_fused"),
                      (rb, "riesz_build_level_fused"),
                      (rpf, "riesz_phase_df2_fused")]:
        monkeypatch.setattr(mod, name,
                            functools.partial(getattr(mod, name), interpret=True))
    # shrink the MXU threshold so the banded kernels engage at test dims
    monkeypatch.setattr(c9, "MIN_MXU_DIM", 16)

    t, h, w, levels = 4, 48, 64, 2
    frames = synthetic_clip(t, h, w, color=True, seed=44)
    b_lo, a_lo = butterworth_bandpass_coeffs(0.5, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(3.0, 30.0)
    dyn = riesz_mode.RieszDynParams(
        jnp.float32(30.0), jnp.float32(0.4 * math.pi),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )
    st_ref = riesz_mode.init_state(h, w, levels)
    st_fus = riesz_mode.init_state(h, w, levels)
    for f in frames:
        chw = jnp.asarray(np.moveaxis(f, -1, 0))
        st_ref, o_ref = riesz_mode.step(st_ref, chw, dyn, levels=levels,
                                        use_pallas=False)
        st_fus, o_fus = riesz_mode.step(st_fus, chw, dyn, levels=levels,
                                        use_pallas=True, phase_fused=phase_fused)
        d = np.abs(np.asarray(o_ref).astype(np.int16)
                   - np.asarray(o_fus).astype(np.int16))
        assert d.max() <= 1, f"max diff {d.max()} LSB"


def test_riesz_step_phase_fused_with_jnp_blur_tail_matches_jnp_step(monkeypatch):
    """The LVMT_PHASE_FUSED=1 production pairing — riesz_phase_df2_fused front
    + the (measured-faster) jnp blur tail, reached only via use_pallas=None
    with LVMT_TAIL unset — vs the plain jnp step (ADVICE round-3: this branch
    had no golden coverage; tests forced use_pallas=True, which takes the
    riesz_amplify_fused tail instead)."""
    import functools
    import math

    import jax.numpy as jnp

    import live_video_magnification_tpu.ops.pallas.conv9_mxu as c9
    import live_video_magnification_tpu.ops.pallas.riesz_phase_fused as rpf
    from live_video_magnification_tpu.models import riesz as riesz_mode
    from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs
    from oracle import synthetic_clip

    for mod, name in [(c9, "conv9_mxu"), (c9, "band5_mxu"),
                      (c9, "lp9_decimate_mxu"), (c9, "lp9_inject_mxu"),
                      (rpf, "riesz_phase_df2_fused")]:
        monkeypatch.setattr(mod, name,
                            functools.partial(getattr(mod, name), interpret=True))
    monkeypatch.setattr(c9, "MIN_MXU_DIM", 16)
    monkeypatch.setenv("LVMT_PALLAS", "1")   # auto-gate on despite CPU backend
    monkeypatch.delenv("LVMT_TAIL", raising=False)  # default jnp blur tail
    # pin the dense conv formulation: this test targets the phase-fused
    # branch; the svd build's different rounding at phase-singular pixels
    # shifts the accumulator state beyond the tight tolerance below
    monkeypatch.setenv("LVMT_CONV9", "dense")

    t, h, w, levels = 4, 48, 64, 2
    frames = synthetic_clip(t, h, w, color=True, seed=45)
    b_lo, a_lo = butterworth_bandpass_coeffs(0.5, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(3.0, 30.0)
    dyn = riesz_mode.RieszDynParams(
        jnp.float32(30.0), jnp.float32(0.4 * math.pi),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )
    st_ref = riesz_mode.init_state(h, w, levels)
    st_fus = riesz_mode.init_state(h, w, levels)
    for f in frames:
        chw = jnp.asarray(np.moveaxis(f, -1, 0))
        st_ref, o_ref = riesz_mode.step(st_ref, chw, dyn, levels=levels,
                                        use_pallas=False)
        st_fus, o_fus = riesz_mode.step(st_fus, chw, dyn, levels=levels,
                                        use_pallas=None, phase_fused=True)
        d = np.abs(np.asarray(o_ref).astype(np.int16)
                   - np.asarray(o_fus).astype(np.int16))
        assert d.max() <= 1, f"max diff {d.max()} LSB"
    # the filter state evolved equivalently through the fused front (kernel
    # accumulation order differs, so this is close-not-bitwise; the <=1 LSB
    # output parity across 4 frames already proves state propagation)
    import jax

    for a, b in zip(jax.tree.leaves(st_ref), jax.tree.leaves(st_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("rebuild", [False, True])
def test_riesz_level_mxu_matches_jnp_composition(rebuild):
    """The fused per-level kernel (phase front + shared-acc DF-II + MXU blurs
    + amplify, LVMT_TAIL=level) == the jnp composition, both rebuild arms."""
    import jax

    from live_video_magnification_tpu.ops.pallas.riesz_level_mxu import (
        riesz_level_mxu,
    )
    from live_video_magnification_tpu.ops.riesz import (
        RieszLevel,
        amplify_level,
        amplitude_blur,
        phase_difference_and_amplitude,
    )
    from live_video_magnification_tpu.ops.temporal import (
        CompExp,
        butterworth_bandpass_coeffs,
        riesz_df2_step,
    )

    rng = np.random.default_rng(23)
    h, w = 40, 72
    mk = lambda: jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    cur = RieszLevel(mk(), CompExp(mk(), mk()))
    old = RieszLevel(mk(), CompExp(mk(), mk()))
    acc = CompExp(mk(), mk())
    lo = (CompExp(mk(), mk()), CompExp(mk(), mk()))   # reg0, reg1
    hi = (CompExp(mk(), mk()), CompExp(mk(), mk()))
    b_lo, a_lo = butterworth_bandpass_coeffs(0.7, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(3.0, 30.0)
    b_lo, a_lo = jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32)
    b_hi, a_hi = jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32)
    alpha, threshold = 30.0, 1.2

    # jnp reference with the same rebuild/zero semantics
    o = cur if rebuild else old
    z = (lambda x: jnp.zeros_like(x)) if rebuild else (lambda x: x)
    acc_m = jax.tree.map(z, acc)
    lo_m = jax.tree.map(z, lo)
    hi_m = jax.tree.map(z, hi)
    pr = phase_difference_and_amplitude(cur, o, compute_blur=True)
    lo_res, phase, lo_r0, lo_r1 = riesz_df2_step(
        acc_m, lo_m[0], lo_m[1], pr.phase_diff, b_lo, a_lo)
    hi_res, _, hi_r0, hi_r1 = riesz_df2_step(
        acc_m, hi_m[0], hi_m[1], pr.phase_diff, b_hi, a_hi)
    ch = hi_res - lo_res
    nc = amplitude_blur(ch.cos * pr.amplitude) / pr.amplitude_blurred
    ns = amplitude_blur(ch.sin * pr.amplitude) / pr.amplitude_blurred
    ref = amplify_level(cur, CompExp(nc, ns), alpha, threshold)

    got, acc2, lo2, hi2 = riesz_level_mxu(
        cur.lowpass, cur.riesz.cos, cur.riesz.sin,
        old.lowpass, old.riesz.cos, old.riesz.sin,
        (acc.cos, acc.sin),
        (lo[0].cos, lo[0].sin, lo[1].cos, lo[1].sin),
        (hi[0].cos, hi[0].sin, hi[1].cos, hi[1].sin),
        b_lo, a_lo, b_hi, a_hi, jnp.asarray(rebuild), alpha, threshold,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)
    for got_s, want in zip(
        (acc2[0], acc2[1], lo2[0], lo2[1], lo2[2], lo2[3],
         hi2[0], hi2[1], hi2[2], hi2[3]),
        (phase.cos, phase.sin, lo_r0.cos, lo_r0.sin, lo_r1.cos, lo_r1.sin,
         hi_r0.cos, hi_r0.sin, hi_r1.cos, hi_r1.sin),
    ):
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_riesz_step_level_tail_matches_jnp_step(monkeypatch):
    """Full phase step with LVMT_TAIL=level (the fused per-level kernel) vs
    the plain jnp step, <=1 LSB over a short clip."""
    import functools
    import math

    import jax.numpy as jnp

    import live_video_magnification_tpu.ops.pallas.conv9_mxu as c9
    import live_video_magnification_tpu.ops.pallas.riesz_level_mxu as rlm
    from live_video_magnification_tpu.models import riesz as riesz_mode
    from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs
    from oracle import synthetic_clip

    for mod, name in [(c9, "conv9_mxu"), (c9, "band5_mxu"),
                      (c9, "lp9_decimate_mxu"), (c9, "lp9_inject_mxu"),
                      (rlm, "riesz_level_mxu")]:
        monkeypatch.setattr(mod, name,
                            functools.partial(getattr(mod, name), interpret=True))
    monkeypatch.setattr(c9, "MIN_MXU_DIM", 16)
    monkeypatch.setenv("LVMT_PALLAS", "1")
    monkeypatch.setenv("LVMT_TAIL", "level")
    monkeypatch.setenv("LVMT_CONV9", "dense")

    t, h, w, levels = 4, 48, 64, 2
    frames = synthetic_clip(t, h, w, color=True, seed=46)
    b_lo, a_lo = butterworth_bandpass_coeffs(0.5, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(3.0, 30.0)
    dyn = riesz_mode.RieszDynParams(
        jnp.float32(30.0), jnp.float32(0.4 * math.pi),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )
    st_ref = riesz_mode.init_state(h, w, levels)
    st_fus = riesz_mode.init_state(h, w, levels)
    for f in frames:
        chw = jnp.asarray(np.moveaxis(f, -1, 0))
        st_ref, o_ref = riesz_mode.step(st_ref, chw, dyn, levels=levels,
                                        use_pallas=False)
        st_fus, o_fus = riesz_mode.step(st_fus, chw, dyn, levels=levels,
                                        use_pallas=None)
        d = np.abs(np.asarray(o_ref).astype(np.int16)
                   - np.asarray(o_fus).astype(np.int16))
        assert d.max() <= 1, f"max diff {d.max()} LSB"


def test_conv9_band5_bf16_out_dtype(monkeypatch):
    """out_dtype='bf16' (LVMT_PYR_IO plumbing): conv9/band5 emit bfloat16
    planes, accumulate f32 in-kernel, and band5 accepts a bf16 input plane —
    all within bf16 quantization of the f32 path."""
    from live_video_magnification_tpu.ops.pallas.conv9_mxu import (
        band5_mxu,
        conv9_mxu,
    )

    h, w = 96, 200
    x = jnp.asarray(RNG.random((h, w)).astype(np.float32) * 100.0 - 50.0)
    ref_hp = conv9_mxu(x, RIESZ_HIGHPASS_9x9, interpret=True)
    ref_r, ref_i = band5_mxu(ref_hp, RIESZ_BAND_KERNEL, interpret=True)

    hp = conv9_mxu(x, RIESZ_HIGHPASS_9x9, interpret=True, out_dtype="bf16")
    assert hp.dtype == jnp.bfloat16
    r, i = band5_mxu(hp, RIESZ_BAND_KERNEL, interpret=True, out_dtype="bf16")
    assert r.dtype == i.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(ref_hp)))
    np.testing.assert_allclose(np.asarray(hp, np.float32),
                               np.asarray(ref_hp), atol=scale / 128)
    scale_b = float(jnp.max(jnp.abs(ref_r))) + 1e-6
    np.testing.assert_allclose(np.asarray(r, np.float32), np.asarray(ref_r),
                               atol=scale_b / 64)
    np.testing.assert_allclose(np.asarray(i, np.float32), np.asarray(ref_i),
                               atol=scale_b / 64)


def test_riesz_amplify_mxu_tile128_matches_tile64(monkeypatch):
    """LVMT_TAIL_TILE=128 (half the DMA issues; fits VMEM only in the
    all-bf16 pairing) == the tile-64 geometry, including a height that is
    not a multiple of either tile."""
    from live_video_magnification_tpu.ops.pallas.riesz_amplify_mxu import (
        riesz_amplify_mxu,
    )

    h, w = 150, 200
    r = lambda: jnp.asarray(RNG.random((h, w)).astype(np.float32) - 0.3)
    amplitude = jnp.abs(r()) + 0.05
    cc, cs = r() * 0.4, r() * 0.4
    lp, rr, ri = r() * 50.0, r(), r()
    alpha, threshold = 30.0, 1.2

    monkeypatch.setenv("LVMT_TAIL_TILE", "64")
    ref = riesz_amplify_mxu(amplitude, cc, cs, lp, rr, ri, alpha, threshold,
                            interpret=True)
    monkeypatch.setenv("LVMT_TAIL_TILE", "128")
    got = riesz_amplify_mxu(amplitude, cc, cs, lp, rr, ri, alpha, threshold,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-4)
    # db + tile128 together (the fast-pairing combination at bf16 strips)
    monkeypatch.setenv("LVMT_TAIL_DB", "1")
    got = riesz_amplify_mxu(amplitude.astype(jnp.bfloat16),
                            cc.astype(jnp.bfloat16), cs.astype(jnp.bfloat16),
                            lp, rr, ri, alpha, threshold, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.5,
                               rtol=2e-2)
