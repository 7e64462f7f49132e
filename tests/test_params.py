"""UI<->algorithm mapping tests (MagnificationParamsUi.hpp semantics)."""

import math

import pytest

from live_video_magnification_tpu.models.params import (
    MagnificationMode,
    MagUiValues,
    clamp_band_to_nyquist,
    defaults_for,
    motion_blend_to_hz,
    motion_hz_to_blend,
    to_params,
    to_ui,
)


def test_defaults_match_reference():
    c = defaults_for(MagnificationMode.COLOR)
    assert (c.amplification, c.low, c.high, c.levels) == (100, 0.84, 1.43, 3)
    p = defaults_for(MagnificationMode.PHASE)
    assert (p.amplification, p.wavelength, p.low, p.high, p.levels) == (50, 50.0, 1.0, 5.0, 5)
    l = defaults_for(MagnificationMode.LAPLACE)
    assert (l.amplification, l.wavelength, l.low, l.high, l.chroma, l.levels) == (
        20, 50.0, 1.0, 5.0, 0, 4)


def test_hz_blend_roundtrip():
    for fps in (24.0, 30.0, 60.0):
        for hz in (0.1, 0.5, 1.0, 5.0, fps / 2):
            b = motion_hz_to_blend(hz, fps)
            assert 0.0 < b < 1.0
            assert motion_blend_to_hz(b, fps) == pytest.approx(hz, rel=1e-9)
    assert motion_hz_to_blend(0.0, 30.0) == 0.0
    assert motion_hz_to_blend(1.0, 0.0) == motion_hz_to_blend(1.0, 30.0)  # fps<=0 -> 30


def test_laplace_mapping():
    v = MagUiValues(mode=MagnificationMode.LAPLACE, amplification=20, wavelength=50.0,
                    low=1.0, high=5.0, chroma=30, levels=4, capture_fps=30.0)
    p = to_params(v)
    assert p.co_wavelength == 500.0            # % -> x10
    assert p.chrom_attenuation == 0.3          # /100
    assert p.co_low == motion_hz_to_blend(1.0, 30.0)
    back = to_ui(p)
    assert back.wavelength == pytest.approx(50.0)
    assert back.low == pytest.approx(1.0)
    assert back.chroma == 30


def test_phase_mapping_inverts_wavelength():
    v = MagUiValues(mode=MagnificationMode.PHASE, wavelength=30.0, low=1.0, high=5.0)
    p = to_params(v)
    assert p.co_wavelength == 70.0  # 100 - v
    assert p.co_low == 1.0 and p.co_high == 5.0  # Hz pass through
    assert to_ui(p).wavelength == pytest.approx(30.0)


def test_none_mode_shows_as_laplace_in_ui():
    from live_video_magnification_tpu.models.params import MagnificationParams

    ui = to_ui(MagnificationParams(mode=MagnificationMode.NONE))
    assert ui.mode is MagnificationMode.LAPLACE


def test_nyquist_clamp():
    v = MagUiValues(low=0.0, high=100.0, capture_fps=30.0)
    clamp_band_to_nyquist(v)
    assert v.low == 0.05 and v.high == 15.0
    v2 = MagUiValues(low=10.0, high=2.0, capture_fps=30.0)
    clamp_band_to_nyquist(v2)
    assert v2.low <= v2.high
