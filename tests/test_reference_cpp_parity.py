"""Parity against the ACTUAL reference C++ math core (VERDICT round-2 item 1).

Builds the reference's Qt-free magnification core — unmodified
/root/reference/src/processing/magnification/{SpatialFilter,TemporalFilter,
RieszPyramid}.cpp + MagnifyCore.hpp — against system OpenCV via
tools/ref_harness.cpp, then asserts:

  (a) the JAX chain reproduces the REAL reference outputs at the BASELINE.md
      PSNR >= 40 dB bound for all three modes and the full preprocess chain
      (SURVEY.md section 4(b), previously substituted by the Python proxy);
  (b) tests/oracle.py itself matches the C++ core (validating the proxy every
      other fidelity test leans on).

Skips only if g++ or the OpenCV dev headers are genuinely absent.
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from live_video_magnification_tpu.models.chain import MagnificationChain
from live_video_magnification_tpu.models.params import (
    MagnificationMode,
    MagnificationParams,
    PreprocessParams,
    ProcessorConfig,
)

from oracle import ChainOracle, psnr_u8, realistic_clip

REPO = Path(__file__).resolve().parent.parent
FPS = 30.0


@pytest.fixture(scope="session")
def ref_harness(tmp_path_factory):
    """Compile the reference math core + harness once per session."""
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    if not Path("/usr/include/opencv4/opencv2/core.hpp").exists():
        pytest.skip("OpenCV dev headers not available")
    if not Path("/root/reference/src/processing/magnification/MagnifyCore.hpp").exists():
        pytest.skip("reference sources not available")
    out = tmp_path_factory.mktemp("refbin") / "ref_harness"
    proc = subprocess.run(
        ["sh", str(REPO / "tools" / "build_ref_harness.sh"), str(out)],
        capture_output=True, text=True, timeout=300,
    )
    if proc.returncode != 0:
        pytest.skip(f"reference harness build failed: {proc.stderr[-800:]}")
    return out


def run_reference(binary, mode, frames, *, fps=FPS, levels=4, amplification=0.0,
                  co_wavelength=0.0, co_low=0.0, co_high=0.0, chrom=0.0,
                  roi=None, downscale=1, grayscale=False, change=None):
    """Feed u8 BGR frames through the compiled reference chain; return (T,h,w,c) u8.

    change=(frame_idx, new_low, new_high) switches the cutoffs mid-clip,
    driving the reference's live cutoff-change path (MagnifyCore.hpp:243-254)."""
    t = len(frames)
    h, w = frames[0].shape[:2]
    rx, ry, rw, rh = roi if roi else (0.0, 0.0, 1.0, 1.0)
    args = [str(binary), mode, str(fps), str(levels), str(amplification),
            str(co_wavelength), str(co_low), str(co_high), str(chrom),
            "1" if roi else "0", str(rx), str(ry), str(rw), str(rh),
            str(downscale), "1" if grayscale else "0", str(w), str(h), str(t)]
    if change is not None:
        args += [str(change[0]), str(change[1]), str(change[2])]
    proc = subprocess.run(args, input=b"".join(np.ascontiguousarray(f).tobytes()
                                               for f in frames),
                          capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode()[-800:]
    oh, ow, oc = np.frombuffer(proc.stdout[:12], np.int32)
    return np.frombuffer(proc.stdout[12:], np.uint8).reshape(t, oh, ow, oc)


def _assert_chain_matches(frames, cfg, ref_outs, bound=40.0, skip=1):
    chain = MagnificationChain()
    worst = 99.0
    for i, f in enumerate(frames):
        got, _ = chain.process(f, cfg)
        got = np.asarray(got)
        ref = ref_outs[i]
        if got.ndim == 2:
            got = got[..., None]
        if i < skip:
            continue
        p = psnr_u8(got, ref)
        worst = min(worst, p)
        assert p > bound, f"frame {i}: PSNR {p:.1f} dB vs reference C++"
    return worst


# ---------------------------------------------------------------- mode parity

def test_phase_vs_reference_cpp(ref_harness):
    t, h, w = 24, 120, 160
    frames = realistic_clip(t, h, w, FPS, seed=21)
    kw = dict(levels=3, amplification=30.0, co_wavelength=40.0, co_low=0.5,
              co_high=3.0)
    ref = run_reference(ref_harness, "phase", frames, **kw)
    cfg = ProcessorConfig(magnification=MagnificationParams(
        mode=MagnificationMode.PHASE, amplification=30.0, co_wavelength=40.0,
        co_low=0.5, co_high=3.0, levels=3, framerate=FPS))
    worst = _assert_chain_matches(frames, cfg, ref)
    assert worst > 40.0


def test_laplace_vs_reference_cpp(ref_harness):
    t, h, w = 24, 120, 160
    frames = realistic_clip(t, h, w, FPS, seed=22)
    # coLow/coHigh are IIR blend coefficients for laplace (IProcessor.hpp:14-23)
    kw = dict(levels=3, amplification=20.0, co_wavelength=500.0, co_low=0.138,
              co_high=0.466, chrom=0.1)
    ref = run_reference(ref_harness, "laplace", frames, **kw)
    cfg = ProcessorConfig(magnification=MagnificationParams(
        mode=MagnificationMode.LAPLACE, amplification=20.0, co_wavelength=500.0,
        co_low=0.138, co_high=0.466, chrom_attenuation=0.1, levels=3,
        framerate=FPS))
    worst = _assert_chain_matches(frames, cfg, ref)
    assert worst > 40.0


def test_color_vs_reference_cpp(ref_harness):
    t, h, w = 24, 120, 160
    frames = realistic_clip(t, h, w, FPS, seed=23)
    kw = dict(levels=3, amplification=80.0, co_low=0.8, co_high=1.4)
    ref = run_reference(ref_harness, "color", frames, **kw)
    cfg = ProcessorConfig(magnification=MagnificationParams(
        mode=MagnificationMode.COLOR, amplification=80.0, co_low=0.8,
        co_high=1.4, levels=3, framerate=FPS))
    worst = _assert_chain_matches(frames, cfg, ref)
    assert worst > 40.0


def test_color_rolling_window_vs_reference_cpp(ref_harness):
    """Low fps -> pow2(2*fps)=16-column window; t=24 exercises the rolling
    eviction (img2tempMat maxImages cap, SpatialFilter.cpp:63-89)."""
    fps = 8.0
    t, h, w = 24, 96, 128
    frames = realistic_clip(t, h, w, fps, seed=24)
    ref = run_reference(ref_harness, "color", frames, fps=fps, levels=3,
                        amplification=60.0, co_low=0.4, co_high=1.2)
    cfg = ProcessorConfig(magnification=MagnificationParams(
        mode=MagnificationMode.COLOR, amplification=60.0, co_low=0.4,
        co_high=1.2, levels=3, framerate=fps))
    _assert_chain_matches(frames, cfg, ref)


def test_phase_cutoff_change_vs_reference_cpp(ref_harness):
    """Mid-clip cutoff change drives the reference's Butterworth recompute +
    filter reset + prior-pyramid rebuild (MagnifyCore.hpp:243-254); the JAX
    chain's reset_filters/dyn-coefficient path must match the REAL C++."""
    t, h, w = 28, 120, 160
    change_at = 14
    frames = realistic_clip(t, h, w, FPS, seed=28)
    ref = run_reference(ref_harness, "phase", frames, levels=3,
                        amplification=30.0, co_wavelength=40.0, co_low=0.5,
                        co_high=3.0, change=(change_at, 1.0, 5.0))
    chain = MagnificationChain()
    worst = 99.0
    for i, f in enumerate(frames):
        lo, hi = (0.5, 3.0) if i < change_at else (1.0, 5.0)
        cfg = ProcessorConfig(magnification=MagnificationParams(
            mode=MagnificationMode.PHASE, amplification=30.0,
            co_wavelength=40.0, co_low=lo, co_high=hi, levels=3,
            framerate=FPS))
        got, _ = chain.process(f, cfg)
        if i == 0:
            continue
        p = psnr_u8(np.asarray(got), ref[i])
        worst = min(worst, p)
        assert p > 40.0, f"frame {i}: PSNR {p:.1f} dB (change at {change_at})"
    assert worst > 40.0


def test_laplace_blend_change_vs_reference_cpp(ref_harness):
    """Laplace blend-coefficient change mid-clip: NO state reset in the
    reference (the IIR just runs with new blends) — the chain must do the
    same, not a structural reset."""
    t, h, w = 24, 96, 128
    change_at = 12
    frames = realistic_clip(t, h, w, FPS, seed=29)
    ref = run_reference(ref_harness, "laplace", frames, levels=3,
                        amplification=20.0, co_wavelength=500.0, co_low=0.138,
                        co_high=0.466, chrom=0.1, change=(change_at, 0.05, 0.3))
    chain = MagnificationChain()
    for i, f in enumerate(frames):
        lo, hi = (0.138, 0.466) if i < change_at else (0.05, 0.3)
        cfg = ProcessorConfig(magnification=MagnificationParams(
            mode=MagnificationMode.LAPLACE, amplification=20.0,
            co_wavelength=500.0, co_low=lo, co_high=hi, chrom_attenuation=0.1,
            levels=3, framerate=FPS))
        got, _ = chain.process(f, cfg)
        if i == 0:
            continue
        p = psnr_u8(np.asarray(got), ref[i])
        assert p > 40.0, f"frame {i}: PSNR {p:.1f} dB (change at {change_at})"


def test_color_grayscale_input_vs_reference_cpp(ref_harness):
    """Color mode on GRAYSCALE input (the reference processes 1-channel in
    magnifyColor, MagnifyCore.hpp:163-206)."""
    t, h, w = 20, 96, 128
    frames = realistic_clip(t, h, w, FPS, seed=30)
    ref = run_reference(ref_harness, "color", frames, levels=3,
                        amplification=60.0, co_low=0.8, co_high=1.4,
                        grayscale=True)
    cfg = ProcessorConfig(grayscale=True, magnification=MagnificationParams(
        mode=MagnificationMode.COLOR, amplification=60.0, co_low=0.8,
        co_high=1.4, levels=3, framerate=FPS))
    _assert_chain_matches(frames, cfg, ref)


# ---------------------------------------------------------------- full chain

def test_phase_full_chain_roi_downscale_vs_reference_cpp(ref_harness):
    t, h, w = 24, 240, 320
    frames = realistic_clip(t, h, w, FPS, seed=25)
    roi = (0.1, 0.08, 0.75, 0.8)
    ref = run_reference(ref_harness, "phase", frames, levels=3,
                        amplification=30.0, co_wavelength=40.0, co_low=0.5,
                        co_high=3.0, roi=roi, downscale=2)
    import dataclasses
    pre = dataclasses.replace(PreprocessParams(downscale=2), roi_enabled=True,
                              roi_x=roi[0], roi_y=roi[1], roi_w=roi[2],
                              roi_h=roi[3])
    cfg = ProcessorConfig(preprocess=pre, magnification=MagnificationParams(
        mode=MagnificationMode.PHASE, amplification=30.0, co_wavelength=40.0,
        co_low=0.5, co_high=3.0, levels=3, framerate=FPS))
    _assert_chain_matches(frames, cfg, ref)


def test_laplace_full_chain_grayscale_roi_vs_reference_cpp(ref_harness):
    t, h, w = 24, 240, 320
    frames = realistic_clip(t, h, w, FPS, seed=26)
    roi = (0.05, 0.05, 0.85, 0.85)
    ref = run_reference(ref_harness, "laplace", frames, levels=3,
                        amplification=20.0, co_wavelength=500.0, co_low=0.138,
                        co_high=0.466, roi=roi, downscale=2, grayscale=True)
    import dataclasses
    pre = dataclasses.replace(PreprocessParams(downscale=2), roi_enabled=True,
                              roi_x=roi[0], roi_y=roi[1], roi_w=roi[2],
                              roi_h=roi[3])
    cfg = ProcessorConfig(grayscale=True, preprocess=pre,
                          magnification=MagnificationParams(
                              mode=MagnificationMode.LAPLACE, amplification=20.0,
                              co_wavelength=500.0, co_low=0.138, co_high=0.466,
                              chrom_attenuation=0.0, levels=3, framerate=FPS))
    _assert_chain_matches(frames, cfg, ref)


def test_level_clamp_small_frames_vs_reference_cpp(ref_harness):
    """Requested levels exceed what the frame supports: both sides must clamp
    via calculateMaxLevels (MagnificationProcessor.cpp:31-34; halve while both
    dims >5, SpatialFilter.cpp:5-11)."""
    t, h, w = 16, 40, 56  # max_levels = 3; request 8
    frames = realistic_clip(t, h, w, FPS, seed=32)
    ref = run_reference(ref_harness, "laplace", frames, levels=8,
                        amplification=20.0, co_wavelength=500.0, co_low=0.138,
                        co_high=0.466)
    cfg = ProcessorConfig(magnification=MagnificationParams(
        mode=MagnificationMode.LAPLACE, amplification=20.0, co_wavelength=500.0,
        co_low=0.138, co_high=0.466, levels=8, framerate=FPS))
    _assert_chain_matches(frames, cfg, ref)


def test_downscale8_full_chain_vs_reference_cpp(ref_harness):
    """The extreme 1/8 resolution lever (PreprocessProcessor.cpp:36-40) end to
    end: 240x320 -> 30x40, phase mode."""
    t, h, w = 16, 240, 320
    frames = realistic_clip(t, h, w, FPS, seed=33)
    ref = run_reference(ref_harness, "phase", frames, levels=2,
                        amplification=30.0, co_wavelength=40.0, co_low=0.5,
                        co_high=3.0, downscale=8)
    cfg = ProcessorConfig(
        preprocess=PreprocessParams(downscale=8),
        magnification=MagnificationParams(
            mode=MagnificationMode.PHASE, amplification=30.0,
            co_wavelength=40.0, co_low=0.5, co_high=3.0, levels=2,
            framerate=FPS))
    _assert_chain_matches(frames, cfg, ref)


# ------------------------------------------------- the proxy oracle itself

@pytest.mark.parametrize("mode,params", [
    ("phase", dict(amplification=30.0, co_wavelength=40.0, lo=0.5, hi=3.0,
                   levels=3, fps=FPS)),
    ("laplace", dict(amplification=20.0, co_wavelength=500.0, co_low=0.138,
                     co_high=0.466, chrom=0.1, levels=3)),
    ("color", dict(amplification=80.0, lo=0.8, hi=1.4, levels=3, fps=FPS)),
])
def test_python_oracle_matches_reference_cpp(ref_harness, mode, params):
    """tests/oracle.py (the proxy every other fidelity test compares against)
    must itself reproduce the real C++ core. A shared misreading of, e.g., the
    CCS mask quirk (TemporalFilter.cpp:59-80) would fail here."""
    t, h, w = 20, 120, 160
    frames = realistic_clip(t, h, w, FPS, seed=27)
    if mode == "phase":
        ref = run_reference(ref_harness, mode, frames, levels=3,
                            amplification=30.0, co_wavelength=40.0, co_low=0.5,
                            co_high=3.0)
    elif mode == "laplace":
        ref = run_reference(ref_harness, mode, frames, levels=3,
                            amplification=20.0, co_wavelength=500.0,
                            co_low=0.138, co_high=0.466, chrom=0.1)
    else:
        ref = run_reference(ref_harness, mode, frames, levels=3,
                            amplification=80.0, co_low=0.8, co_high=1.4)
    oracle = ChainOracle(mode, **params)
    worst = 99.0
    for i, f in enumerate(frames):
        out, _ = oracle.step(f)
        if out.ndim == 2:
            out = out[..., None]
        if i == 0:
            continue
        p = psnr_u8(out, ref[i])
        worst = min(worst, p)
        assert p > 45.0, f"{mode} frame {i}: oracle vs C++ PSNR {p:.1f} dB"
    assert worst > 45.0
