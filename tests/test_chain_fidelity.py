"""Full-chain fidelity at realistic scale (VERDICT round-1 weak #6).

The WHOLE chain — ROI crop + INTER_AREA downscale + grayscale + magnification
— against the cv2/scipy ChainOracle on >=480p footage with subpixel motion and
multiple temporal frequencies, over >=60 frames, at the BASELINE.md PSNR
>= 40 dB bound. The ChainOracle proxy is itself validated against the COMPILED
reference math core (g++ + system OpenCV over the unmodified reference sources)
in tests/test_reference_cpp_parity.py, which also asserts the JAX chain
directly against the real C++ outputs.
"""

import numpy as np
import pytest

from live_video_magnification_tpu.models.chain import MagnificationChain
from live_video_magnification_tpu.models.params import (
    MagnificationMode,
    MagnificationParams,
    PreprocessParams,
    ProcessorConfig,
    motion_hz_to_blend,
)

from oracle import ChainOracle, psnr_u8, realistic_clip

FPS = 30.0


def _run_chain(frames, cfg, warmup=1):
    chain = MagnificationChain()
    outs = []
    for f in frames:
        p, _o = chain.process(f, cfg)
        outs.append(np.asarray(p))
    return outs


@pytest.mark.parametrize("use_roi", [False, True])
def test_phase_full_chain_480p(use_roi):
    """Flagship mode at 480p over 60 frames, with and without ROI+downscale."""
    t, h, w = 60, 480, 640
    frames = realistic_clip(t, h, w, FPS, seed=11)
    roi = (0.1, 0.08, 0.75, 0.8) if use_roi else None
    downscale = 2 if use_roi else 1
    levels, alpha, wavelength, lo, hi = 4, 30.0, 40.0, 0.5, 3.0

    pre = PreprocessParams(downscale=downscale)
    if roi:
        import dataclasses

        pre = dataclasses.replace(pre, roi_enabled=True, roi_x=roi[0], roi_y=roi[1],
                                  roi_w=roi[2], roi_h=roi[3])
    cfg = ProcessorConfig(preprocess=pre, magnification=MagnificationParams(
        mode=MagnificationMode.PHASE, amplification=alpha, co_wavelength=wavelength,
        co_low=lo, co_high=hi, levels=levels, framerate=FPS,
    ))
    oracle = ChainOracle("phase", amplification=alpha, co_wavelength=wavelength,
                         lo=lo, hi=hi, levels=levels, fps=FPS)

    chain = MagnificationChain()
    worst = 99.0
    for i, f in enumerate(frames):
        ref, _ = oracle.step(f, roi=roi, downscale=downscale)
        got, _ = chain.process(f, cfg)
        if i == 0:
            continue  # init frame: both passthrough
        p = psnr_u8(np.asarray(got), ref)
        worst = min(worst, p)
        assert p > 40.0, f"frame {i}: PSNR {p:.1f} dB"
    assert worst > 40.0


def test_laplace_full_chain_480p_grayscale_roi():
    t, h, w = 60, 480, 640
    frames = realistic_clip(t, h, w, FPS, seed=12)
    roi = (0.05, 0.05, 0.85, 0.85)
    levels, alpha, lam_c, chrom = 4, 20.0, 500.0, 0.0
    co_low = motion_hz_to_blend(0.7, FPS)
    co_high = motion_hz_to_blend(3.0, FPS)

    import dataclasses

    pre = PreprocessParams(downscale=2, roi_enabled=True, roi_x=roi[0], roi_y=roi[1],
                           roi_w=roi[2], roi_h=roi[3])
    cfg = ProcessorConfig(grayscale=True, preprocess=pre,
                          magnification=MagnificationParams(
                              mode=MagnificationMode.LAPLACE, amplification=alpha,
                              co_wavelength=lam_c, co_low=co_low, co_high=co_high,
                              chrom_attenuation=chrom, levels=levels, framerate=FPS,
                          ))
    oracle = ChainOracle("laplace", amplification=alpha, co_wavelength=lam_c,
                         co_low=co_low, co_high=co_high, chrom=chrom, levels=levels)

    chain = MagnificationChain()
    for i, f in enumerate(frames):
        ref, _ = oracle.step(f, roi=roi, downscale=2, grayscale=True)
        got, _ = chain.process(f, cfg)
        got = np.asarray(got)
        if got.ndim == 3 and got.shape[2] == 1:
            got = got[..., 0]
        if i == 0:
            continue
        p = psnr_u8(got, ref)
        assert p > 40.0, f"frame {i}: PSNR {p:.1f} dB"


def test_color_full_chain_vga():
    """Color mode fills its pow2(2*fps)=64-frame rolling window over 70 frames
    at 640x480 (BASELINE config 1 geometry)."""
    t, h, w = 70, 480, 640
    frames = realistic_clip(t, h, w, FPS, seed=13)
    levels, alpha, lo, hi = 4, 80.0, 0.8, 1.4

    cfg = ProcessorConfig(magnification=MagnificationParams(
        mode=MagnificationMode.COLOR, amplification=alpha, co_low=lo, co_high=hi,
        levels=levels, framerate=FPS,
    ))
    oracle = ChainOracle("color", amplification=alpha, lo=lo, hi=hi,
                         levels=levels, fps=FPS)

    chain = MagnificationChain()
    for i, f in enumerate(frames):
        ref, _ = oracle.step(f)
        got, _ = chain.process(f, cfg)
        if i == 0:
            continue
        p = psnr_u8(np.asarray(got), ref)
        assert p > 40.0, f"frame {i}: PSNR {p:.1f} dB"
