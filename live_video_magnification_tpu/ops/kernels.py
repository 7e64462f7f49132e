"""Fixed filter-bank constants for the magnification pipelines.

The values reproduce the reference app's filters:
  * 5-tap binomial pyramid kernel — OpenCV's pyrDown/pyrUp kernel
    (used by reference src/processing/magnification/SpatialFilter.cpp:13-61).
  * Riesz band kernel [-0.2, -0.48, 0, 0.48, 0.2] and its transpose
    (reference src/processing/magnification/RieszPyramid.cpp:71-72).
  * The hard-coded 9x9 low/high-pass Riesz pyramid filters
    (reference src/processing/magnification/RieszPyramid.cpp:146-167, which takes
    them from Wadhwa et al., "Riesz Pyramids for Fast Phase-Based Video
    Magnification", ICCP 2014 supplemental pseudocode).
  * cv::getGaussianKernel-compatible Gaussian taps (used for the 13x13 sigma=3
    amplitude blur, reference RieszPyramid.cpp:110,114-127).
"""

from __future__ import annotations

import math

import numpy as np

# OpenCV pyramid kernel: outer([1,4,6,4,1]/16). pyrDown convolves with K, pyrUp with 4*K.
PYR_KERNEL_1D = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float64) / 16.0

# Riesz band filter (1x5); the horizontal pass gives the "real"/x component, the
# transposed vertical pass the "imag"/y component.
RIESZ_BAND_KERNEL = np.array([-0.2, -0.48, 0.0, 0.48, 0.2], dtype=np.float32)

# 9x9 pyramid low-pass filter (applied as 2*LP for both decimation and zero-injected
# upsampling energy compensation).
RIESZ_LOWPASS_9x9 = np.array(
    [
        [-0.0001, -0.0007, -0.0023, -0.0046, -0.0057, -0.0046, -0.0023, -0.0007, -0.0001],
        [-0.0007, -0.0030, -0.0047, -0.0025, -0.0003, -0.0025, -0.0047, -0.0030, -0.0007],
        [-0.0023, -0.0047,  0.0054,  0.0272,  0.0387,  0.0272,  0.0054, -0.0047, -0.0023],
        [-0.0046, -0.0025,  0.0272,  0.0706,  0.0910,  0.0706,  0.0272, -0.0025, -0.0046],
        [-0.0057, -0.0003,  0.0387,  0.0910,  0.1138,  0.0910,  0.0387, -0.0003, -0.0057],
        [-0.0046, -0.0025,  0.0272,  0.0706,  0.0910,  0.0706,  0.0272, -0.0025, -0.0046],
        [-0.0023, -0.0047,  0.0054,  0.0272,  0.0387,  0.0272,  0.0054, -0.0047, -0.0023],
        [-0.0007, -0.0030, -0.0047, -0.0025, -0.0003, -0.0025, -0.0047, -0.0030, -0.0007],
        [-0.0001, -0.0007, -0.0023, -0.0046, -0.0057, -0.0046, -0.0023, -0.0007, -0.0001],
    ],
    dtype=np.float32,
)

# 9x9 pyramid high-pass filter; the high-pass band undergoes the Riesz transform.
RIESZ_HIGHPASS_9x9 = np.array(
    [
        [0.0000, 0.0003, 0.0011, 0.0022, 0.0027, 0.0022, 0.0011, 0.0003, 0.0000],
        [0.0003, 0.0020, 0.0059, 0.0103, 0.0123, 0.0103, 0.0059, 0.0020, 0.0003],
        [0.0011, 0.0059, 0.0151, 0.0249, 0.0292, 0.0249, 0.0151, 0.0059, 0.0011],
        [0.0022, 0.0103, 0.0249, 0.0402, 0.0469, 0.0402, 0.0249, 0.0103, 0.0022],
        [0.0027, 0.0123, 0.0292, 0.0469, -0.9455, 0.0469, 0.0292, 0.0123, 0.0027],
        [0.0022, 0.0103, 0.0249, 0.0402, 0.0469, 0.0402, 0.0249, 0.0103, 0.0022],
        [0.0011, 0.0059, 0.0151, 0.0249, 0.0292, 0.0249, 0.0151, 0.0059, 0.0011],
        [0.0003, 0.0020, 0.0059, 0.0103, 0.0123, 0.0103, 0.0059, 0.0020, 0.0003],
        [0.0000, 0.0003, 0.0011, 0.0022, 0.0027, 0.0022, 0.0011, 0.0003, 0.0000],
    ],
    dtype=np.float32,
)


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv::getGaussianKernel(ksize, sigma): normalized exp(-(i-c)^2 / (2*sigma^2))."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    c = (ksize - 1) * 0.5
    i = np.arange(ksize, dtype=np.float64)
    k = np.exp(-((i - c) ** 2) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k


# The reference blurs amplitudes with GaussianBlur(13x13, sigma=3) and normalizes phase
# with sepFilter2D(getGaussianKernel(1 + 4*3, 3)) — the same 13-tap kernel.
AMPLITUDE_BLUR_KERNEL_1D = gaussian_kernel_1d(13, 3.0)


def next_pow2(n: int) -> int:
    """Round up to the next power of two (reference TemporalFilter.cpp:82-94)."""
    return 1 << max(0, math.ceil(math.log2(max(1, n))))
