"""Numeric core: pure-jnp ops matching the reference app's OpenCV semantics.

Every op here documents the reference file/lines whose behavior it reproduces so
parity can be audited. The implementations are TPU-first (static shapes,
separable convs, matmul-based resampling) — not translations.
"""

from live_video_magnification_tpu.ops.kernels import (
    PYR_KERNEL_1D,
    RIESZ_BAND_KERNEL,
    RIESZ_LOWPASS_9x9,
    RIESZ_HIGHPASS_9x9,
    gaussian_kernel_1d,
)
from live_video_magnification_tpu.ops.conv import correlate2d, sep_correlate2d
from live_video_magnification_tpu.ops.pyramid import (
    calculate_max_levels,
    pyr_down,
    pyr_up,
    build_gauss_pyr,
    build_laplace_pyr,
    collapse_laplace_pyr,
    reconstruct_from_gauss_level,
    pyramid_sizes,
)
from live_video_magnification_tpu.ops.resize import resize_linear, resize_area, resize_matrix
from live_video_magnification_tpu.ops.color import bgr_to_lab, lab_to_bgr, bgr_to_gray, to_u8
from live_video_magnification_tpu.ops.temporal import (
    iir_filter,
    ideal_bandpass_apply,
    butterworth,
    optimal_buffer_size,
)
