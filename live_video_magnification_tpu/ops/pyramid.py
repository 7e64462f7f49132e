"""Gaussian / Laplacian pyramid ops matching OpenCV pyrDown/pyrUp numerics.

Reproduces the reference's pyramid builders (reference
src/processing/magnification/SpatialFilter.cpp:5-61):
  * pyr_down  == cv::pyrDown  (5-tap binomial blur, reflect-101, decimate by 2,
    ceil-halved output size)
  * pyr_up    == cv::pyrUp    (zero-inject upsample, 4x-scaled kernel, reflect-101
    in the *source* domain, optional odd output size)
  * build_gauss_pyr / build_laplace_pyr / collapse_laplace_pyr /
    reconstruct_from_gauss_level mirror buildGaussPyrFromImg /
    buildLaplacePyrFromImg / buildImgFromLaplacePyr / buildImgFromGaussPyr.

Arrays are [..., H, W] (channels on leading dims). All shapes are static: the
pyramid is a plain Python list of arrays, one per level, which jit treats as a
pytree with a static level count.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from live_video_magnification_tpu.ops.conv import (
    reflect_pad,
    sep_correlate2d,
    _shifted_taps_sum,
)
from live_video_magnification_tpu.ops.kernels import PYR_KERNEL_1D
from live_video_magnification_tpu.ops.resize import resize_linear


def calculate_max_levels(size_hw: Tuple[int, int]) -> int:
    """Max pyramid levels: halve (ceil) while both dims exceed 5 (SpatialFilter.cpp:5-11)."""
    h, w = size_hw
    if w > 5 and h > 5:
        return 1 + calculate_max_levels(((1 + h) // 2, (1 + w) // 2))
    return 0


def pyramid_sizes(h: int, w: int, levels: int) -> List[Tuple[int, int]]:
    """Sizes of `levels` successive pyrDown outputs of an (h, w) image."""
    sizes = []
    for _ in range(levels):
        h, w = (h + 1) // 2, (w + 1) // 2
        sizes.append((h, w))
    return sizes


def pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown: binomial 5x5 blur (reflect-101) then take every even pixel."""
    blurred = sep_correlate2d(x, PYR_KERNEL_1D, PYR_KERNEL_1D)
    return blurred[..., ::2, ::2]


def _upsample_axis(x: jnp.ndarray, axis: int, out_len: int) -> jnp.ndarray:
    """One axis of cv::pyrUp: zero-inject, correlate with the 2x-scaled 5-tap
    kernel, crop to out_len.

    Border handling reflects (101) in the *upsampled* domain: the zero-injected
    signal Z (src[i] at Z[2i], length 2*src_len) reflects about its ends, so
    Z[-2] -> src[1] on the left but Z[2*src_len] -> Z[2*src_len-2] = src[-1] on
    the right (verified against cv2.pyrUp). Implemented polyphase: even outputs
    use taps {k0, k2, k4}, odd outputs {k1, k3}, so no zero-multiplies reach the
    VPU.
    """
    taps2 = (2.0 * PYR_KERNEL_1D).tolist()  # per-axis factor 2 (4x total for 2-D)
    src_len = x.shape[axis]
    left = lax.slice_in_dim(x, 1, 2, axis=axis)  # Z[-2] == Z[2] == src[1]
    right = lax.slice_in_dim(x, src_len - 1, src_len, axis=axis)  # Z[2n] == Z[2n-2] == src[n-1]
    padded = jnp.concatenate([left, x, right], axis=axis)
    # Even output 2i: t0*srcE[i-1] + t2*srcE[i] + t4*srcE[i+1]  (srcE = border-extended)
    # Odd  output 2i+1: t1*srcE[i] + t3*srcE[i+1]
    n_even = (out_len + 1) // 2
    n_odd = out_len // 2
    even = _shifted_taps_sum(padded, [taps2[0], taps2[2], taps2[4]], axis=axis, out_len=n_even)
    odd = _shifted_taps_sum(
        lax.slice_in_dim(padded, 1, padded.shape[axis], axis=axis),
        [taps2[1], taps2[3]],
        axis=axis,
        out_len=n_odd,
    )
    # Interleave even/odd phases along `axis`.
    if n_even != n_odd:  # odd out_len: pad odd phase with one dummy row, drop after
        odd = jnp.concatenate([odd, lax.slice_in_dim(odd, n_odd - 1, n_odd, axis=axis)], axis=axis)
    stacked = jnp.stack([even, odd], axis=axis + 1 if axis >= 0 else x.ndim + axis + 1)
    new_shape = list(even.shape)
    ax = axis if axis >= 0 else x.ndim + axis
    new_shape[ax] = 2 * n_even
    out = stacked.reshape(new_shape)
    return lax.slice_in_dim(out, 0, out_len, axis=ax)


def pyr_up(x: jnp.ndarray, out_hw: Tuple[int, int] | None = None) -> jnp.ndarray:
    """cv::pyrUp to out_hw (default exactly 2x). out_hw may be (2h, 2w) or odd (2h-1 etc.)."""
    h2, w2 = x.shape[-2], x.shape[-1]
    if out_hw is None:
        out_hw = (2 * h2, 2 * w2)
    out = _upsample_axis(x, x.ndim - 1, out_hw[1])
    out = _upsample_axis(out, out.ndim - 2, out_hw[0])
    return out


def build_gauss_pyr(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """`levels` successive pyrDowns; the original is NOT stored (SpatialFilter.cpp:13-23)."""
    pyr = []
    cur = img
    for _ in range(levels):
        cur = pyr_down(cur)
        pyr.append(cur)
    return pyr


def build_laplace_pyr(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """levels difference images + coarsest residual => levels+1 arrays (SpatialFilter.cpp:25-38)."""
    pyr = []
    cur = img
    for _ in range(levels):
        down = pyr_down(cur)
        up = pyr_up(down, (cur.shape[-2], cur.shape[-1]))
        pyr.append(cur - up)
        cur = down
    pyr.append(cur)
    return pyr


def collapse_laplace_pyr(pyr: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Residual up + add per level, finest last (SpatialFilter.cpp:52-61)."""
    cur = pyr[-1]
    for lvl in range(len(pyr) - 2, -1, -1):
        cur = pyr_up(cur, (pyr[lvl].shape[-2], pyr[lvl].shape[-1])) + pyr[lvl]
    return cur


def reconstruct_from_gauss_level(
    level_img: jnp.ndarray, levels: int, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """`levels` default (exact 2x) pyrUps, then bilinear resize to absorb rounding
    drift (SpatialFilter.cpp:40-50; cv::resize default INTER_LINEAR)."""
    cur = level_img
    for _ in range(levels):
        cur = pyr_up(cur)
    return resize_linear(cur, out_hw)
