"""Image resize matching cv::resize (INTER_LINEAR / INTER_AREA) as matmuls.

The reference uses:
  * cv::resize(..., INTER_AREA) for the 1/2 / 1/4 / 1/8 preprocess downscale
    (reference src/processing/PreprocessProcessor.cpp:37-41);
  * cv::resize(..., default INTER_LINEAR) to absorb pyrUp rounding drift in the
    Gaussian reconstruction (reference SpatialFilter.cpp:48).

Resampling is separable, so each resize is two small matmuls
(out = R @ img @ C^T) — an MXU-friendly formulation whose weight matrices are
built host-side at trace time from the static shapes, bit-matching OpenCV's
sample positions: INTER_LINEAR uses fx = (x + 0.5) * scale - 0.5 with clamped
edges; INTER_AREA (shrink) uses per-cell overlap / scale weights (exact box
average for integer factors).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=None)
def resize_matrix(src_len: int, dst_len: int, kind: str) -> np.ndarray:
    """[dst_len, src_len] row-stochastic resampling matrix ('linear' or 'area')."""
    m = np.zeros((dst_len, src_len), dtype=np.float64)
    if src_len == dst_len:
        np.fill_diagonal(m, 1.0)
        return m.astype(np.float32)
    scale = src_len / dst_len
    if kind == "linear":
        for x in range(dst_len):
            fx = (x + 0.5) * scale - 0.5
            sx = int(np.floor(fx))
            fx -= sx
            if sx < 0:
                sx, fx = 0, 0.0
            if sx >= src_len - 1:
                sx, fx = src_len - 2, 1.0
            if src_len == 1:
                m[x, 0] = 1.0
            else:
                m[x, sx] = 1.0 - fx
                m[x, sx + 1] = fx
    elif kind == "area":
        # Shrink-only area average: weight = overlap([j, j+1], [x*scale, (x+1)*scale)) / scale.
        for x in range(dst_len):
            fsx1 = x * scale
            fsx2 = fsx1 + scale
            cell = 1.0 / scale
            j0 = int(np.floor(fsx1))
            j1 = min(int(np.ceil(fsx2)), src_len)
            for j in range(j0, j1):
                overlap = min(j + 1, fsx2) - max(j, fsx1)
                if overlap > 0:
                    m[x, j] = overlap * cell
    else:
        raise ValueError(f"unknown resize kind {kind!r}")
    return m.astype(np.float32)


def _apply(x: jnp.ndarray, out_hw: Tuple[int, int], kind: str) -> jnp.ndarray:
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    r = jnp.asarray(resize_matrix(h, oh, kind), dtype=x.dtype)
    c = jnp.asarray(resize_matrix(w, ow, kind), dtype=x.dtype)
    out = jnp.einsum("oh,...hw->...ow", r, x, precision=lax.Precision.HIGHEST)
    out = jnp.einsum("...ow,pw->...op", out, c, precision=lax.Precision.HIGHEST)
    return out


def resize_linear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv::resize INTER_LINEAR on [..., H, W]."""
    return _apply(x, out_hw, "linear")


def resize_area(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv::resize INTER_AREA (shrinking) on [..., H, W].

    Integer shrink factors (the 1/2 / 1/4 / 1/8 preprocess path) reduce to an
    exact box average, computed as a reshape-mean instead of two matmuls: the
    weight matrix is uniform 1/f per cell, so both forms are the same sum —
    the reduce is ~6x cheaper than the matmuls on the CPU host loop and fuses
    just as well on TPU.
    """
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    if (
        jnp.issubdtype(x.dtype, jnp.floating)
        and oh > 0 and ow > 0 and h % oh == 0 and w % ow == 0
    ):
        fh, fw = h // oh, w // ow
        r = x.reshape(x.shape[:-2] + (oh, fh, ow, fw))
        return r.mean(axis=(-3, -1))
    return _apply(x, out_hw, "area")


def resize_nearest_even_inject(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv::resize INTER_NEAREST to out_hw followed by zeroing all but (even, even)
    pixels — the reference Riesz collapse upsampling (RieszPyramid.cpp:280-317).

    For out dims of 2n or 2n-1, nearest mapping sends output pixel (2i, 2j) to
    source (i, j), so the composite is direct zero-injection at even coordinates.
    """
    oh, ow = out_hw
    h2, w2 = x.shape[-2], x.shape[-1]
    n_even_h, n_even_w = (oh + 1) // 2, (ow + 1) // 2
    assert n_even_h <= h2 and n_even_w <= w2, "inject target must be ~2x source"
    src = x[..., :n_even_h, :n_even_w]
    out = jnp.zeros(x.shape[:-2] + (n_even_h, 2, n_even_w, 2), dtype=x.dtype)
    out = out.at[..., :, 0, :, 0].set(src)
    out = out.reshape(x.shape[:-2] + (2 * n_even_h, 2 * n_even_w))
    return out[..., :oh, :ow]
