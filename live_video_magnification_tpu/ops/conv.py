"""2-D correlation with OpenCV BORDER_REFLECT_101 semantics.

Reproduces cv::filter2D / cv::sepFilter2D as used by the reference's pyramid and
Riesz code (reference src/processing/magnification/RieszPyramid.cpp:66-78,215-238,
304-325 and SpatialFilter.cpp:13-61 — OpenCV filter2D performs *correlation*, no
kernel flip, anchor at center, BORDER_REFLECT_101 = reflect without repeating the
edge pixel, which is exactly numpy/jnp pad(mode="reflect")).

TPU-first design notes:
  * Canonical array layout is [..., H, W]: W lands on the 128-lane minor dimension
    and channels/batch ride the leading dims, instead of OpenCV's interleaved HWC.
  * Small fixed kernels are implemented as shifted multiply-adds on the VPU (XLA
    fuses the whole stencil into one pass over the padded array) rather than
    conv_general_dilated, which would round tiny depthwise convs up to MXU tiles.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp
from jax import lax

# Dense-2D kernel implementation: "slices" (shifted multiply-adds, relies on XLA
# elementwise fusion) or "conv" (lax.conv_general_dilated, XLA's native conv
# path). Selected per-platform at trace time; override with LVMT_CONV_IMPL.
_CONV_IMPL = os.environ.get("LVMT_CONV_IMPL", "auto")


def set_conv_impl(impl: str) -> None:
    global _CONV_IMPL
    assert impl in ("auto", "slices", "conv")
    _CONV_IMPL = impl


def _dense_impl() -> str:
    if _CONV_IMPL != "auto":
        return _CONV_IMPL
    # "slices" everywhere: measured on the axon v5e stack, conv_general_dilated
    # at 4K crashed the TPU worker ("kernel fault"), while the shifted-add chain
    # fuses cleanly; the Pallas kernels carry the hot 9x9 stencils instead.
    return "slices"


def reflect_pad(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 padding of the trailing two dims (gfedcb|abcdefgh|gfedcba)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
    return jnp.pad(x, pad, mode="reflect")


def _shifted_taps_sum(padded: jnp.ndarray, taps, axis: int, out_len: int) -> jnp.ndarray:
    """Valid correlation along `axis` of a padded array via shifted multiply-adds."""
    acc = None
    for k, w in enumerate(taps):
        if w == 0.0:
            continue
        sl = lax.slice_in_dim(padded, k, k + out_len, axis=axis)
        term = sl * jnp.asarray(w, padded.dtype)
        acc = term if acc is None else acc + term
    if acc is None:
        acc = jnp.zeros_like(lax.slice_in_dim(padded, 0, out_len, axis=axis))
    return acc


def sep_correlate2d(x: jnp.ndarray, kr, kc) -> jnp.ndarray:
    """Separable correlation: kr along rows (H), kc along columns (W), reflect-101.

    kr/kc are 1-D python/numpy tap lists (static). x is [..., H, W].
    """
    kr = np.asarray(kr, dtype=np.float64)
    kc = np.asarray(kc, dtype=np.float64)
    h, w = x.shape[-2], x.shape[-1]
    rh, rw = len(kr) // 2, len(kc) // 2
    out = reflect_pad(x, rh, rw)
    out = _shifted_taps_sum(out, kc.tolist(), axis=out.ndim - 1, out_len=w)
    out = _shifted_taps_sum(out, kr.tolist(), axis=out.ndim - 2, out_len=h)
    return out


def _correlate2d_slices(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    kh, kw = k.shape
    rh, rw = kh // 2, kw // 2
    h, w = x.shape[-2], x.shape[-1]
    padded = reflect_pad(x, rh, rw)
    acc = None
    for i in range(kh):
        row = lax.slice_in_dim(padded, i, i + h, axis=padded.ndim - 2)
        term = _shifted_taps_sum(row, k[i].tolist(), axis=row.ndim - 1, out_len=w)
        acc = term if acc is None else acc + term
    return acc


def _correlate2d_conv(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    kh, kw = k.shape
    rh, rw = kh // 2, kw // 2
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    padded = reflect_pad(x, rh, rw).reshape((-1, 1, h + 2 * rh, w + 2 * rw))
    rhs = jnp.asarray(k, x.dtype).reshape(1, 1, kh, kw)
    out = lax.conv_general_dilated(
        padded, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (h, w))


def correlate2d(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """Dense 2-D correlation with a static [kh, kw] kernel, reflect-101 border."""
    k = np.asarray(kernel, dtype=np.float64)
    if _dense_impl() == "conv":
        return _correlate2d_conv(x, k)
    return _correlate2d_slices(x, k)


def correlate_rows(x: jnp.ndarray, taps) -> jnp.ndarray:
    """1-D correlation along W (a horizontal 1xK cv::filter2D), reflect-101."""
    taps = np.asarray(taps, dtype=np.float64)
    r = len(taps) // 2
    w = x.shape[-1]
    padded = reflect_pad(x, 0, r)
    return _shifted_taps_sum(padded, taps.tolist(), axis=x.ndim - 1, out_len=w)


def correlate_cols(x: jnp.ndarray, taps) -> jnp.ndarray:
    """1-D correlation along H (a vertical Kx1 cv::filter2D), reflect-101."""
    taps = np.asarray(taps, dtype=np.float64)
    r = len(taps) // 2
    h = x.shape[-2]
    padded = reflect_pad(x, r, 0)
    return _shifted_taps_sum(padded, taps.tolist(), axis=x.ndim - 2, out_len=h)
