"""Color conversions matching OpenCV as used by the reference pipelines.

  * bgr_to_lab / lab_to_bgr — cv::cvtColor COLOR_BGR2Lab / COLOR_Lab2BGR on
    CV_32F: sRGB gamma, D65 white point, L in [0,100], a/b signed. Lab is
    load-bearing in two of the three modes (reference MagnifyCore.hpp:88-90,
    217-219). OpenCV's forward path approximates the gamma curve with a spline
    table; we use the exact curve (measured u8 round-trip parity vs OpenCV:
    max |diff| = 1, PSNR ≈ 70 dB).
  * bgr_to_gray_u8 — cv::cvtColor COLOR_BGR2GRAY on CV_8U, reproducing OpenCV's
    fixed-point arithmetic bit-exactly (reference GrayscaleProcessor.cpp:7-16).
  * to_u8 — cv::Mat::convertTo(CV_8U, alpha, beta): round-half-even + saturate
    (the 255.0, 1.0/255.0 bias at reference MagnifyCore.hpp:153,202,276).

Layout: planar [C, H, W] float32 (TPU-native; W on the lane dimension), channel
order BGR to match the reference's frame model.
"""

from __future__ import annotations

import jax.numpy as jnp

_T0 = 0.008856  # CIE threshold
_T0_CBRT_SCALE = 7.787
_T0_OFFSET = 16.0 / 116.0
_L_THRESH = 903.3 * _T0  # == 7.99959...; L below this came from the linear branch


def _cbrt_fast(x: jnp.ndarray) -> jnp.ndarray:
    """x**(1/3) for x >= 0 via exponent-divide bit hack + 3 Newton steps:
    max rel err 1.6e-7 over the Lab domains (f32-roundoff class) — replaces
    exp(log(x)/3), the transcendental pair that made the color stage ~12x
    its HBM bound (round-5 roofline). x == 0 converges toward (not exactly
    to) 0 without NaN; every call site's branch guard discards that region."""
    import jax as _jax
    import numpy as _np

    i = _jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    y = _jax.lax.bitcast_convert_type(i // 3 + _np.int32(0x2A508C37),
                                      jnp.float32)
    for _ in range(3):
        y = (2.0 * y + x / (y * y)) * (1.0 / 3.0)
    return y


def _root5_fast(x: jnp.ndarray) -> jnp.ndarray:
    """x**(1/5) for x > 0, same construction (max rel err 2.2e-7)."""
    import jax as _jax
    import numpy as _np

    i = _jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    y = _jax.lax.bitcast_convert_type(i // 5 + _np.int32(0x32C82FE3),
                                      jnp.float32)
    for _ in range(3):
        y4 = (y * y) * (y * y)
        y = (4.0 * y + x / y4) * 0.2
    return y


def _fast_gamma() -> bool:
    """LVMT_FAST_GAMMA=1: Newton-root gamma/cbrt instead of pow/cbrt
    transcendentals (max rel err 2.2e-7 over the Lab domains). A RECORDED
    NEGATIVE on TPU (R5_GAMMA_AB.json: fast step 6.8 -> 7.9 ms — the v5e's
    transcendental unit evaluates pow/cbrt faster than 3 Newton steps' VPU
    divisions); also wobbles the scan==stepwise BIT identity by 1 u8 LSB
    via differing FMA contraction. Default OFF everywhere, kept as the
    documented experiment (may pay on CPU backends). Trace-time env read,
    keyed into the chain jit cache (models/chain.py)."""
    import os

    return os.environ.get("LVMT_FAST_GAMMA", "0") == "1"


def _srgb_inverse_gamma(x: jnp.ndarray) -> jnp.ndarray:
    if _fast_gamma():
        # x**2.4 == (x**12)**(1/5) exactly; base in [0.052, 1.06] so x**12
        # stays normal f32 (>= 1.7e-16)
        base = (jnp.abs(x) + 0.055) / 1.055
        b2 = base * base
        b4 = b2 * b2
        b12 = b4 * b4 * b4
        return jnp.where(x <= 0.04045, x / 12.92, _root5_fast(b12))
    return jnp.where(x <= 0.04045, x / 12.92,
                     jnp.power((jnp.abs(x) + 0.055) / 1.055, 2.4))


def _srgb_forward_gamma(x: jnp.ndarray) -> jnp.ndarray:
    if _fast_gamma():
        # x**(1/2.4) == x**(5/12) == sqrt(sqrt(cbrt(x**5))) exactly
        xp = jnp.maximum(x, 0.0)
        x5 = (xp * xp) * (xp * xp) * xp
        return jnp.where(
            x <= 0.0031308,
            12.92 * x,
            1.055 * jnp.sqrt(jnp.sqrt(_cbrt_fast(x5))) - 0.055,
        )
    return jnp.where(
        x <= 0.0031308,
        12.92 * x,
        1.055 * jnp.power(jnp.maximum(x, 0.0), 1.0 / 2.4) - 0.055,
    )


def _cie_f(t: jnp.ndarray) -> jnp.ndarray:
    cbrt = _cbrt_fast if _fast_gamma() else jnp.cbrt
    return jnp.where(t > _T0, cbrt(jnp.maximum(t, 0.0)),
                     _T0_CBRT_SCALE * t + _T0_OFFSET)


def bgr_to_lab(bgr: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] BGR float32 in [0,1] -> [3, H, W] Lab (L 0..100, a/b signed)."""
    b, g, r = bgr[0], bgr[1], bgr[2]
    r = _srgb_inverse_gamma(r)
    g = _srgb_inverse_gamma(g)
    b = _srgb_inverse_gamma(b)
    x = (0.412453 * r + 0.357580 * g + 0.180423 * b) / 0.950456
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = (0.019334 * r + 0.119193 * g + 0.950227 * b) / 1.088754
    fx, fy, fz = _cie_f(x), _cie_f(y), _cie_f(z)
    l_chan = jnp.where(y > _T0, 116.0 * fy - 16.0, 903.3 * y)
    a_chan = 500.0 * (fx - fy)
    b_chan = 200.0 * (fy - fz)
    return jnp.stack([l_chan, a_chan, b_chan])


def lab_to_bgr(lab: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] Lab float32 -> [3, H, W] BGR (unclamped, like OpenCV's f32 path)."""
    l_chan, a_chan, b_chan = lab[0], lab[1], lab[2]
    fy = (l_chan + 16.0) / 116.0
    y = jnp.where(l_chan > _L_THRESH, fy * fy * fy, l_chan / 903.3)
    fy_eff = jnp.where(l_chan > _L_THRESH, fy, _T0_CBRT_SCALE * (l_chan / 903.3) + _T0_OFFSET)
    fx = a_chan / 500.0 + fy_eff
    fz = fy_eff - b_chan / 200.0
    fx3, fz3 = fx * fx * fx, fz * fz * fz
    x = jnp.where(fx3 > _T0, fx3, (fx - _T0_OFFSET) / _T0_CBRT_SCALE) * 0.950456
    z = jnp.where(fz3 > _T0, fz3, (fz - _T0_OFFSET) / _T0_CBRT_SCALE) * 1.088754
    r = 3.240479 * x - 1.537150 * y - 0.498535 * z
    g = -0.969256 * x + 1.875991 * y + 0.041556 * z
    b = 0.055648 * x - 0.204043 * y + 1.057311 * z
    return jnp.stack(
        [_srgb_forward_gamma(b), _srgb_forward_gamma(g), _srgb_forward_gamma(r)]
    )


def bgr_to_gray_u8(bgr_u8: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] uint8 BGR -> [1, H, W] uint8 gray, bit-exact with OpenCV CV_8U.

    OpenCV 5: (R*9798 + G*19235 + B*3735 + (1<<14)) >> 15 with 15-bit fixed
    point (coefficients round(0.299/0.587/0.114 * 2^15)); verified exhaustively
    against cv2.cvtColor on random u8 inputs.
    """
    b = bgr_u8[0].astype(jnp.int32)
    g = bgr_u8[1].astype(jnp.int32)
    r = bgr_u8[2].astype(jnp.int32)
    y = (r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15
    return y.astype(jnp.uint8)[None]


def to_u8(x: jnp.ndarray, alpha: float | jnp.ndarray = 1.0, beta: float | jnp.ndarray = 0.0) -> jnp.ndarray:
    """cv::Mat::convertTo(CV_8U, alpha, beta): rint (half-to-even) then saturate."""
    v = jnp.rint(x * alpha + beta)
    return jnp.clip(v, 0.0, 255.0).astype(jnp.uint8)


def u8_to_unit_f32(x_u8: jnp.ndarray) -> jnp.ndarray:
    """convertTo(CV_32F, 1/255): u8 -> [0,1] float32."""
    return x_u8.astype(jnp.float32) * jnp.float32(1.0 / 255.0)


def bgr_to_gray(bgr: jnp.ndarray) -> jnp.ndarray:
    """Float BGR -> gray (cv::cvtColor CV_32F weights), [3,H,W] -> [1,H,W]."""
    return (0.114 * bgr[0] + 0.587 * bgr[1] + 0.299 * bgr[2])[None]
