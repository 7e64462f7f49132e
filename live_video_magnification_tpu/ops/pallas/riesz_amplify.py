"""Fused Riesz normalize + amplify as a Pallas TPU kernel.

The per-level tail of the phase pipeline (RieszPyramid.cpp:114-144):

    ab  = gauss13(amplitude)
    n_c = gauss13(change_c * amplitude) / ab
    n_s = gauss13(change_s * amplitude) / ab
    mag  = sqrt(n_c^2 + n_s^2);  mag2 = min(mag * alpha, threshold)
    pair = nan_to_zero((riesz_r * n_c + riesz_i * n_s) / mag)
    out  = lowpass * cos(mag2) - pair * sin(mag2)

Unfused this materializes ~8 full-resolution intermediates; the kernel runs the
three separable 13-tap blurs and all the element-wise math on one VMEM-resident
strip (halo 6) and writes only the amplified lowpass. Inputs are reflect-101
pre-padded host-side so the kernel needs no boundary conditionals.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from live_video_magnification_tpu.ops.kernels import AMPLITUDE_BLUR_KERNEL_1D

_HALO = 6
_TILE = 32
# DMA strips are sublane-aligned (multiples of 8 rows): one strip height for all
# six inputs, starting at the tile origin; blur math uses rows [0, tile+12),
# pointwise math rows [HALO, HALO+tile).
_STRIP = -(-(_TILE + 2 * _HALO) // 8) * 8
MIN_FUSED_DIM = 16


def _blur13(strip, rows: int, cols: int, r0: int, c0: int):
    """Separable 13-tap Gaussian on a VMEM strip: out[y, x] corresponds to
    strip[r0 + y, c0 + x]; needs +-6 valid context around that window."""
    taps = [float(v) for v in AMPLITUDE_BLUR_KERNEL_1D]
    rowpass = None
    for k, w in enumerate(taps):
        term = strip[r0 - 6 : r0 + rows + 6, c0 - 6 + k : c0 - 6 + k + cols] * w
        rowpass = term if rowpass is None else rowpass + term
    out = None
    for k, w in enumerate(taps):
        term = rowpass[k : k + rows, :] * w
        out = term if out is None else out + term
    return out


def _kernel(scalars, amp_hbm, cc_hbm, cs_hbm, lp_hbm, rr_hbm, ri_hbm, out_ref,
            amp_v, cc_v, cs_v, lp_v, rr_v, ri_v, sems, *, tile: int, w: int):
    ti = pl.program_id(0)
    alpha = scalars[0, 0]
    threshold = scalars[0, 1]

    strips = [
        (amp_hbm, amp_v),
        (cc_hbm, cc_v),
        (cs_hbm, cs_v),
        (lp_hbm, lp_v),
        (rr_hbm, rr_v),
        (ri_hbm, ri_v),
    ]
    copies = []
    for k, (src, dst) in enumerate(strips):
        cp = pltpu.make_async_copy(src.at[pl.ds(ti * tile, _STRIP), :], dst, sems.at[k])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    amp = amp_v[:, :]
    cc = cc_v[:, :]
    cs = cs_v[:, :]

    ab = _blur13(amp, tile, w, _HALO, _HALO)
    nc = _blur13(cc * amp, tile, w, _HALO, _HALO) / ab
    ns = _blur13(cs * amp, tile, w, _HALO, _HALO) / ab

    mag = jnp.sqrt(nc * nc + ns * ns)
    mag2 = jnp.minimum(mag * alpha, threshold)  # cv::THRESH_TRUNC
    lp = lp_v[_HALO : _HALO + tile, _HALO : _HALO + w]
    rr = rr_v[_HALO : _HALO + tile, _HALO : _HALO + w]
    ri = ri_v[_HALO : _HALO + tile, _HALO : _HALO + w]
    pair = (rr * nc + ri * ns) / mag
    pair = jnp.where(jnp.isnan(pair), 0.0, pair)
    out_ref[:, :] = lp * jnp.cos(mag2) - pair * jnp.sin(mag2)


@functools.partial(jax.jit, static_argnames=("w_out", "interpret"))
def _run(scalars, amp_p, cc_p, cs_p, lp_p, rr_p, ri_p, w_out: int,
         interpret: bool = False):
    hp, wp = amp_p.shape
    h = hp - 2 * _HALO - (_STRIP - (_TILE + 2 * _HALO))
    w = w_out
    tile = _TILE
    n_tiles = h // tile

    kernel = functools.partial(_kernel, tile=tile, w=w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0)),
        scratch_shapes=[pltpu.VMEM((_STRIP, wp), jnp.float32)] * 6
        + [pltpu.SemaphoreType.DMA((6,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, amp_p, cc_p, cs_p, lp_p, rr_p, ri_p)


def riesz_amplify_fused(
    amplitude: jnp.ndarray,
    change_c: jnp.ndarray,
    change_s: jnp.ndarray,
    lowpass: jnp.ndarray,
    riesz_r: jnp.ndarray,
    riesz_i: jnp.ndarray,
    alpha,
    threshold,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused normalize+amplify for one [H, W] level. Matches
    normalize_phase + amplify_level of ops/riesz.py."""
    h, w = amplitude.shape
    assert min(h, w) >= MIN_FUSED_DIM
    h_pad = -(-h // _TILE) * _TILE

    wp_aligned = -(-(w + 2 * _HALO) // 128) * 128

    def prep(x):
        p = jnp.pad(x, ((_HALO, _HALO), (_HALO, _HALO)), mode="reflect")
        slack = (h_pad - h) + (_STRIP - (_TILE + 2 * _HALO))
        return jnp.pad(p, ((0, slack), (0, wp_aligned - (w + 2 * _HALO))), mode="edge")

    scalars = jnp.stack([jnp.asarray(alpha, jnp.float32),
                         jnp.asarray(threshold, jnp.float32)]).reshape(1, 2)
    out = _run(scalars, prep(amplitude), prep(change_c), prep(change_s),
               prep(lowpass), prep(riesz_r), prep(riesz_i), w, interpret=interpret)
    return out[:h, :w]
