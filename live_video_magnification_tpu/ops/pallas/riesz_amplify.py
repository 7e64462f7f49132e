"""Fused Riesz normalize + amplify as a Pallas TPU kernel.

The per-level tail of the phase pipeline (RieszPyramid.cpp:114-144):

    ab  = gauss13(amplitude)
    n_c = gauss13(change_c * amplitude) / ab
    n_s = gauss13(change_s * amplitude) / ab
    mag  = sqrt(n_c^2 + n_s^2);  mag2 = min(mag * alpha, threshold)
    pair = nan_to_zero((riesz_r * n_c + riesz_i * n_s) / mag)
    out  = lowpass * cos(mag2) - pair * sin(mag2)

Unfused this materializes ~8 full-resolution intermediates; the kernel runs the
three separable 13-tap blurs and all the element-wise math on VMEM-resident
strips (halo 6) and writes only the amplified lowpass. Inputs are reflect-101
pre-padded host-side; DMA strips are (8, 128)-aligned and blur accumulation
goes through scratch refs to stay inside the scoped-vmem budget (see
riesz_build.py for the Mosaic constraints).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from live_video_magnification_tpu.ops.kernels import AMPLITUDE_BLUR_KERNEL_1D

_HALO = 6
_TILE = 16  # small tile: six full-width input strips must fit scoped vmem at 4K
_STRIP = -(-(_TILE + 2 * _HALO) // 8) * 8  # sublane-aligned DMA strip height
MIN_FUSED_DIM = 16

_TAPS = [float(v) for v in AMPLITUDE_BLUR_KERNEL_1D]


def _blur13_into(dst_ref, rp_ref, src, rows: int, cols: int) -> None:
    """Separable 13-tap Gaussian: dst_ref[:rows, :cols] = gauss13(src), where
    output (y, x) corresponds to src[y + 6, x + 6] (src carries a 6-px halo).
    rp_ref holds the row pass; accumulation streams tap-by-tap through the refs
    so at most one term is live at a time."""
    for k, w in enumerate(_TAPS):
        term = src[0 : rows + 12, k : k + cols] * w
        if k == 0:
            rp_ref[0 : rows + 12, 0:cols] = term
        else:
            rp_ref[0 : rows + 12, 0:cols] = rp_ref[0 : rows + 12, 0:cols] + term
    for k, w in enumerate(_TAPS):
        term = rp_ref[k : k + rows, 0:cols] * w
        if k == 0:
            dst_ref[0:rows, 0:cols] = term
        else:
            dst_ref[0:rows, 0:cols] = dst_ref[0:rows, 0:cols] + term


def _kernel(scalars, amp_hbm, cc_hbm, cs_hbm, lp_hbm, rr_hbm, ri_hbm, out_ref,
            amp_v, cc_v, cs_v, lp_v, rr_v, ri_v, rp_s, ab_s, nc_s, ns_s, sems,
            *, tile: int, w: int, preweighted: bool):
    ti = pl.program_id(0)
    alpha = scalars[0, 0]
    threshold = scalars[0, 1]

    copies = []
    for k, (src, dst) in enumerate(
        [(amp_hbm, amp_v), (cc_hbm, cc_v), (cs_hbm, cs_v),
         (lp_hbm, lp_v), (rr_hbm, rr_v), (ri_hbm, ri_v)]
    ):
        cp = pltpu.make_async_copy(src.at[pl.ds(ti * tile, _STRIP), :], dst, sems.at[k])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    amp = amp_v[:, :]

    _blur13_into(ab_s, rp_s, amp, tile, w)
    if preweighted:  # cc/cs already carry the amplitude weight
        _blur13_into(nc_s, rp_s, cc_v[:, :], tile, w)
        _blur13_into(ns_s, rp_s, cs_v[:, :], tile, w)
    else:
        _blur13_into(nc_s, rp_s, cc_v[:, :] * amp, tile, w)
        _blur13_into(ns_s, rp_s, cs_v[:, :] * amp, tile, w)

    ab = ab_s[:, :]
    nc = nc_s[:, :] / ab
    ns = ns_s[:, :] / ab

    mag = jnp.sqrt(nc * nc + ns * ns)
    mag2 = jnp.minimum(mag * alpha, threshold)  # cv::THRESH_TRUNC
    lp = lp_v[_HALO : _HALO + tile, _HALO : _HALO + w]
    rr = rr_v[_HALO : _HALO + tile, _HALO : _HALO + w]
    ri = ri_v[_HALO : _HALO + tile, _HALO : _HALO + w]
    pair = (rr * nc + ri * ns) / mag
    pair = jnp.where(jnp.isnan(pair), 0.0, pair)
    out_ref[:, :] = lp * jnp.cos(mag2) - pair * jnp.sin(mag2)


@functools.partial(jax.jit, static_argnames=("w_out", "interpret", "preweighted"))
def _run(scalars, amp_p, cc_p, cs_p, lp_p, rr_p, ri_p, w_out: int,
         interpret: bool = False, preweighted: bool = False):
    hp, wp_aligned = amp_p.shape
    h = hp - 2 * _HALO - (_STRIP - (_TILE + 2 * _HALO))
    w = w_out
    tile = _TILE
    n_tiles = h // tile

    kernel = functools.partial(_kernel, tile=tile, w=w, preweighted=preweighted)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0)),
        scratch_shapes=[pltpu.VMEM((_STRIP, wp_aligned), jnp.float32)] * 6
        + [
            pltpu.VMEM((_STRIP, w), jnp.float32),   # row-pass scratch
            pltpu.VMEM((tile, w), jnp.float32),     # blurred amplitude
            pltpu.VMEM((tile, w), jnp.float32),     # blurred weighted cos
            pltpu.VMEM((tile, w), jnp.float32),     # blurred weighted sin
            pltpu.SemaphoreType.DMA((6,)),
        ],
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
    preweighted: bool = False,
) -> jnp.ndarray:
    """Fused normalize+amplify for one [H, W] level. Matches
    normalize_phase + amplify_level of ops/riesz.py. preweighted=True means
    change_c/s already carry the amplitude factor (riesz_phase_df2_fused
    outputs)."""
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
               prep(lowpass), prep(riesz_r), prep(riesz_i), w, interpret=interpret,
               preweighted=preweighted)
    return out[:h, :w]
