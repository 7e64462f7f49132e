"""Fused Riesz level build as a Pallas TPU kernel.

Per pyramid level the reference issues four full-resolution convolutions over
HBM-resident arrays (RieszPyramid.cpp:215-238): hp = octave * HP9, band pair
r/i = hp * (1x5/5x1), lp = octave * 2*LP9, then decimation. Composed naively
that is ~9 HBM passes over octave-sized arrays; this kernel performs ONE pass:
each grid step DMAs a strip of the (reflect-101 pre-padded) octave into VMEM,
computes the 9x9 high-pass (with a 2-px apron for the band kernels), both band
convolutions, and the full-res low-pass rows, writing hp / r / i / lp tiles
straight out. Decimation happens outside (Mosaic cannot lower strided slices).

Mosaic constraints honored here:
  * DMA strips are (8, 128)-aligned (rows rounded to _STRIP, widths to 128);
  * stencil accumulation goes through VMEM scratch refs — accumulating 81
    multiply-adds as pure values lets the scheduler keep every term live and
    blows the 16 MB scoped-vmem budget at 4K.

Numerics are identical to ops/riesz.py (same f32 taps, same order); the
equivalence test runs this kernel in interpreter mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from live_video_magnification_tpu.ops.kernels import (
    RIESZ_BAND_KERNEL,
    RIESZ_HIGHPASS_9x9,
    RIESZ_LOWPASS_9x9,
)

_HALO = 6   # 4 (9x9) + 2 (band apron)
_TILE = 32  # output rows per grid step (kept small: 4 full-width output blocks + stencil temps must fit scoped vmem at 4K)
_STRIP = -(-(_TILE + 2 * _HALO) // 8) * 8  # sublane-aligned DMA strip height
MIN_FUSED_DIM = 16  # below this, reflect-101 haloing can't pad; use the jnp ops


def _stencil_9x9_into(out_ref, src, k: np.ndarray, rows: int, cols: int,
                      r0: int, c0: int) -> None:
    """out_ref[:rows, :cols] = sum_{a,b} k[a,b] * src[r0+y+a, c0+x+b].

    Row-by-row accumulation through the ref bounds live temporaries to one
    9-term column pass instead of all 81.
    """
    for a in range(9):
        acc = None
        for b in range(9):
            w = float(k[a, b])
            if w == 0.0:
                continue
            term = src[r0 + a : r0 + a + rows, c0 + b : c0 + b + cols] * w
            acc = term if acc is None else acc + term
        if a == 0:
            out_ref[0:rows, 0:cols] = acc
        else:
            out_ref[0:rows, 0:cols] = out_ref[0:rows, 0:cols] + acc


def _kernel(p_hbm, hp_ref, r_ref, i_ref, lp_ref, oct_vmem, hp_scratch, sem,
            *, tile: int, w: int):
    ti = pl.program_id(0)
    copy = pltpu.make_async_copy(p_hbm.at[pl.ds(ti * tile, _STRIP), :], oct_vmem, sem)
    copy.start()
    copy.wait()
    oct_ = oct_vmem[:, :]

    # hp with a 2-px apron each side (rows [-2, tile+2), cols [-2, w+2)):
    # output row y reads padded rows starting at y + HALO - 4.
    _stencil_9x9_into(hp_scratch, oct_, RIESZ_HIGHPASS_9x9,
                      tile + 4, w + 4, _HALO - 4 - 2, _HALO - 4 - 2)
    hp_ext = hp_scratch[:, :]
    hp_ref[:, :] = hp_ext[2 : tile + 2, 2 : w + 2]

    # band kernels on hp (1x5 horizontal -> r, 5x1 vertical -> i)
    band = [float(v) for v in RIESZ_BAND_KERNEL]
    racc = None
    iacc = None
    for k_i, wgt in enumerate(band):
        if wgt == 0.0:
            continue
        rterm = hp_ext[2 : tile + 2, k_i : k_i + w] * wgt
        iterm = hp_ext[k_i : k_i + tile, 2 : w + 2] * wgt
        racc = rterm if racc is None else racc + rterm
        iacc = iterm if iacc is None else iacc + iterm
    r_ref[:, :] = racc
    i_ref[:, :] = iacc

    # Full-resolution low-pass rows straight into the output block.
    _stencil_9x9_into(lp_ref, oct_, 2.0 * RIESZ_LOWPASS_9x9,
                      tile, w, _HALO - 4, _HALO - 4)


@functools.partial(jax.jit, static_argnames=("w_out", "interpret"))
def _run(padded: jnp.ndarray, w_out: int, interpret: bool = False):
    hp_pad, wp_aligned = padded.shape
    h_pad = hp_pad - 2 * _HALO - (_STRIP - (_TILE + 2 * _HALO))
    w_pad = w_out
    tile = _TILE
    n_tiles = h_pad // tile

    kernel = functools.partial(_kernel, tile=tile, w=w_pad)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32) for _ in range(4)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec((tile, w_pad), lambda i: (i, 0)) for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((_STRIP, wp_aligned), jnp.float32),
            pltpu.VMEM((tile + 4, w_pad + 4), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
    )(padded)


def riesz_build_level_fused(
    octave: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused (hp, band_r, band_i, lp_decimated) for one [H, W] f32 octave.

    Matches _band_build + low-pass/subsample of ops/riesz.py exactly.
    """
    h, w = octave.shape
    assert min(h, w) >= MIN_FUSED_DIM, "use ops/riesz.py for tiny levels"
    h_pad = -(-h // _TILE) * _TILE  # ceil to tile multiple
    w_pad = w + (w % 2)             # even width so decimation tiles evenly
    wp_aligned = -(-(w_pad + 2 * _HALO) // 128) * 128  # lane-aligned DMA width
    padded = jnp.pad(octave, ((_HALO, _HALO), (_HALO, _HALO)), mode="reflect")
    slack = (h_pad - h) + (_STRIP - (_TILE + 2 * _HALO))
    padded = jnp.pad(
        padded, ((0, slack), (0, wp_aligned - (w + 2 * _HALO))), mode="edge"
    )
    hp, r, i, lp_full = _run(padded, w_pad, interpret=interpret)
    return hp[:h, :w], r[:h, :w], i[:h, :w], lp_full[:h:2, :w:2]
