"""Fused Riesz level build as a Pallas TPU kernel.

Per pyramid level the reference issues four full-resolution convolutions over
HBM-resident arrays (RieszPyramid.cpp:215-238): hp = octave * HP9, band pair
r/i = hp * (1x5/5x1), lp = octave * 2*LP9, then decimation. Composed naively
that is ~9 HBM passes over the octave-sized arrays; this kernel performs ONE
pass: each grid step DMAs an (T + 12)-row strip of the (reflect-101 pre-padded)
octave into VMEM, computes the 9x9 high-pass (with a 2-row/2-col apron for the
band kernels), both band convolutions, and the 2x-decimated low-pass rows, and
writes hp / r / i / lp_sub tiles straight out — ~4 passes of traffic total.

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
_TILE = 64  # output rows per grid step (even, for 2x row decimation)
# DMA strip height must be sublane-aligned (Mosaic: multiples of 8); the strip
# carries tile + 2*HALO = 76 useful rows, rounded up to 80 with slack rows.
_STRIP = -(-(_TILE + 2 * _HALO) // 8) * 8
MIN_FUSED_DIM = 16  # below this, reflect-101 haloing can't pad; use the jnp ops


def _stencil_9x9(src, k: np.ndarray, rows: int, cols: int, r0: int, c0: int):
    """81-term shifted multiply-add over a VMEM-resident strip.

    out[y, x] = sum_{a,b} k[a, b] * src[r0 + y + a, c0 + x + b]
    """
    acc = None
    for a in range(9):
        for b in range(9):
            w = float(k[a, b])
            if w == 0.0:
                continue
            term = src[r0 + a : r0 + a + rows, c0 + b : c0 + b + cols] * w
            acc = term if acc is None else acc + term
    return acc


def _kernel(p_hbm, hp_ref, r_ref, i_ref, sub_ref, oct_vmem, sem, *, tile: int, w: int):
    ti = pl.program_id(0)
    copy = pltpu.make_async_copy(
        p_hbm.at[pl.ds(ti * tile, _STRIP), :], oct_vmem, sem
    )
    copy.start()
    copy.wait()
    oct_ = oct_vmem[:, :]

    # hp with a 2-px apron on each side: rows [-2, tile+2), cols [-2, w+2).
    # hp[y, x] (apron coords) needs oct rows (y+2-4+6=y+... ): padded P row for
    # output row y is y + HALO; 9x9 window starts at P[y + HALO - 4].
    hp_ext = _stencil_9x9(oct_, RIESZ_HIGHPASS_9x9, tile + 4, w + 4, _HALO - 4 - 2, _HALO - 4 - 2)

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

    # Full-resolution low-pass rows; 2x decimation happens outside the kernel
    # (Mosaic cannot lower strided slices — they become unsupported gathers).
    sub_ref[:, :] = _stencil_9x9(
        oct_, 2.0 * RIESZ_LOWPASS_9x9, tile, w, _HALO - 4, _HALO - 4
    )


@functools.partial(jax.jit, static_argnames=("w_out", "interpret"))
def _run(padded: jnp.ndarray, w_out: int, interpret: bool = False):
    hp_pad, wp_pad = padded.shape  # (H_pad + alignment slack, 128-aligned width)
    h_pad = hp_pad - 2 * _HALO - (_STRIP - (_TILE + 2 * _HALO))
    w_pad = w_out
    tile = _TILE
    n_tiles = h_pad // tile

    kernel = functools.partial(_kernel, tile=tile, w=w_pad)
    out_shapes = (
        jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),       # hp
        jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),       # r
        jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),       # i
        jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),       # lp (full res)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((tile, w_pad), lambda i: (i, 0)),
            pl.BlockSpec((tile, w_pad), lambda i: (i, 0)),
            pl.BlockSpec((tile, w_pad), lambda i: (i, 0)),
            pl.BlockSpec((tile, w_pad), lambda i: (i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((_STRIP, wp_pad), jnp.float32),
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
    w_pad = w + (w % 2)             # even width so column decimation tiles evenly
    # DMA'd strips must be lane-aligned: round the padded width up to 128.
    wp_aligned = -(-(w_pad + 2 * _HALO) // 128) * 128
    # reflect-101 halo; extra bottom/right padding (edge mode) only covers crop waste
    padded = jnp.pad(octave, ((_HALO, _HALO), (_HALO, _HALO)), mode="reflect")
    # bottom slack: crop waste + the DMA strip alignment overhang
    slack = (h_pad - h) + (_STRIP - (_TILE + 2 * _HALO))
    padded = jnp.pad(
        padded, ((0, slack), (0, wp_aligned - (w + 2 * _HALO))), mode="edge"
    )
    hp, r, i, lp_full = _run(padded, w_pad, interpret=interpret)
    return hp[:h, :w], r[:h, :w], i[:h, :w], lp_full[:h:2, :w:2]
