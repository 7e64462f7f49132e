"""9x9 stencils as MXU banded matmuls (Pallas TPU kernels).

The Riesz pyramid's 9x9 filters (reference RieszPyramid.cpp:146-167, applied at
:215-238 build and :304-325 collapse) are non-separable, so a VPU stencil pays
81 shifted multiply-adds per pixel — and on TPU every lane-dimension (W) shift
is a cross-lane relayout. Measured at 4K both the XLA shifted-slice fusion and
a VPU Pallas stencil run ~30x off VPU peak (~12 ms per conv). The MXU
formulation expresses the horizontal taps as a banded matrix product

    out[y, 128j + q] = sum_a sum_p strip[y + a, 128j + p] * B[a, p, q],
    B[a, p, q] = k[a, p - q]   when 0 <= p - q <= 8, else 0,

so each 128-lane output block is the sum over the 9 vertical taps `a` of a
(tile, 256) x (256, 128) matmul: dense, lane-aligned slices only (Mosaic cannot
lower strided slices), with the 81-tap stencil riding the systolic array. The
band is zero for p - q > 8, so alignment padding beyond the real width never
contributes.

Two entry points:

* conv9_mxu(x, k9) — plain correlate2d(x, k9), BORDER_REFLECT_101.

* lp9_inject_mxu(small, k9, out_hw) — correlate2d(zero_inject_2x(small), k9)
  without ever materializing the zero-injected array: the injection folds into
  the band (B'[., p, q] = k[., 2p - q], input read at half resolution) and the
  vertical taps split by output-row parity into two dense matmul planes,
  written interleaved as an (H/2, 2, W) block that reshapes to (H, W) for
  free. Reflect-101 of the injected array maps to reflect-101 (leading) /
  symmetric (trailing) padding of the small image (even out dims only).
  This is the collapse upsample term (RieszPyramid.cpp:304-317) at 1/4 the
  dense tap count.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE_R = 128       # dense-kernel output rows per grid step
_TILE_S = 64        # inject-kernel small rows per grid step (=> 128 out rows)
MIN_MXU_DIM = 96    # below this the VPU/XLA slices path wins


def _mxu_precision_name() -> str:
    """Matmul pass decomposition for the banded stencils, LVMT_MXU_PRECISION.
    Resolved here and threaded as a STATIC argument into the jitted _run_*
    wrappers (see _mxu_dot). Measured honestly (MXU_PRECISION_AB.json,
    2026-08-21, after fixing the stale-trace A/B): 'highest' = 6-pass f32
    (14.0 ms/4K-frame, the bit-conservative default); 'high' (bf16x3) is NOT
    supported by the Mosaic lowering (NotImplementedError); 'default' =
    1-pass bf16 multiply (9.35 ms, 44.1 dB / max u8 delta 140 vs highest) —
    behaviorally the same as the explicit LVMT_MXU_DTYPE=bf16 fast mode,
    which is the documented knob."""
    import os

    return os.environ.get("LVMT_MXU_PRECISION", "highest").lower()


def _mxu_bf16() -> bool:
    """LVMT_MXU_DTYPE=bf16 casts the banded-matmul OPERANDS to bfloat16
    (f32 accumulate) — the MXU's native rate. Off by default: the cast costs
    up to ~1 u8 LSB vs the f32 path (taps and pixel values at 2^-8 relative),
    so it is an opt-in fast mode; see docs/ROOFLINE.md for the measured
    fps/PSNR trade. The hybrid modes (LVMT_MXU_DTYPE=hybrid / hybrid-band)
    resolve per LEVEL/OP in ops/riesz.py and pass `bf16` explicitly."""
    import os

    return os.environ.get("LVMT_MXU_DTYPE", "f32") == "bf16"


def _resolve_bf16(bf16) -> bool:
    return _mxu_bf16() if bf16 is None else bool(bf16)


def _np_dtype(name: str):
    """'f32'|'bf16' -> dtype for kernel out_shapes (LVMT_PYR_IO: pyramid
    planes at half HBM width in the fast mode; the kernels always ACCUMULATE
    f32 and cast only on the final store)."""
    return jnp.bfloat16 if name == "bf16" else jnp.float32


def _mxu_dot(a, b, bf16: bool = False, prec: str = "highest"):
    """One banded-stencil matmul term: f32 (default) or bf16-operand.

    bf16 AND prec must be threaded as STATIC arguments from the public entry
    points — the _run_* wrappers are module-level jitted functions, so an env
    read at kernel-trace time would be frozen into their jit cache (the first
    precision A/B measured a false null exactly this way)."""
    if bf16:
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    precision = getattr(jax.lax.Precision, prec.upper(), jax.lax.Precision.HIGHEST)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


# --------------------------------------------------------------------------- banks


def _dense_bank(k: np.ndarray) -> np.ndarray:
    """B[a, p, q] = k[a, p - q] for 0 <= p - q <= 8. Shape (9, 256, 128)."""
    bank = np.zeros((9, 2 * _LANES, _LANES), np.float32)
    for a in range(9):
        for q in range(_LANES):
            for b in range(9):
                bank[a, q + b, q] = k[a, b]
    return bank


def _inject_bank(k: np.ndarray, parity: int) -> np.ndarray:
    """B'[ai, p, q] = k[a, 2p - q] for 0 <= 2p - q <= 8, a = parity, parity+2, …

    256-wide output blocks (so the half-rate input slab start 128j stays
    lane-aligned). Shape (len(taps), 256, 256).
    """
    a_taps = list(range(parity, 9, 2))
    bank = np.zeros((len(a_taps), 2 * _LANES, 2 * _LANES), np.float32)
    for ai, a in enumerate(a_taps):
        for q in range(2 * _LANES):
            for p in range(2 * _LANES):
                b = 2 * p - q
                if 0 <= b <= 8:
                    bank[ai, p, q] = k[a, b]
    return bank


def _pad_reflect_symmetric2(x: jnp.ndarray) -> jnp.ndarray:
    """Pad 2 on each side of both dims: leading edges reflect-101, trailing
    edges symmetric — exactly the small-image image of the zero-injected
    array's reflect-101 halo (see module docstring)."""
    top = x[2:0:-1, :]
    bot = x[-1:-3:-1, :]
    x = jnp.concatenate([top, x, bot], axis=0)
    left = x[:, 2:0:-1]
    right = x[:, -1:-3:-1]
    return jnp.concatenate([left, x, right], axis=1)


def _conv9_variant(bf16: bool) -> str:
    """LVMT_CONV9 in {auto, dense, svd}: banded-stencil formulation.

    'dense': 9 banded matmuls per block, one per vertical tap.
    'svd': the 9x9 kernels are EXACTLY rank 5 (4 zero singular values), so
    conv = sum of 5 separable col⊗row terms — 5 banded matmuls per block plus
    5x9 VPU sublane multiply-adds for the column taps.
    'auto' (default): svd for f32 operands, dense for bf16 — measured at 4K
    (R4 svd A/B, same session): f32 11.62 vs 13.23 ms full step (the MXU-
    rate-bound stages shrink 0.56x and the VPU taps hide under them); bf16
    8.94 vs 8.01 (the 4x-faster matmuls make the VPU taps the bottleneck)."""
    import os

    v = os.environ.get("LVMT_CONV9", "auto")
    if v == "auto":
        return "dense" if bf16 else "svd"
    return v


def _svd_factors(k: np.ndarray):
    """Exact separable factorization k = sum_i col_i ⊗ row_i (f64 SVD).
    Returns (col [r, 9], row [r, 9]); r == 5 for the Riesz kernels."""
    u, s, vt = np.linalg.svd(np.asarray(k, np.float64))
    r = int(np.sum(s > s[0] * 1e-12))
    col = (u[:, :r] * s[:r]).T
    row = vt[:r]
    return np.ascontiguousarray(col), np.ascontiguousarray(row)


def _svd_row_bank(row: np.ndarray) -> np.ndarray:
    """B[i, q+b, q] = row[i, b]. Shape (r, 256, 128)."""
    r = row.shape[0]
    bank = np.zeros((r, 2 * _LANES, _LANES), np.float32)
    for i in range(r):
        for q in range(_LANES):
            for b in range(9):
                bank[i, q + b, q] = row[i, b]
    return bank


# --------------------------------------------------------------------------- dense


def _dense_kernel(x_hbm, bank_ref, out_ref, strip, sem, *, n_blocks: int, bf16: bool, prec: str):
    ti = pl.program_id(0)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(ti * _TILE_R, _TILE_R + 8), :], strip, sem
    )
    cp.start()
    cp.wait()
    for j in range(n_blocks):
        acc = None
        for a in range(9):
            slab = strip[a : a + _TILE_R, j * _LANES : j * _LANES + 2 * _LANES]
            term = _mxu_dot(slab, bank_ref[a], bf16, prec)
            acc = term if acc is None else acc + term
        out_ref[:, j * _LANES : (j + 1) * _LANES] = acc.astype(out_ref.dtype)


def _dense_svd_kernel(x_hbm, bank_ref, out_ref, strip, sem,
                      *, n_blocks: int, col_taps, bf16: bool, prec: str):
    """Separable rank-r form: per block, r vertical VPU passes (9 sublane
    fmas each) + r banded matmuls, vs the dense form's 9 matmuls."""
    ti = pl.program_id(0)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(ti * _TILE_R, _TILE_R + 8), :], strip, sem
    )
    cp.start()
    cp.wait()
    r = len(col_taps)
    for j in range(n_blocks):
        cols = slice(j * _LANES, j * _LANES + 2 * _LANES)
        acc = None
        for i in range(r):
            v = None
            for a in range(9):
                t = strip[a : a + _TILE_R, cols] * col_taps[i][a]
                v = t if v is None else v + t
            term = _mxu_dot(v, bank_ref[i], bf16, prec)
            acc = term if acc is None else acc + term
        out_ref[:, j * _LANES : (j + 1) * _LANES] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "bf16", "prec", "col_taps",
                              "out_dtype")
)
def _run_dense_svd(padded: jnp.ndarray, bank: jnp.ndarray, col_taps,
                   interpret: bool = False, bf16: bool = False,
                   prec: str = "highest", out_dtype: str = "f32"):
    hp, wp = padded.shape
    n_tiles = (hp - 8) // _TILE_R
    n_blocks = wp // _LANES - 1
    r = len(col_taps)
    kernel = functools.partial(_dense_svd_kernel, n_blocks=n_blocks,
                               col_taps=col_taps, bf16=bf16, prec=prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((r, 2 * _LANES, _LANES), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE_R, n_blocks * _LANES), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_TILE_R + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * _TILE_R, n_blocks * _LANES), _np_dtype(out_dtype)
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(padded, bank)


@functools.partial(jax.jit, static_argnames=("interpret", "bf16", "prec",
                                             "out_dtype"))
def _run_dense(padded: jnp.ndarray, bank: jnp.ndarray, interpret: bool = False,
               bf16: bool = False, prec: str = "highest",
               out_dtype: str = "f32"):
    hp, wp = padded.shape
    n_tiles = (hp - 8) // _TILE_R
    n_blocks = wp // _LANES - 1
    kernel = functools.partial(_dense_kernel, n_blocks=n_blocks, bf16=bf16, prec=prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, 2 * _LANES, _LANES), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE_R, n_blocks * _LANES), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_TILE_R + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * _TILE_R, n_blocks * _LANES), _np_dtype(out_dtype)
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(padded, bank)


def conv9_mxu(x: jnp.ndarray, kernel9, interpret: bool = False,
              bf16: bool | None = None, out_dtype: str = "f32") -> jnp.ndarray:
    """correlate2d(x, kernel9) with BORDER_REFLECT_101 via MXU banded matmuls.

    x: [H, W] f32 with min(H, W) >= 9 (use MIN_MXU_DIM gating for speed).
    """
    k = np.asarray(kernel9, np.float64)
    assert k.shape == (9, 9)
    h, w = x.shape
    p = jnp.pad(x, ((4, 4), (4, 4)), mode="reflect")
    n_tiles = -(-h // _TILE_R)
    n_blocks = -(-w // _LANES)
    wp = (n_blocks + 1) * _LANES
    p = jnp.pad(
        p, ((0, n_tiles * _TILE_R + 8 - (h + 8)), (0, wp - (w + 8))), mode="edge"
    )
    use_bf16 = _resolve_bf16(bf16)
    if _conv9_variant(use_bf16) == "svd":
        col, row = _svd_factors(k)
        col_taps = tuple(tuple(float(v) for v in c) for c in col)
        bank = jnp.asarray(_svd_row_bank(row))
        out = _run_dense_svd(p, bank, col_taps, interpret=interpret,
                             bf16=use_bf16, prec=_mxu_precision_name(),
                             out_dtype=out_dtype)
    else:
        bank = jnp.asarray(_dense_bank(k))
        out = _run_dense(p, bank, interpret=interpret, bf16=use_bf16,
                         prec=_mxu_precision_name(), out_dtype=out_dtype)
    return out[:h, :w]


# --------------------------------------------------------------------------- inject


def _inject_kernel(s_hbm, e_bank, o_bank, out_ref, strip, sem, *, n_blocks: int, bf16: bool, prec: str):
    ti = pl.program_id(0)
    cp = pltpu.make_async_copy(
        s_hbm.at[pl.ds(ti * _TILE_S, _TILE_S + 8), :], strip, sem
    )
    cp.start()
    cp.wait()
    for j in range(n_blocks):
        slab_cols = slice(j * _LANES, j * _LANES + 2 * _LANES)
        acc_e = None
        for ai in range(5):  # a = 0,2,4,6,8 -> small rows y' + a/2
            slab = strip[ai : ai + _TILE_S, slab_cols]
            term = _mxu_dot(slab, e_bank[ai], bf16, prec)
            acc_e = term if acc_e is None else acc_e + term
        acc_o = None
        for ai in range(4):  # a = 1,3,5,7 -> small rows y' + (a+1)/2
            slab = strip[ai + 1 : ai + 1 + _TILE_S, slab_cols]
            term = _mxu_dot(slab, o_bank[ai], bf16, prec)
            acc_o = term if acc_o is None else acc_o + term
        out_cols = slice(j * 2 * _LANES, (j + 1) * 2 * _LANES)
        out_ref[:, 0, out_cols] = acc_e
        out_ref[:, 1, out_cols] = acc_o


@functools.partial(jax.jit, static_argnames=("interpret", "bf16", "prec"))
def _run_inject(sp: jnp.ndarray, e_bank, o_bank, interpret: bool = False,
                bf16: bool = False, prec: str = "highest"):
    hp, wp = sp.shape
    n_tiles = (hp - 8) // _TILE_S
    n_blocks = wp // _LANES - 1
    kernel = functools.partial(_inject_kernel, n_blocks=n_blocks, bf16=bf16, prec=prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((5, 2 * _LANES, 2 * _LANES), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, 2 * _LANES, 2 * _LANES), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE_S, 2, n_blocks * 2 * _LANES), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_TILE_S + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * _TILE_S, 2, n_blocks * 2 * _LANES), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sp, e_bank, o_bank)


def lp9_inject_mxu(
    small: jnp.ndarray, kernel9, out_hw: Tuple[int, int], interpret: bool = False,
    bf16: bool | None = None,
) -> jnp.ndarray:
    """correlate2d(zero_inject(small, out_hw), kernel9) with reflect-101 —
    the Riesz-collapse upsample term. out_hw must be (2*sh, 2*sw) (even dims).
    """
    k = np.asarray(kernel9, np.float64)
    assert k.shape == (9, 9)
    h, w = out_hw
    sh, sw = small.shape
    assert h == 2 * sh and w == 2 * sw, "inject kernel needs exact-2x even dims"
    sp = _pad_reflect_symmetric2(small)  # (sh + 4, sw + 4)
    n_tiles = -(-sh // _TILE_S)
    n_blocks = -(-w // (2 * _LANES))  # 256-wide output blocks
    wp = (n_blocks + 1) * _LANES
    sp = jnp.pad(
        sp,
        ((0, n_tiles * _TILE_S + 8 - (sh + 4)), (0, wp - (sw + 4))),
        mode="edge",
    )
    e_bank = jnp.asarray(_inject_bank(k, 0))
    o_bank = jnp.asarray(_inject_bank(k, 1))
    out = _run_inject(sp, e_bank, o_bank, interpret=interpret,
                      bf16=_resolve_bf16(bf16), prec=_mxu_precision_name())
    out = out[:sh, :, :w].reshape(h, w)
    return out


# --------------------------------------------------------------------------- bands


def _band_bank(taps, width: int) -> np.ndarray:
    """B[p, q] = taps[p - q] for 0 <= p - q < len(taps). Shape (2*128, 128)."""
    bank = np.zeros((2 * _LANES, _LANES), np.float32)
    for q in range(_LANES):
        for b in range(len(taps)):
            bank[q + b, q] = taps[b]
    return bank


def _band_kernel(hp_hbm, r_bank, s_bank, r_ref, i_ref, strip, sem,
                 *, bf16: bool, prec: str, n_blocks: int, taps):
    ti = pl.program_id(0)
    cp = pltpu.make_async_copy(
        hp_hbm.at[pl.ds(ti * _TILE_R, _TILE_R + 8), :], strip, sem
    )
    cp.start()
    cp.wait()
    for j in range(n_blocks):
        cols = slice(j * _LANES, j * _LANES + 2 * _LANES)
        # r: horizontal 1x5 at vertical offset 2 (the pad-2 halo). The strip
        # may arrive bf16 (LVMT_PYR_IO); accumulate f32 regardless.
        slab = strip[2 : 2 + _TILE_R, cols].astype(jnp.float32)
        r_ref[:, j * _LANES : (j + 1) * _LANES] = _mxu_dot(
            slab, r_bank[:], bf16, prec).astype(r_ref.dtype)
        # i: vertical 5x1 (cheap sublane shifts), then a +2-lane shift expressed
        # as a delta-band matmul (Mosaic cannot lane-rotate cheaply).
        acc = None
        for a in range(5):
            term = strip[a : a + _TILE_R, cols].astype(jnp.float32) * taps[a]
            acc = term if acc is None else acc + term
        i_ref[:, j * _LANES : (j + 1) * _LANES] = _mxu_dot(
            acc, s_bank[:], bf16, prec).astype(i_ref.dtype)


@functools.partial(jax.jit, static_argnames=("taps", "interpret", "bf16",
                                             "prec", "out_dtype"))
def _run_band(padded: jnp.ndarray, taps, interpret: bool = False,
              bf16: bool = False, prec: str = "highest",
              out_dtype: str = "f32"):
    hp, wp = padded.shape
    n_tiles = (hp - 8) // _TILE_R
    n_blocks = wp // _LANES - 1
    kernel = functools.partial(_band_kernel, n_blocks=n_blocks, taps=taps, bf16=bf16, prec=prec)
    r_bank = jnp.asarray(_band_bank(list(taps), 5))
    s_bank = jnp.asarray(_band_bank([0.0, 0.0, 1.0, 0.0, 0.0], 5))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2 * _LANES, _LANES), lambda i: (0, 0)),
            pl.BlockSpec((2 * _LANES, _LANES), lambda i: (0, 0)),
        ],
        out_specs=tuple(
            pl.BlockSpec((_TILE_R, n_blocks * _LANES), lambda i: (i, 0))
            for _ in range(2)
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE_R + 8, wp), padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_sd = jax.ShapeDtypeStruct((n_tiles * _TILE_R, n_blocks * _LANES),
                                  _np_dtype(out_dtype))
    return pl.pallas_call(
        kernel,
        out_shape=(out_sd, out_sd),
        grid_spec=grid_spec,
        interpret=interpret,
    )(padded, r_bank, s_bank)


def band5_mxu(
    hp: jnp.ndarray, taps, interpret: bool = False, bf16: bool | None = None,
    out_dtype: str = "f32",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(correlate_rows(hp, taps), correlate_cols(hp, taps)) — the Riesz band
    pair (RieszPyramid.cpp:66-78) — reflect-101, via MXU band matmuls."""
    taps = tuple(float(v) for v in np.asarray(taps, np.float64))
    assert len(taps) == 5
    h, w = hp.shape
    p = jnp.pad(hp, ((2, 2), (2, 2)), mode="reflect")
    n_tiles = -(-h // _TILE_R)
    n_blocks = -(-w // _LANES)
    wp = (n_blocks + 1) * _LANES
    p = jnp.pad(
        p, ((0, n_tiles * _TILE_R + 8 - (h + 4)), (0, wp - (w + 4))), mode="edge"
    )
    r, i = _run_band(p, taps, interpret=interpret, bf16=_resolve_bf16(bf16),
                     prec=_mxu_precision_name(), out_dtype=out_dtype)
    return r[:h, :w], i[:h, :w]


# --------------------------------------------------------------------------- decimate


def _dec_bank(k: np.ndarray, parity: int) -> np.ndarray:
    """B[ai, p, q] = k[a, p - 2q] for 0 <= p - 2q <= 8, a = parity, parity+2, …
    Decimated output: col x' = 128j + q reads input col 256j + p. Shape
    (len(taps), 384, 128)."""
    a_taps = list(range(parity, 9, 2))
    bank = np.zeros((len(a_taps), 3 * _LANES, _LANES), np.float32)
    for ai, a in enumerate(a_taps):
        for q in range(_LANES):
            for b in range(9):
                bank[ai, 2 * q + b, q] = k[a, b]
    return bank


def _dec_kernel(pe_hbm, po_hbm, e_bank, o_bank, out_ref, strip_e, strip_o, sems,
                *, n_blocks: int, bf16: bool, prec: str):
    ti = pl.program_id(0)
    cp0 = pltpu.make_async_copy(
        pe_hbm.at[pl.ds(ti * _TILE_R, _TILE_R + 8), :], strip_e, sems.at[0]
    )
    cp1 = pltpu.make_async_copy(
        po_hbm.at[pl.ds(ti * _TILE_R, _TILE_R + 8), :], strip_o, sems.at[1]
    )
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()
    for j in range(n_blocks):
        cols = slice(j * 2 * _LANES, j * 2 * _LANES + 3 * _LANES)
        acc = None
        for ai in range(5):  # a = 0,2,4,6,8 -> even plane rows y' + a/2
            term = _mxu_dot(strip_e[ai : ai + _TILE_R, cols], e_bank[ai], bf16, prec)
            acc = term if acc is None else acc + term
        for ai in range(4):  # a = 1,3,5,7 -> odd plane rows y' + (a-1)/2
            term = _mxu_dot(strip_o[ai : ai + _TILE_R, cols], o_bank[ai], bf16, prec)
            acc = acc + term
        out_ref[:, j * _LANES : (j + 1) * _LANES] = acc


def _dec_svd_bank(row: np.ndarray) -> np.ndarray:
    """B[i, p, q] = row[i, p - 2q] for 0 <= p - 2q <= 8. Shape (r, 384, 128)."""
    r = row.shape[0]
    bank = np.zeros((r, 3 * _LANES, _LANES), np.float32)
    for i in range(r):
        for q in range(_LANES):
            for b in range(9):
                bank[i, 2 * q + b, q] = row[i, b]
    return bank


def _dec_svd_kernel(pe_hbm, po_hbm, bank_ref, out_ref, strip_e, strip_o, sems,
                    *, n_blocks: int, col_taps, bf16: bool, prec: str):
    """Separable rank-r decimate: the vertical taps mirror _dec_kernel's
    parity-plane indexing exactly (even a -> strip_e[a/2], odd a ->
    strip_o[(a-1)/2]); one banded matmul per rank."""
    ti = pl.program_id(0)
    cp0 = pltpu.make_async_copy(
        pe_hbm.at[pl.ds(ti * _TILE_R, _TILE_R + 8), :], strip_e, sems.at[0]
    )
    cp1 = pltpu.make_async_copy(
        po_hbm.at[pl.ds(ti * _TILE_R, _TILE_R + 8), :], strip_o, sems.at[1]
    )
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()
    r = len(col_taps)
    for j in range(n_blocks):
        cols = slice(j * 2 * _LANES, j * 2 * _LANES + 3 * _LANES)
        acc = None
        for i in range(r):
            v = None
            for ai in range(5):      # a = 0,2,4,6,8
                t = strip_e[ai : ai + _TILE_R, cols] * col_taps[i][2 * ai]
                v = t if v is None else v + t
            for ai in range(4):      # a = 1,3,5,7
                v = v + (strip_o[ai : ai + _TILE_R, cols]
                         * col_taps[i][2 * ai + 1])
            term = _mxu_dot(v, bank_ref[i], bf16, prec)
            acc = term if acc is None else acc + term
        out_ref[:, j * _LANES : (j + 1) * _LANES] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "bf16", "prec", "col_taps")
)
def _run_dec_svd(pe: jnp.ndarray, po: jnp.ndarray, bank, col_taps,
                 interpret: bool = False, bf16: bool = False,
                 prec: str = "highest"):
    hp, wp = pe.shape
    n_tiles = (hp - 8) // _TILE_R
    n_blocks = (wp - _LANES) // (2 * _LANES)
    r = len(col_taps)
    kernel = functools.partial(_dec_svd_kernel, n_blocks=n_blocks,
                               col_taps=col_taps, bf16=bf16, prec=prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((r, 3 * _LANES, _LANES), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE_R, n_blocks * _LANES), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_TILE_R + 8, wp), jnp.float32),
            pltpu.VMEM((_TILE_R + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * _TILE_R, n_blocks * _LANES), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pe, po, bank)


@functools.partial(jax.jit, static_argnames=("interpret", "bf16", "prec"))
def _run_dec(pe: jnp.ndarray, po: jnp.ndarray, e_bank, o_bank,
             interpret: bool = False, bf16: bool = False, prec: str = "highest"):
    hp, wp = pe.shape
    n_tiles = (hp - 8) // _TILE_R
    n_blocks = (wp - _LANES) // (2 * _LANES)
    kernel = functools.partial(_dec_kernel, n_blocks=n_blocks, bf16=bf16, prec=prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((5, 3 * _LANES, _LANES), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, 3 * _LANES, _LANES), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE_R, n_blocks * _LANES), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_TILE_R + 8, wp), jnp.float32),
            pltpu.VMEM((_TILE_R + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * _TILE_R, n_blocks * _LANES), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pe, po, e_bank, o_bank)


def lp9_decimate_mxu(
    x: jnp.ndarray, kernel9, interpret: bool = False, bf16: bool | None = None
) -> jnp.ndarray:
    """correlate2d(x, kernel9)[::2, ::2] — the pyramid low-pass + even-pixel
    decimation (RieszPyramid.cpp:254-278) — computed only at the decimated
    sites (1/4 the dense tap count), reflect-101, odd dims supported.

    The stride-2 vertical taps are made dense by pre-splitting the padded
    input into row-parity planes; the stride-2 horizontal taps fold into the
    band matrix (B[p, q] = k[., p - 2q])."""
    k = np.asarray(kernel9, np.float64)
    assert k.shape == (9, 9)
    h, w = x.shape
    h2, w2 = -(-h // 2), -(-w // 2)
    p = jnp.pad(x, ((4, 4), (4, 4)), mode="reflect")
    n_tiles = -(-h2 // _TILE_R)
    n_blocks = -(-w2 // _LANES)
    # Plane rows needed: y' + 4 for y' < n_tiles*128 => n_tiles*128 + 8 per plane.
    rows_need = 2 * (n_tiles * _TILE_R + 8)
    wp = 2 * n_blocks * _LANES + _LANES  # slab start 256j, width 384
    p = jnp.pad(p, ((0, rows_need - (h + 8)), (0, wp - (w + 8))), mode="edge")
    pe, po = p[0::2], p[1::2]
    use_bf16 = _resolve_bf16(bf16)
    if _conv9_variant(use_bf16) == "svd":
        col, row = _svd_factors(k)
        col_taps = tuple(tuple(float(v) for v in c) for c in col)
        bank = jnp.asarray(_dec_svd_bank(row))
        out = _run_dec_svd(pe, po, bank, col_taps, interpret=interpret,
                           bf16=use_bf16, prec=_mxu_precision_name())
    else:
        e_bank = jnp.asarray(_dec_bank(k, 0))
        o_bank = jnp.asarray(_dec_bank(k, 1))
        out = _run_dec(pe, po, e_bank, o_bank, interpret=interpret,
                       bf16=use_bf16, prec=_mxu_precision_name())
    return out[:h2, :w2]
