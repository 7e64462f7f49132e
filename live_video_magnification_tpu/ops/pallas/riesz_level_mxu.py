"""The whole per-level Riesz temporal tail as ONE Pallas TPU kernel.

Fuses the phase front (quaternion phase difference + amplitude,
RieszPyramid.cpp:81-111), the shared-accumulator lo/hi Butterworth DF-II
(TemporalFilter.cpp:340-351, MagnifyCore.hpp:259-264), the three 13x13
normalize blurs as MXU banded matmuls (RieszPyramid.cpp:114-127, same
formulation as riesz_amplify_mxu), and the amplify rotation (:129-144):

    in : cur lp/r/i, old lp/r/i, acc (shared phase), lo regs, hi regs  (16)
    out: amplified lowpass, acc', lo regs', hi regs'                   (11)

vs the split form's ~36 HBM plane-passes per level (XLA front writes
amplitude/wc/ws + 10 state planes, the blur kernel re-reads 6), this kernel
moves 16+3 reads + 11 writes. The front is recomputed on the halo (6 rows
AND the 256-wide column slab per 128-lane output block: ~3x redundancy on
~50 cheap pointwise flops/px); reflect-101 padding of the INPUTS equals
padding of the products because every front op is pointwise in (row, col).
cur lp/r/i are ALSO fed as lane-aligned BlockSpec planes for the
element-wise amplify (Mosaic slices must start lane-aligned; the padded
strips sit at a +6 column offset). State outputs are written in PADDED
column coordinates (width wp) and the host slices the 6-col halo off.

The grid is 2-D (row tiles x column blocks): a single-axis grid with the
column loop unrolled in-kernel compiled at 1080p but killed the axon
relay's compile helper at 4K width (30 unrolled blocks); per-block DMA
slabs keep the program small at any width.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from live_video_magnification_tpu.ops.kernels import AMPLITUDE_BLUR_KERNEL_1D
from live_video_magnification_tpu.ops.pallas.conv9_mxu import (
    _mxu_bf16,
    _mxu_dot,
    _mxu_precision_name,
)
from live_video_magnification_tpu.ops.pallas.riesz_phase_fused import _acos

_LANES = 128
_HALO = 6
_TILE = 64
_STRIP = _TILE + 2 * _HALO + 4   # = 80, 8-row aligned
_JBLK = 4                        # output blocks per grid step (slab 640 wide)
_TAPS = [float(v) for v in AMPLITUDE_BLUR_KERNEL_1D]
_N_STRIPS = 16  # cur(3) old(3) acc(2) lo(4) hi(4), all halo-padded


def _blur_bank() -> np.ndarray:
    bank = np.zeros((2 * _LANES, _LANES), np.float32)
    for q in range(_LANES):
        for b in range(13):
            bank[q + b, q] = _TAPS[b]
    return bank


def _kernel(scal, *refs, bf16: bool, prec: str):
    # refs: 16 hbm planes, bank, lp_a, rr_a, ri_a, 11 out refs,
    #       16 slab scratch, sems
    hbm = refs[:_N_STRIPS]
    bank_ref = refs[_N_STRIPS]
    lp_a, rr_a, ri_a = refs[_N_STRIPS + 1 : _N_STRIPS + 4]
    outs = refs[_N_STRIPS + 4 : _N_STRIPS + 15]
    strips = refs[_N_STRIPS + 15 : 2 * _N_STRIPS + 15]
    sems = refs[2 * _N_STRIPS + 15]

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    b_lo = (scal[0, 0], scal[0, 1], scal[0, 2])
    a_lo = (scal[0, 3], scal[0, 4])
    b_hi = (scal[0, 5], scal[0, 6], scal[0, 7])
    a_hi = (scal[0, 8], scal[0, 9])
    rebuild = scal[0, 10]
    alpha = scal[0, 11]
    threshold = scal[0, 12]

    # ---- double-buffered DMA: start step s+1's 16 slab copies before
    # computing step s (the wait-all-then-compute form serialized the 16
    # copies against compute and lost 18.0 vs 12.1 ms — docs/ROOFLINE.md)
    slab_w = _JBLK * _LANES + _LANES
    nj = pl.num_programs(1)
    nsteps = pl.num_programs(0) * nj
    step = ti * nj + tj
    buf = jax.lax.rem(step, 2)

    def copies_for(s, b):
        i = jax.lax.div(s, nj)
        j = jax.lax.rem(s, nj)
        return [
            pltpu.make_async_copy(
                hbm[k].at[pl.ds(i * _TILE, _STRIP),
                          pl.ds(j * _JBLK * _LANES, slab_w)],
                strips[k].at[b], sems.at[b, k],
            )
            for k in range(_N_STRIPS)
        ]

    @pl.when(step == 0)
    def _prologue():
        for cp in copies_for(step, buf):
            cp.start()

    @pl.when(step + 1 < nsteps)
    def _prefetch_next():
        for cp in copies_for(step + 1, 1 - buf):
            cp.start()

    for cp in copies_for(step, buf):
        cp.wait()

    def rd(k):
        return strips[k][buf]

    # ---- front: pointwise on the whole haloed strip ----
    do_rebuild = rebuild > 0.5
    c_lp, c_r, c_i = rd(0), rd(1), rd(2)
    o_lp = jnp.where(do_rebuild, c_lp, rd(3))
    o_r = jnp.where(do_rebuild, c_r, rd(4))
    o_i = jnp.where(do_rebuild, c_i, rd(5))
    st = [jnp.where(do_rebuild, 0.0, rd(6 + k)) for k in range(10)]

    q_real = c_lp * o_lp + c_r * o_r + c_i * o_i
    qx = o_r * (-c_lp) + c_r * o_lp
    qy = o_i * (-c_lp) + c_i * o_lp
    xy_sq = qx * qx + qy * qy
    q_amp = jnp.sqrt(q_real * q_real + xy_sq)
    ratio = q_real / q_amp
    safe = _acos(jnp.clip(ratio, -1.0, 1.0))
    phi = jnp.where(ratio < -1.0, -1.0, jnp.where(ratio > 1.0, 1.0, safe))
    xyn = jnp.sqrt(xy_sq)
    pd_c = qx / xyn * phi
    pd_s = qy / xyn * phi
    pd_c = jnp.where(jnp.isnan(pd_c), 0.0, pd_c)
    pd_s = jnp.where(jnp.isnan(pd_s), 0.0, pd_s)
    amplitude = jnp.sqrt(q_amp)

    acc_c = st[0] + pd_c
    acc_s = st[1] + pd_s

    def df2(r0_c, r0_s, r1_c, r1_s, b, a):
        res_c = acc_c * b[0] + r0_c
        res_s = acc_s * b[0] + r0_s
        n_r0_c = acc_c * b[1] + r1_c - res_c * a[0]
        n_r0_s = acc_s * b[1] + r1_s - res_s * a[0]
        n_r1_c = acc_c * b[2] - res_c * a[1]
        n_r1_s = acc_s * b[2] - res_s * a[1]
        return res_c, res_s, (n_r0_c, n_r0_s, n_r1_c, n_r1_s)

    lo_res_c, lo_res_s, lo_out = df2(*st[2:6], b_lo, a_lo)
    hi_res_c, hi_res_s, hi_out = df2(*st[6:10], b_hi, a_hi)

    amp_sl = amplitude
    wcp_sl = (hi_res_c - lo_res_c) * amplitude
    wsp_sl = (hi_res_s - lo_res_s) * amplitude

    # state outputs: interior rows, PADDED column coordinates — this step's
    # _JBLK*128-lane slice is the slab's leading columns (the host slices the
    # 6-col halo off the assembled array)
    rows = slice(_HALO, _HALO + _TILE)
    wout = _JBLK * _LANES
    outs[1][...] = acc_c[rows, :wout]
    outs[2][...] = acc_s[rows, :wout]
    for k in range(4):
        outs[3 + k][...] = lo_out[k][rows, :wout]
        outs[7 + k][...] = hi_out[k][rows, :wout]

    # ---- blur + amplify for the _JBLK 128-lane output blocks ----
    for r in range(_JBLK):
        bcols = slice(r * _LANES, r * _LANES + 2 * _LANES)

        def vert(src):
            acc = None
            for a in range(13):
                t = src[a : a + _TILE, bcols] * _TAPS[a]
                acc = t if acc is None else acc + t
            return acc

        ba = _mxu_dot(vert(amp_sl), bank_ref[:], bf16, prec)
        bc = _mxu_dot(vert(wcp_sl), bank_ref[:], bf16, prec)
        bs = _mxu_dot(vert(wsp_sl), bank_ref[:], bf16, prec)
        nc = bc / ba
        ns = bs / ba
        mag = jnp.sqrt(nc * nc + ns * ns)
        mag2 = jnp.minimum(mag * alpha, threshold)
        ocols = slice(r * _LANES, (r + 1) * _LANES)
        pair = (rr_a[:, ocols] * nc + ri_a[:, ocols] * ns) / mag
        pair = jnp.where(jnp.isnan(pair), 0.0, pair)
        outs[0][:, ocols] = (lp_a[:, ocols] * jnp.cos(mag2)
                             - pair * jnp.sin(mag2))


@functools.partial(
    jax.jit, static_argnames=("interpret", "bf16", "prec")
)
def _run(scal, planes16, lp_a, rr_a, ri_a, interpret=False, bf16=False,
         prec="highest"):
    h_out, w_blocks = lp_a.shape      # w_blocks = nb_pad * 128
    n_tiles = h_out // _TILE
    nj = w_blocks // (_JBLK * _LANES)
    kernel = functools.partial(_kernel, bf16=bf16, prec=prec)
    bank = jnp.asarray(_blur_bank())
    blk = pl.BlockSpec((_TILE, _JBLK * _LANES), lambda i, j: (i, j))
    sd = jax.ShapeDtypeStruct((h_out, w_blocks), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles, nj),
        in_specs=[pl.BlockSpec((1, 16), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * _N_STRIPS
        + [pl.BlockSpec((2 * _LANES, _LANES), lambda i, j: (0, 0))]
        + [blk] * 3,
        out_specs=(blk,) * 11,
        scratch_shapes=[pltpu.VMEM((2, _STRIP, _JBLK * _LANES + _LANES),
                                   jnp.float32)] * _N_STRIPS
        + [pltpu.SemaphoreType.DMA((2, _N_STRIPS))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=(sd,) * 11,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, *planes16, bank, lp_a, rr_a, ri_a)


def riesz_level_mxu(
    cur_lp, cur_r, cur_i, old_lp, old_r, old_i,
    acc,                      # (acc_c, acc_s) shared accumulated phase
    lo_regs, hi_regs,         # each: (r0_c, r0_s, r1_c, r1_s)
    b_lo, a_lo, b_hi, a_hi,   # [3] coefficient arrays (a[0] == 1)
    rebuild, alpha, threshold,
    interpret: bool = False,
):
    """One fused per-level step. Returns (amplified_lowpass, acc', lo', hi')
    with acc'/lo'/hi' in the input tuple layouts. Matches the jnp composition
    phase_difference_and_amplitude + riesz_df2_step (x2, shared acc) +
    normalize_phase + amplify_level."""
    h, w = cur_lp.shape
    h_out = -(-h // _TILE) * _TILE
    n_blocks = -(-w // _LANES)
    # pad the block count so (n_blocks + 1 halo block) fills _JBLK groups
    nb_pad = -(-(n_blocks + 1) // _JBLK) * _JBLK
    w_blocks = nb_pad * _LANES
    wp = w_blocks + _LANES               # DMA slabs reach 512*tj + 640

    def prep(x):
        p = jnp.pad(x, ((_HALO, _HALO), (_HALO, _HALO)), mode="reflect")
        return jnp.pad(
            p,
            ((0, (h_out + _STRIP - _TILE) - (h + 2 * _HALO)),
             (0, wp - (w + 2 * _HALO))),
            mode="edge",
        )

    def prep_ew(x):
        return jnp.pad(x, ((0, h_out - h), (0, w_blocks - w)), mode="edge")

    planes16 = tuple(
        prep(x) for x in (cur_lp, cur_r, cur_i, old_lp, old_r, old_i,
                          acc[0], acc[1], *lo_regs, *hi_regs)
    )
    scal = jnp.concatenate([
        jnp.asarray(b_lo, jnp.float32),
        jnp.asarray(a_lo, jnp.float32)[1:3],
        jnp.asarray(b_hi, jnp.float32),
        jnp.asarray(a_hi, jnp.float32)[1:3],
        jnp.asarray(rebuild, jnp.float32).reshape(1),
        jnp.asarray(alpha, jnp.float32).reshape(1),
        jnp.asarray(threshold, jnp.float32).reshape(1),
        jnp.zeros((3,), jnp.float32),
    ]).reshape(1, 16)
    out = _run(scal, planes16, prep_ew(cur_lp), prep_ew(cur_r),
               prep_ew(cur_i), interpret=interpret, bf16=_mxu_bf16(),
               prec=_mxu_precision_name())
    amplified = out[0][:h, :w]
    state = [x[:h, _HALO : _HALO + w] for x in out[1:]]
    return (amplified, (state[0], state[1]),
            tuple(state[2 + k] for k in range(4)),
            tuple(state[6 + k] for k in range(4)))
