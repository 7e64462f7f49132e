"""Fused phase-difference + DF-II filtering for one Riesz level (Pallas, VPU).

The per-level temporal front of the phase pipeline
(RieszPyramid.cpp:81-111 computePhaseDifferenceAndAmplitude +
TemporalFilter.cpp:340-351 DF-II for the lo AND hi filters + the
normalize pre-products of :114-127):

    old      = rebuild ? cur : old                  (MagnifyCore.hpp:243-254)
    state_in = rebuild ? 0 : state_in
    q        = cur * conj(old)       (quaternion product)
    phi      = clamped_arccos(q_real/|q|);  pd = orientation * phi (NaN->0)
    amplitude = sqrt(|q|)
    for F in (lo, hi):  phase += pd;  DF-II registers advance;  res_F
    wc = (res_hi - res_lo).cos * amplitude          (blur inputs of normalize)
    ws = (res_hi - res_lo).sin * amplitude

Everything is element-wise (the 13x13 blurs stay in riesz_amplify_fused, which
accepts these pre-weighted products), but unfused XLA materializes a dozen
full-resolution intermediates between the small fusions it chooses — measured
7.0 ms of the 15.2 ms 4K frame (tools/microbench.py). One VMEM-resident pass
reads the 18 input planes and writes the 15 outputs at the HBM roofline.

Layout: whole-width row strips (lane dim = padded W, multiple of 128), plain
BlockSpec pipelining (no manual DMA), grid over row tiles. Every plane is a
SEPARATE ref — stacking them first would materialize an extra ~1.2 GB of HBM
traffic per 4K frame (measured: the stacked form was SLOWER than unfused).
Scalar parameters (b/a coefficient pairs + the rebuild flag) ride SMEM.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8   # in+out blocks x double-buffering must fit scoped VMEM at 4K width
MIN_FUSED_DIM = 16

# input/output plane orders (all [H, W] f32)
_N_IN = 18   # cur lp/r/i, old lp/r/i, lo(phase_c, phase_s, r0_c, r0_s, r1_c, r1_s), hi(...)
_N_OUT = 15  # amplitude, wc, ws, lo', hi'


def _acos(x):
    """arccos for |x| <= 1 from Mosaic-supported primitives (no acos lowering):
    Abramowitz & Stegun 4.4.45, acos(x) = sqrt(1-x)*poly(x) for x in [0,1]
    mirrored via acos(-x) = pi - acos(x). Abs error ~1e-6 rad in f32 — the
    filtered phase is later scaled by alpha <= ~200, so ~2e-4 max, far below
    one u8 LSB of output. Used in interpret mode too so the equivalence tests
    cover the exact deployed math."""
    ax = jnp.abs(x)
    p = (((((((-0.0012624911 * ax + 0.0066700901) * ax - 0.0170881256) * ax
             + 0.0308918810) * ax - 0.0501743046) * ax + 0.0889789874) * ax
          - 0.2145988016) * ax + 1.5707963050)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0.0, np.float32(np.pi) - r, r)


def _kernel(scal, *refs):
    # scal: [1, 13] SMEM — b_lo0..2, a_lo1..2, b_hi0..2, a_hi1..2, rebuild, pad
    x = refs[:_N_IN]
    o = refs[_N_IN:]
    b_lo = (scal[0, 0], scal[0, 1], scal[0, 2])
    a_lo = (scal[0, 3], scal[0, 4])
    b_hi = (scal[0, 5], scal[0, 6], scal[0, 7])
    a_hi = (scal[0, 8], scal[0, 9])
    rebuild = scal[0, 10]

    c_lp, c_r, c_i = x[0][...], x[1][...], x[2][...]
    # exact selection (an arithmetic blend would turn inf state into NaN)
    do_rebuild = rebuild > 0.5
    o_lp = jnp.where(do_rebuild, c_lp, x[3][...])
    o_r = jnp.where(do_rebuild, c_r, x[4][...])
    o_i = jnp.where(do_rebuild, c_i, x[5][...])

    st = [jnp.where(do_rebuild, 0.0, x[6 + k][...]) for k in range(12)]

    q_real = c_lp * o_lp + c_r * o_r + c_i * o_i
    qx = o_r * (-c_lp) + c_r * o_lp
    qy = o_i * (-c_lp) + c_i * o_lp
    xy_sq = qx * qx + qy * qy
    q_amp = jnp.sqrt(q_real * q_real + xy_sq)
    ratio = q_real / q_amp
    # the reference's clamped arcCos quirk: out-of-range maps to +-1.0
    safe = _acos(jnp.clip(ratio, -1.0, 1.0))
    phi = jnp.where(ratio < -1.0, -1.0, jnp.where(ratio > 1.0, 1.0, safe))
    xyn = jnp.sqrt(xy_sq)
    pd_c = qx / xyn * phi
    pd_s = qy / xyn * phi
    pd_c = jnp.where(jnp.isnan(pd_c), 0.0, pd_c)
    pd_s = jnp.where(jnp.isnan(pd_s), 0.0, pd_s)
    amplitude = jnp.sqrt(q_amp)

    def df2(phase_c, phase_s, r0_c, r0_s, r1_c, r1_s, b, a):
        phase_c = phase_c + pd_c
        phase_s = phase_s + pd_s
        res_c = phase_c * b[0] + r0_c
        res_s = phase_s * b[0] + r0_s
        n_r0_c = phase_c * b[1] + r1_c - res_c * a[0]
        n_r0_s = phase_s * b[1] + r1_s - res_s * a[0]
        n_r1_c = phase_c * b[2] - res_c * a[1]
        n_r1_s = phase_s * b[2] - res_s * a[1]
        return res_c, res_s, (phase_c, phase_s, n_r0_c, n_r0_s, n_r1_c, n_r1_s)

    lo_res_c, lo_res_s, lo_out = df2(*st[0:6], b_lo, a_lo)
    hi_res_c, hi_res_s, hi_out = df2(*st[6:12], b_hi, a_hi)

    o[0][...] = amplitude
    o[1][...] = (hi_res_c - lo_res_c) * amplitude
    o[2][...] = (hi_res_s - lo_res_s) * amplitude
    for k in range(6):
        o[3 + k][...] = lo_out[k]
        o[9 + k][...] = hi_out[k]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(scal, *planes, interpret=False):
    hp, wp = planes[0].shape
    grid = (hp // _TILE,)
    strip = pl.BlockSpec((_TILE, wp), lambda i: (i, 0))
    sd = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    return pl.pallas_call(
        _kernel,
        out_shape=(sd,) * _N_OUT,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[pl.BlockSpec((1, 13), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)]
            + [strip] * _N_IN,
            out_specs=(strip,) * _N_OUT,
        ),
        interpret=interpret,
    )(scal, *planes)


def riesz_phase_df2_fused(
    cur_lp, cur_r, cur_i, old_lp, old_r, old_i,
    lo_state, hi_state,          # each: 6 [H, W] arrays (phase_c/s, r0_c/s, r1_c/s)
    b_lo, a_lo, b_hi, a_hi,      # [3] coefficient arrays (a[0] == 1)
    rebuild,                     # scalar bool/0-1: first frame / cutoff change
    interpret: bool = False,
):
    """Returns (amplitude, wc, ws, lo_state', hi_state') for one level.

    wc/ws are the blur inputs of normalize ((hi-lo) * amplitude) — feed them to
    riesz_amplify_fused(preweighted=True). Matches the jnp composition
    phase_difference_and_amplitude + riesz_df2_step (x2) exactly.
    """
    h, w = cur_lp.shape
    planes = [cur_lp, cur_r, cur_i, old_lp, old_r, old_i, *lo_state, *hi_state]
    hp = -(-h // _TILE) * _TILE
    wp = -(-w // 128) * 128
    if (hp, wp) != (h, w):  # 4K/1080p need no padding (W multiple of 128)
        planes = [jnp.pad(x, ((0, hp - h), (0, wp - w)), mode="edge")
                  for x in planes]
    scal = jnp.concatenate([
        jnp.asarray(b_lo, jnp.float32),
        jnp.asarray(a_lo, jnp.float32)[1:3],
        jnp.asarray(b_hi, jnp.float32),
        jnp.asarray(a_hi, jnp.float32)[1:3],
        jnp.asarray(rebuild, jnp.float32).reshape(1),
        jnp.zeros((2,), jnp.float32),
    ]).reshape(1, 13)
    out = _run(scal, *planes, interpret=interpret)
    if (hp, wp) != (h, w):
        out = [x[:h, :w] for x in out]
    return (out[0], out[1], out[2],
            tuple(out[3 + k] for k in range(6)),
            tuple(out[9 + k] for k in range(6)))
