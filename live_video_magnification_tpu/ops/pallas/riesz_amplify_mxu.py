"""Riesz normalize + amplify with MXU-banded 13-tap blurs (Pallas TPU kernel).

Same math as riesz_amplify.py (the per-level tail, RieszPyramid.cpp:114-144):

    ab  = gauss13(amplitude)
    n_c = gauss13(change_c * amplitude) / ab
    n_s = gauss13(change_s * amplitude) / ab
    mag  = sqrt(n_c^2 + n_s^2);  mag2 = min(mag * alpha, threshold)
    pair = nan_to_zero((riesz_r * n_c + riesz_i * n_s) / mag)
    out  = lowpass * cos(mag2) - pair * sin(mag2)

but the three separable 13-tap Gaussians ride the MXU instead of VPU
scratch-ref accumulation: the vertical taps are 13 sublane-shifted
multiply-adds on a VMEM strip (cheap — sublane shifts need no relayout) and
the horizontal taps become ONE banded matmul per 128-lane output block,

    out[y, 128j + q] = sum_p vert[y, 128j + p] * B[p, q],
    B[p, q] = g[p - q]  when 0 <= p - q <= 12, else 0,

i.e. a (tile, 256) x (256, 128) product — the same proven formulation as the
9x9 pyramid stencils (conv9_mxu.py). This was the round-3 roofline's named
candidate for the tail (docs/ROOFLINE.md: the scratch-ref kernel lost to
XLA's fused shifted-add blurs at 7.26 vs 5.64 ms/4K-frame; per-tap scratch
passes + a cross-lane relayout per horizontal tap). Here each blur is
13 shifted VPU multiply-adds + one MXU pass, with all element-wise math
fused in VMEM and ONE output plane written.

Traffic per level: 6 input planes + 1 output = 7 plane passes, vs the jnp
tail's 3 blur inputs + ~6 blur intermediates + output.
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

_LANES = 128
_HALO = 6                    # 13-tap reach
_TILE = 64                   # default output rows per grid step (LVMT_TAIL_TILE)
_TAPS = [float(v) for v in AMPLITUDE_BLUR_KERNEL_1D]


def _strip_h(tile: int) -> int:
    """DMA strip height for a tile: tile + 13-tap halo, padded to the 16-row
    sublane tile (80 for tile=64 — the historical constant — 144 for 128)."""
    return -(-(tile + 2 * _HALO) // 16) * 16


def _blur_bank() -> np.ndarray:
    """B[p, q] = g[p - q] for 0 <= p - q <= 12. Shape (256, 128)."""
    bank = np.zeros((2 * _LANES, _LANES), np.float32)
    for q in range(_LANES):
        for b in range(13):
            bank[q + b, q] = _TAPS[b]
    return bank


def _vert_bank(tile: int) -> np.ndarray:
    """Bv[y, p] = g[p - y] for 0 <= p - y <= 12: the VERTICAL 13-tap blur as
    one (tile x strip) banded matmul from the left — out = Bv @ strip. The
    round-5 microbench put the kernel at ~5.7x its traffic bound with the
    vertical taps as 13 VPU sublane FMAs per block; this moves them to the
    MXU (one matmul per blur per tile instead of 13x3 VPU passes per
    256-lane slab). Shape (tile, strip); alignment rows past y+12 carry
    zero taps by construction."""
    bank = np.zeros((tile, _strip_h(tile)), np.float32)
    for y in range(tile):
        for b in range(13):
            bank[y, y + b] = _TAPS[b]
    return bank


def _tail_vert_mode() -> str:
    """LVMT_TAIL_VERT in {mxu, vpu}: vertical-blur formulation inside
    riesz_amplify_mxu. Default mxu since the round-5 A/B (R5_TAILIO_AB.json:
    8.19 -> 7.61 ms/4K-frame bf16 fast mode, identical 44.1 dB; also wins at
    f32 operands). vpu kept for A/B. Trace-time env read, threaded STATIC
    into _run and keyed into the chain jit cache (models/chain.py)."""
    import os

    return os.environ.get("LVMT_TAIL_VERT", "mxu")


def _kernel(scalars, *refs, n_blocks: int, preweighted: bool, bf16: bool,
            prec: str, vert_mxu: bool, db: bool, tile: int, packed: bool):
    if packed:
        (stk_hbm, vbank_ref, bank_ref, lp_ref, rr_ref, ri_ref, out_ref,
         stk_v, sems) = refs
    else:
        (amp_hbm, cc_hbm, cs_hbm, vbank_ref, bank_ref, lp_ref, rr_ref,
         ri_ref, out_ref, amp_v, cc_v, cs_v, sems) = refs
    strip_rows = _strip_h(tile)
    ti = pl.program_id(0)
    alpha = scalars[0, 0]
    threshold = scalars[0, 1]

    if packed:
        # LVMT_TAIL_PACK=1: the three halo'd planes live as ONE stacked
        # (3, Hp, Wp) array, so each grid step issues a single strided DMA
        # instead of three (and the db prefetch one instead of three) —
        # probing whether per-transfer issue overhead is part of the
        # kernel's gap to its traffic bound (docs/ROUND5.md item 3)
        if db:
            def dma(slot, t):
                return pltpu.make_async_copy(
                    stk_hbm.at[:, pl.ds(t * tile, strip_rows), :],
                    stk_v.at[slot], sems.at[slot])

            slot = jax.lax.rem(ti, 2)

            @pl.when(ti == 0)
            def _():
                dma(0, 0).start()

            @pl.when(ti + 1 < pl.num_programs(0))
            def _():
                dma(jax.lax.rem(ti + 1, 2), ti + 1).start()

            dma(slot, ti).wait()
            base = stk_v.at[slot]
        else:
            cp = pltpu.make_async_copy(
                stk_hbm.at[:, pl.ds(ti * tile, strip_rows), :], stk_v,
                sems.at[0])
            cp.start()
            cp.wait()
            base = stk_v

        def strip(k):
            return base.at[k]
    elif db:
        # cross-step double buffer (LVMT_TAIL_DB): step ti prefetches step
        # ti+1's strips into the other slot while computing — the manual
        # strip DMAs were the one non-pipelined transfer left (the blocked
        # lp/rr/ri/out are pipelined by the grid machinery)
        srcs = [amp_hbm, cc_hbm, cs_hbm]
        dsts = [amp_v, cc_v, cs_v]

        def dma(slot, t, k):
            return pltpu.make_async_copy(
                srcs[k].at[pl.ds(t * tile, strip_rows), :], dsts[k].at[slot],
                sems.at[slot, k])

        slot = jax.lax.rem(ti, 2)

        @pl.when(ti == 0)
        def _():
            for k in range(3):
                dma(0, 0, k).start()

        @pl.when(ti + 1 < pl.num_programs(0))
        def _():
            nxt = jax.lax.rem(ti + 1, 2)
            for k in range(3):
                dma(nxt, ti + 1, k).start()

        for k in range(3):
            dma(slot, ti, k).wait()

        def strip(k):
            return dsts[k].at[slot]
    else:
        srcs = [amp_hbm, cc_hbm, cs_hbm]
        dsts = [amp_v, cc_v, cs_v]
        copies = []
        for k in range(3):
            cp = pltpu.make_async_copy(
                srcs[k].at[pl.ds(ti * tile, strip_rows), :], dsts[k],
                sems.at[k])
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        def strip(k):
            return dsts[k]

    amp_s, cc_s, cs_s = strip(0), strip(1), strip(2)

    if vert_mxu:
        # vertical 13-tap as ONE left-banded matmul per blur over the whole
        # strip width (LVMT_TAIL_VERT=mxu): V = Bv @ strip, (tile x strip)
        # @ (strip x wp) — ~120 MFLOP/step on the MXU replaces ~39 VPU tap
        # passes (round-5 microbench: the kernel sat at 5.7x traffic bound)
        vb = vbank_ref[:]
        amp_strip = amp_s[:].astype(jnp.float32)
        if preweighted:
            w_cc = cc_s[:].astype(jnp.float32)
            w_cs = cs_s[:].astype(jnp.float32)
        else:
            w_cc = cc_s[:].astype(jnp.float32) * amp_strip
            w_cs = cs_s[:].astype(jnp.float32) * amp_strip
        v_amp = _mxu_dot(vb, amp_strip, bf16, prec)
        v_cc = _mxu_dot(vb, w_cc, bf16, prec)
        v_cs = _mxu_dot(vb, w_cs, bf16, prec)

    for j in range(n_blocks):
        cols = slice(j * _LANES, j * _LANES + 2 * _LANES)

        def vert(strip_ref, weight_ref=None):
            # strips may arrive bf16 (LVMT_TAIL_IO=bf16: transient planes at
            # half the HBM bytes); accumulate the taps in f32 regardless
            acc = None
            for a in range(13):
                term = strip_ref[a : a + tile, cols].astype(jnp.float32)
                if weight_ref is not None:
                    term = term * weight_ref[a : a + tile, cols].astype(
                        jnp.float32)
                term = term * _TAPS[a]
                acc = term if acc is None else acc + term
            return acc

        if vert_mxu:
            ba = _mxu_dot(v_amp[:, cols], bank_ref[:], bf16, prec)
            bc = _mxu_dot(v_cc[:, cols], bank_ref[:], bf16, prec)
            bs = _mxu_dot(v_cs[:, cols], bank_ref[:], bf16, prec)
        else:
            ba = _mxu_dot(vert(amp_s), bank_ref[:], bf16, prec)
            wref = None if preweighted else amp_s
            bc = _mxu_dot(vert(cc_s, wref), bank_ref[:], bf16, prec)
            bs = _mxu_dot(vert(cs_s, wref), bank_ref[:], bf16, prec)

        nc = bc / ba
        ns = bs / ba
        mag = jnp.sqrt(nc * nc + ns * ns)
        mag2 = jnp.minimum(mag * alpha, threshold)  # cv::THRESH_TRUNC
        ocols = slice(j * _LANES, (j + 1) * _LANES)
        # lp/rr/ri may arrive bf16 (LVMT_PYR_IO); compute f32 regardless
        rr = rr_ref[:, ocols].astype(jnp.float32)
        ri = ri_ref[:, ocols].astype(jnp.float32)
        lp = lp_ref[:, ocols].astype(jnp.float32)
        pair = (rr * nc + ri * ns) / mag
        pair = jnp.where(jnp.isnan(pair), 0.0, pair)
        out_ref[:, ocols] = (lp * jnp.cos(mag2) - pair * jnp.sin(mag2))


def _db_mode() -> str:
    """LVMT_TAIL_DB in {auto, 0, 1}: cross-step double buffering of the
    halo'd strip DMAs. auto = on whenever the two strip slots + pipelined
    block buffers fit VMEM comfortably (always at bf16 strips; at f32 only
    below ~3000 padded columns). Trace-time env read, keyed into the chain
    jit cache (models/chain.py)."""
    import os

    return os.environ.get("LVMT_TAIL_DB", "auto")


def _tile_mode() -> str:
    """LVMT_TAIL_TILE in {64, 128, auto}: output rows per grid step. 128
    halves the DMA issue count and improves vertical-matmul utilization but
    fits VMEM only when the strip and elementwise inputs are narrow (the
    all-bf16 fast pairing); auto picks the largest fitting geometry.
    Trace-time env read, keyed into the chain jit cache."""
    import os

    return os.environ.get("LVMT_TAIL_TILE", "64")


def _tail_pack() -> bool:
    """LVMT_TAIL_PACK in {0, 1}: stack the three halo'd blur inputs into one
    (3, Hp, Wp) array so every grid step moves them with ONE strided DMA
    (and one semaphore wait) instead of three. Same HBM bytes — the stack
    fuses into the producers that had to materialize the planes anyway —
    purely a DMA-issue-count probe (docs/ROUND5.md open item 3). Trace-time
    env read, keyed into the chain jit cache."""
    import os

    return os.environ.get("LVMT_TAIL_PACK", "0") == "1"


def _vmem_est(tile: int, db: bool, wp: int, strip_item: int,
              ew_item: int) -> int:
    strips = (2 if db else 1) * 3 * _strip_h(tile) * wp * strip_item
    blocked = 2 * tile * wp * (3 * ew_item + 4)  # 3 pipelined ins + f32 out
    return strips + blocked


def _resolve_geom(strip_dtype, ew_dtype, wp: int, tile_mode: str,
                  db_mode: str):
    """(tile, db) jointly from the env modes + a VMEM-fit estimate."""
    budget = 14 * 1024 * 1024
    s_it = jnp.dtype(strip_dtype).itemsize
    e_it = jnp.dtype(ew_dtype).itemsize
    tiles = {"64": [64], "128": [128], "auto": [128, 64]}[tile_mode]
    dbs = {"0": [False], "1": [True], "auto": [True, False]}[db_mode]
    for tile in tiles:
        for db in dbs:
            if _vmem_est(tile, db, wp, s_it, e_it) <= budget:
                return tile, db
    return 64, False


@functools.partial(
    jax.jit, static_argnames=("interpret", "preweighted", "bf16", "prec",
                              "vert_mxu", "db", "tile", "packed")
)
def _run(scalars, planes, lp_a, rr_a, ri_a,
         interpret: bool = False, preweighted: bool = False,
         bf16: bool = False, prec: str = "highest", vert_mxu: bool = False,
         db: bool = False, tile: int = _TILE, packed: bool = False):
    # planes: a 3-tuple of (Hp, Wp) halo'd arrays, or — packed — ONE
    # stacked (3, Hp, Wp) array moved with a single strided DMA per step
    if packed:
        hp, wp = planes.shape[1:]
        strip_dtype = planes.dtype
        plane_args = (planes,)
    else:
        hp, wp = planes[0].shape  # (n_tiles*tile + strip - tile, blocks*128 + 128)
        strip_dtype = planes[0].dtype
        plane_args = tuple(planes)
    h_out, w_pad = lp_a.shape     # aligned output size
    strip = _strip_h(tile)
    n_tiles = h_out // tile
    n_blocks = w_pad // _LANES
    kernel = functools.partial(_kernel, n_blocks=n_blocks,
                               preweighted=preweighted, bf16=bf16, prec=prec,
                               vert_mxu=vert_mxu, db=db, tile=tile,
                               packed=packed)
    bank = jnp.asarray(_blur_bank())
    vbank = jnp.asarray(_vert_bank(tile))
    if packed:
        strip_shape = (2, 3, strip, wp) if db else (3, strip, wp)
        sem_shape = (2,) if db else (1,)
        strip_scratch = [pltpu.VMEM(strip_shape, strip_dtype)]
    else:
        strip_shape = (2, strip, wp) if db else (strip, wp)
        sem_shape = (2, 3) if db else (3,)
        strip_scratch = [pltpu.VMEM(strip_shape, strip_dtype)] * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(plane_args)
        + [pl.BlockSpec((tile, strip), lambda i: (0, 0))]
        + [pl.BlockSpec((2 * _LANES, _LANES), lambda i: (0, 0))]
        + [pl.BlockSpec((tile, w_pad), lambda i: (i, 0))] * 3,
        out_specs=pl.BlockSpec((tile, w_pad), lambda i: (i, 0)),
        scratch_shapes=strip_scratch
        + [pltpu.SemaphoreType.DMA(sem_shape)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h_out, w_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, *plane_args, vbank, bank, lp_a, rr_a, ri_a)


def riesz_amplify_mxu(
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
    vert: str | None = None,
) -> jnp.ndarray:
    """Fused normalize+amplify for one [H, W] level via MXU-banded blurs.
    Same semantics as riesz_amplify_fused (normalize_phase + amplify_level of
    ops/riesz.py); preweighted=True means change_c/s already carry the
    amplitude factor. vert: 'vpu' (13 sublane FMAs per block) or 'mxu' (one
    left-banded matmul per blur per tile); None reads LVMT_TAIL_VERT."""
    h, w = amplitude.shape
    n_blocks = -(-w // _LANES)
    w_pad = n_blocks * _LANES
    wp = (n_blocks + 1) * _LANES  # slab cols 128j .. 128j+255 must exist
    tile, db = _resolve_geom(amplitude.dtype, lowpass.dtype, wp,
                             _tile_mode(), _db_mode())
    strip = _strip_h(tile)
    h_out = -(-h // tile) * tile

    def prep_blur(x):
        # reflect-101 halo, then alignment padding (junk region never read
        # into a real output: the band is zero past p - q > 12 only within
        # the slab — pad with edge values so matmul stays finite)
        p = jnp.pad(x, ((_HALO, _HALO), (_HALO, _HALO)), mode="reflect")
        return jnp.pad(
            p,
            ((0, (h_out + strip - tile) - (h + 2 * _HALO)),
             (0, wp - (w + 2 * _HALO))),
            mode="edge",
        )

    def prep_ew(x):  # element-wise inputs: plain alignment padding
        return jnp.pad(x, ((0, h_out - h), (0, w_pad - w)), mode="edge")

    scalars = jnp.stack([jnp.asarray(alpha, jnp.float32),
                         jnp.asarray(threshold, jnp.float32)]).reshape(1, 2)
    packed = _tail_pack()
    if packed:
        planes = jnp.stack([prep_blur(amplitude), prep_blur(change_c),
                            prep_blur(change_s)])
    else:
        planes = (prep_blur(amplitude), prep_blur(change_c),
                  prep_blur(change_s))
    out = _run(scalars, planes, prep_ew(lowpass), prep_ew(riesz_r),
               prep_ew(riesz_i), interpret=interpret, preweighted=preweighted,
               bf16=_mxu_bf16(), prec=_mxu_precision_name(),
               vert_mxu=(vert or _tail_vert_mode()) == "mxu",
               db=db, tile=tile, packed=packed)
    return out[:h, :w]
