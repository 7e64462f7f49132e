"""Explicit shard_map phase-mode step: Pallas MXU kernels composed with sharding.

The GSPMD path (parallel/sharding.py) cannot partition a pallas_call, so round 1
forced the sharded phase step onto the jnp shifted-slice stencils (~30x off MXU
peak at 4K — ops/pallas/conv9_mxu.py). This module is the explicit alternative
(VERDICT round-1 item 2, the seam named in parallel/halo.py): the frame's W
(lane) axis is sharded over the 'tile' mesh axis, every 9x9/1x5/13x13 stencil
runs the SAME Pallas MXU kernels on halo-exchanged local strips (lax.ppermute
over ICI; reflect-101 at the global edges), and everything element-wise stays
local. W is chosen over H because 4K's W = 3840 = 2^8*15 keeps every pyramid
level divisible across 8 chips while H = 2160 = 2^4*135 stops at level 1.

Halo trick: each kernel already reflect-101-pads its input internally, so a
local strip exchanged by the kernel's reach (conv9: 4, band5: 2, blur13: 6,
inject small: 2) is handed to the UNMODIFIED kernel and the valid interior
sliced from its output — the kernel's own padding only contaminates the
discarded halo columns, and the global-edge devices get correct reflect-101
halos from the exchange itself.

Levels whose W doesn't divide the mesh (or whose local strip would be thinner
than the halo) are computed replicated — every device redundantly runs the
full (cheap, geometrically decaying) small level — with a tiled all_gather at
the sharded->replicated boundary and a dynamic-slice back at collapse. The
plan is prefix-monotone: once a level replicates, all deeper levels do.

Reference numerics: RieszPyramid.cpp (build :215-238, collapse :304-325,
normalize/amplify :114-144), MagnifyCore.hpp:209-279 (step semantics).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from live_video_magnification_tpu.models.riesz import (
    RegPair,
    RieszDynParams,
    RieszState,
    init_state,
)
from live_video_magnification_tpu.ops.color import (
    bgr_to_lab,
    lab_to_bgr,
    to_u8,
    u8_to_unit_f32,
)
from live_video_magnification_tpu.ops.conv import correlate2d, correlate_cols, correlate_rows
from live_video_magnification_tpu.ops.kernels import (
    RIESZ_BAND_KERNEL,
    RIESZ_HIGHPASS_9x9,
    RIESZ_LOWPASS_9x9,
)
from live_video_magnification_tpu.ops.resize import resize_nearest_even_inject
from live_video_magnification_tpu.ops.riesz import (
    RieszLevel,
    amplify_level,
    amplitude_blur,
    normalize_phase,
    phase_difference_and_amplitude,
    riesz_level_sizes,
)
from live_video_magnification_tpu.ops.temporal import CompExp, riesz_df2_step

_BLUR_HALO = 6   # 13x13 Gaussian reach
_CONV9_HALO = 4
_BAND_HALO = 2


# --------------------------------------------------------------------------- plan


@dataclasses.dataclass(frozen=True)
class RieszShardPlan:
    """Per-level W-axis sharding decisions for an n-way 'tile' mesh axis."""

    n: int
    levels: int
    sizes: Tuple[Tuple[int, int], ...]   # full (h, w) per level
    sharded: Tuple[bool, ...]            # prefix-monotone

    @property
    def fully_sharded(self) -> bool:
        return all(self.sharded)


def make_plan(h: int, w: int, levels: int, n: int,
              force_sharded: bool = False) -> RieszShardPlan:
    """W-axis sharding plan. A mesh of 1 has no neighbors: every level is
    'replicated' (= plain local compute through the same multi-chip program,
    zero halo machinery) so the sharded step degenerates to the unsharded
    kernels exactly — measured 14.84 vs 13.44 ms/4K-frame for the forced-halo
    variant (R4_CAMPAIGN.json). force_sharded=True keeps the halo path at
    n==1 for that A/B (and for interpret-mode halo tests)."""
    sizes = tuple(riesz_level_sizes(h, w, levels))
    if n == 1 and not force_sharded:
        return RieszShardPlan(n, levels, sizes, (False,) * levels)
    flags: List[bool] = []
    ok = True
    for l, (lh, lw) in enumerate(sizes):
        last = l == levels - 1
        if ok and lw % n == 0:
            local = lw // n
            if last:
                ok = local >= 2 * _BAND_HALO + 2          # band5 + inject-small halos
            else:
                ok = local % 2 == 0 and local >= 2 * _BLUR_HALO + 2
        else:
            ok = False
        flags.append(ok)
    return RieszShardPlan(n, levels, sizes, tuple(flags))


# --------------------------------------------------------------------------- halo exchange


def halo_exchange_cols(
    x: jnp.ndarray, halo: int, axis_name: str, right_mode: str = "reflect"
) -> jnp.ndarray:
    """[..., w_local] col shard -> [..., w_local + 2*halo] with neighbor halos.

    Interior boundaries get real neighbor columns (ppermute over ICI); the
    global left/right edges get local reflect-101, exactly matching the pad the
    kernels would apply to the unsharded array. Requires w_local > halo.

    right_mode='symmetric' is the zero-injection quirk (conv9_mxu.py module
    docstring): reflect-101 of a 2x zero-injected array maps to reflect-101
    (leading) / SYMMETRIC (trailing) padding of the small image, because the
    injected array's trailing reflection axis sits on an odd (zero) column.
    """
    n = lax.axis_size(axis_name)
    reflect_l = jnp.flip(x[..., 1 : halo + 1], axis=-1)
    if right_mode == "symmetric":
        reflect_r = jnp.flip(x[..., -halo:], axis=-1)
    else:
        reflect_r = jnp.flip(x[..., -halo - 1 : -1], axis=-1)
    if n == 1:
        # Mesh of 1: no neighbors exist — skip the collectives and the traced
        # edge selects entirely (axis_size is static, so this is a trace-time
        # branch). This is the single-chip speed of the multi-chip code path
        # (VERDICT round-3 item 1).
        return jnp.concatenate([reflect_l, x, reflect_r], axis=-1)
    idx = lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(n - 1)]   # my right edge -> next shard's left halo
    bwd = [(i, i - 1) for i in range(1, n)]    # my left edge -> previous shard's right halo
    from_left = lax.ppermute(x[..., -halo:], axis_name, fwd)
    from_right = lax.ppermute(x[..., :halo], axis_name, bwd)
    left = jnp.where(idx == 0, reflect_l, from_left)
    right = jnp.where(idx == n - 1, reflect_r, from_right)
    return jnp.concatenate([left, x, right], axis=-1)


# --------------------------------------------------------------------------- kernel dispatch


class _Ops:
    """Stencil primitives on FULL (or haloed) arrays, Pallas or jnp.

    mode: 'jnp' (plain ops — CPU / GSPMD-safe), 'pallas' (compiled MXU kernels
    where the level is big enough, jnp below), 'interpret' (Pallas interpreter
    — CPU equivalence tests of the exact kernel code).
    """

    def __init__(self, mode: str, halo_impl: str = "ppermute",
                 tail: str | None = None, band_parallel: bool = False):
        assert mode in ("jnp", "pallas", "interpret")
        assert halo_impl in ("ppermute", "rdma")
        self.mode = mode
        self.halo_impl = halo_impl
        # Pyramid-band (level) parallelism for the REPLICATED small levels
        # (SURVEY §2.9 "per-band sharding of pyramid levels"): instead of every
        # device redundantly running the per-level temporal tail, each
        # replicated level is OWNED by one device (round-robin); the owner
        # computes phase-diff→DF-II→normalize→amplify inside a lax.cond (real
        # runtime skip under shard_map, not a select) and a psum replicates
        # the results for the (inherently sequential) collapse. Build and
        # collapse stay replicated — each level's input is the previous
        # level's output, so there is no band parallelism to extract there.
        # See docs/MULTICHIP.md for the measured/analytic comparison.
        self.band_parallel = band_parallel
        if tail is None:
            # Same LVMT_TAIL resolution as the streaming step (round-3 A/B:
            # the jnp blur tail beat the VPU kernel 5.64 vs 7.26 ms at 4K —
            # the sharded path previously kept the LOSING kernel, part of its
            # 18% mesh-of-1 tax). Resolved at BUILD time, never in trace.
            from live_video_magnification_tpu.ops.riesz import _tail_mode

            tail = _tail_mode() if mode != "jnp" else "jnp"
        # the fused level kernel (LVMT_TAIL=level) has no sharded form yet;
        # its closest sharded analogue is the mxu blur tail
        tail = {"level": "mxu"}.get(tail, tail)
        assert tail in ("jnp", "pallas", "mxu")
        self.tail = tail if mode != "jnp" else "jnp"

    def exchange(self, x, halo, axis_name, right_mode: str = "reflect"):
        """Column halo exchange: XLA collective-permute by default, or the
        explicit Pallas make_async_remote_copy ring (halo_impl='rdma' —
        parallel/halo.py)."""
        if self.halo_impl == "rdma" and self.mode != "jnp":
            from live_video_magnification_tpu.parallel.halo import (
                halo_exchange_cols_rdma,
            )

            return halo_exchange_cols_rdma(
                x, halo, axis_name, right_mode=right_mode, interpret=self._interp,
            )
        return halo_exchange_cols(x, halo, axis_name, right_mode=right_mode)

    def _pallas_ok(self, h: int, w: int) -> bool:
        if self.mode == "jnp":
            return False
        if self.mode == "interpret":
            return min(h, w) >= 16
        from live_video_magnification_tpu.ops.pallas.conv9_mxu import MIN_MXU_DIM

        return min(h, w) >= MIN_MXU_DIM

    @property
    def _interp(self) -> bool:
        return self.mode == "interpret"

    def conv9(self, x, k9):
        if self._pallas_ok(*x.shape):
            from live_video_magnification_tpu.ops.pallas.conv9_mxu import conv9_mxu

            return conv9_mxu(x, k9, interpret=self._interp)
        return correlate2d(x, k9)

    def band5(self, hp):
        if self._pallas_ok(*hp.shape):
            from live_video_magnification_tpu.ops.pallas.conv9_mxu import band5_mxu

            return band5_mxu(hp, RIESZ_BAND_KERNEL, interpret=self._interp)
        return (
            correlate_rows(hp, RIESZ_BAND_KERNEL),
            correlate_cols(hp, RIESZ_BAND_KERNEL),
        )

    def lp_decimate(self, x):
        """correlate2d(x, 2*lowpass)[::2, ::2]."""
        if self._pallas_ok(*x.shape):
            from live_video_magnification_tpu.ops.pallas.conv9_mxu import lp9_decimate_mxu

            return lp9_decimate_mxu(x, 2.0 * RIESZ_LOWPASS_9x9, interpret=self._interp)
        return correlate2d(x, 2.0 * RIESZ_LOWPASS_9x9)[..., ::2, ::2]

    def lp_inject(self, small, out_hw):
        h, w = out_hw
        sh, sw = small.shape
        even = h == 2 * sh and w == 2 * sw
        if even and self._pallas_ok(h, w):
            from live_video_magnification_tpu.ops.pallas.conv9_mxu import lp9_inject_mxu

            return lp9_inject_mxu(small, 2.0 * RIESZ_LOWPASS_9x9, out_hw,
                                  interpret=self._interp)
        up = resize_nearest_even_inject(small, out_hw)
        return correlate2d(up, 2.0 * RIESZ_LOWPASS_9x9)

    def fused_tail_ok(self, h: int, w: int) -> bool:
        # VPU kernel: its own (small) minimum applies, not the MXU threshold.
        from live_video_magnification_tpu.ops.pallas.riesz_amplify import MIN_FUSED_DIM

        return (self.mode != "jnp" and self.tail == "pallas"
                and min(h, w) >= MIN_FUSED_DIM)

    def mxu_tail_ok(self, h: int, w: int) -> bool:
        return self.tail == "mxu" and self._pallas_ok(h, w)

    def mxu_tail(self, amplitude, change: CompExp, level: RieszLevel, alpha,
                 threshold):
        from live_video_magnification_tpu.ops.pallas.riesz_amplify_mxu import (
            riesz_amplify_mxu,
        )

        return riesz_amplify_mxu(
            amplitude, change.cos, change.sin,
            level.lowpass, level.riesz.cos, level.riesz.sin,
            alpha, threshold, interpret=self._interp,
        )

    def fused_build_ok(self, h: int, w: int) -> bool:
        from live_video_magnification_tpu.ops.pallas.riesz_build import MIN_FUSED_DIM

        return (self.mode != "jnp" and min(h, w) >= MIN_FUSED_DIM
                and not self._pallas_ok(h, w))  # MXU kernels win at large dims

    def fused_build(self, octave):
        from live_video_magnification_tpu.ops.pallas.riesz_build import (
            riesz_build_level_fused,
        )

        return riesz_build_level_fused(octave, interpret=self._interp)

    def fused_tail(self, amplitude, change: CompExp, level: RieszLevel, alpha,
                   threshold):
        from live_video_magnification_tpu.ops.pallas.riesz_amplify import riesz_amplify_fused

        return riesz_amplify_fused(
            amplitude, change.cos, change.sin,
            level.lowpass, level.riesz.cos, level.riesz.sin,
            alpha, threshold, interpret=self._interp,
        )


# --------------------------------------------------------------------------- sharded level ops


def _sharded_build_level_fused(ops: _Ops, octave_local, axis_name):
    """One exchange (halo 6 = conv 4 + band apron 2) + the fused VPU build
    kernel on the haloed strip; interiors sliced per output reach. Used for
    sharded levels too small for the MXU banded kernels."""
    wl = octave_local.shape[-1]
    xh = ops.exchange(octave_local, _BLUR_HALO, axis_name)
    hp, r, i, sub = ops.fused_build(xh)
    sl = lambda a: a[:, _BLUR_HALO : _BLUR_HALO + wl]
    # sub col j' <- haloed col 2j'; strip cols start at halo 6 -> j' = 3.
    return sl(hp), sl(r), sl(i), sub[:, 3 : 3 + wl // 2]


def _sharded_build_level(ops: _Ops, octave_local, axis_name):
    """Full build of one sharded level (hp, band pair, decimated lowpass) from
    ONE halo-6 exchange instead of three separate halo-4/2/4 exchanges.

    The exchanged strip covers global cols [s-6, s+wl+6). conv9 (reach 4) is
    then valid on [s-2, s+wl+2) — exactly the 2-col apron band5 needs — and
    the even-site decimation (reach 4) is valid from decimated col 2 on, with
    global col s landing at decimated col 3 (strips start on even cols). The
    kernels' internal reflect-101 padding only contaminates the discarded
    halo region, as in the per-op helpers below."""
    wl = octave_local.shape[-1]
    xh = ops.exchange(octave_local, _BLUR_HALO, axis_name)
    hp_ext = ops.conv9(xh, RIESZ_HIGHPASS_9x9)[:, 4 : 4 + wl + 2 * _BAND_HALO]
    r, i = ops.band5(hp_ext)
    sl = lambda a: a[:, _BAND_HALO : _BAND_HALO + wl]
    sub = ops.lp_decimate(xh)[:, 3 : 3 + wl // 2]
    return sl(hp_ext), sl(r), sl(i), sub


def _sharded_conv9(ops: _Ops, x_local, k9, axis_name):
    w_local = x_local.shape[-1]
    xh = ops.exchange(x_local, _CONV9_HALO, axis_name)
    return ops.conv9(xh, k9)[:, _CONV9_HALO : _CONV9_HALO + w_local]


def _sharded_band5(ops: _Ops, hp_local, axis_name):
    w_local = hp_local.shape[-1]
    hph = ops.exchange(hp_local, _BAND_HALO, axis_name)
    r, i = ops.band5(hph)
    return (r[:, _BAND_HALO : _BAND_HALO + w_local],
            i[:, _BAND_HALO : _BAND_HALO + w_local])


def _sharded_inject(ops: _Ops, small_local, out_h, axis_name):
    # 2-col small halo -> 4 injected halo columns == exactly conv9's reach.
    # The trailing global edge pads SYMMETRIC (zero-injection parity quirk).
    sw_local = small_local.shape[-1]
    sm = ops.exchange(small_local, _BAND_HALO, axis_name, right_mode="symmetric")
    lp = ops.lp_inject(sm, (out_h, 2 * sm.shape[-1]))
    return lp[:, 2 * _BAND_HALO : 2 * _BAND_HALO + 2 * sw_local]


def _sharded_tail(ops: _Ops, level_local: RieszLevel, amplitude, wc, ws,
                  alpha, threshold, axis_name):
    """normalize_phase + amplify_level on a W shard: the three 13x13 blurs need
    a 6-col halo; everything else is element-wise. Tail kernel per ops.tail.
    wc/ws are the raw (hi-lo) cos/sin difference."""
    w_local = level_local.lowpass.shape[-1]
    h = level_local.lowpass.shape[-2]
    if (ops.fused_tail_ok(h, w_local + 2 * _BLUR_HALO)
            or ops.mxu_tail_ok(h, w_local + 2 * _BLUR_HALO)):
        stack = jnp.stack([
            amplitude, wc, ws,
            level_local.lowpass, level_local.riesz.cos, level_local.riesz.sin,
        ])
        sh = ops.exchange(stack, _BLUR_HALO, axis_name)
        kern = (ops.mxu_tail if ops.mxu_tail_ok(h, w_local + 2 * _BLUR_HALO)
                else ops.fused_tail)
        out = kern(
            sh[0], CompExp(sh[1], sh[2]), RieszLevel(sh[3], CompExp(sh[4], sh[5])),
            alpha, threshold,
        )
        return out[:, _BLUR_HALO : _BLUR_HALO + w_local]
    # jnp tail (default): per-plane exchanges — no stack materialization, so
    # XLA fuses each blur's producers (the round-3 stacked-blur negative
    # result applies here too); the 3 extra small ppermutes are 6-col messages.
    sl = lambda x: x[:, _BLUR_HALO : _BLUR_HALO + w_local]
    amp_blur = sl(amplitude_blur(ops.exchange(amplitude, _BLUR_HALO, axis_name)))
    nc = sl(amplitude_blur(ops.exchange(wc * amplitude, _BLUR_HALO, axis_name)))
    ns = sl(amplitude_blur(ops.exchange(ws * amplitude, _BLUR_HALO, axis_name)))
    normalized = CompExp(nc / amp_blur, ns / amp_blur)
    return amplify_level(level_local, normalized, alpha, threshold)


# --------------------------------------------------------------------------- the local step


def _riesz_step_local(
    state: RieszState,
    frame_u8,          # [3, H, W_local] (W sharded) — or full W on a 1-mesh
    dyn: RieszDynParams,
    *,
    plan: RieszShardPlan,
    ops: _Ops,
    axis_name: str,
):
    """One phase-mode step on this device's W shard. Mirrors models/riesz.step
    (MagnifyCore.hpp:209-279) with plan-aware halo exchange / replication."""
    levels, n = plan.levels, plan.n
    lab = bgr_to_lab(u8_to_unit_f32(frame_u8))
    luma = lab[0]

    # ---- build pyramid (RieszPyramid.cpp:215-238) ----
    cur: List[RieszLevel] = []
    octave = luma  # sharded iff plan.sharded[0]
    for l in range(levels - 1):
        if plan.sharded[l]:
            lh, lwl = octave.shape
            if ops.fused_build_ok(lh, lwl + 2 * _BLUR_HALO):
                hp, r, i, sub = _sharded_build_level_fused(ops, octave, axis_name)
            else:
                hp, r, i, sub = _sharded_build_level(ops, octave, axis_name)
            if not plan.sharded[l + 1]:
                sub = lax.all_gather(sub, axis_name, axis=1, tiled=True)
        else:
            hp = ops.conv9(octave, RIESZ_HIGHPASS_9x9)
            r, i = ops.band5(hp)
            sub = ops.lp_decimate(octave)
        cur.append(RieszLevel(hp, CompExp(r, i)))
        octave = sub
    if plan.sharded[levels - 1]:
        r, i = _sharded_band5(ops, octave, axis_name)
    else:
        r, i = ops.band5(octave)
    cur.append(RieszLevel(octave, CompExp(r, i)))

    # ---- temporal state plumbing (MagnifyCore.hpp:226-254) ----
    first = state.count == 0
    rebuild_old = first | dyn.reset_filters | dyn.force_init
    zero_filters = rebuild_old

    old = tuple(
        RieszLevel(
            jnp.where(rebuild_old, c.lowpass, o.lowpass),
            CompExp(
                jnp.where(rebuild_old, c.riesz.cos, o.riesz.cos),
                jnp.where(rebuild_old, c.riesz.sin, o.riesz.sin),
            ),
        )
        for c, o in zip(cur, state.old)
    )

    def masked(fl):
        return jax.tree.map(lambda x: jnp.where(zero_filters, 0.0, x), fl)

    new_acc: List[CompExp] = []
    new_lo: List[RegPair] = []
    new_hi: List[RegPair] = []
    lowpasses: List[jnp.ndarray] = []
    # The element-wise phase front (rebuild/zeroing + quaternion phase diff +
    # both DF-II filters) stays in jnp everywhere: XLA fuses it into the
    # tail's halo-exchange stack (sharded levels) or the fused amplify
    # kernel's input pipeline (replicated levels). The all-in-one
    # riesz_phase_df2_fused Pallas pass measured SLOWER both sharded (18.3 vs
    # 17.7 ms/4K-frame) and unsharded (16.9 vs 15.5 — models/riesz.py): its
    # 15 HBM output planes re-materialize what the compiler fuses away.
    for lvl in range(levels - 1):
        h_l, w_l = cur[lvl].lowpass.shape
        if (not plan.sharded[lvl] and ops.band_parallel and n > 1):
            # band parallelism: this replicated level's whole temporal tail
            # runs ONLY on its owner device (lax.cond is real per-device
            # control flow under shard_map); psum replicates the results.
            owner = lvl % n

            def _band_compute(lvl=lvl):
                acc_b = masked(state.acc[lvl])
                lo_b = masked(state.lo[lvl])
                hi_b = masked(state.hi[lvl])
                pr_b = phase_difference_and_amplitude(
                    cur[lvl], old[lvl], compute_blur=False)
                lo_res, phase, lo_r0, lo_r1 = riesz_df2_step(
                    acc_b, lo_b.reg0, lo_b.reg1, pr_b.phase_diff,
                    dyn.b_lo, dyn.a_lo)
                hi_res, _, hi_r0, hi_r1 = riesz_df2_step(
                    acc_b, hi_b.reg0, hi_b.reg1, pr_b.phase_diff,
                    dyn.b_hi, dyn.a_hi)
                ch = hi_res - lo_res
                ab = amplitude_blur(pr_b.amplitude)
                nc = amplitude_blur(ch.cos * pr_b.amplitude) / ab
                ns = amplitude_blur(ch.sin * pr_b.amplitude) / ab
                out = amplify_level(cur[lvl], CompExp(nc, ns),
                                    dyn.amplification, dyn.threshold)
                return (out, phase, RegPair(lo_r0, lo_r1),
                        RegPair(hi_r0, hi_r1))

            def _band_zeros(lvl=lvl):
                z = lambda x: jnp.zeros_like(x)
                return (z(cur[lvl].lowpass), jax.tree.map(z, state.acc[lvl]),
                        jax.tree.map(z, state.lo[lvl]),
                        jax.tree.map(z, state.hi[lvl]))

            mine = lax.axis_index(axis_name) == owner
            out, phase, lo_rp, hi_rp = lax.psum(
                lax.cond(mine, _band_compute, _band_zeros), axis_name)
            new_acc.append(phase)
            new_lo.append(lo_rp)
            new_hi.append(hi_rp)
            lowpasses.append(out)
            continue
        acc_st = masked(state.acc[lvl])
        lo_st = masked(state.lo[lvl])
        hi_st = masked(state.hi[lvl])
        pr = phase_difference_and_amplitude(cur[lvl], old[lvl], compute_blur=False)
        # shared accumulator (RieszState.acc): XLA CSEs the duplicate acc+diff
        lo_res, phase, lo_r0, lo_r1 = riesz_df2_step(
            acc_st, lo_st.reg0, lo_st.reg1, pr.phase_diff, dyn.b_lo, dyn.a_lo
        )
        hi_res, _, hi_r0, hi_r1 = riesz_df2_step(
            acc_st, hi_st.reg0, hi_st.reg1, pr.phase_diff, dyn.b_hi, dyn.a_hi
        )
        new_acc.append(phase)
        new_lo.append(RegPair(lo_r0, lo_r1))
        new_hi.append(RegPair(hi_r0, hi_r1))
        change = hi_res - lo_res
        if plan.sharded[lvl]:
            lowpasses.append(
                _sharded_tail(ops, cur[lvl], pr.amplitude, change.cos,
                              change.sin, dyn.amplification, dyn.threshold,
                              axis_name)
            )
        else:
            if ops.mxu_tail_ok(h_l, w_l):
                lowpasses.append(
                    ops.mxu_tail(pr.amplitude, change, cur[lvl],
                                 dyn.amplification, dyn.threshold)
                )
            elif ops.fused_tail_ok(h_l, w_l):
                lowpasses.append(
                    ops.fused_tail(pr.amplitude, change, cur[lvl],
                                   dyn.amplification, dyn.threshold)
                )
            else:
                # per-plane blurs (no stack): XLA fuses each blur's producers
                amp_blur = amplitude_blur(pr.amplitude)
                nc = amplitude_blur(change.cos * pr.amplitude) / amp_blur
                ns = amplitude_blur(change.sin * pr.amplitude) / amp_blur
                lowpasses.append(
                    amplify_level(cur[lvl], CompExp(nc, ns),
                                  dyn.amplification, dyn.threshold)
                )
    lowpasses.append(cur[levels - 1].lowpass)  # untouched residual octave

    # ---- collapse (RieszPyramid.cpp:304-325) ----
    result = lowpasses[-1]
    for lvl in range(levels - 2, -1, -1):
        octave = lowpasses[lvl]
        h_l = octave.shape[-2]
        if plan.sharded[lvl] and plan.sharded[lvl + 1]:
            lp = _sharded_inject(ops, result, h_l, axis_name)
            hp = _sharded_conv9(ops, octave, RIESZ_HIGHPASS_9x9, axis_name)
        elif plan.sharded[lvl]:
            # small is replicated: every device computes the full (cheap)
            # upsample term and slices its own strip; hp stays sharded.
            w_local = octave.shape[-1]
            lp_full = ops.lp_inject(result, (h_l, n * w_local))
            idx = lax.axis_index(axis_name)
            lp = lax.dynamic_slice_in_dim(lp_full, idx * w_local, w_local, axis=1)
            hp = _sharded_conv9(ops, octave, RIESZ_HIGHPASS_9x9, axis_name)
        else:
            lp = ops.lp_inject(result, octave.shape)
            hp = ops.conv9(octave, RIESZ_HIGHPASS_9x9)
        result = lp + hp

    merged = jnp.stack([result, lab[1], lab[2]])
    out_u8 = to_u8(lab_to_bgr(merged), 255.0, 1.0 / 255.0)
    passthrough = first | dyn.force_init
    out_u8 = jnp.where(passthrough, frame_u8, out_u8)

    new_old = tuple(RieszLevel(c.lowpass, c.riesz) for c in cur)
    new_state = RieszState(state.count + 1, new_old, tuple(new_acc),
                           tuple(new_lo), tuple(new_hi))
    return new_state, out_u8


# --------------------------------------------------------------------------- specs + builder


def state_specs(plan: RieszShardPlan, batch_axis: str | None = "batch") -> RieszState:
    """PartitionSpec pytree matching a batched RieszState for this plan.
    batch_axis=None builds specs for a tile-only mesh (batch replicated)."""
    levels = plan.levels
    lv = lambda l: P(batch_axis, None, "tile" if plan.sharded[l] else None)
    old = tuple(RieszLevel(lv(l), CompExp(lv(l), lv(l))) for l in range(levels))
    acc = tuple(CompExp(lv(l), lv(l)) for l in range(levels - 1))
    rp = lambda l: RegPair(CompExp(lv(l), lv(l)), CompExp(lv(l), lv(l)))
    lo = tuple(rp(l) for l in range(levels - 1))
    hi = tuple(rp(l) for l in range(levels - 1))
    return RieszState(P(batch_axis), old, acc, lo, hi)


def default_kernel_mode() -> str:
    return "jnp" if jax.default_backend() == "cpu" else "pallas"


def build_sharded_riesz_step(
    mesh: Mesh,
    batch: int,
    h: int,
    w: int,
    levels: int,
    kernels: str | None = None,
    halo_impl: str = "ppermute",
    repeat_steps: int = 0,
    tail: str | None = None,
    band_parallel: bool = False,
    force_sharded: bool = False,
):
    """(jitted_step, sharded_init_state) for the explicit Pallas+halo phase step.

    jitted_step(state, frames_u8 [B,3,H,W], dyn) -> (state, outs [B,3,H,W]).
    B shards over 'batch', W over 'tile'. Requires make_plan(...).sharded[0]
    (callers fall back to the GSPMD jnp path otherwise — see
    parallel/sharding.py).

    repeat_steps > 0 is the benchmark form: one dispatch scans that many steps
    over the same frame and returns (state, checksum scalar) instead of the
    output frame.
    """
    n = mesh.shape["tile"]
    batch_axis = "batch" if "batch" in mesh.axis_names else None
    nb = mesh.shape.get("batch", 1)
    assert batch % nb == 0, f"batch {batch} not divisible by batch axis {nb}"
    plan = make_plan(h, w, levels, n, force_sharded=force_sharded)
    if n > 1 and not plan.sharded[0]:
        raise ValueError(
            f"W={w} cannot be lane-sharded {n}-way at level 0; use the GSPMD path"
        )
    ops = _Ops(kernels or default_kernel_mode(), halo_impl=halo_impl, tail=tail,
               band_parallel=band_parallel)

    frame_spec = P(batch_axis, None, None, "tile")
    st_specs = state_specs(plan, batch_axis)
    dyn_spec = jax.tree.map(lambda _: P(), RieszDynParams(*([0.0] * 8)))

    def local_fn(state, frames, dyn):
        b_local = frames.shape[0]
        sts, outs = [], []
        for b in range(b_local):  # static unroll; Pallas kernels stay 2-D
            st_b = jax.tree.map(lambda x: x[b], state)
            st2, out = _riesz_step_local(
                st_b, frames[b], dyn, plan=plan, ops=ops, axis_name="tile"
            )
            sts.append(st2)
            outs.append(out)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
        return stacked, jnp.stack(outs)

    if repeat_steps:
        # Benchmark form: one dispatch scans `repeat_steps` sharded steps
        # (timing protocol of bench.py — the relay returns at dispatch time,
        # so per-call timing would measure queueing). The frame VALUES vary
        # per step (a fused u8 add): with a constant frame XLA hoists the
        # loop-invariant pyramid build out of the scan and the bench measures
        # only the temporal tail (caught in round 4 — the degenerate mesh-1
        # path timed 9.8 ms vs the honest 13.4; bench_mode_scan varies its
        # frame the same way).
        inner = local_fn

        def local_fn(state, frames, dyn):  # noqa: F811
            def body(st, t):
                fr = frames + (t % 3).astype(jnp.uint8)
                st, out = inner(st, fr, dyn)
                return st, jnp.sum(out[:, :, ::64, ::64].astype(jnp.int32))

            state, sums = lax.scan(body, state, jnp.arange(repeat_steps))
            return state, jnp.sum(sums)

    out_specs = (st_specs, P() if repeat_steps else frame_spec)
    sharded_fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(st_specs, frame_spec, dyn_spec),
        out_specs=out_specs,
        check_vma=False,
    )

    state0 = jax.vmap(lambda _: init_state(h, w, levels))(jnp.arange(batch))
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), st_specs)
    state_sharded = jax.tree.map(jax.device_put, state0, shardings)

    jitted = jax.jit(
        sharded_fn,
        in_shardings=(shardings, NamedSharding(mesh, frame_spec), None),
        out_shardings=(shardings,
                       NamedSharding(mesh, P()) if repeat_steps
                       else NamedSharding(mesh, frame_spec)),
        donate_argnums=(0,),
    )
    return jitted, state_sharded
