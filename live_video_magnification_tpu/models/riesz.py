"""Phase (Riesz) magnification: Riesz pyramid + Butterworth phase bandpass.

Pure, scannable re-design of the reference's rieszMagnify
(reference src/processing/magnification/MagnifyCore.hpp:209-279):

  u8 -> f32/255 -> BGR->Lab, take luminance -> Riesz pyramid -> quaternionic
  phase difference vs the prior frame's pyramid -> per-level lo/hi Butterworth
  DF-II IIR on the accumulated phase -> amplitude-normalized phase change ->
  phase rotation of the band (amplification truncated at threshold) -> collapse
  -> merge L back into Lab -> BGR u8.

Functional state model (replacing the reference's two mutable pyramids +
"*old = *cur" deep copy, MagnifyCore.hpp:267): the carried state holds the prior
pyramid (band + Riesz pair per level) and, per active level, the lo/hi filters'
accumulated phase and DF-II registers. Butterworth coefficients are computed
host-side (float64) and passed as six traced scalars, so live cutoff changes
re-filter without recompiling; the reference's cutoff-change protocol
(reset filter state + rebuild the prior pyramid from the current frame,
MagnifyCore.hpp:243-254) maps to the `reset_filters` flag, and its NaN-degenerate
re-init loop (MagnifyCore.hpp:226) to `force_init`.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from live_video_magnification_tpu.ops.color import (
    bgr_to_lab,
    lab_to_bgr,
    to_u8,
    u8_to_unit_f32,
)
from live_video_magnification_tpu.ops.riesz import (
    RieszLevel,
    amplify_level,
    build_riesz_pyramid,
    collapse_riesz_pyramid,
    normalize_phase,
    phase_difference_and_amplitude,
    riesz_level_sizes,
)
from live_video_magnification_tpu.ops.temporal import CompExp, riesz_df2_step


class RieszDynParams(NamedTuple):
    amplification: jnp.ndarray
    threshold: jnp.ndarray       # co_wavelength * pi / 100 (MagnifyCore.hpp:214,269)
    b_lo: jnp.ndarray            # [3] low-cutoff Butterworth numerator
    a_lo: jnp.ndarray            # [3] denominator (a[0] == 1)
    b_hi: jnp.ndarray
    a_hi: jnp.ndarray
    reset_filters: jnp.ndarray   # bool: a cutoff changed this frame
    force_init: jnp.ndarray      # bool: degenerate coefficients -> re-init + passthrough


class RegPair(NamedTuple):
    """DF-II register pair of one Butterworth filter (itsRegister0/1,
    TemporalFilter.cpp:340-351)."""

    reg0: CompExp
    reg1: CompExp


class RieszState(NamedTuple):
    """10 state planes per active level (not 12): the lo and hi filters both
    accumulate the SAME quaternionic phase diff and are always reset together
    (MagnifyCore.hpp:243-254), so their unwrap accumulators are provably
    identical — `acc` carries the shared plane pair once (VERDICT round-3
    item 2a; the time-parallel scan already exploited this)."""

    count: jnp.ndarray
    old: Tuple[RieszLevel, ...]    # prior pyramid, all `levels` levels
    acc: Tuple[CompExp, ...]       # shared accumulated phase, per active level
    lo: Tuple[RegPair, ...]        # per active level (levels-1 entries)
    hi: Tuple[RegPair, ...]


def _zero_reg_pair(h: int, w: int) -> RegPair:
    # Distinct arrays per leaf: shared buffers would break argument donation.
    z = lambda: jnp.zeros((h, w), jnp.float32)
    return RegPair(CompExp(z(), z()), CompExp(z(), z()))


def init_state(h: int, w: int, levels: int) -> RieszState:
    from live_video_magnification_tpu.ops.riesz import _pyr_io_bf16

    sizes = riesz_level_sizes(h, w, levels)
    # LVMT_PYR_IO=bf16: the carried prior pyramid's ACTIVE band levels match
    # the build's bf16 planes; the residual octave stays f32 (it merges into
    # the collapse). Trace-time env read, keyed via the chain static key.
    band_dt = jnp.bfloat16 if _pyr_io_bf16() else jnp.float32
    old = tuple(
        RieszLevel(
            jnp.zeros((lh, lw), dt),
            CompExp(jnp.zeros((lh, lw), dt), jnp.zeros((lh, lw), dt)),
        )
        for i, (lh, lw) in enumerate(sizes)
        for dt in [band_dt if i < levels - 1 else jnp.float32]
    )
    acc = tuple(
        CompExp(jnp.zeros((lh, lw), jnp.float32), jnp.zeros((lh, lw), jnp.float32))
        for lh, lw in sizes[: levels - 1]
    )
    lo = tuple(_zero_reg_pair(lh, lw) for lh, lw in sizes[: levels - 1])
    hi = tuple(_zero_reg_pair(lh, lw) for lh, lw in sizes[: levels - 1])
    return RieszState(jnp.zeros((), jnp.int32), old, acc, lo, hi)


def step(
    state: RieszState,
    frame_u8: jnp.ndarray,  # [3, H, W] uint8 (phase mode requires color input)
    dyn: RieszDynParams,
    *,
    levels: int,
    use_pallas: bool | None = None,
    phase_fused: bool = False,
) -> Tuple[RieszState, jnp.ndarray]:
    lab = bgr_to_lab(u8_to_unit_f32(frame_u8))
    luma = lab[0]

    cur = build_riesz_pyramid(luma, levels, use_pallas=use_pallas)

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

    acc_state = tuple(masked(a) for a in state.acc)
    lo_state = tuple(masked(f) for f in state.lo)
    hi_state = tuple(masked(f) for f in state.hi)

    # Per active level: phase diff vs prior, then lo/hi DF-II IIR, then
    # normalize+amplify. The whole tail stays in jnp BY DEFAULT (round-3
    # roofline, docs/ROOFLINE.md): the Pallas amplify kernel measured 7.26 vs
    # 5.64 ms at 4K against the XLA-fused jnp tail (its per-tap scratch-ref
    # blur accumulation costs more than the lane relayouts it avoids; XLA
    # cannot fuse producers INTO a pallas_call's operands, so its inputs
    # materialize either way). The all-in-one riesz_phase_df2_fused pass
    # (LVMT_PHASE_FUSED=1) also measured slower — 16.9 vs 15.5 ms/4K-frame.
    # Both kernels remain behind flags for A/B and stay golden-tested.
    from live_video_magnification_tpu.ops.riesz import _use_fused_build

    new_acc: List[CompExp] = []
    new_lo: List[RegPair] = []
    new_hi: List[RegPair] = []
    lowpasses: List[jnp.ndarray] = []

    # Resolved by the CALLER at build time (chain static key / bench flag), never
    # from the environment inside a traced body (ADVICE round-2).
    phase_kernel = phase_fused
    from live_video_magnification_tpu.ops.riesz import (
        _tail_mode,
        _use_amplify_kernel,
        _use_mxu,
    )

    # bf16 pyramid planes (LVMT_PYR_IO) are cast to f32 at their consumers —
    # the cast fuses into each consumer's elementwise fusion, so only
    # storage is quantized, never arithmetic
    _f32 = lambda L: jax.tree.map(lambda x: x.astype(jnp.float32), L)

    for lvl in range(levels - 1):
        lh, lw = cur[lvl].lowpass.shape[-2], cur[lvl].lowpass.shape[-1]
        # LVMT_TAIL=mxu: banded-matmul blur tail (riesz_amplify_mxu) at
        # MXU-sized levels; smaller levels fall through to the jnp tail.
        mxu_tail = (
            use_pallas is None and not phase_kernel
            and cur[lvl].lowpass.ndim == 2
            and _tail_mode() == "mxu" and _use_mxu(lh, lw)
        )
        # LVMT_TAIL=level: the whole per-level temporal tail (phase front +
        # shared-acc DF-II + MXU blurs + amplify) as ONE kernel — 27 HBM
        # plane passes/level instead of ~36 (riesz_level_mxu).
        if (use_pallas is None and not phase_kernel
                and cur[lvl].lowpass.ndim == 2
                and _tail_mode() == "level" and _use_mxu(lh, lw)):
            from live_video_magnification_tpu.ops.pallas.riesz_level_mxu import (
                riesz_level_mxu,
            )

            _cl, _ol = _f32(cur[lvl]), _f32(state.old[lvl])
            out_l, acc2, lo2, hi2 = riesz_level_mxu(
                _cl.lowpass, _cl.riesz.cos, _cl.riesz.sin,
                _ol.lowpass, _ol.riesz.cos, _ol.riesz.sin,
                (state.acc[lvl].cos, state.acc[lvl].sin),
                (state.lo[lvl].reg0.cos, state.lo[lvl].reg0.sin,
                 state.lo[lvl].reg1.cos, state.lo[lvl].reg1.sin),
                (state.hi[lvl].reg0.cos, state.hi[lvl].reg0.sin,
                 state.hi[lvl].reg1.cos, state.hi[lvl].reg1.sin),
                dyn.b_lo, dyn.a_lo, dyn.b_hi, dyn.a_hi,
                rebuild_old, dyn.amplification, dyn.threshold,
            )
            new_acc.append(CompExp(acc2[0], acc2[1]))
            new_lo.append(RegPair(CompExp(lo2[0], lo2[1]),
                                  CompExp(lo2[2], lo2[3])))
            new_hi.append(RegPair(CompExp(hi2[0], hi2[1]),
                                  CompExp(hi2[2], hi2[3])))
            lowpasses.append(out_l)
            continue
        # The TAIL defaults to jnp even when the MXU build/collapse kernels are
        # on: the jnp normalize+amplify (XLA-fused blurs) measured FASTER than
        # riesz_amplify_fused at 4K (5.64 vs 7.26 ms, same-day A/B — see
        # _use_amplify_kernel). use_pallas=True still forces the kernel
        # (tests); LVMT_TAIL=pallas re-enables it for A/B.
        fused_tail = cur[lvl].lowpass.ndim == 2 and min(lh, lw) >= 16 and (
            use_pallas if use_pallas is not None
            else (_use_fused_build(lh, lw) and (phase_kernel or _use_amplify_kernel()))
        )
        if fused_tail and phase_kernel:
            from live_video_magnification_tpu.ops.pallas.riesz_amplify import (
                riesz_amplify_fused,
            )
            from live_video_magnification_tpu.ops.pallas.riesz_phase_fused import (
                riesz_phase_df2_fused,
            )

            def flat(rp: RegPair):
                # the kernel's per-filter 6-plane layout; the shared acc is
                # fed to both filters (they accumulate identically)
                return (state.acc[lvl].cos, state.acc[lvl].sin,
                        rp.reg0.cos, rp.reg0.sin, rp.reg1.cos, rp.reg1.sin)

            # raw prior/state: the kernel applies rebuild/zeroing itself
            _cl, _ol = _f32(cur[lvl]), _f32(state.old[lvl])
            amplitude, wc, ws, lo6, hi6 = riesz_phase_df2_fused(
                _cl.lowpass, _cl.riesz.cos, _cl.riesz.sin,
                _ol.lowpass, _ol.riesz.cos, _ol.riesz.sin,
                flat(state.lo[lvl]), flat(state.hi[lvl]),
                dyn.b_lo, dyn.a_lo, dyn.b_hi, dyn.a_hi,
                rebuild_old,
            )
            unflat = lambda t: RegPair(CompExp(t[2], t[3]), CompExp(t[4], t[5]))
            new_acc.append(CompExp(lo6[0], lo6[1]))  # == hi6[0..1]
            new_lo.append(unflat(lo6))
            new_hi.append(unflat(hi6))
            if use_pallas is True or _use_amplify_kernel():
                lowpasses.append(
                    riesz_amplify_fused(
                        amplitude, wc, ws,
                        _cl.lowpass, _cl.riesz.cos, _cl.riesz.sin,
                        dyn.amplification, dyn.threshold, preweighted=True,
                    )
                )
            else:
                # phase kernel + the (measured-faster) jnp blur tail: wc/ws are
                # already amplitude-weighted, so normalize is blur(w)/blur(amp)
                from live_video_magnification_tpu.ops.riesz import amplitude_blur

                ab = amplitude_blur(amplitude)
                normalized = CompExp(amplitude_blur(wc) / ab,
                                     amplitude_blur(ws) / ab)
                lowpasses.append(amplify_level(
                    _cl, normalized, dyn.amplification, dyn.threshold))
            continue

        pr = phase_difference_and_amplitude(
            _f32(cur[lvl]), _f32(old[lvl]),
            compute_blur=not (fused_tail or mxu_tail)
        )
        # Both filters read the SAME shared accumulator; XLA CSEs the duplicate
        # acc+diff, so only one accumulated-phase pair is computed and stored.
        lo_res, phase, lo_r0, lo_r1 = riesz_df2_step(
            acc_state[lvl], lo_state[lvl].reg0, lo_state[lvl].reg1,
            pr.phase_diff, dyn.b_lo, dyn.a_lo,
        )
        hi_res, _, hi_r0, hi_r1 = riesz_df2_step(
            acc_state[lvl], hi_state[lvl].reg0, hi_state[lvl].reg1,
            pr.phase_diff, dyn.b_hi, dyn.a_hi,
        )
        new_acc.append(phase)
        new_lo.append(RegPair(lo_r0, lo_r1))
        new_hi.append(RegPair(hi_r0, hi_r1))
        if mxu_tail:
            from live_video_magnification_tpu.ops.pallas.riesz_amplify_mxu import (
                riesz_amplify_mxu,
            )

            change = hi_res - lo_res
            # LVMT_TAIL_IO=bf16: the three transient planes (amplitude +
            # change pair) cross HBM at half the bytes; per-frame
            # intermediates only, so nothing accumulates the quantization
            # (the DF-II registers/acc stay f32)
            from live_video_magnification_tpu.ops.riesz import _tail_io_bf16

            tio = jnp.bfloat16 if _tail_io_bf16() else jnp.float32
            lowpasses.append(
                riesz_amplify_mxu(
                    pr.amplitude.astype(tio), change.cos.astype(tio),
                    change.sin.astype(tio),
                    cur[lvl].lowpass, cur[lvl].riesz.cos, cur[lvl].riesz.sin,
                    dyn.amplification, dyn.threshold,
                )
            )
            continue
        if fused_tail:  # default: jnp front + fused blur/amplify tail
            from live_video_magnification_tpu.ops.pallas.riesz_amplify import (
                riesz_amplify_fused,
            )

            change = hi_res - lo_res
            cl = _f32(cur[lvl])
            lowpasses.append(
                riesz_amplify_fused(
                    pr.amplitude, change.cos, change.sin,
                    cl.lowpass, cl.riesz.cos, cl.riesz.sin,
                    dyn.amplification, dyn.threshold,
                )
            )
            continue
        normalized = normalize_phase(
            hi_res, lo_res, pr.amplitude, pr.amplitude_blurred
        )
        lowpasses.append(
            amplify_level(_f32(cur[lvl]), normalized, dyn.amplification,
                          dyn.threshold)
        )
    lowpasses.append(cur[levels - 1].lowpass)  # untouched residual octave

    magnified = collapse_riesz_pyramid(lowpasses, use_pallas=use_pallas)

    merged = jnp.stack([magnified, lab[1], lab[2]])
    out_u8 = to_u8(lab_to_bgr(merged), 255.0, 1.0 / 255.0)

    # First frame and degenerate-coefficient frames emit the raw input unchanged
    # (MagnifyCore.hpp:226-239).
    passthrough = first | dyn.force_init
    out_u8 = jnp.where(passthrough, frame_u8, out_u8)

    # "*st.old = *st.cur" — the prior pyramid becomes this frame's (band + Riesz).
    # The carried dtype follows state.old (LVMT_PYR_IO: bf16 band levels; a
    # resumed f32 checkpoint stays f32), so chunked scans and checkpoints
    # stay dtype-self-consistent.
    new_old = jax.tree.map(lambda c, o: c.astype(o.dtype), tuple(cur),
                           state.old)
    new_state = RieszState(state.count + 1, new_old, tuple(new_acc),
                           tuple(new_lo), tuple(new_hi))
    return new_state, out_u8


def process_clip(
    frames_u8: jnp.ndarray,  # [T, 3, H, W] uint8
    dyn: RieszDynParams,
    *,
    levels: int,
    state: RieszState | None = None,
) -> Tuple[RieszState, jnp.ndarray]:
    t, c, h, w = frames_u8.shape
    if state is None:
        state = init_state(h, w, levels)

    def body(st, frame):
        return step(st, frame, dyn, levels=levels)

    return jax.lax.scan(body, state, frames_u8)


def process_clip_parallel(
    frames_u8: jnp.ndarray,  # [T, 3, H, W] uint8
    dyn: RieszDynParams,
    *,
    levels: int,
    state: RieszState | None = None,
) -> Tuple[RieszState, jnp.ndarray]:
    """Time-parallel batch export of phase mode (SURVEY.md §5 sequence parallelism).

    Every per-frame stage (Lab, pyramid build, phase difference vs the previous
    frame, normalize/amplify, collapse) is batched over T with vmap; the only
    truly sequential parts — the quaternionic phase accumulation
    (TemporalFilter.cpp:340-351's `itsPhase += phaseDiff`) and the lo/hi
    Butterworth DF-II registers — fuse into ONE 5-component associative affine
    scan per (cos|sin) component (`df2_dual_filter_parallel`), O(log T) depth.
    Under a mesh with the T axis sharded this is the sequence-parallel export
    path: XLA splits the scans into local scans plus shard-boundary combines
    over ICI.

    `state` enables chunked continuation (prior pyramid, accumulated phase and
    DF-II registers are carried); a cold start (state=None) seeds from the
    first frame's pyramid with zeroed filters. Static cutoffs for the whole
    clip — the batch-export contract. `reset_filters` / `force_init` mid-clip
    events are a streaming concern; use process_clip.

    Returns (final_state, outs [T, 3, H, W] u8), numerically equivalent to
    process_clip (exact on typical smooth video; on noise-like input the
    cumsum/scan reassociation feeding arccos and small-amplitude divisions can
    shift u8 rounding, so parity tests should use realistic fixtures or a
    tolerance).
    """
    from live_video_magnification_tpu.ops.temporal import df2_dual_filter_parallel

    t = frames_u8.shape[0]
    h, w = frames_u8.shape[-2], frames_u8.shape[-1]
    if state is None:
        state = init_state(h, w, levels)
    first = state.count == 0

    def front(frame_u8):
        lab = bgr_to_lab(u8_to_unit_f32(frame_u8))
        pyr = build_riesz_pyramid(lab[0], levels, use_pallas=False)
        return lab, tuple(pyr)

    labs, pyrs = jax.vmap(front)(frames_u8)  # leaves [T, lh, lw]

    def masked(x):
        return jnp.where(first, jnp.zeros_like(x), x)

    def dual(diff, acc: CompExp, lo_rp: RegPair, hi_rp: RegPair, comp):
        """Fused phase-accumulate + lo&hi DF-II for one (cos|sin) component:
        ONE 5-plane associative scan instead of 2 cumsums + 4 register scans
        (df2_dual_filter_parallel). The shared phase accumulator is carried
        ONCE in the state (RieszState.acc) — the reference resets both
        filters together (MagnifyCore.hpp:243-254) and feeds both the same
        diff, so they are identical by construction."""
        sel = (lambda ce: ce.cos) if comp == 0 else (lambda ce: ce.sin)
        return df2_dual_filter_parallel(
            sel(diff), dyn.b_lo, dyn.a_lo, dyn.b_hi, dyn.a_hi,
            acc_init=masked(sel(acc)),
            lo_init=(masked(sel(lo_rp.reg0)), masked(sel(lo_rp.reg1))),
            hi_init=(masked(sel(hi_rp.reg0)), masked(sel(hi_rp.reg1))),
        )

    lowpasses: List[jnp.ndarray] = []
    new_acc: List[CompExp] = []
    new_lo: List[RegPair] = []
    new_hi: List[RegPair] = []
    for lvl in range(levels - 1):
        cur = pyrs[lvl]
        # prior[t] = cur[t-1]; prior[0] = carried pyramid, or cur[0] on the
        # global first frame (the "rebuild_old" seed).
        prior = jax.tree.map(
            lambda x, s: jnp.concatenate(
                [jnp.where(first, x[:1], s[None]), x[:-1]], axis=0
            ),
            cur, state.old[lvl],
        )
        pr = jax.vmap(phase_difference_and_amplitude)(cur, prior)
        ylo_c, yhi_c, acc_c, fin_c = dual(pr.phase_diff, state.acc[lvl],
                                          state.lo[lvl], state.hi[lvl], 0)
        ylo_s, yhi_s, acc_s, fin_s = dual(pr.phase_diff, state.acc[lvl],
                                          state.lo[lvl], state.hi[lvl], 1)
        lo_res = CompExp(ylo_c, ylo_s)
        hi_res = CompExp(yhi_c, yhi_s)
        new_acc.append(CompExp(fin_c[0], fin_s[0]))
        new_lo.append(RegPair(
            CompExp(fin_c[1], fin_s[1]), CompExp(fin_c[2], fin_s[2])))
        new_hi.append(RegPair(
            CompExp(fin_c[3], fin_s[3]), CompExp(fin_c[4], fin_s[4])))
        normalized = jax.vmap(normalize_phase)(
            hi_res, lo_res, pr.amplitude, pr.amplitude_blurred
        )
        lowpasses.append(
            jax.vmap(
                lambda c, n: amplify_level(c, n, dyn.amplification, dyn.threshold)
            )(cur, normalized)
        )
    lowpasses.append(pyrs[levels - 1].lowpass)

    magnified = jax.vmap(
        lambda *lp: collapse_riesz_pyramid(list(lp), use_pallas=False)
    )(*lowpasses)

    merged = jnp.stack([magnified, labs[:, 1], labs[:, 2]], axis=1)
    out_u8 = jax.vmap(lambda m: to_u8(lab_to_bgr(m), 255.0, 1.0 / 255.0))(merged)
    # The global first frame (and force_init clips) pass the raw input through.
    passthrough = (jnp.zeros((t,), bool).at[0].set(True) & first) | dyn.force_init
    outs = jnp.where(passthrough[:, None, None, None], frames_u8, out_u8)

    new_old = jax.tree.map(
        lambda x, o: x.astype(o.dtype),
        tuple(RieszLevel(p.lowpass[-1],
                         CompExp(p.riesz.cos[-1], p.riesz.sin[-1]))
              for p in pyrs),
        state.old,
    )
    new_state = RieszState(state.count + t, new_old, tuple(new_acc),
                           tuple(new_lo), tuple(new_hi))
    return new_state, outs
