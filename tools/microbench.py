#!/usr/bin/env python
"""Component microbenchmark for the phase (Riesz) pipeline on TPU.

Times each pipeline stage at a given resolution with the same scan-checksum
protocol as bench.py (one dispatch, N on-device steps, scalar readback), so the
axon relay's dispatch-time block_until_ready and slow device->host path cannot
skew results.

Stages: scan_overhead | color | build | tail | collapse | full

Usage: python tools/microbench.py [--res 2160x3840] [--levels 6] [--steps 20]
                                  [--stages build,tail,...]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import sys
import time
from functools import partial


# TPU v5e public peaks (cloud.google.com/tpu/docs/v5e): 197 TFLOP/s bf16,
# 819 GB/s HBM bandwidth per chip. The pipeline is elementwise/stencil-
# dominated f32, so the HBM roofline is the relevant speed-of-light.
V5E_HBM_BYTES_PER_S = 819e9
V5E_BF16_FLOPS = 197e12


def stage_traffic_model(h: int, w: int, levels: int) -> dict:
    """Minimal HBM bytes + approximate FLOPs per stage, per frame, from shapes
    (VERDICT round-2 item 3). "Minimal bytes" assumes perfect fusion: only
    fundamental stage inputs/outputs and carried state cross HBM; every
    intermediate (filtered planes, phase diffs, blur passes) stays in VMEM.
    That is the speed-of-light a fused implementation could approach, not what
    XLA necessarily achieves. FLOPs count multiply+add as 2.

    Per-level plane sizes come from riesz_level_sizes; the tail touches levels
    0..L-2 (the residual lowpass is untouched, RieszPyramid.cpp:240-252).
    """
    from live_video_magnification_tpu.ops import riesz as rops

    sizes = rops.riesz_level_sizes(h, w, levels)
    p = float(h * w)
    p_l = [float(lh * lw) for lh, lw in sizes]
    p_active = sum(p_l[: levels - 1])
    p_all = sum(p_l)
    f32 = 4.0

    model = {}
    # Lab roundtrip: read 3 u8 planes, write 3 u8 planes; ~100 flops/px each way
    model["color"] = {"bytes": 6 * p, "flops": 200 * p}
    # build: read luma (u8 plane), write 3 f32 planes per level (lowpass +
    # riesz cos/sin). conv 9x9 lowpass+highpass (2*81 MAC) + 2x 1x5 riesz per px.
    model["build"] = {"bytes": p + 3 * f32 * p_all,
                      "flops": (2 * 162 + 2 * 10) * p_active + 162 * p_l[-1]}
    # tail per active level: read cur(3) + old(3) + filter state(12: phase/
    # reg0/reg1 x lo/hi x cos/sin); write state(12) + amplified lowpass(1).
    # flops: quaternion phase diff ~80, 13x13 separable blurs (2 passes x 26
    # MAC x 2 blurs) ~208, DF-II 2 filters x 2 comps ~40, amplify ~40.
    model["tail"] = {"bytes": (6 + 12 + 12 + 1) * f32 * p_active,
                     "flops": 370 * p_active}
    # collapse: read all lowpasses, write luma plane; zero-inject + 9x9 conv
    model["collapse"] = {"bytes": f32 * (p_all + p), "flops": 180 * p_all}
    # full step = color + build + tail + collapse + old-pyramid update
    # (*old = *cur deep copy: write 3 planes/level; reads already counted)
    model["full"] = {
        "bytes": sum(m["bytes"] for m in model.values()) + 3 * f32 * p_all,
        "flops": sum(m["flops"] for m in model.values()),
    }
    model["scan_overhead"] = {"bytes": 0.0, "flops": 0.0}
    return model


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="2160x3840")
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--stages", default="scan_overhead,color,build,tail,collapse,full")
    ap.add_argument("--json", default=None,
                    help="write measurements + roofline model to this path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from live_video_magnification_tpu.models import riesz as m
    from live_video_magnification_tpu.ops import riesz as rops
    from live_video_magnification_tpu.ops.color import (
        bgr_to_lab,
        lab_to_bgr,
        to_u8,
        u8_to_unit_f32,
    )
    from live_video_magnification_tpu.ops.temporal import (
        butterworth_bandpass_coeffs,
        riesz_df2_step,
    )

    h, w = (int(v) for v in args.res.split("x"))
    levels = args.levels
    steps = args.steps

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 255, (3, h, w + 64), dtype=np.uint8))

    b_lo, a_lo = butterworth_bandpass_coeffs(1.0, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(5.0, 30.0)
    dyn = m.RieszDynParams(
        jnp.float32(50.0), jnp.float32(0.5 * math.pi),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )

    sizes = rops.riesz_level_sizes(h, w, levels)

    def frame_at(t):
        return jax.lax.dynamic_slice_in_dim(base, t % 64, w, axis=2)

    def chk(x):
        return jnp.sum(x[..., ::64, ::64].astype(jnp.float32))

    # --- stage step functions: (carry, t) -> (carry, scalar) ------------------
    def step_scan_overhead(state, t):
        return state, chk(frame_at(t))

    def step_color(state, t):
        lab = bgr_to_lab(u8_to_unit_f32(frame_at(t)))
        out = to_u8(lab_to_bgr(lab), 255.0, 1.0 / 255.0)
        return state, chk(out)

    def step_build(state, t):
        luma = u8_to_unit_f32(frame_at(t))[0]
        pyr = rops.build_riesz_pyramid(luma, levels)
        return state, sum(chk(l.lowpass) + chk(l.riesz.cos) for l in pyr)

    def make_pyr(seed):
        r = np.random.default_rng(seed)
        return tuple(
            rops.RieszLevel(
                jnp.asarray(r.normal(size=(lh, lw)), jnp.float32),
                rops.CompExp(
                    jnp.asarray(r.normal(size=(lh, lw)), jnp.float32),
                    jnp.asarray(r.normal(size=(lh, lw)), jnp.float32),
                ),
            )
            for lh, lw in sizes
        )

    cur0, old0 = make_pyr(1), make_pyr(2)

    def step_tail(state, t):
        # Perturb by a per-step scalar (fuses into consumers; no extra pass).
        s = 1.0 + 1e-6 * t.astype(jnp.float32)
        cur = jax.tree.map(lambda x: x * s, cur0, is_leaf=lambda x: x is None)
        old = jax.tree.map(lambda x: x * s, old0, is_leaf=lambda x: x is None)
        acc, lo, hi = state.acc, state.lo, state.hi
        total = jnp.float32(0.0)
        new_acc, new_lo, new_hi = [], [], []
        from live_video_magnification_tpu.ops.pallas.riesz_amplify import (
            riesz_amplify_fused,
        )

        for lvl in range(levels - 1):
            lh, lw = sizes[lvl]
            fused_tail = min(lh, lw) >= 16 and rops._use_fused_build(lh, lw)
            pr = rops.phase_difference_and_amplitude(
                cur[lvl], old[lvl], compute_blur=not fused_tail
            )
            lo_res, phase, lo_r0, lo_r1 = riesz_df2_step(
                acc[lvl], lo[lvl].reg0, lo[lvl].reg1,
                pr.phase_diff, dyn.b_lo, dyn.a_lo)
            hi_res, _, hi_r0, hi_r1 = riesz_df2_step(
                acc[lvl], hi[lvl].reg0, hi[lvl].reg1,
                pr.phase_diff, dyn.b_hi, dyn.a_hi)
            new_acc.append(phase)
            new_lo.append(m.RegPair(lo_r0, lo_r1))
            new_hi.append(m.RegPair(hi_r0, hi_r1))
            if fused_tail:
                change = hi_res - lo_res
                out = riesz_amplify_fused(
                    pr.amplitude, change.cos, change.sin,
                    cur[lvl].lowpass, cur[lvl].riesz.cos, cur[lvl].riesz.sin,
                    dyn.amplification, dyn.threshold)
            else:
                norm = rops.normalize_phase(
                    hi_res, lo_res, pr.amplitude, pr.amplitude_blurred)
                out = rops.amplify_level(cur[lvl], norm, dyn.amplification,
                                         dyn.threshold)
            total = total + chk(out)
        state = m.RieszState(state.count + 1, state.old, tuple(new_acc),
                             tuple(new_lo), tuple(new_hi))
        return state, total

    def step_tail_front(state, t):
        """Phase diff + amplitude only (no DF-II, no amplify kernel)."""
        s = 1.0 + 1e-6 * t.astype(jnp.float32)
        total = jnp.float32(0.0)
        for lvl in range(levels - 1):
            cur = jax.tree.map(lambda x: x * s, cur0[lvl])
            old = jax.tree.map(lambda x: x * s, old0[lvl])
            pr = rops.phase_difference_and_amplitude(cur, old, compute_blur=False)
            total = total + chk(pr.phase_diff.cos) + chk(pr.amplitude)
        return state, total

    def step_tail_df2(state, t):
        """Phase front + DF-II state update, NO amplify/blur kernel."""
        s = 1.0 + 1e-6 * t.astype(jnp.float32)
        acc, lo, hi = state.acc, state.lo, state.hi
        total = jnp.float32(0.0)
        new_acc, new_lo, new_hi = [], [], []
        for lvl in range(levels - 1):
            cur = jax.tree.map(lambda x: x * s, cur0[lvl])
            old = jax.tree.map(lambda x: x * s, old0[lvl])
            pr = rops.phase_difference_and_amplitude(cur, old, compute_blur=False)
            lo_res, phase, lo_r0, lo_r1 = riesz_df2_step(
                acc[lvl], lo[lvl].reg0, lo[lvl].reg1,
                pr.phase_diff, dyn.b_lo, dyn.a_lo)
            hi_res, _, hi_r0, hi_r1 = riesz_df2_step(
                acc[lvl], hi[lvl].reg0, hi[lvl].reg1,
                pr.phase_diff, dyn.b_hi, dyn.a_hi)
            new_acc.append(phase)
            new_lo.append(m.RegPair(lo_r0, lo_r1))
            new_hi.append(m.RegPair(hi_r0, hi_r1))
            total = total + chk(hi_res.cos - lo_res.cos) + chk(pr.amplitude)
        state = m.RieszState(state.count + 1, state.old, tuple(new_acc),
                             tuple(new_lo), tuple(new_hi))
        return state, total

    def step_tail_amplify(state, t):
        """The fused blur+normalize+amplify Pallas kernel alone (static
        inputs perturbed per step)."""
        from live_video_magnification_tpu.ops.pallas.riesz_amplify import (
            riesz_amplify_fused,
        )

        s = 1.0 + 1e-6 * t.astype(jnp.float32)
        total = jnp.float32(0.0)
        for lvl in range(levels - 1):
            cur = cur0[lvl]
            amp = jnp.abs(cur.riesz.cos) * s
            out = riesz_amplify_fused(
                amp, cur.riesz.cos * (0.1 * s), cur.riesz.sin * 0.1,
                cur.lowpass, cur.riesz.cos, cur.riesz.sin,
                dyn.amplification, dyn.threshold)
            total = total + chk(out)
        return state, total

    def step_tail_jnp(state, t):
        """Whole tail with the Pallas amplify kernel OFF (jnp normalize +
        amplify; XLA-fused shifted-add 13x13 blurs) — the A/B for the kernel."""
        s = 1.0 + 1e-6 * t.astype(jnp.float32)
        cur = jax.tree.map(lambda x: x * s, cur0, is_leaf=lambda x: x is None)
        old = jax.tree.map(lambda x: x * s, old0, is_leaf=lambda x: x is None)
        acc, lo, hi = state.acc, state.lo, state.hi
        total = jnp.float32(0.0)
        new_acc, new_lo, new_hi = [], [], []
        for lvl in range(levels - 1):
            pr = rops.phase_difference_and_amplitude(cur[lvl], old[lvl],
                                                     compute_blur=True)
            lo_res, phase, lo_r0, lo_r1 = riesz_df2_step(
                acc[lvl], lo[lvl].reg0, lo[lvl].reg1,
                pr.phase_diff, dyn.b_lo, dyn.a_lo)
            hi_res, _, hi_r0, hi_r1 = riesz_df2_step(
                acc[lvl], hi[lvl].reg0, hi[lvl].reg1,
                pr.phase_diff, dyn.b_hi, dyn.a_hi)
            new_acc.append(phase)
            new_lo.append(m.RegPair(lo_r0, lo_r1))
            new_hi.append(m.RegPair(hi_r0, hi_r1))
            norm = rops.normalize_phase(
                hi_res, lo_res, pr.amplitude, pr.amplitude_blurred)
            out = rops.amplify_level(cur[lvl], norm, dyn.amplification,
                                     dyn.threshold)
            total = total + chk(out)
        state = m.RieszState(state.count + 1, state.old, tuple(new_acc),
                             tuple(new_lo), tuple(new_hi))
        return state, total

    def step_tail_mxu(state, t):
        """Whole tail with the MXU-banded blur kernel (riesz_amplify_mxu) —
        the round-4 fast-mode pairing's tail."""
        from live_video_magnification_tpu.ops.pallas.riesz_amplify_mxu import (
            riesz_amplify_mxu,
        )

        s = 1.0 + 1e-6 * t.astype(jnp.float32)
        cur = jax.tree.map(lambda x: x * s, cur0, is_leaf=lambda x: x is None)
        old = jax.tree.map(lambda x: x * s, old0, is_leaf=lambda x: x is None)
        acc, lo, hi = state.acc, state.lo, state.hi
        total = jnp.float32(0.0)
        new_acc, new_lo, new_hi = [], [], []
        for lvl in range(levels - 1):
            pr = rops.phase_difference_and_amplitude(cur[lvl], old[lvl],
                                                     compute_blur=False)
            lo_res, phase, lo_r0, lo_r1 = riesz_df2_step(
                acc[lvl], lo[lvl].reg0, lo[lvl].reg1,
                pr.phase_diff, dyn.b_lo, dyn.a_lo)
            hi_res, _, hi_r0, hi_r1 = riesz_df2_step(
                acc[lvl], hi[lvl].reg0, hi[lvl].reg1,
                pr.phase_diff, dyn.b_hi, dyn.a_hi)
            new_acc.append(phase)
            new_lo.append(m.RegPair(lo_r0, lo_r1))
            new_hi.append(m.RegPair(hi_r0, hi_r1))
            change = hi_res - lo_res
            out = riesz_amplify_mxu(
                pr.amplitude, change.cos, change.sin,
                cur[lvl].lowpass, cur[lvl].riesz.cos, cur[lvl].riesz.sin,
                dyn.amplification, dyn.threshold)
            total = total + chk(out)
        state = m.RieszState(state.count + 1, state.old, tuple(new_acc),
                             tuple(new_lo), tuple(new_hi))
        return state, total

    def step_full_jnp(state, t):
        st, out = m.step(state, frame_at(t), dyn, levels=levels,
                         use_pallas=False)
        return st, chk(out)

    def step_collapse(state, t):
        s = 1.0 + 1e-6 * t.astype(jnp.float32)
        lows = [c.lowpass * s for c in cur0]
        out = rops.collapse_riesz_pyramid(lows)
        return state, chk(out)

    full_step = partial(m.step, levels=levels)

    def step_full(state, t):
        state, out = full_step(state, frame_at(t), dyn)
        return state, chk(out)

    stage_fns = {
        "scan_overhead": (step_scan_overhead, lambda: jnp.zeros(())),
        "color": (step_color, lambda: jnp.zeros(())),
        "build": (step_build, lambda: jnp.zeros(())),
        "tail": (step_tail, lambda: m.init_state(h, w, levels)),
        "tail_front": (step_tail_front, lambda: jnp.zeros(())),
        "tail_df2": (step_tail_df2, lambda: m.init_state(h, w, levels)),
        "tail_amplify": (step_tail_amplify, lambda: jnp.zeros(())),
        "tail_jnp": (step_tail_jnp, lambda: m.init_state(h, w, levels)),
        "tail_mxu": (step_tail_mxu, lambda: m.init_state(h, w, levels)),
        "full_jnp": (step_full_jnp, lambda: m.init_state(h, w, levels)),
        "collapse": (step_collapse, lambda: jnp.zeros(())),
        "full": (step_full, lambda: m.init_state(h, w, levels)),
    }

    # rtt probe
    rtt_fn = jax.jit(lambda x: x + 1.0)
    float(rtt_fn(jnp.float32(0.0)))
    t0 = time.monotonic()
    float(rtt_fn(jnp.float32(1.0)))
    rtt = time.monotonic() - t0

    results = {}
    for name in args.stages.split(","):
        fn, make_carry = stage_fns[name]

        @partial(jax.jit, donate_argnums=(0,))
        def run(carry, fn=fn):
            carry, sums = jax.lax.scan(fn, carry, jnp.arange(steps))
            return carry, jnp.sum(sums)

        t0 = time.monotonic()
        carry, s = run(make_carry())
        sval = float(s)
        compile_s = time.monotonic() - t0
        # best-of-3 timed dispatches (CLAUDE.md relay-noise protocol)
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            carry, s = run(carry)
            sval = float(s)
            best = min(best, max(1e-9, time.monotonic() - t0 - rtt))
        ms = best / steps * 1e3
        results[name] = ms
        print(f"{name:14s} {ms:8.2f} ms/step   (compile {compile_s:.1f}s, "
              f"chk {sval:.3e})", flush=True)

    print("# " + " ".join(f"{k}={v:.2f}" for k, v in results.items()))

    if args.json:
        import json

        model = stage_traffic_model(h, w, levels)
        overhead = results.get("scan_overhead", 0.0)
        report = {
            "artifact": "roofline",
            "device": jax.devices()[0].device_kind,
            "geometry": {"h": h, "w": w, "levels": levels},
            "peaks": {"hbm_bytes_per_s": V5E_HBM_BYTES_PER_S,
                      "bf16_flops": V5E_BF16_FLOPS},
            "note": ("bytes_min = perfectly-fused HBM speed-of-light from "
                     "shapes (inputs+outputs+state only); pct_of_sol = "
                     "sol_ms/measured — a LOWER bound on achieved efficiency "
                     "because XLA materializes some intermediates. "
                     "scan_overhead is subtracted from each stage."),
            "stages": {},
        }
        for name, ms in results.items():
            if name not in model:
                continue
            m = model[name]
            net_ms = max(ms - (overhead if name != "scan_overhead" else 0.0),
                         1e-6)
            sol_hbm_ms = m["bytes"] / V5E_HBM_BYTES_PER_S * 1e3
            sol_flops_ms = m["flops"] / V5E_BF16_FLOPS * 1e3
            sol_ms = max(sol_hbm_ms, sol_flops_ms)
            report["stages"][name] = {
                "measured_ms": round(net_ms, 3),
                "bytes_min": m["bytes"],
                "flops": m["flops"],
                "sol_hbm_ms": round(sol_hbm_ms, 3),
                "sol_mxu_ms": round(sol_flops_ms, 4),
                "bound": "hbm" if sol_hbm_ms >= sol_flops_ms else "mxu",
                "pct_of_sol": round(100.0 * sol_ms / net_ms, 1),
            }
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
