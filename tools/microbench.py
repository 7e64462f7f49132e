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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="2160x3840")
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--stages", default="scan_overhead,color,build,tail,collapse,full")
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
        lo, hi = state.lo, state.hi
        total = jnp.float32(0.0)
        new_lo, new_hi = [], []
        from live_video_magnification_tpu.ops.pallas.riesz_amplify import (
            riesz_amplify_fused,
        )

        for lvl in range(levels - 1):
            lh, lw = sizes[lvl]
            fused_tail = min(lh, lw) >= 16 and rops._use_fused_build(lh, lw)
            pr = rops.phase_difference_and_amplitude(
                cur[lvl], old[lvl], compute_blur=not fused_tail
            )
            lo_res, lo_p, lo_r0, lo_r1 = riesz_df2_step(
                lo[lvl].phase, lo[lvl].reg0, lo[lvl].reg1,
                pr.phase_diff, dyn.b_lo, dyn.a_lo)
            hi_res, hi_p, hi_r0, hi_r1 = riesz_df2_step(
                hi[lvl].phase, hi[lvl].reg0, hi[lvl].reg1,
                pr.phase_diff, dyn.b_hi, dyn.a_hi)
            new_lo.append(m.FilterLevelState(lo_p, lo_r0, lo_r1))
            new_hi.append(m.FilterLevelState(hi_p, hi_r0, hi_r1))
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
        state = m.RieszState(state.count + 1, state.old,
                             tuple(new_lo), tuple(new_hi))
        return state, total

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
        t0 = time.monotonic()
        carry, s = run(carry)
        sval = float(s)
        dt = max(1e-9, time.monotonic() - t0 - rtt)
        ms = dt / steps * 1e3
        results[name] = ms
        print(f"{name:14s} {ms:8.2f} ms/step   (compile {compile_s:.1f}s, "
              f"chk {sval:.3e})", flush=True)

    print("# " + " ".join(f"{k}={v:.2f}" for k, v in results.items()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
