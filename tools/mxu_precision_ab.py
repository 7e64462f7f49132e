#!/usr/bin/env python
"""Same-session A/B of the MXU banded-stencil precision (ROOFLINE follow-up).

The conv9/band5/inject banded matmuls default to Precision.HIGHEST (6-pass
f32 emulation): the roofline shows build+collapse are MXU-rate-bound there.
This script, in ONE process on the real chip:

  1. times the full 4K phase step under HIGHEST vs HIGH vs DEFAULT
     (scan-checksum protocol, best-of-3; per-config errors contained — HIGH
     turns out to be unsupported by the Mosaic lowering), and
  2. runs a 720p 20-frame clip under each and reports the max u8 output
     delta vs HIGHEST (device-side comparison, scalar readback).

Precision switches via the LVMT_MXU_PRECISION env var, which the public
kernel entry points resolve and thread as a STATIC jit argument — the first
version of this tool patched a module function read at kernel-trace time,
which the module-level jit caches froze on the first config (a false
"all identical" null, recorded and since corrected).

Usage: python tools/mxu_precision_ab.py [out.json]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import math
import sys
import time
from functools import partial


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MXU_PRECISION_AB.json"

    import jax
    import jax.numpy as jnp
    import numpy as np

    import live_video_magnification_tpu.ops.pallas.conv9_mxu as c9
    from live_video_magnification_tpu.models import riesz as m
    from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs

    def set_precision(name):
        # The precision is a STATIC argument of the jitted _run_* wrappers,
        # resolved from this env var at the public entry points — the earlier
        # version of this tool patched a module function read at kernel-trace
        # time, which the module-level jit caches froze on the first iteration
        # (all later configs silently re-served the first trace).
        import os

        os.environ["LVMT_MXU_PRECISION"] = name.lower()

    b_lo, a_lo = butterworth_bandpass_coeffs(1.0, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(5.0, 30.0)
    dyn = m.RieszDynParams(
        jnp.float32(50.0), jnp.float32(0.5 * math.pi),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )

    rtt_fn = jax.jit(lambda x: x + 1.0)
    float(rtt_fn(jnp.float32(0.0)))
    t0 = time.monotonic()
    float(rtt_fn(jnp.float32(1.0)))
    rtt = time.monotonic() - t0

    report = {"artifact": "mxu-precision-ab", "device": jax.devices()[0].device_kind,
              "timing_4k": {}, "accuracy_720p_vs_highest": {}}

    # ---- 1. full-step timing at 4K, levels=6 --------------------------------
    h, w, levels, steps = 2160, 3840, 6, 20
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 255, (3, h, w + 64), dtype=np.uint8))

    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        set_precision(prec)
        try:
            _timing_one(prec, report, m, dyn, base, h, w, levels, steps, rtt)
        except Exception as e:
            report["timing_4k"][prec] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"4K {prec}: ERROR {str(e)[:150]}", flush=True)

    # ---- 2. output parity on a 720p clip ------------------------------------
    h2, w2, t_clip = 720, 1280, 20
    clip = rng.integers(0, 255, (t_clip, 3, h2, w2), dtype=np.uint8)
    clip = ((clip.astype(np.float32) + np.roll(clip, 1, 2) + np.roll(clip, 1, 3))
            / 3.0).astype(np.uint8)
    clip_d = jnp.asarray(clip)

    def run_clip(prec):
        set_precision(prec)
        step = partial(m.step, levels=5)

        @jax.jit
        def scan_clip(state, frames):
            def body(st, fr):
                st, out = step(st, fr, dyn)
                return st, out
            return jax.lax.scan(body, state, frames)

        _st, outs = scan_clip(m.init_state(h2, w2, 5), clip_d)
        return outs

    ref = run_clip("HIGHEST")
    for prec in ("HIGH", "DEFAULT"):
        try:
            got = run_clip(prec)
            d = jax.jit(lambda a, b: jnp.max(jnp.abs(
                a.astype(jnp.int32) - b.astype(jnp.int32))))(ref, got)
            mse = float(jax.jit(lambda a, b: jnp.mean(jnp.square(
                (a.astype(jnp.float32) - b.astype(jnp.float32)))))(ref, got))
            psnr = 99.0 if mse <= 0 else 10 * math.log10(255.0 * 255.0 / mse)
            report["accuracy_720p_vs_highest"][prec] = {
                "max_u8_delta": int(d), "psnr_db": round(psnr, 1)}
            print(f"720p {prec} vs HIGHEST: max u8 delta {int(d)}, "
                  f"PSNR {psnr:.1f} dB", flush=True)
        except Exception as e:
            report["accuracy_720p_vs_highest"][prec] = {
                "error": f"{type(e).__name__}: {e}"[:200]}
            print(f"720p {prec}: ERROR {str(e)[:150]}", flush=True)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")
    return 0


def _timing_one(prec, report, m, dyn, base, h, w, levels, steps, rtt):
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    step = partial(m.step, levels=levels)

    def body(st, t):
        frame = jax.lax.dynamic_slice_in_dim(base, t % 64, w, axis=2)
        st, out = step(st, frame, dyn)
        return st, jnp.sum(out[:, ::64, ::64].astype(jnp.int32))

    @partial(jax.jit, donate_argnums=(0,))
    def run(state):
        state, sums = jax.lax.scan(body, state, jnp.arange(steps))
        return state, jnp.sum(sums)

    t0 = time.monotonic()
    state, s = run(m.init_state(h, w, levels))
    warm = int(s)
    compile_s = time.monotonic() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        state, s = run(state)
        chk = int(s)
        best = min(best, max(1e-9, time.monotonic() - t0 - rtt))
    ms = best / steps * 1e3
    report["timing_4k"][prec] = {
        "ms_per_frame": round(ms, 3), "fps": round(1e3 / ms, 2),
        "compile_s": round(compile_s, 1), "checksum": chk, "warm": warm,
    }
    print(f"4K {prec}: {ms:.2f} ms/frame ({1e3/ms:.1f} fps)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
