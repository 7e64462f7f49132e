#!/usr/bin/env python
"""Sweep LVMT_MXU_PRECISION at 4K: throughput AND on-device parity vs the jnp
f32 path (PSNR computed on device — the relay's 320 KB/s device->host path
makes frame readback infeasible; a scalar MSE is 4 bytes).

Run per setting in a fresh process (the knob is read at trace time):
    LVMT_MXU_PRECISION=high python tools/precision_sweep.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import math
import os
import sys
import time
from functools import partial


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from live_video_magnification_tpu.models import riesz as m
    from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs

    h, w, levels, steps = 2160, 3840, 6, 30
    setting = os.environ.get("LVMT_MXU_PRECISION", "highest")

    b_lo, a_lo = butterworth_bandpass_coeffs(1.0, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(5.0, 30.0)
    dyn = m.RieszDynParams(
        jnp.float32(50.0), jnp.float32(0.5 * math.pi),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 255, (3, h, w + 64), dtype=np.uint8))

    # --- parity: pallas path (current precision) vs jnp f32 path, on device ---
    @partial(jax.jit, static_argnames=("n",))
    def parity(n):
        stp = m.init_state(h, w, levels)
        stj = m.init_state(h, w, levels)

        def body(carry, t):
            stp, stj, _ = carry
            frame = jax.lax.dynamic_slice_in_dim(base, t % 64, w, axis=2)
            stp, op = m.step(stp, frame, dyn, levels=levels, use_pallas=True)
            stj, oj = m.step(stj, frame, dyn, levels=levels, use_pallas=False)
            d = op.astype(jnp.float32) - oj.astype(jnp.float32)
            return (stp, stj, 0.0), (jnp.mean(d * d), jnp.max(jnp.abs(d)))

        (_, _, _), (mses, maxes) = jax.lax.scan(body, (stp, stj, 0.0), jnp.arange(n))
        return jnp.max(mses), jnp.max(maxes)

    mse, mx = parity(6)
    mse, mx = float(mse), float(mx)
    psnr = 99.0 if mse == 0 else 10 * math.log10(255.0**2 / mse)

    # --- throughput (same protocol as bench.py) ---
    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def run_n(state, dyn, n):
        def body(st, t):
            frame = jax.lax.dynamic_slice_in_dim(base, t % 64, w, axis=2)
            st, out = m.step(st, frame, dyn, levels=levels)
            return st, jnp.sum(out[:, ::64, ::64].astype(jnp.int32))

        state, sums = jax.lax.scan(body, state, jnp.arange(n))
        return state, jnp.sum(sums)

    state = m.init_state(h, w, levels)
    state, chk = run_n(state, dyn, steps)
    int(chk)
    rtt_fn = jax.jit(lambda x: x + 1.0)
    float(rtt_fn(jnp.float32(0.0)))
    t0 = time.monotonic()
    float(rtt_fn(jnp.float32(1.0)))
    rtt = time.monotonic() - t0
    t0 = time.monotonic()
    state, chk = run_n(state, dyn, steps)
    int(chk)
    dt = max(1e-9, time.monotonic() - t0 - rtt)

    print(json.dumps({
        "precision": setting,
        "fps": round(steps / dt, 2),
        "ms_per_frame": round(dt / steps * 1e3, 2),
        "worst_frame_psnr_vs_jnp_f32_db": round(psnr, 1),
        "max_abs_u8_diff": mx,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
