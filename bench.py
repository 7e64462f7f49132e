#!/usr/bin/env python
"""Headline benchmark: 4K phase-based magnification throughput per chip.

Prints ONE JSON line:
  {"metric": "phase_4k_fps_per_chip", "value": N, "unit": "fps", "vs_baseline": N/60}

BASELINE.md north star: >= 60 fps at 4K, levels=6, phase (Riesz) mode on a
v5e-8 (60 fps aggregate over 8 chips). vs_baseline reports this single chip
against the full 60 fps target: vs_baseline >= 1.0 on ONE chip beats the
8-chip target outright.

Measurement protocol: the whole timed run is ONE dispatch — a lax.scan of N
magnification steps over device-generated frames, synchronized by a single
scalar checksum readback. This is immune to two quirks of the axon TPU relay:
jax.block_until_ready returning at dispatch time, and glacial device->host
transfers (the checksum is 4 bytes and doubles as proof of execution).

Flags: --small (720p), --steps N, --mode phase|laplace|color.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from functools import partial


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="720p instead of 4K")
    ap.add_argument("--res", default=None, help="HxW override, e.g. 480x640")
    ap.add_argument("--levels", type=int, default=None)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--mode", default="phase", choices=["phase", "laplace", "color"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.res:
        h, w = (int(v) for v in args.res.split("x"))
        levels = args.levels or 4
        name_res = f"{h}x{w}"
    elif args.small:
        h, w, levels = 720, 1280, 5
        name_res = "720p"
    else:
        h, w, levels = 2160, 3840, 6
        name_res = "4k"
    if args.levels:
        levels = args.levels

    fps_cfg = 30.0

    if args.mode == "phase":
        from live_video_magnification_tpu.models import riesz as m
        from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs

        b_lo, a_lo = butterworth_bandpass_coeffs(1.0, fps_cfg)
        b_hi, a_hi = butterworth_bandpass_coeffs(5.0, fps_cfg)
        dyn = m.RieszDynParams(
            jnp.float32(50.0), jnp.float32(0.5 * math.pi),
            jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
            jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
            jnp.asarray(False), jnp.asarray(False),
        )
        state = m.init_state(h, w, levels)
        step = partial(m.step, levels=levels)
    elif args.mode == "laplace":
        from live_video_magnification_tpu.models import motion as m
        from live_video_magnification_tpu.models.params import motion_hz_to_blend

        dyn = m.MotionDynParams(
            jnp.float32(20.0), jnp.float32(500.0),
            jnp.float32(motion_hz_to_blend(1.0, fps_cfg)),
            jnp.float32(motion_hz_to_blend(5.0, fps_cfg)),
            jnp.float32(0.3),
        )
        state = m.init_state(h, w, 3, levels)
        step = partial(m.step, levels=levels)
    else:
        from live_video_magnification_tpu.models import color as m

        dyn = m.ColorDynParams(jnp.float32(100.0), jnp.float32(0.84), jnp.float32(1.43))
        state = m.init_state(h, w, 3, levels, fps_cfg)
        step = partial(m.step, levels=levels, framerate=fps_cfg)

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 255, (3, h, w + 64), dtype=np.uint8))

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def run_n(state, dyn, n):
        def body(st, t):
            frame = jax.lax.dynamic_slice_in_dim(base, t % 64, w, axis=2)
            st, out = step(st, frame, dyn)
            return st, jnp.sum(out[:, ::64, ::64].astype(jnp.int32))

        state, sums = jax.lax.scan(body, state, jnp.arange(n))
        return state, jnp.sum(sums)

    # Warmup/compile with the SAME static n as the timed run (one executable).
    t0 = time.monotonic()
    state, chk = run_n(state, dyn, args.steps)
    warm = int(chk)
    compile_s = time.monotonic() - t0
    # Scalar round-trip time: compile the probe first, then measure its 2nd call.
    rtt_fn = jax.jit(lambda x: x + 1.0)
    float(rtt_fn(jnp.float32(0.0)))
    t0 = time.monotonic()
    _ = float(rtt_fn(jnp.float32(1.0)))
    rtt = time.monotonic() - t0

    t0 = time.monotonic()
    state, chk = run_n(state, dyn, args.steps)
    final = int(chk)
    dt = max(1e-9, time.monotonic() - t0 - rtt)
    fps = args.steps / dt

    metric = f"{args.mode}_{name_res}_fps_per_chip"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))
    print(f"# device={jax.devices()[0].device_kind} levels={levels} "
          f"compile+warm={compile_s:.1f}s rtt={rtt*1e3:.0f}ms "
          f"steady={dt/args.steps*1e3:.1f}ms/frame checksums=({warm},{final})",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
