#!/usr/bin/env python
"""Headline benchmark: 4K phase-based magnification throughput per chip.

Prints ONE JSON line:
  {"metric": "phase_4k_fps_per_chip", "value": N, "unit": "fps", "vs_baseline": N/60}

BASELINE.md north star: >= 60 fps at 4K, levels=6, phase (Riesz) mode on a
v5e-8 — i.e. 60 fps aggregate over 8 chips. vs_baseline reports this chip's
throughput against the full 60 fps target, so vs_baseline >= 1.0 on ONE chip
means the single chip alone beats the 8-chip target.

Flags: --small (720p, for CPU smoke runs), --steps N, --mode phase|laplace|color.
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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--mode", default="phase", choices=["phase", "laplace", "color"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.small:
        h, w, levels = 720, 1280, 5
        name_res = "720p"
    else:
        h, w, levels = 2160, 3840, 6
        name_res = "4k"

    fps_cfg = 30.0
    rng = np.random.default_rng(0)
    frame_np = rng.integers(0, 255, (3, h, w), dtype=np.uint8)

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
        step = jax.jit(partial(m.step, levels=levels), donate_argnums=(0,))
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
        step = jax.jit(partial(m.step, levels=levels), donate_argnums=(0,))
    else:
        from live_video_magnification_tpu.models import color as m

        dyn = m.ColorDynParams(jnp.float32(100.0), jnp.float32(0.84), jnp.float32(1.43))
        state = m.init_state(h, w, 3, levels, fps_cfg)
        step = jax.jit(partial(m.step, levels=levels, framerate=fps_cfg), donate_argnums=(0,))

    frame = jnp.asarray(frame_np)

    # Synchronize via a device-side scalar reduction + 1-element readback: on the
    # axon TPU relay, block_until_ready returns at dispatch time, and fetching a
    # full frame crawls through the tunnel — a checksum scalar is the only
    # trustworthy barrier (and doubles as proof the computation ran).
    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

    t_compile0 = time.monotonic()
    for _ in range(max(1, args.warmup)):
        state, out = step(state, frame, dyn)
    warm_sum = int(checksum(out))
    compile_s = time.monotonic() - t_compile0

    t0 = time.monotonic()
    for _ in range(args.steps):
        state, out = step(state, frame, dyn)
    final_sum = int(checksum(out))
    dt = time.monotonic() - t0
    fps = args.steps / dt

    metric = f"{args.mode}_{name_res}_fps_per_chip"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))
    print(f"# device={jax.devices()[0].device_kind} levels={levels} "
          f"warmup+compile={compile_s:.1f}s steady={dt/args.steps*1e3:.1f}ms/frame "
          f"checksum={final_sum}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
