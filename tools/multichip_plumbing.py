"""Record the multi-chip PLUMBING artifact on the virtual 8-device CPU mesh
(VERDICT round-2 item 8).

This environment has ONE real TPU chip; real N-chip / N-host scaling
efficiency (the BASELINE >=80% target) is unmeasurable here. What CAN be
certified — and what this script records next to MULTICHIP_r*.json — is that
the multi-chip code paths (GSPMD sharded step and the explicit shard_map
Pallas+halo riesz step) compile, execute, and produce correct state flow on a
1-device and an 8-device mesh, via the same `measure_scaling_efficiency`
harness that would measure real ICI scaling on a pod. CPU-mesh timings are
emulation-scheduler numbers, NOT ICI performance; the artifact says so.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      PYTHONPATH=/root/repo python tools/multichip_plumbing.py [out.json]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from live_video_magnification_tpu.models.params import MagnificationMode
    from live_video_magnification_tpu.parallel import distributed
    from live_video_magnification_tpu.parallel.riesz_sharded import (
        build_sharded_riesz_step,
    )
    from live_video_magnification_tpu.parallel.sharding import build_sharded_step

    n = len(jax.devices())
    if n < 8:
        print(f"need the 8-device virtual mesh (have {n}); set "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu",
              file=sys.stderr)
        return 1

    h, w, levels = 128, 512, 3
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (1, 3, h, w), dtype=np.uint8))

    # dyn params for the phase step (same shape the tests use)
    from live_video_magnification_tpu.models.riesz import RieszDynParams
    from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs
    import math

    b_lo, a_lo = butterworth_bandpass_coeffs(0.5, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(3.0, 30.0)
    dyn = RieszDynParams(
        jnp.float32(30.0), jnp.float32(0.4 * math.pi),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )

    results = {
        "artifact": "multichip-plumbing",
        "round": 3,
        "devices": n,
        "backend": jax.devices()[0].platform,
        "geometry": {"h": h, "w": w, "levels": levels, "mode": "phase"},
        "caveat": (
            "virtual CPU mesh: certifies compile+execute+state-flow of the "
            "multi-chip paths only; timings are the CPU emulation scheduler, "
            "NOT ICI — the >=80% N-host BASELINE target cannot be measured in "
            "this single-chip environment (see docs/MULTICHIP.md)"),
        "measurements": {},
    }

    def record(name, build, inputs):
        t0 = time.monotonic()
        r = distributed.measure_scaling_efficiency(build, inputs, steps=5)
        r["wall_s"] = round(time.monotonic() - t0, 1)
        r["fps_1"] = round(r["fps_1"], 3)
        r["fps_n"] = round(r["fps_n"], 3)
        r["speedup"] = round(r["speedup"], 3)
        r["efficiency"] = round(r["efficiency"], 3)
        results["measurements"][name] = r
        print(f"{name}: {r}")

    record(
        "gspmd_phase_step",
        lambda mesh: build_sharded_step(mesh, MagnificationMode.PHASE, 1, h, w,
                                        levels, 30.0, kernels="jnp"),
        lambda mesh: (frames, dyn),
    )
    record(
        "explicit_shardmap_riesz_step",
        lambda mesh: build_sharded_riesz_step(mesh, 1, h, w, levels,
                                              kernels="jnp"),
        lambda mesh: (frames, dyn),
    )

    out = sys.argv[1] if len(sys.argv) > 1 else "MULTICHIP_PLUMBING_r03.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
