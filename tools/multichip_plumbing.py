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
        "round": 4,
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

    # config-5 program (round 4): the whole distributed batch-export pipeline
    # — per-shard decode, ONE T-sharded SPMD clip call per chunk, per-shard
    # encode, ordered concat — run file->file on the virtual mesh. Records
    # that the PROGRAM executes and its throughput under emulation; the
    # bit-identity with the sequential export is asserted in
    # tests/test_distributed.py.
    import os
    import tempfile

    import cv2

    from live_video_magnification_tpu.models.params import (
        MagnificationParams,
        PreprocessParams,
        ProcessorConfig,
    )
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    tmp = tempfile.mkdtemp()
    clip = os.path.join(tmp, "in.avi")
    wtr = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (w, h))
    base = rng.random((h, w, 3)).astype(np.float32)
    for i in range(24):
        wtr.write(np.clip(np.roll(base, i, axis=1) * 255, 0, 255).astype(np.uint8))
    wtr.release()
    cfg5 = ProcessorConfig(
        preprocess=PreprocessParams(), grayscale=False,
        magnification=MagnificationParams(
            mode=MagnificationMode.PHASE, amplification=30.0,
            co_wavelength=40.0, co_low=0.5, co_high=3.0, levels=levels,
            framerate=30.0,
        ),
    )
    t0 = time.monotonic()
    final = export_video_distributed(clip, os.path.join(tmp, "out.avi"), cfg5,
                                     chunk=8)
    wall = time.monotonic() - t0
    cap = cv2.VideoCapture(final)
    n_out = 0
    while cap.read()[0]:
        n_out += 1
    cap.release()
    results["measurements"]["config5_distributed_export_program"] = {
        "frames": 24, "frames_out": n_out, "chunk": 8,
        "wall_s": round(wall, 1), "fps": round(24 / wall, 2),
        "end_to_end": "decode->T-sharded SPMD->per-shard encode->concat",
    }
    print(f"config5 program: {n_out} frames in {wall:.1f}s")

    out = sys.argv[1] if len(sys.argv) > 1 else "MULTICHIP_PLUMBING_r04.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
