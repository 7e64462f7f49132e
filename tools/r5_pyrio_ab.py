"""Round-5 bf16-PYRAMID campaign: LVMT_PYR_IO A/B.

Same protocol as the tail campaigns (varying-frame 4K scan, best-of-3,
checksum barrier, RTT subtracted): the per-level band planes (highpass +
Riesz pair) stored bfloat16 by the build kernels — half their HBM bytes on
build writes, front reads, amplify-tail reads, and prior-pyramid state —
with all arithmetic still f32 (consumers cast on load). Measured against
the shipping fast mode, plus 720p accuracy vs the f32/jnp reference.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/r5_pyrio_ab.py
Writes R5_PYRIO_AB.json.
"""

import json
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")


def _set_env(tail: str, dtype: str, tail_io: str, vert: str = "mxu",
             db: str = "auto", pyr: str = "f32") -> None:
    os.environ["LVMT_TAIL"] = tail
    os.environ["LVMT_MXU_DTYPE"] = dtype
    os.environ["LVMT_TAIL_IO"] = tail_io
    os.environ["LVMT_TAIL_VERT"] = vert
    os.environ["LVMT_TAIL_DB"] = db
    os.environ["LVMT_PYR_IO"] = pyr


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "R5_PYRIO_AB.json"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from live_video_magnification_tpu.models import riesz as m
    from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs

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

    report = {"artifact": "r5-pyrio-ab",
              "device": jax.devices()[0].device_kind,
              "rtt_ms": round(rtt * 1e3, 1),
              "timing_4k": {}, "accuracy_720p_vs_f32": {}}

    variants = [
        # the shipping fast pairing (interleaved x2 with the candidate)
        ("fast_r0", "mxu", "bf16", "bf16", "mxu", "auto", "f32"),
        ("fast_pyr_r0", "mxu", "bf16", "bf16", "mxu", "auto", "bf16"),
        ("fast_r1", "mxu", "bf16", "bf16", "mxu", "auto", "f32"),
        ("fast_pyr_r1", "mxu", "bf16", "bf16", "mxu", "auto", "bf16"),
        # does the f32 default benefit? (pyramid storage bf16, math f32)
        ("f32_jnp_pyr", "jnp", "f32", "f32", "mxu", "auto", "bf16"),
    ]

    h, w, levels, steps = 2160, 3840, 6, 20
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 255, (3, h, w + 64), dtype=np.uint8))

    def time_variant(name):
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
        best, chk = float("inf"), 0
        for _ in range(3):
            t0 = time.monotonic()
            state, s = run(state)
            c = int(s)
            dt = max(1e-9, time.monotonic() - t0 - rtt)
            if dt < best:
                best, chk = dt, c
        ms = best / steps * 1e3
        report["timing_4k"][name] = {
            "ms_per_frame": round(ms, 3), "fps": round(1e3 / ms, 2),
            "compile_s": round(compile_s, 1), "checksum": chk, "warm": warm,
        }
        print(f"4K {name}: {ms:.2f} ms/frame ({1e3/ms:.1f} fps)", flush=True)

    for name, tail, dtype, tio, vert, db, pyr in variants:
        _set_env(tail, dtype, tio, vert, db, pyr)
        try:
            time_variant(name)
        except Exception as e:
            report["timing_4k"][name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"4K {name}: ERROR {str(e)[:150]}", flush=True)

    # ---- accuracy: 720p video-like clip vs f32/jnp ---------------------------
    h2, w2, t_clip, lv2 = 720, 1280, 20, 5
    clip = rng.integers(0, 255, (t_clip, 3, h2, w2), dtype=np.uint8)
    clip = ((clip.astype(np.float32) + np.roll(clip, 1, 2) + np.roll(clip, 1, 3))
            / 3.0).astype(np.uint8)
    clip_d = jnp.asarray(clip)

    def run_clip():
        step = partial(m.step, levels=lv2)

        @jax.jit
        def scan_clip(state, frames):
            def body(st, fr):
                st, out = step(st, fr, dyn)
                return st, out
            return jax.lax.scan(body, state, frames)

        _st, outs = scan_clip(m.init_state(h2, w2, lv2), clip_d)
        return outs

    _set_env("jnp", "f32", "f32")
    ref = run_clip()
    for name, tail, dtype, tio, vert, db, pyr in [
        ("fast_pyr", "mxu", "bf16", "bf16", "mxu", "auto", "bf16"),
        ("f32_jnp_pyr", "jnp", "f32", "f32", "mxu", "auto", "bf16"),
    ]:
        _set_env(tail, dtype, tio, vert, db, pyr)
        try:
            got = run_clip()
            d = int(jax.jit(lambda a, b: jnp.max(jnp.abs(
                a.astype(jnp.int32) - b.astype(jnp.int32))))(ref, got))
            mse = float(jax.jit(lambda a, b: jnp.mean(jnp.square(
                a.astype(jnp.float32) - b.astype(jnp.float32))))(ref, got))
            fmse = float(jax.jit(lambda a, b: jnp.max(jnp.mean(jnp.square(
                a.astype(jnp.float32) - b.astype(jnp.float32)),
                axis=(1, 2, 3))))(ref, got))
            psnr = 99.0 if mse <= 0 else 10 * math.log10(255.0**2 / mse)
            wpsnr = 99.0 if fmse <= 0 else 10 * math.log10(255.0**2 / fmse)
            report["accuracy_720p_vs_f32"][name] = {
                "max_u8_delta": d, "psnr_db": round(psnr, 1),
                "worst_frame_psnr_db": round(wpsnr, 1)}
            print(f"720p {name}: max u8 delta {d}, PSNR {psnr:.1f} dB "
                  f"(worst frame {wpsnr:.1f})", flush=True)
        except Exception as e:
            report["accuracy_720p_vs_f32"][name] = {
                "error": f"{type(e).__name__}: {e}"[:200]}
            print(f"720p {name}: ERROR {str(e)[:150]}", flush=True)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
