"""Round-5 follow-up: taller amplify tiles WITHOUT the double buffer.

docs/ROUND5.md open item 3 names the one untried geometry: LVMT_TAIL_TILE=128
with the cross-step double buffer OFF (the R5_TILE_AB run paired 128 with the
db the auto-resolver chose, and the doubled slots squeezed the pipeline).
With db=0 the single (3x) 144-row strip set halves the DMA issue count at
half the VMEM residency of the db=128 pairing; the pack variant folds the
three strips into one DMA on top. Same protocol as the other campaigns
(varying-frame 4K scan in the fast pairing, best-of-3, RTT subtracted,
interleaved controls).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/r5_tile2_ab.py
Writes R5_TILE2_AB.json.
"""

import json
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")


def _set_env(tile: str, db: str, pack: str) -> None:
    os.environ["LVMT_TAIL"] = "mxu"
    os.environ["LVMT_MXU_DTYPE"] = "bf16"
    os.environ["LVMT_TAIL_IO"] = "bf16"
    os.environ["LVMT_TAIL_VERT"] = "mxu"
    os.environ["LVMT_PYR_IO"] = "bf16"
    os.environ["LVMT_TAIL_TILE"] = tile
    os.environ["LVMT_TAIL_DB"] = db
    os.environ["LVMT_TAIL_PACK"] = pack


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "R5_TILE2_AB.json"

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

    report = {"artifact": "r5-tile2-ab",
              "device": jax.devices()[0].device_kind,
              "rtt_ms": round(rtt * 1e3, 1),
              "timing_4k": {}}

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

    variants = [
        ("fast_r0", "64", "auto", "0"),          # shipping control
        ("tile128_db0_r0", "128", "0", "0"),     # the untried geometry
        ("tile128_db0_pack_r0", "128", "0", "1"),
        ("fast_r1", "64", "auto", "0"),
        ("tile128_db0_r1", "128", "0", "0"),
        ("tile128_db0_pack_r1", "128", "0", "1"),
    ]
    for name, tile, db, pack in variants:
        _set_env(tile, db, pack)
        try:
            time_variant(name)
        except Exception as e:
            report["timing_4k"][name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"4K {name}: ERROR {str(e)[:150]}", flush=True)

    t = report["timing_4k"]
    chks = {v["warm"] for v in t.values() if "warm" in v}
    report["checksums_identical"] = len(chks) <= 1  # warm = fresh-state epoch
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out_path} (warm checksums identical: "
          f"{report['checksums_identical']})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
