#!/usr/bin/env python
"""Minimal repro for the axon relay's remote-compile abort on large graphs
(VERDICT round-3 item 8).

Observed: the relay's remote compile helper returns HTTP 500 for very large
XLA programs — `process_clip_parallel` (phase mode) fails at 1080p T>=64 and
4K T>=32 (TP_SWEEP.json error entries), which bounds the time-parallel
export chunk size on this stack. This script finds the smallest failing T by
walking up from a known-good size, records the lowered-HLO text size of the
last good and first failing program (a proxy for the payload the relay
chokes on), and writes COMPILE_ABORT_REPRO.json for the relay owners.

AOT compile only (`jax.jit(...).lower(...).compile()`): no TPU math runs, so
the probe is cheap and cannot wedge the device; each compile is wrapped in
try/except so the sweep itself always completes.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/compile_abort_repro.py
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
    out_path = sys.argv[1] if len(sys.argv) > 1 else "COMPILE_ABORT_REPRO.json"

    import jax
    import jax.numpy as jnp

    from live_video_magnification_tpu.models import riesz as m
    from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs

    h, w, levels = 1080, 1920, 6
    b_lo, a_lo = butterworth_bandpass_coeffs(1.0, 30.0)
    b_hi, a_hi = butterworth_bandpass_coeffs(5.0, 30.0)
    dyn = m.RieszDynParams(
        jnp.float32(50.0), jnp.float32(0.5 * math.pi),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )

    def probe(t):
        fn = jax.jit(partial(m.process_clip_parallel, levels=levels))
        frames = jax.ShapeDtypeStruct((t, 3, h, w), jnp.uint8)
        t0 = time.monotonic()
        lowered = fn.lower(frames, dyn)
        hlo_chars = len(lowered.as_text())
        try:
            lowered.compile()
            return {"t": t, "ok": True, "compile_s": round(time.monotonic() - t0, 1),
                    "hlo_chars": hlo_chars}
        except Exception as e:
            return {"t": t, "ok": False, "hlo_chars": hlo_chars,
                    "error": f"{type(e).__name__}: {e}"[:300]}

    report = {
        "artifact": "compile-abort-repro",
        "device": jax.devices()[0].device_kind,
        "backend": jax.devices()[0].platform,
        "geometry": {"h": h, "w": w, "levels": levels,
                     "program": "models/riesz.process_clip_parallel"},
        "sweep": [],
    }
    threshold = None
    for t in (8, 16, 24, 32, 40, 48, 56, 64):
        r = probe(t)
        report["sweep"].append(r)
        print(json.dumps(r), flush=True)
        if not r["ok"]:
            threshold = t
            break
    report["first_failing_t"] = threshold
    if threshold is not None and len(report["sweep"]) >= 2:
        good = report["sweep"][-2]
        report["summary"] = (
            f"compile aborts between T={good['t']} ({good['hlo_chars']} HLO "
            f"chars) and T={threshold} ({report['sweep'][-1]['hlo_chars']} "
            "HLO chars) at 1080p levels=6 phase; the failing program is the "
            "same HLO family as the passing one, only wider in T — the bound "
            "is the relay's payload/graph-size limit, not a malformed program")
    elif threshold is None:
        report["summary"] = ("no abort up to T=64 in this session — the "
                            "limit is load/date-dependent; re-run attached "
                            "to the failing relay build")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
