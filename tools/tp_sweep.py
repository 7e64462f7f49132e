#!/usr/bin/env python
"""Time-parallel vs sequential sweep for phase mode (VERDICT round-2 item 2).

Measures, same-session on the same chip:
  - the sequential lax.scan step path (bench.bench_mode_scan)
  - process_clip_parallel at a range of chunk lengths T (bench.bench_time_parallel)
at 1080p and 4K, levels=6, and writes one JSON (default TP_SWEEP.json).

Each config is one compiled dispatch timed best-of-3 with the device-checksum
sync protocol; OOM/compile failures are recorded per-config, not fatal.

Usage: python tools/tp_sweep.py [out.json] [--skip-4k]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time


def main() -> int:
    out_path = "TP_SWEEP.json"
    skip_4k = "--skip-4k" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        out_path = args[0]

    import jax

    import bench

    results = {
        "artifact": "time-parallel-sweep",
        "device": jax.devices()[0].device_kind,
        "levels": 6,
        "mode": "phase",
        "protocol": "one dispatch, best-of-3, device-checksum sync (bench.py)",
        "configs": {},
    }

    def run(name, fn):
        t0 = time.monotonic()
        try:
            r = fn()
            r["total_wall_s"] = round(time.monotonic() - t0, 1)
            results["configs"][name] = r
            print(f"{name}: {r['fps']:.2f} fps  ({r['ms_per_frame']:.2f} ms/frame, "
                  f"compile {r['compile_s']:.1f}s)", flush=True)
        except Exception as e:
            results["configs"][name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)

    geoms = [("1080p", 1080, 1920, (8, 32, 64, 128))]
    if not skip_4k:
        geoms.append(("4k", 2160, 3840, (8, 16)))

    for name, h, w, ts in geoms:
        run(f"seq_{name}", lambda h=h, w=w: bench.bench_mode_scan(
            "phase", h, w, 6, steps=30))
        for t in ts:
            run(f"tp_{name}_T{t}", lambda h=h, w=w, t=t: bench.bench_time_parallel(
                "phase", h, w, 6, t_chunk=t))

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
