"""Config-5 end-to-end stage split on the real chip (VERDICT round-4 item 2).

Measures the distributed-export program (mesh-of-1 on the real TPU) as its
four host/device stages — decode / SPMD process / device->host fetch / encode
(+ concat) — in ms per frame, at 1080p and 4K phase levels=6 (the BASELINE
configs). Answers: is config 5 host-IO-bound or compute-bound, and does the
decode/encode prefetch pipeline (round 5) pay?

Relay caveat measured, not assumed: behind the axon tunnel device->host runs
at ~320 KB/s, so the fetch stage here is TUNNEL bandwidth; the tool reports
the measured MB/s so the production figure (PCIe-class, >=8 GB/s) can be
substituted: fetch_ms_frame_at_8GBps is included per config.

Run on the real chip (exclusive TPU process, to completion):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/config5_stage_split.py
Writes CONFIG5_E2E.json at the repo root.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_clip(path: str, w: int, h: int, t: int, fps: float = 30.0) -> None:
    """Synthetic moving-texture clip; content varies per frame (decode is
    real work; also the bench-protocol rule from round 4)."""
    import cv2

    rng = np.random.default_rng(7)
    base = cv2.GaussianBlur(
        rng.random((h + 32, w + 32, 3)).astype(np.float32), (0, 0), 3.0)
    wtr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    assert wtr.isOpened(), f"VideoWriter failed for {path}"
    for i in range(t):
        m = np.float32([[1, 0, 2.0 * math.sin(2 * math.pi * i / 30)],
                        [0, 1, math.cos(2 * math.pi * i / 30)]])
        s = cv2.warpAffine(base, m, (w + 32, h + 32))[16:16 + h, 16:16 + w]
        wtr.write(np.clip(s * 255, 0, 255).astype(np.uint8))
    wtr.release()


def phase_cfg(fps: float = 30.0):
    from live_video_magnification_tpu.models.params import (
        MagnificationMode,
        MagnificationParams,
        PreprocessParams,
        ProcessorConfig,
    )

    return ProcessorConfig(
        preprocess=PreprocessParams(),
        grayscale=False,
        magnification=MagnificationParams(
            mode=MagnificationMode.PHASE, amplification=50.0,
            co_wavelength=50.0, co_low=1.0, co_high=5.0, levels=6,
            framerate=fps,
        ),
    )


def run_config(name: str, w: int, h: int, t: int, chunk: int,
               prefetch_ab: bool) -> dict:
    import tempfile

    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    d = tempfile.mkdtemp(prefix=f"c5_{name}_")
    clip = os.path.join(d, "in.avi")
    t0 = time.monotonic()
    make_clip(clip, w, h, t)
    t_gen = time.monotonic() - t0
    cfg = phase_cfg()
    out = {}
    frame_bytes = w * h * 3

    def steady_ms(chunks, frames_per_chunk):
        """Median per-frame ms over the warm chunks (drop the first: it
        carries the compile / first-touch cost)."""
        warm = sorted(chunks[1:]) if len(chunks) > 1 else chunks
        return 1e3 * warm[len(warm) // 2] / frames_per_chunk

    # serial first (carries the compile; stage split is per-stage busy time)
    st: dict = {}
    t0 = time.monotonic()
    export_video_distributed(clip, os.path.join(d, "out_serial.avi"), cfg,
                             chunk=chunk, stats=st, prefetch=False)
    wall_first = time.monotonic() - t0
    n = st["frames"]
    # split=NONE fetches only the processed plane (round-5 fetch_original
    # optimization: the original pane is skipped when no split needs it)
    fetched_mb = n * frame_bytes / 1e6
    out["serial"] = {
        "frames": n,
        "decode_ms_frame": 1e3 * st["decode_s"] / n,
        "h2d_ms_frame_steady": steady_ms(st["h2d_chunks"], chunk),
        "process_ms_frame_incl_compile": 1e3 * st["process_s"] / n,
        "process_ms_frame_steady": steady_ms(st["process_chunks"], chunk),
        "fetch_ms_frame": 1e3 * st["fetch_s"] / n,
        "encode_ms_frame": 1e3 * st["encode_s"] / n,
        "concat_ms_frame": 1e3 * st["concat_s"] / n,
        "wall_s_incl_compile": wall_first,
        "fetch_MBps_measured": fetched_mb / st["fetch_s"],
        "fetch_ms_frame_at_8GBps": 1e3 * frame_bytes / 8e9,
        "fps_end_to_end": n / st["wall_s"],
        "fps_excl_fetch": n / (st["wall_s"] - st["fetch_s"]),
    }
    if prefetch_ab:
        # second run re-jits (each exporter re-jits its own chunk closure);
        # the steady-state per-chunk numbers below exclude that first-chunk
        # compile — they show whether the decode pool + encode thread hide
        # the host IO
        st2: dict = {}
        export_video_distributed(clip, os.path.join(d, "out_pre.avi"), cfg,
                                 chunk=chunk, stats=st2, prefetch=True,
                                 decode_workers=2)
        out["prefetch"] = {
            "wall_s": st2["wall_s"],
            "fps_end_to_end": st2["frames"] / st2["wall_s"],
            "decode_busy_s": st2["decode_s"],
            "encode_busy_s": st2["encode_s"],
            "process_busy_s": st2["process_s"],
            "process_ms_frame_steady": steady_ms(st2["process_chunks"],
                                                 chunk),
            "fetch_busy_s": st2["fetch_s"],
        }
    out["clip_gen_s"] = t_gen
    # clean up the big temp files
    for f in os.listdir(d):
        os.unlink(os.path.join(d, f))
    os.rmdir(d)
    return out


def main() -> int:
    import jax

    dev = jax.devices()[0]
    results = {
        "artifact": "config5-stage-split",
        "device": str(dev.device_kind),
        "protocol": ("per-stage busy seconds from export_video_distributed "
                     "stats; process/fetch split by device checksum sync "
                     "(bench.py barrier); serial path carries the compile"),
        "note": ("fetch here is the axon tunnel (~320 KB/s class), NOT "
                 "production PCIe; fetch_ms_frame_at_8GBps is the projected "
                 "production figure. The prefetch pipeline overlaps "
                 "decode+encode with device compute; on the relay its win is "
                 "bounded by the fetch share."),
        "configs": {},
    }
    for name, w, h, t, chunk, ab in [
        ("1080p", 1920, 1080, 32, 8, True),
        ("4k", 3840, 2160, 16, 8, False),
    ]:
        print(f"[{name}] {w}x{h} t={t} chunk={chunk}", flush=True)
        try:
            results["configs"][name] = run_config(name, w, h, t, chunk, ab)
        except Exception as e:
            results["configs"][name] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps(results["configs"][name], indent=2), flush=True)

    with open("/root/repo/CONFIG5_E2E.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote CONFIG5_E2E.json", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
