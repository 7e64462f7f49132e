#!/usr/bin/env python
"""Reference-C++ parity of the ACTUAL TPU execution path.

tests/test_reference_cpp_parity.py proves the JAX chain == the compiled
reference math core on the CPU backend (where the MXU kernels are gated off).
This tool closes the remaining loop on the real chip: it runs the SAME clips
through the chain on the TPU — MXU banded-stencil kernels + jnp tail, the
production 4K path — reads the frames back (slow relay path, sizes kept small)
and PSNRs them against the reference binary's output. Optionally repeats in
the bf16 fast mode.

Writes TPU_REFERENCE_PARITY.json. Run with the axon TPU visible (no env
overrides); requires g++ + OpenCV dev headers for the harness build.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)
_sys.path.insert(0, _os.path.join(_REPO, "tests"))

import json
import math
import subprocess
import sys


def main() -> int:
    # first non-flag argument is the output path (so `--fast-too` alone
    # cannot be mistaken for a filename)
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = paths[0] if paths else "TPU_REFERENCE_PARITY.json"

    import numpy as np
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print("warning: running on CPU backend — this tool is meant for the "
              "real chip", file=sys.stderr)

    # build the reference harness
    binary = _os.path.join(_REPO, "build", "ref_harness")
    proc = subprocess.run(["sh", _os.path.join(_REPO, "tools", "build_ref_harness.sh"),
                           binary], capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        print(f"harness build failed: {proc.stderr[-500:]}", file=sys.stderr)
        return 1

    from oracle import psnr_u8, realistic_clip
    from test_reference_cpp_parity import run_reference

    from live_video_magnification_tpu.models.chain import MagnificationChain
    from live_video_magnification_tpu.models.params import (
        MagnificationMode,
        MagnificationParams,
        ProcessorConfig,
    )

    FPS = 30.0
    # 320-wide so levels 0-1 clear MIN_MXU_DIM=96 and the banded kernels engage
    t, h, w = 20, 240, 320
    report = {"artifact": "tpu-reference-parity", "backend": backend,
              "device": jax.devices()[0].device_kind,
              "geometry": {"t": t, "h": h, "w": w}, "modes": {}}

    configs = {
        "phase": (dict(levels=3, amplification=30.0, co_wavelength=40.0,
                       co_low=0.5, co_high=3.0),
                  MagnificationParams(mode=MagnificationMode.PHASE,
                                      amplification=30.0, co_wavelength=40.0,
                                      co_low=0.5, co_high=3.0, levels=3,
                                      framerate=FPS)),
        "laplace": (dict(levels=3, amplification=20.0, co_wavelength=500.0,
                         co_low=0.138, co_high=0.466, chrom=0.1),
                    MagnificationParams(mode=MagnificationMode.LAPLACE,
                                        amplification=20.0, co_wavelength=500.0,
                                        co_low=0.138, co_high=0.466,
                                        chrom_attenuation=0.1, levels=3,
                                        framerate=FPS)),
        "color": (dict(levels=3, amplification=80.0, co_low=0.8, co_high=1.4),
                  MagnificationParams(mode=MagnificationMode.COLOR,
                                      amplification=80.0, co_low=0.8,
                                      co_high=1.4, levels=3, framerate=FPS)),
    }

    # fast mode == the shipping --fast pairing: bf16 operands + the MXU blur
    # tail + bf16 transients (round 5, R5_TAILDB_AB.json; the MXU vertical
    # taps and auto double buffering are the in-kernel defaults)
    fast_modes = [("f32", {"LVMT_MXU_DTYPE": "f32"})]
    if "--fast-too" in sys.argv:
        fast_modes.append(("bf16", {"LVMT_MXU_DTYPE": "bf16",
                                    "LVMT_TAIL": "mxu",
                                    "LVMT_TAIL_IO": "bf16",
                                    "LVMT_PYR_IO": "bf16"}))

    for mode, (ref_kw, mag) in configs.items():
        frames = realistic_clip(t, h, w, FPS, seed=31)
        ref = run_reference(binary, mode, frames, fps=FPS, **ref_kw)
        for label, env in fast_modes:
            _os.environ.pop("LVMT_TAIL", None)
            _os.environ.pop("LVMT_TAIL_IO", None)
            _os.environ.pop("LVMT_PYR_IO", None)
            for k, v in env.items():
                _os.environ[k] = v
            chain = MagnificationChain()
            cfg = ProcessorConfig(magnification=mag)
            worst, total = 99.0, 0.0
            for i, f in enumerate(frames):
                got, _orig = chain.process(f, cfg)
                got = np.asarray(got)  # device->host readback (slow relay path)
                if i == 0:
                    continue
                p = psnr_u8(got, ref[i])
                worst = min(worst, p)
                total += p
            entry = {"worst_psnr_db": round(worst, 2),
                     "mean_psnr_db": round(total / (t - 1), 2),
                     "pass_40db": bool(worst > 40.0)}
            key = mode if label == "f32" else f"{mode}_{label}"
            report["modes"][key] = entry
            print(f"{key}: worst {worst:.2f} dB, mean {total/(t-1):.2f} dB "
                  f"({'PASS' if worst > 40 else 'FAIL'})", flush=True)
        _os.environ["LVMT_MXU_DTYPE"] = "f32"
        _os.environ.pop("LVMT_TAIL", None)
        _os.environ.pop("LVMT_TAIL_IO", None)
        _os.environ.pop("LVMT_PYR_IO", None)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
