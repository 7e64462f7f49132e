"""Per-rank worker for the REAL multi-process config-5 test.

Run as a subprocess (one per rank) by tests/test_multiprocess_export.py — NOT
collected by pytest. Each rank brings up jax.distributed over a local TCP
coordinator with 4 virtual CPU devices, then calls export_video_distributed
with identical arguments — executing the `jax.process_count() > 1` branches
(make_array_from_process_local_data, sync_global_devices, the rank!=0
partial-tail encode skip, the rank-0 manifest concat) that single-process
tests and dryrun_multichip can never reach (VERDICT round 4, top item).

stdout contract (last line): one JSON object
  {"rank": N, "final": path, "frames": N, "error": str|null}
"""

import json
import os
import sys

# Before jax import: 4 virtual CPU devices per process, CPU platform. The
# baked sitecustomize can override env platform selection, so the config
# update below is the authoritative CPU force (CLAUDE.md).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    rank = int(sys.argv[1])
    port = sys.argv[2]
    clip = sys.argv[3]
    out = sys.argv[4]
    end = int(sys.argv[5]) if len(sys.argv) > 5 and sys.argv[5] != "-" else None
    checkpoint = sys.argv[6] if len(sys.argv) > 6 and sys.argv[6] != "-" else None
    keep_parts = len(sys.argv) > 7 and sys.argv[7] == "keep"

    from live_video_magnification_tpu.models.params import (
        MagnificationMode,
        MagnificationParams,
        PreprocessParams,
        ProcessorConfig,
    )
    from live_video_magnification_tpu.parallel import distributed
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    assert distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=rank
    ), "expected a multi-process runtime"
    assert jax.process_count() == 2 and jax.device_count() == 8

    cfg = ProcessorConfig(
        preprocess=PreprocessParams(),
        grayscale=False,
        magnification=MagnificationParams(
            mode=MagnificationMode.PHASE, amplification=30.0,
            co_wavelength=40.0, co_low=0.5, co_high=3.0, levels=2,
            framerate=30.0,
        ),
    )

    stats: dict = {}
    err = None
    final = None
    try:
        final = export_video_distributed(
            clip, out, cfg, chunk=8, end=end,
            keep_parts=keep_parts,
            checkpoint_path=checkpoint,
            checkpoint_every=8 if checkpoint else 0,
            stats=stats,
        )
    except Exception as e:  # surfaced to the test via the JSON contract
        err = f"{type(e).__name__}: {e}"
    print(json.dumps({"rank": rank, "final": final,
                      "frames": stats.get("frames"), "error": err}), flush=True)
    return 0 if err is None else 1


if __name__ == "__main__":
    sys.exit(main())
