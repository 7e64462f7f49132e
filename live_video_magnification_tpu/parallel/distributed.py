"""Multi-host scaffolding: jax.distributed bring-up + scaling-efficiency harness.

The reference is single-process (SURVEY.md §2.9); the framework's multi-host
story (BASELINE config 5: N-host 4K batch export at >=80% scaling efficiency)
is standard JAX SPMD: every host runs the same program, `jax.distributed`
wires the hosts into one runtime, a global Mesh spans all chips, and the
sharded steps (parallel/sharding.py, parallel/riesz_sharded.py) run unchanged
— GSPMD/shard_map place the ICI/DCN collectives.

Usage on a pod slice (per host):

    from live_video_magnification_tpu.parallel import distributed
    distributed.initialize()            # env-driven (COORDINATOR_ADDRESS, ...)
    mesh = distributed.global_mesh(("batch", "tile"))
    step, state = build_sharded_step(mesh, MagnificationMode.PHASE, ...)

`measure_scaling_efficiency` is the harness for the BASELINE >=80% target: it
times the SAME sharded step on a 1-chip mesh and the full mesh and reports
throughput ratio / ideal. On a single host it exercises the code path on the
virtual device mesh; on a pod it measures real ICI/DCN scaling.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from live_video_magnification_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up jax.distributed from args or environment.

    Env (standard JAX names): COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID —
    or the TPU pod metadata autodetected by jax.distributed.initialize() with
    no arguments. Returns True when a multi-process runtime was initialized,
    False for single-process operation (no-op; everything still works on the
    local devices)."""
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        # Single host unless running under a TPU pod runtime that JAX can
        # autodetect; attempt only when explicitly requested.
        if os.environ.get("LVMT_DISTRIBUTED") != "1":
            return False
        jax.distributed.initialize()
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh(axis_names: Sequence[str] = ("batch", "tile"),
                tile_per_host: bool = False):
    """Mesh over ALL devices (every host's chips). Default: everything on
    'tile' (one stream sharded as wide as possible). tile_per_host=True puts
    hosts on 'batch' and each host's chips on 'tile' — frame-tile sharding
    rides ICI only, data parallelism rides DCN (the BASELINE north-star
    layout for multi-host batch export)."""
    devices = jax.devices()
    if tile_per_host:
        n_hosts = jax.process_count()
        per_host = len(devices) // n_hosts
        shape = (n_hosts, per_host)
    else:
        shape = (1,) * (len(axis_names) - 1) + (len(devices),)
    return make_mesh(shape, axis_names, devices)


def measure_scaling_efficiency(
    build_step,                       # (mesh) -> (jitted_step, state)
    make_inputs,                      # (mesh) -> tuple of step args after state
    steps: int = 10,
    axis_names: Sequence[str] = ("batch", "tile"),
) -> dict:
    """Throughput of the same step on 1 device vs all devices.

    efficiency = (fps_N / fps_1) / N. Synchronization is a scalar readback of
    the final state leaf (dispatch-queue safe). Returns a dict with both
    measurements."""
    devices = jax.devices()
    n = len(devices)

    def run(mesh) -> float:
        step, state = build_step(mesh)
        args = make_inputs(mesh)
        state, out = step(state, *args)            # compile + warm
        _sync(out)
        t0 = time.monotonic()
        for _ in range(steps):
            state, out = step(state, *args)
        _sync(out)
        return steps / (time.monotonic() - t0)

    mesh1 = make_mesh((1,) * len(axis_names), axis_names, devices[:1])
    fps_1 = run(mesh1)
    mesh_n = make_mesh((1,) * (len(axis_names) - 1) + (n,), axis_names, devices)
    fps_n = run(mesh_n)
    return {
        "devices": n,
        "fps_1": fps_1,
        "fps_n": fps_n,
        "speedup": fps_n / fps_1,
        "efficiency": (fps_n / fps_1) / n,
    }


def _sync(out) -> None:
    """Device-side scalar checksum + 4-byte readback — a full-leaf device_get
    would measure the relay's ~320 KB/s transfer path, not compute."""
    leaf = jax.tree.leaves(out)[0]
    s = jax.jit(lambda x: jnp.sum(x.ravel()[:: max(1, x.size // 64)]
                                  .astype(jnp.float32)))(leaf)
    float(s)
