"""Multi-host scaffolding mechanics on the virtual 8-device mesh.

Real DCN scaling needs a pod slice; these verify the bring-up no-op path, the
global mesh construction, and that the scaling-efficiency harness runs the
sharded step end-to-end on 1 vs N devices (the numbers themselves are
meaningless on virtual CPU devices — the harness is the deliverable)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from live_video_magnification_tpu.parallel import distributed
from live_video_magnification_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def test_initialize_is_noop_single_process(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    monkeypatch.delenv("LVMT_DISTRIBUTED", raising=False)
    assert distributed.initialize() is False


def test_global_mesh_shapes():
    mesh = distributed.global_mesh(("batch", "tile"))
    assert mesh.shape == {"batch": 1, "tile": 8}
    mesh = distributed.global_mesh(("batch", "tile"), tile_per_host=True)
    # single process: hosts axis is 1
    assert mesh.shape == {"batch": 1, "tile": 8}


def test_scaling_harness_runs_sharded_phase_step():
    from live_video_magnification_tpu.models.params import MagnificationMode
    from live_video_magnification_tpu.parallel.sharding import build_sharded_step

    h, w, levels = 64, 256, 2
    from test_sharding import _riesz_dyn

    dyn = _riesz_dyn(levels)
    frames = jnp.asarray(
        np.random.default_rng(3).integers(0, 255, (1, 3, h, w), dtype=np.uint8)
    )

    def build(mesh):
        return build_sharded_step(mesh, MagnificationMode.PHASE, 1, h, w, levels,
                                  30.0, kernels="jnp")

    def inputs(mesh):
        return (frames, dyn)

    r = distributed.measure_scaling_efficiency(build, inputs, steps=3)
    assert r["devices"] == 8
    assert r["fps_1"] > 0 and r["fps_n"] > 0
    assert 0 < r["efficiency"]  # mechanics only; CPU-mesh numbers not meaningful


# --- config-5 end-to-end: the distributed batch-export program -----------------------------------

def _tiny_clip(tmp_path, t=14, hw=(64, 80)):
    import math

    import cv2

    h, w = hw
    path = str(tmp_path / "in.avi")
    rng = np.random.default_rng(5)
    base = cv2.GaussianBlur(rng.random((h + 32, w + 32, 3)).astype(np.float32),
                            (0, 0), 3.0)
    wtr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (w, h))
    for i in range(t):
        m = np.float32([[1, 0, 1.5 * math.sin(2 * math.pi * i / 30)],
                        [0, 1, math.cos(2 * math.pi * i / 30)]])
        s = cv2.warpAffine(base, m, (w + 32, h + 32))[16:16 + h, 16:16 + w]
        wtr.write(np.clip(s * 255, 0, 255).astype(np.uint8))
    wtr.release()
    return path


def _phase_cfg(levels=2):
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
            mode=MagnificationMode.PHASE, amplification=30.0,
            co_wavelength=40.0, co_low=0.5, co_high=3.0, levels=levels,
            framerate=30.0,
        ),
    )


def test_distributed_chunks_match_sequential_clip_processor(tmp_path):
    """The T-sharded distributed compute core == the sequential ClipProcessor
    (state carried across chunks, 8-way mesh, phase mode) — BASELINE config 5's
    correctness seam (reference Exporter.cpp:202-207 ordered fixed-config
    semantics under sharding)."""
    from live_video_magnification_tpu.export.batch import ClipProcessor
    from live_video_magnification_tpu.io.video import read_video
    from live_video_magnification_tpu.parallel.batch_export import (
        DistributedClipExporter,
    )

    clip_path = _tiny_clip(tmp_path, t=14)
    frames, _fps = read_video(clip_path)
    tchw = np.ascontiguousarray(np.moveaxis(frames, -1, 1))
    cfg = _phase_cfg()
    h, w = frames.shape[1], frames.shape[2]

    seq = ClipProcessor(cfg, h, w, 3)
    exp = DistributedClipExporter(cfg, h, w, 3)
    assert exp.n_shards == 8

    # two full sharded chunks of 8 then... 14 = 8 + 6 (6 = partial tail)
    got = []
    for a, b in [(0, 8), (8, 14)]:
        clen = b - a
        if clen % exp.n_shards == 0:
            rows = exp.local_rows(clen)
            local = np.concatenate([tchw[a + ra : a + rb] for _s, ra, rb in rows])
        else:
            local = tchw[a:b]
        processed, _orig = exp.process_chunk(local, clen)
        got.append(processed)
    got = np.concatenate(got)

    want = []
    for a, b in [(0, 7), (7, 14)]:  # different chunking on purpose
        p, _o = seq.process_chunk(tchw[a:b])
        want.append(p)
    want = np.concatenate(want)

    d = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert d.max() <= 1, f"max diff {d.max()} LSB"


def test_export_video_distributed_end_to_end(tmp_path):
    """The full config-5 program: per-shard decode -> T-sharded process ->
    per-shard encode -> ordered concat == ONE playable file with every frame,
    matching the sequential export frame count and content (codec-decoded)."""
    import cv2

    from live_video_magnification_tpu.export.batch import ClipProcessor
    from live_video_magnification_tpu.io.video import read_video
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    clip_path = _tiny_clip(tmp_path, t=14)
    out = str(tmp_path / "out.avi")
    cfg = _phase_cfg()
    final = export_video_distributed(clip_path, out, cfg, chunk=8)
    assert final == out

    got, _ = read_video(final)
    assert got.shape[0] == 14
    # no stray part files left behind
    assert not list(tmp_path.glob("out.c*s*.avi"))

    # content parity vs the sequential ClipProcessor, through the same codec:
    frames, fps = read_video(clip_path)
    tchw = np.ascontiguousarray(np.moveaxis(frames, -1, 1))
    seq = ClipProcessor(cfg, frames.shape[1], frames.shape[2], 3)
    p, _o = seq.process_chunk(tchw)
    ref_path = str(tmp_path / "ref.avi")
    wtr = cv2.VideoWriter(ref_path, cv2.VideoWriter_fourcc(*"MJPG"), fps,
                          (frames.shape[2], frames.shape[1]))
    for f in np.moveaxis(p, 1, -1):
        wtr.write(np.ascontiguousarray(f))
    wtr.release()
    ref, _ = read_video(ref_path)
    d = np.abs(got.astype(np.int16) - ref.astype(np.int16))
    # The pre-encode outputs are BIT-IDENTICAL (previous test); the decoded
    # delta here is the ffmpeg-less concat fallback's double MJPG
    # quantization (parts encoded once, concat re-encodes). Bound it as
    # codec noise, not correctness.
    assert d.max() <= 48, f"max decoded diff {d.max()}"
    assert np.mean(d) < 4.0


def test_export_video_distributed_ignores_stale_parts(tmp_path):
    """A stale .cNNNsNNN part from an older crashed run on the same output
    path must never be merged (code-review round 4: concat uses this run's
    expected part list, not a glob)."""
    from live_video_magnification_tpu.io.video import read_video
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    clip_path = _tiny_clip(tmp_path, t=8)
    out = str(tmp_path / "out.avi")
    stale = tmp_path / "out.c0099s000.avi"
    stale.write_bytes(b"STALE")
    final = export_video_distributed(clip_path, out, _phase_cfg(), chunk=8)
    got, _ = read_video(final)
    assert got.shape[0] == 8          # only this run's frames
    assert stale.read_bytes() == b"STALE"  # untouched


def test_export_video_distributed_split_and_resume(tmp_path):
    """Round-4 follow-up: --split composition and checkpoint/resume work
    through the distributed program; the checkpoint format is ClipProcessor's
    (sequential<->distributed interchangeable), completed chunks' parts are
    reused on resume."""
    from live_video_magnification_tpu.export.types import SplitMode
    from live_video_magnification_tpu.io.video import read_video
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    clip_path = _tiny_clip(tmp_path, t=16)
    cfg = _phase_cfg()

    # split: panes compose like the exporter (width doubles, even dims)
    out_s = str(tmp_path / "split.avi")
    final = export_video_distributed(clip_path, out_s, cfg, chunk=8,
                                     split=SplitMode.LEFT_RIGHT, labels=True)
    got, _ = read_video(final)
    assert got.shape[0] == 16
    assert got.shape[2] == 160  # 2x80 even-cropped panes

    # resume: process [0, 8) with a checkpoint, then the rest; the first
    # chunk's parts are reused, the output covers all 16 frames
    out_r = str(tmp_path / "resume.avi")
    ck = str(tmp_path / "ck")
    export_video_distributed(clip_path, out_r, cfg, chunk=8, end=8,
                             checkpoint_path=ck, checkpoint_every=8,
                             keep_parts=True)
    assert (tmp_path / "ck.npz").exists()
    # the run above concatenated chunk 0; its parts were kept for the resume
    final = export_video_distributed(clip_path, out_r, cfg, chunk=8,
                                     checkpoint_path=ck)
    got, _ = read_video(final)
    assert got.shape[0] == 16


def test_export_video_distributed_rerun_after_complete_returns_output(tmp_path):
    """Re-running a finished distributed export (checkpoint says all chunks
    done, parts already concatenated and deleted) returns the existing output
    instead of demanding the deleted part files (advisor round 4)."""
    from live_video_magnification_tpu.io.video import read_video
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    clip_path = _tiny_clip(tmp_path, t=8)
    out = str(tmp_path / "out.avi")
    ck = str(tmp_path / "ck")
    cfg = _phase_cfg()
    export_video_distributed(clip_path, out, cfg, chunk=8,
                             checkpoint_path=ck, checkpoint_every=8)
    before = read_video(out)[0]
    final = export_video_distributed(clip_path, out, cfg, chunk=8,
                                     checkpoint_path=ck)
    assert final == out
    np.testing.assert_array_equal(read_video(final)[0], before)


def test_export_video_distributed_resume_with_deleted_parts_errors(tmp_path):
    """Resuming past completed chunks whose part files were NOT kept
    (keep_parts=False already deleted them) must raise the explicit
    missing-parts IOError, not concat a short file."""
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    clip_path = _tiny_clip(tmp_path, t=16)
    out = str(tmp_path / "out.avi")
    ck = str(tmp_path / "ck")
    cfg = _phase_cfg()
    export_video_distributed(clip_path, out, cfg, chunk=8, end=8,
                             checkpoint_path=ck, checkpoint_every=8)
    # chunk 0's parts are gone (concatenated + deleted); the resume over
    # [8, 16) reuses them by name and must fail loudly
    with pytest.raises(IOError, match="missing"):
        export_video_distributed(clip_path, out, cfg, chunk=8,
                                 checkpoint_path=ck)


def test_export_prefetch_pipeline_matches_serial_and_reports_stages(tmp_path):
    """The overlapped decode/encode pipeline (prefetch=True, the default)
    produces a bit-identical file to the serial path, and stats carries the
    per-stage busy-seconds split (decode/process/fetch/encode/concat) used by
    the config-5 stage-split measurement."""
    from live_video_magnification_tpu.io.video import read_video
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    clip_path = _tiny_clip(tmp_path, t=22)  # 2 full chunks + 6-frame tail
    cfg = _phase_cfg()
    out_p = str(tmp_path / "pipelined.avi")
    out_s = str(tmp_path / "serial.avi")
    st_p: dict = {}
    st_s: dict = {}
    export_video_distributed(clip_path, out_p, cfg, chunk=8, stats=st_p)
    export_video_distributed(clip_path, out_s, cfg, chunk=8, stats=st_s,
                             prefetch=False)
    np.testing.assert_array_equal(read_video(out_p)[0], read_video(out_s)[0])
    for st in (st_p, st_s):
        assert st["frames"] == 22
        for k in ("decode_s", "process_s", "fetch_s", "encode_s", "concat_s",
                  "wall_s"):
            assert st[k] > 0, (k, st)


def test_local_rows_rejects_partial_chunk():
    """local_rows is only defined for shard-divisible chunks; a partial tail
    must take the replicated path (advisor round 4: chunk_len < n_shards used
    to ZeroDivisionError)."""
    from live_video_magnification_tpu.parallel.batch_export import (
        DistributedClipExporter,
    )

    exp = DistributedClipExporter(_phase_cfg(), 64, 80, 3)
    with pytest.raises(AssertionError, match="shard-divisible"):
        exp.local_rows(6)


def test_export_video_distributed_grayscale_roi_laplace(tmp_path):
    """The distributed program with a non-trivial chain geometry (ROI crop +
    1/2 downscale + grayscale + laplace): per-shard decode and the T-sharded
    chain agree with the sequential ClipProcessor through the same config."""
    import dataclasses

    from live_video_magnification_tpu.export.batch import ClipProcessor
    from live_video_magnification_tpu.io.video import read_video
    from live_video_magnification_tpu.models.params import (
        MagnificationMode,
        MagnificationParams,
        PreprocessParams,
        ProcessorConfig,
    )
    from live_video_magnification_tpu.parallel.batch_export import (
        DistributedClipExporter,
    )

    clip_path = _tiny_clip(tmp_path, t=8)
    frames, _fps = read_video(clip_path)
    tchw = np.ascontiguousarray(np.moveaxis(frames, -1, 1))
    cfg = ProcessorConfig(
        grayscale=True,
        preprocess=PreprocessParams(downscale=2, roi_enabled=True,
                                    roi_x=0.1, roi_y=0.1, roi_w=0.8,
                                    roi_h=0.8),
        magnification=MagnificationParams(
            mode=MagnificationMode.LAPLACE, amplification=15.0,
            co_wavelength=200.0, co_low=0.3, co_high=0.7, levels=2,
            framerate=30.0),
    )
    h, w = frames.shape[1], frames.shape[2]
    exp = DistributedClipExporter(cfg, h, w, 3)
    rows = exp.local_rows(8)
    local = np.concatenate([tchw[ra:rb] for _s, ra, rb in rows])
    processed, _orig = exp.process_chunk(local, 8)

    seq = ClipProcessor(cfg, h, w, 3)
    want, _o = seq.process_chunk(tchw)
    d = np.abs(processed.astype(np.int16) - want.astype(np.int16))
    assert processed.shape == want.shape  # ROI+downscale geometry applied
    assert d.max() <= 1, f"max diff {d.max()} LSB"


def test_export_short_decode_fails_with_cause(tmp_path, monkeypatch):
    """A container that claims more frames than it can decode (video_info
    documents they lie) must fail with the decoder-shortfall IOError naming
    chunk and position — not a shape mismatch deep in the SPMD call."""
    from live_video_magnification_tpu.io import video as vio
    from live_video_magnification_tpu.parallel import batch_export
    from live_video_magnification_tpu.parallel.batch_export import (
        export_video_distributed,
    )

    clip_path = _tiny_clip(tmp_path, t=8)
    real_iter = vio.iter_video

    def short_iter(path, start=0, end=None):
        # decode stops 2 frames early, as a truncated container would
        yield from real_iter(path, start, min(end or 6, 6))

    monkeypatch.setattr(batch_export, "iter_video", short_iter, raising=False)
    # the exporter imports iter_video inside the function; patch the module
    # it resolves from
    monkeypatch.setattr(vio, "iter_video", short_iter)
    with pytest.raises(IOError, match="frame count is wrong"):
        export_video_distributed(clip_path, str(tmp_path / "out.avi"),
                                 _phase_cfg(), chunk=8, end=8)
