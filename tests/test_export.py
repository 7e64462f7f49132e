"""Export subsystem tests: streaming exporter, batch scan path, checkpoints.

Key invariant (reference ChainBuilder.hpp:11-12 / SURVEY.md §1.4): export and
live preview share one chain — here additionally the batch lax.scan path must
equal the per-frame streaming path bit-for-bit.
"""

import os

import numpy as np
import pytest

from live_video_magnification_tpu.engine.processing import chw_to_hwc, frame_to_chw
from live_video_magnification_tpu.export import batch
from live_video_magnification_tpu.export.batch import ClipProcessor, export_frames
from live_video_magnification_tpu.export.exporter import Exporter, compose, open_writer
from live_video_magnification_tpu.export.recording import RecordingBuffer
from live_video_magnification_tpu.export.sources import BufferExportFrameSource
from live_video_magnification_tpu.export.types import (
    ExportFormat,
    ExportPhase,
    ExportRequest,
    SplitMode,
)
from live_video_magnification_tpu.models.chain import MagnificationChain
from live_video_magnification_tpu.models.params import (
    MagnificationMode,
    MagnificationParams,
    ProcessorConfig,
)

from oracle import synthetic_clip

CFG = ProcessorConfig(
    magnification=MagnificationParams(
        mode=MagnificationMode.LAPLACE, amplification=15, co_wavelength=200,
        co_low=0.2, co_high=0.7, levels=2, framerate=30.0,
    )
)


def _clip(t=8, h=32, w=40):
    return np.stack([frame_to_chw(f) for f in synthetic_clip(t, h, w, color=True, seed=9)])


def test_batch_scan_equals_streaming_chain():
    frames = _clip()  # [T, C, H, W]
    chain = MagnificationChain()
    stream_out = []
    for i in range(frames.shape[0]):
        p, _ = chain.process(np.moveaxis(frames[i], 0, -1), CFG)  # chain API is HWC
        stream_out.append(np.moveaxis(np.asarray(p), -1, 0))
    proc = ClipProcessor(CFG, 32, 40, 3)
    batch_p, batch_o = proc.process_chunk(frames)
    np.testing.assert_array_equal(batch_p, np.stack(stream_out))
    np.testing.assert_array_equal(batch_o, frames)  # no preprocess => original == input


def test_batch_chunking_and_checkpoint_resume(tmp_path):
    frames = _clip(t=10)
    # single pass
    proc = ClipProcessor(CFG, 32, 40, 3)
    all_p, _ = proc.process_chunk(frames)
    # chunked with checkpoint in the middle
    ck = str(tmp_path / "state")
    proc2 = ClipProcessor(CFG, 32, 40, 3)
    p1, _ = proc2.process_chunk(frames[:5])
    proc2.save_checkpoint(ck)
    # resume in a fresh processor
    proc3 = ClipProcessor(CFG, 32, 40, 3)
    cursor = proc3.load_checkpoint(ck)
    assert cursor == 5
    p2, _ = proc3.process_chunk(frames[5:])
    np.testing.assert_array_equal(np.concatenate([p1, p2]), all_p)


def test_checkpoint_rejects_wrong_config(tmp_path):
    frames = _clip(t=2)
    proc = ClipProcessor(CFG, 32, 40, 3)
    proc.process_chunk(frames)
    ck = str(tmp_path / "state")
    proc.save_checkpoint(ck)
    import dataclasses

    other = dataclasses.replace(
        CFG, magnification=dataclasses.replace(CFG.magnification, levels=3)
    )
    with pytest.raises(ValueError):
        ClipProcessor(other, 32, 40, 3).load_checkpoint(ck)


def test_checkpoint_rejects_old_state_format_version(tmp_path):
    """A checkpoint from an older state layout (pre-round-4 12-plane
    RieszState, or any future change that bumps STATE_FORMAT_VERSION) must
    fail with a version error, not the misleading 'different configuration'
    message (advisor round 4)."""
    import json

    frames = _clip(t=2)
    proc = ClipProcessor(CFG, 32, 40, 3)
    proc.process_chunk(frames)
    ck = str(tmp_path / "state")
    proc.save_checkpoint(ck)
    # rewrite the meta as a version-less (v1) checkpoint
    data = dict(np.load(ck + ".npz"))
    meta = json.loads(bytes(data["__meta__"]).decode())
    assert meta["version"] == batch.STATE_FORMAT_VERSION
    del meta["version"]
    data["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(ck, **data)
    with pytest.raises(ValueError, match="state-format version"):
        ClipProcessor(CFG, 32, 40, 3).load_checkpoint(ck)


def test_time_parallel_export_equals_sequential():
    """The --time-parallel chunked export path == the sequential scan path,
    across chunk boundaries, through the FULL chain (preprocess ROI + downscale
    + grayscale interplay included), for all three modes."""
    import dataclasses

    from live_video_magnification_tpu.models.params import PreprocessParams

    pre = PreprocessParams(downscale=1, roi_enabled=True,
                           roi_x=0.1, roi_y=0.05, roi_w=0.8, roi_h=0.9)
    cfgs = {
        "laplace_gray": dataclasses.replace(CFG, grayscale=True, preprocess=pre),
        "phase": ProcessorConfig(
            preprocess=pre,
            magnification=MagnificationParams(
                mode=MagnificationMode.PHASE, amplification=30, co_wavelength=40,
                co_low=0.5, co_high=3.0, levels=2, framerate=30.0,
            ),
        ),
        "color": ProcessorConfig(
            magnification=MagnificationParams(
                mode=MagnificationMode.COLOR, amplification=60, co_low=0.4,
                co_high=1.2, levels=2, framerate=4.0,
            ),
        ),
    }
    frames = _clip(t=11, h=48, w=64)
    for name, cfg in cfgs.items():
        seq_p, seq_o = [], []
        for p, o in export_frames(frames, cfg, chunk_size=4):
            seq_p.append(p)
            seq_o.append(o)
        par_p, par_o = [], []
        for p, o in export_frames(frames, cfg, chunk_size=4, time_parallel=True):
            par_p.append(p)
            par_o.append(o)
        a = np.concatenate(seq_p)
        b = np.concatenate(par_p)
        d = np.abs(a.astype(np.int16) - b.astype(np.int16)).max()
        assert d <= 1, f"{name}: max diff {d} LSB"
        np.testing.assert_array_equal(np.concatenate(seq_o), np.concatenate(par_o))


def test_compose_split_modes():
    o = np.full((33, 41, 3), 10, np.uint8)
    p = np.full((33, 41, 3), 200, np.uint8)
    c = compose(o, p, SplitMode.NONE, overlay=False)
    assert c.shape == (32, 40, 3)  # cropped to even dims
    c = compose(o, p, SplitMode.LEFT_RIGHT, overlay=False)
    assert c.shape == (32, 80, 3)
    assert c[16, 10, 0] == 10   # left pane = original
    assert c[16, 60, 0] == 200  # right pane = processed
    c2 = compose(o, p, SplitMode.LEFT_RIGHT, overlay=True)
    assert (c2 != c).any()  # labels burned in
    c = compose(o, p, SplitMode.TOP_BOTTOM, overlay=False)
    assert c.shape == (64, 40, 3)
    np.testing.assert_array_equal(c[:32], o[:32, :40])
    np.testing.assert_array_equal(c[32:], p[:32, :40])


def test_recording_buffer_cap_and_take():
    hits = []
    buf = RecordingBuffer(max_bytes=1000, on_limit=lambda: hits.append(1))
    f = np.zeros((10, 10, 3), np.uint8)  # 300 bytes
    assert buf.append(f, 0)
    assert buf.append(f, 1)
    assert buf.append(f, 2)
    assert not buf.append(f, 3)  # would exceed 1000 -> closes
    assert buf.limit_reached and buf.closed and hits == [1]
    frames = buf.take_frames()
    assert len(frames) == 3
    assert buf.frame_count == 0


def test_exporter_end_to_end(tmp_path):
    frames_hwc = synthetic_clip(6, 32, 40, color=True, seed=12)
    out = str(tmp_path / "out.mp4")
    req = ExportRequest(config=CFG, output_path=out, file_fps=30.0,
                        split=SplitMode.LEFT_RIGHT, text_overlay=True,
                        format=ExportFormat.MP4_H264)
    exp = Exporter()
    exp.start(BufferExportFrameSource(frames_hwc), req)
    exp.join(timeout=120.0)
    prog = exp.progress()
    assert prog.phase is ExportPhase.DONE, prog.error
    assert prog.frames_done == 6
    # the writer may have fallen back to .avi
    produced = [p for p in os.listdir(tmp_path) if p.startswith("out")]
    assert produced
    import cv2

    cap = cv2.VideoCapture(os.path.join(tmp_path, produced[0]))
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    assert (n, h, w) == (6, 32, 80)


def test_exporter_empty_range_is_error(tmp_path):
    out = str(tmp_path / "empty.mp4")
    req = ExportRequest(config=CFG, output_path=out)
    exp = Exporter()
    exp.start(BufferExportFrameSource([]), req)
    exp.join(timeout=30.0)
    assert exp.progress().phase is ExportPhase.FAILED
    assert not os.path.exists(out)
