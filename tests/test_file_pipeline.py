"""File-source end-to-end: decode -> paced pipeline -> seek -> export.

Exercises FileSource semantics (CFR pts, pending-seek exchange, park-at-end,
loop) and the file->file export path against a real container written by cv2.
"""

import os
import time

import numpy as np
import pytest

from live_video_magnification_tpu.engine.controller import PlaybackController
from live_video_magnification_tpu.export.exporter import Exporter
from live_video_magnification_tpu.export.sources import FileExportFrameSource
from live_video_magnification_tpu.export.types import (
    ExportFormat,
    ExportPhase,
    ExportRequest,
    SplitMode,
)
from live_video_magnification_tpu.io.video import read_video, video_info, write_video
from live_video_magnification_tpu.models.params import (
    MagnificationMode,
    MagnificationParams,
)

from oracle import synthetic_clip


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory):
    frames = np.stack(synthetic_clip(20, 48, 64, color=True, seed=33))
    path = str(tmp_path_factory.mktemp("vid") / "clip.avi")
    return write_video(path, frames, fps=30.0, fourcc="MJPG")


def test_video_io_roundtrip(clip_path):
    n, h, w, fps = video_info(clip_path)
    assert (n, h, w) == (20, 48, 64)
    assert fps == pytest.approx(30.0, abs=0.5)
    frames, _ = read_video(clip_path, 5, 10)
    assert frames.shape == (5, 48, 64, 3)


def test_controller_file_playback_and_seek(clip_path):
    ctrl = PlaybackController()
    ctrl.set_magnification(
        MagnificationParams(
            mode=MagnificationMode.LAPLACE, amplification=10, co_wavelength=200,
            co_low=0.2, co_high=0.7, levels=2, framerate=30.0,
        )
    )
    assert ctrl.open_file(clip_path)
    assert ctrl.seekable() and ctrl.frame_count() == 20
    ctrl.set_playback_fps(240.0)  # fast playback so the test is quick
    ctrl.play()
    deadline = time.monotonic() + 30.0
    while time.monotonic() < deadline and ctrl.stats().processed < 5:
        time.sleep(0.05)
    assert ctrl.stats().processed >= 5
    # scrub while playing; pipeline must keep functioning and not error
    ctrl.seek_frame(2)
    time.sleep(0.5)
    assert ctrl.stats().proc_errors == 0
    # park at end without loop
    ctrl.set_in_out(0, 6)
    ctrl.seek_frame(5)
    time.sleep(1.0)
    ctrl.close()


def test_file_export_range(clip_path, tmp_path):
    cfg_req = ExportRequest(
        config=__import__("dataclasses").replace(
            __import__(
                "live_video_magnification_tpu.models.params", fromlist=["ProcessorConfig"]
            ).ProcessorConfig(),
            magnification=MagnificationParams(
                mode=MagnificationMode.COLOR, amplification=60, co_low=0.8, co_high=1.6,
                levels=2, framerate=30.0,
            ),
        ),
        output_path=str(tmp_path / "mag.avi"),
        file_fps=30.0,
        split=SplitMode.NONE,
        format=ExportFormat.AVI_MJPG,
        start_frame=4,
        end_frame=14,
    )
    exp = Exporter()
    exp.start(FileExportFrameSource(clip_path, 4, 14), cfg_req)
    exp.join(timeout=120.0)
    prog = exp.progress()
    assert prog.phase is ExportPhase.DONE, prog.error
    assert prog.frames_done == 10
    n, h, w, _ = video_info(str(tmp_path / "mag.avi"))
    assert (n, h, w) == (10, 48, 64)


def test_file_export_abort_deletes_partial(clip_path, tmp_path):
    out = str(tmp_path / "aborted.avi")
    req = ExportRequest(
        config=__import__(
            "live_video_magnification_tpu.models.params", fromlist=["ProcessorConfig"]
        ).ProcessorConfig(),
        output_path=out, format=ExportFormat.AVI_MJPG,
    )
    exp = Exporter()
    exp.abort()  # pre-aborted: worker should bail immediately and clean up
    exp.start(FileExportFrameSource(clip_path), req)
    exp.abort()
    exp.join(timeout=60.0)
    assert exp.progress().phase in (ExportPhase.ABORTED, ExportPhase.DONE)
    if exp.progress().phase is ExportPhase.ABORTED:
        assert not os.path.exists(out)
