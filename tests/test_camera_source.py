"""CameraSource paths with a fake cv2.VideoCapture (no hardware).

VERDICT round-1 weak #7: wedged-grab timeout (5 s bail -> controller rebuild on
Play), transient-read retry counting, and API-preference fallback. Reference
semantics: CameraSource.cpp:26-80.
"""

import itertools
import threading
import time

import numpy as np
import pytest

import live_video_magnification_tpu.engine.source as source_mod
from live_video_magnification_tpu.engine.controller import PlaybackController
from live_video_magnification_tpu.engine.instrumentation import Instrumentation
from live_video_magnification_tpu.engine.pool import FramePool
from live_video_magnification_tpu.engine.queue import BoundedQueue, OverflowPolicy
from live_video_magnification_tpu.engine.source import CameraSource


class FakeCapture:
    """Scriptable cv2.VideoCapture: `script` yields (ok, frame) per read()."""

    def __init__(self, script, opened=True, fps=30.0):
        self._script = iter(script)
        self._opened = opened
        self._fps = fps

    def isOpened(self):
        return self._opened

    def get(self, prop):
        return self._fps

    def read(self):
        try:
            return next(self._script)
        except StopIteration:
            return False, None

    def release(self):
        pass


def _img():
    return np.full((16, 20, 3), 128, np.uint8)


def _frames(n):
    return [(True, _img()) for _ in range(n)]


def _endless_frames():
    return itertools.repeat((True, _img()))


def _make_camera(monkeypatch, captures):
    """Patch cv2.VideoCapture to pop from `captures` per open attempt."""
    import cv2

    calls = []

    def fake_cap(index, api=None):
        calls.append((index, api))
        return captures.pop(0) if captures else FakeCapture([], opened=False)

    monkeypatch.setattr(cv2, "VideoCapture", fake_cap)
    pool = FramePool(8)
    queue = BoundedQueue(4)
    queue.set_policy(OverflowPolicy.DROP)
    instr = Instrumentation()
    cam = CameraSource(0, pool, queue, instr)
    return cam, queue, instr, calls


def _wait(cond, timeout=10.0):
    end = time.monotonic() + timeout
    while time.monotonic() < end:
        if cond():
            return True
        time.sleep(0.01)
    return False


def test_transient_read_failures_retry_and_count(monkeypatch):
    """A few failed grabs are retried (read errors counted), then frames flow
    (CameraSource.cpp:53-57)."""
    script = itertools.chain([(True, _img())], [(False, None)] * 3, _endless_frames())
    cam, queue, instr, _ = _make_camera(monkeypatch, [FakeCapture(script)])
    assert cam.open()
    cam.start()
    cam.play()
    assert _wait(lambda: instr.snapshot().captured >= 5), "frames never flowed"
    cam.stop()
    s = instr.snapshot()
    assert s.read_errors == 3
    assert not cam.finished() or s.captured >= 5


def test_wedged_grab_times_out_and_controller_rebuilds(monkeypatch):
    """Grabs failing for READ_TIMEOUT_S wedge-bail the source thread; the next
    Play rebuilds from the factory (CameraSource.cpp:26-28 +
    PlaybackController.cpp:123-130)."""
    import cv2

    monkeypatch.setattr(CameraSource, "READ_TIMEOUT_S", 0.15)
    captures = [
        FakeCapture([(True, _img())] + [(False, None)] * 100000),  # probe ok, then wedged
        FakeCapture(itertools.chain([(True, _img())], _endless_frames())),  # rebuild works
    ]

    def fake_cap(index, api=None):
        return captures.pop(0) if captures else FakeCapture([], opened=False)

    monkeypatch.setattr(cv2, "VideoCapture", fake_cap)

    ctrl = PlaybackController()
    assert ctrl.open_camera(0)
    ctrl.play()
    src1 = ctrl._source
    assert _wait(src1.finished, timeout=10.0), "wedged source never bailed"
    ctrl.play()  # dead source -> rebuild
    src2 = ctrl._source
    assert src2 is not src1
    assert _wait(lambda: ctrl.stats().captured >= 3), "rebuilt camera not producing"
    ctrl.close()


def test_open_falls_back_through_api_preferences(monkeypatch):
    """First capture API fails to open -> the next is tried (CAP_V4L2 then
    CAP_ANY ordering, CameraEnumerator preferredCaptureApis semantics)."""
    captures = [FakeCapture([], opened=False),
                FakeCapture(itertools.chain([(True, _img())], _endless_frames()))]
    cam, _, _, calls = _make_camera(monkeypatch, captures)
    assert cam.open()
    assert len(calls) == 2  # tried two APIs
    assert cam.native_size() == (16, 20)
    assert cam.native_channels() == 3


def test_open_fails_when_no_api_works(monkeypatch):
    cam, _, _, _ = _make_camera(monkeypatch, [FakeCapture([], opened=False),
                                              FakeCapture([], opened=False)])
    assert not cam.open()


def test_record_bypass_publishes_raw_preview_and_skips_queue(monkeypatch):
    """Record mode: clone into sink + raw preview to the mailbox, queue
    untouched (CameraSource.cpp:70-80)."""
    import cv2

    from live_video_magnification_tpu.engine.mailbox import LatestFrameMailbox
    from live_video_magnification_tpu.export.recording import RecordingBuffer

    monkeypatch.setattr(cv2, "VideoCapture",
                        lambda i, api=None: FakeCapture(
                            itertools.chain([(True, _img())], _endless_frames())))
    pool = FramePool(8)
    queue = BoundedQueue(4)
    queue.set_policy(OverflowPolicy.DROP)
    instr = Instrumentation()
    mailbox = LatestFrameMailbox()
    cam = CameraSource(0, pool, queue, instr, mailbox=mailbox)
    assert cam.open()
    buf = RecordingBuffer(max_bytes=10**9)
    cam.set_record_target(buf)
    cam.start()
    cam.play()
    assert _wait(lambda: buf.frame_count >= 3)
    assert queue.depth() == 0  # queue bypassed while recording
    df = mailbox.latest()
    assert df is not None  # raw preview published
    np.testing.assert_array_equal(df.processed.data, _img())
    cam.set_record_target(None)
    assert _wait(lambda: queue.depth() > 0)  # normal flow resumes
    cam.stop()
