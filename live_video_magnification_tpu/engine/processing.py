"""The processing consumer: one worker, frames strictly in order (invariant 3).

Re-design of the reference ProcessingChain (ProcessingChain.{hpp,cpp}): pop a
frame -> read the RCU config once -> run the device chain -> publish the
{processed, original} pair to the latest-wins mailbox. On any exception the
stage state is reset and the input is published as both panes — degrade, don't
crash (ProcessingChain.cpp:50-62). Capture->processed latency is recorded per
frame.

The chain itself (MagnificationChain) runs on the accelerator; this thread is
the host-side driver that keeps device work enqueued while the source decodes
the next frame (the thread-pipeline parallelism of the reference maps to
host/device overlap here).
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np

from live_video_magnification_tpu.engine.config import AtomicConfig
from live_video_magnification_tpu.engine.frame import Frame, PixelFormat, now
from live_video_magnification_tpu.engine.instrumentation import Instrumentation
from live_video_magnification_tpu.engine.mailbox import DisplayFrame, LatestFrameMailbox
from live_video_magnification_tpu.engine.queue import BoundedQueue
from live_video_magnification_tpu.models.chain import MagnificationChain
from live_video_magnification_tpu.models.params import ProcessorConfig


def frame_to_chw(data: np.ndarray) -> np.ndarray:
    """HWC (decode layout) -> planar CHW, for the batch/raw step paths."""
    if data.ndim == 2:
        return data[None]
    return np.ascontiguousarray(np.moveaxis(data, -1, 0))


def chw_to_hwc(arr) -> np.ndarray:
    a = np.asarray(arr)
    if a.shape[0] == 1:
        return a[0]
    return np.ascontiguousarray(np.moveaxis(a, 0, -1))


def hwc_result(arr) -> np.ndarray:
    """Device [H, W, C] result -> numpy, squeezing gray to [H, W]."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        return a[..., 0]
    return a


class ProcessingChain:
    def __init__(
        self,
        queue: BoundedQueue,
        mailbox: LatestFrameMailbox,
        config: AtomicConfig,
        instr: Instrumentation,
    ):
        self._queue = queue
        self._mailbox = mailbox
        self._config = config
        self._instr = instr
        self._chain = MagnificationChain()
        self._thread: Optional[threading.Thread] = None
        self._stopping = threading.Event()

    def start(self) -> None:
        self._stopping.clear()
        self._thread = threading.Thread(target=self._run, daemon=True, name="ProcessingChain")
        self._thread.start()

    def stop(self) -> None:
        self._stopping.set()
        # queue.stop() (done by the controller) unblocks the pop
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            self._thread = None

    def reset_chain(self) -> None:
        self._chain.reset()

    def _run(self) -> None:
        while not self._stopping.is_set():
            frame = self._queue.pop()
            if frame is None:
                return  # stopped
            cfg = self._config.read() or ProcessorConfig()
            try:
                processed_dev, original_dev = self._chain.process(frame.data, cfg)
                processed = hwc_result(processed_dev)
                original = hwc_result(original_dev)
                pf = Frame(
                    seq=frame.seq, pts_us=frame.pts_us, capture_ts=frame.capture_ts,
                    width=processed.shape[1], height=processed.shape[0],
                    format=PixelFormat.GRAY8 if processed.ndim == 2 else PixelFormat.BGR8,
                    data=processed,
                )
                of = Frame(
                    seq=frame.seq, pts_us=frame.pts_us, capture_ts=frame.capture_ts,
                    width=original.shape[1], height=original.shape[0],
                    format=PixelFormat.GRAY8 if original.ndim == 2 else PixelFormat.BGR8,
                    data=original,
                )
                self._mailbox.publish(DisplayFrame(pf, of))
                self._instr.on_processed()
                self._instr.record_latency(now() - frame.capture_ts)
            except Exception:
                # Degrade, don't crash: count, reset temporal state, passthrough.
                self._instr.on_proc_error()
                self._chain.reset()
                copy = Frame(
                    seq=frame.seq, pts_us=frame.pts_us, capture_ts=frame.capture_ts,
                    width=frame.width, height=frame.height, format=frame.format,
                    data=np.array(frame.data, copy=True),
                )
                self._mailbox.publish(DisplayFrame(copy, copy))
            finally:
                frame.release()
