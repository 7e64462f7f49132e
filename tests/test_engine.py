"""Engine runtime tests: transport semantics, pipeline orchestration, chain.

Covers the reference's core-runtime semantics (SURVEY.md §1 invariants):
Block/Drop overflow, stop-unblocks-everything, latest-wins mailbox, pool
backpressure, structural reset, degrade-don't-crash, and an end-to-end
synthetic-source run through the controller.
"""

import threading
import time

import numpy as np
import pytest

from live_video_magnification_tpu.engine import (
    AtomicConfig,
    BoundedQueue,
    FramePool,
    LatestFrameMailbox,
    OverflowPolicy,
    PlaybackController,
)
from live_video_magnification_tpu.engine.mailbox import DisplayFrame
from live_video_magnification_tpu.engine.frame import Frame
from live_video_magnification_tpu.models.chain import MagnificationChain, preprocess_geometry
from live_video_magnification_tpu.models.params import (
    MagnificationMode,
    MagnificationParams,
    PreprocessParams,
    ProcessorConfig,
)


def test_queue_block_policy_backpressure():
    q = BoundedQueue(2, OverflowPolicy.BLOCK)
    assert q.push(1) and q.push(2)
    pushed = []

    def producer():
        pushed.append(q.push(3))

    t = threading.Thread(target=producer)
    t.start()
    time.sleep(0.05)
    assert t.is_alive()  # blocked on full queue
    assert q.pop() == 1
    t.join(timeout=1.0)
    assert pushed == [True]
    assert q.drops == 0


def test_queue_drop_policy_evicts_oldest():
    q = BoundedQueue(2, OverflowPolicy.DROP)
    q.push(1)
    q.push(2)
    q.push(3)  # evicts 1
    assert q.drops == 1
    assert q.pop() == 2
    assert q.pop() == 3


def test_queue_stop_unblocks_producer_and_consumer():
    q = BoundedQueue(1, OverflowPolicy.BLOCK)
    q.push(1)
    results = []

    def producer():
        results.append(("push", q.push(2)))

    def consumer_empty():
        q2.pop()
        results.append(("pop", None))

    t1 = threading.Thread(target=producer)
    t1.start()
    q2 = BoundedQueue(1, OverflowPolicy.BLOCK)
    t2 = threading.Thread(target=consumer_empty)
    t2.start()
    time.sleep(0.05)
    q.stop()
    q2.stop()
    t1.join(timeout=1.0)
    t2.join(timeout=1.0)
    assert ("push", False) in results


def test_pool_backpressure_and_stop():
    pool = FramePool(2)
    f1 = pool.acquire(4, 4, 3)
    f2 = pool.acquire(4, 4, 3)
    got = []

    def acquirer():
        got.append(pool.acquire(4, 4, 3))

    t = threading.Thread(target=acquirer)
    t.start()
    time.sleep(0.05)
    assert t.is_alive()  # blocked: pool exhausted
    f1.release()
    t.join(timeout=1.0)
    assert got[0] is not None
    # double-release is a no-op
    f1.release()
    pool.stop()
    assert pool.acquire(4, 4, 3) is None


def test_mailbox_latest_wins():
    mb = LatestFrameMailbox()
    assert mb.latest() is None
    a = Frame(seq=1, data=np.zeros((2, 2), np.uint8))
    b = Frame(seq=2, data=np.zeros((2, 2), np.uint8))
    mb.publish(DisplayFrame(a, a))
    mb.publish(DisplayFrame(b, b))
    assert mb.latest().processed.seq == 2
    mb.clear()
    assert mb.latest() is None


def test_atomic_config_rcu():
    cfg = AtomicConfig(ProcessorConfig())
    snap1 = cfg.read()
    cfg.publish(ProcessorConfig(grayscale=True))
    assert cfg.read().grayscale and not snap1.grayscale


def test_preprocess_geometry_matches_reference():
    # PreprocessProcessor.cpp:14-43: lround + clamps + >=1px + floor-div downscale
    p = PreprocessParams(downscale=2, roi_enabled=True, roi_x=0.25, roi_y=0.1,
                         roi_w=0.5, roi_h=0.5)
    y, x, ch, cw, oh, ow = preprocess_geometry(p, 100, 200)
    assert (x, y) == (50, 10)
    assert (cw, ch) == (100, 50)
    assert (ow, oh) == (50, 25)
    # ROI off, downscale 1 -> identity
    assert preprocess_geometry(PreprocessParams(), 10, 20) == (0, 0, 10, 20, 10, 20)
    # clamp to >= 1 px
    p2 = PreprocessParams(roi_enabled=True, roi_x=0.999, roi_y=0.999, roi_w=0.0001, roi_h=0.0001)
    y, x, ch, cw, oh, ow = preprocess_geometry(p2, 50, 50)
    assert cw >= 1 and ch >= 1 and x < 50 and y < 50


def test_chain_identity_and_structural_reset():
    chain = MagnificationChain()
    cfg_none = ProcessorConfig(
        magnification=MagnificationParams(mode=MagnificationMode.NONE)
    )
    frame = np.random.default_rng(0).integers(0, 255, (32, 40, 3), np.uint8)
    processed, original = chain.process(frame, cfg_none)
    np.testing.assert_array_equal(np.asarray(processed), frame)
    np.testing.assert_array_equal(np.asarray(original), frame)

    # grayscale stage applies before magnification, original tap stays color
    cfg_gray = ProcessorConfig(
        grayscale=True, magnification=MagnificationParams(mode=MagnificationMode.NONE)
    )
    processed, original = chain.process(frame, cfg_gray)
    assert np.asarray(processed).shape[2] == 1
    assert np.asarray(original).shape[2] == 3

    # structural change (levels) resets temporal state: first frame after the
    # change behaves like a first frame (motion mode -> output == input roundtrip)
    cfg_m3 = ProcessorConfig(
        magnification=MagnificationParams(
            mode=MagnificationMode.LAPLACE, amplification=20, co_wavelength=300,
            co_low=0.2, co_high=0.7, levels=3, framerate=30.0,
        )
    )
    chain.process(frame, cfg_m3)
    assert chain._state.count == 1
    chain.process(frame, cfg_m3)
    assert chain._state.count == 2
    cfg_m2 = ProcessorConfig(
        magnification=MagnificationParams(
            mode=MagnificationMode.LAPLACE, amplification=20, co_wavelength=300,
            co_low=0.2, co_high=0.7, levels=2, framerate=30.0,
        )
    )
    chain.process(frame, cfg_m2)
    assert chain._state.count == 1  # reset happened


def test_too_small_frame_is_identity():
    chain = MagnificationChain()
    cfg = ProcessorConfig(
        magnification=MagnificationParams(mode=MagnificationMode.LAPLACE, levels=3)
    )
    frame = np.random.default_rng(0).integers(0, 255, (5, 5, 3), np.uint8)
    processed, _ = chain.process(frame, cfg)
    np.testing.assert_array_equal(np.asarray(processed), frame)


def test_controller_end_to_end_synthetic():
    ctrl = PlaybackController()
    ctrl.set_magnification(
        MagnificationParams(
            mode=MagnificationMode.LAPLACE, amplification=15, co_wavelength=200,
            co_low=0.2, co_high=0.7, levels=2, framerate=60.0,
        )
    )
    assert ctrl.open_synthetic(h=48, w=64, fps=60.0, n_frames=0)
    ctrl.play()
    deadline = time.monotonic() + 20.0
    while time.monotonic() < deadline:
        stats = ctrl.stats()
        if stats.processed >= 5 and ctrl.mailbox.latest() is not None:
            break
        time.sleep(0.05)
    stats = ctrl.stats()
    assert stats.processed >= 5, f"only processed {stats.processed}"
    assert stats.proc_errors == 0
    pair = ctrl.mailbox.latest()
    assert pair is not None
    assert pair.processed.data.shape == (48, 64, 3)
    assert pair.original.data.shape == (48, 64, 3)
    # live reconfigure must not deadlock or error
    ctrl.set_downscale(2)
    time.sleep(0.5)
    assert ctrl.stats().proc_errors == 0
    ctrl.pause()
    ctrl.close()
