"""Native C++ runtime bindings: same transport semantics as the Python layer."""

import threading
import time

import numpy as np
import pytest

from live_video_magnification_tpu.engine import native


pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _meta(seq, idx):
    m = native.FrameMeta()
    m.seq = seq
    m.buffer_index = idx
    m.width = 4
    m.height = 4
    m.channels = 3
    return m


def test_pool_acquire_release_and_views():
    pool = native.NativeFramePool(2, 4 * 4 * 3)
    a = pool.acquire()
    b = pool.acquire()
    assert a is not None and b is not None and a != b
    buf = pool.buffer(a, (4, 4, 3))
    buf[:] = 7
    assert pool.buffer(a, (4, 4, 3))[0, 0, 0] == 7  # same memory

    got = []
    t = threading.Thread(target=lambda: got.append(pool.acquire()))
    t.start()
    time.sleep(0.05)
    assert t.is_alive()  # blocked: exhausted
    pool.release(a)
    t.join(timeout=2.0)
    assert got == [a]
    pool.stop()
    assert pool.acquire() is None


def test_queue_block_and_drop():
    pool = native.NativeFramePool(8, 16)
    q = native.NativeQueue(2, drop_policy=False, pool=pool)
    idxs = [pool.acquire() for _ in range(4)]
    assert q.push(_meta(0, idxs[0]))
    assert q.push(_meta(1, idxs[1]))
    pushed = []
    t = threading.Thread(target=lambda: pushed.append(q.push(_meta(2, idxs[2]))))
    t.start()
    time.sleep(0.05)
    assert t.is_alive()  # BLOCK policy: full
    m = q.pop()
    assert m.seq == 0
    t.join(timeout=2.0)
    assert pushed == [True]

    q2 = native.NativeQueue(2, drop_policy=True, pool=pool)
    q2.push(_meta(10, idxs[0]))
    q2.push(_meta(11, idxs[1]))
    q2.push(_meta(12, idxs[3]))  # evicts seq 10, recycles its buffer
    assert q2.drops == 1
    assert q2.pop().seq == 11
    assert q2.pop().seq == 12
    assert q2.pop(timeout_ms=10.0) is None


def test_queue_stop_unblocks():
    pool = native.NativeFramePool(2, 16)
    q = native.NativeQueue(1, drop_policy=False, pool=pool)
    results = []
    t = threading.Thread(target=lambda: results.append(q.pop()))
    t.start()
    time.sleep(0.05)
    q.stop()
    t.join(timeout=2.0)
    assert results == [None]


def test_mailbox_latest_wins():
    mb = native.NativeMailbox()
    assert mb.latest() is None
    mb.publish(_meta(1, 0))
    mb.publish(_meta(2, 1))
    assert mb.latest().seq == 2
    mb.clear()
    assert mb.latest() is None


def test_stats_counters_and_histogram():
    st = native.NativeInstrumentation()
    for _ in range(10):
        st.bump(native.PROCESSED)
    st.record_latency(0.003)   # bucket 0
    st.record_latency(0.012)   # bucket 2
    counts, mean_ms, p95_ms = st.read()
    assert counts[native.PROCESSED] == 10
    assert 3.0 < mean_ms < 12.0
    assert p95_ms >= 10.0
