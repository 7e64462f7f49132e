"""Host-side streaming runtime.

The TPU-native re-design of the reference's core runtime + pipeline layers
(src/core/, src/pipeline/): bounded-queue transport with Block/Drop overflow,
latest-wins display mailbox, RCU config snapshots, pooled frames,
instrumentation, threaded sources, and the playback controller that wires a
source -> processing chain (device) -> mailbox.

Semantics preserved from the reference (SURVEY.md §1 invariants):
  1. lossless-by-default temporal path (file=Block, camera=Drop; frames may be
     skipped, never reordered),
  2. display is the only lossy hop (latest-wins mailbox),
  3. one processing consumer, frames strictly in order,
  4. live preview and export share one chain implementation,
  5. config is RCU-published, read once per frame,
  6. frames are immutable after publish; pooled buffers bound memory.
"""

from live_video_magnification_tpu.engine.frame import Frame, PixelFormat
from live_video_magnification_tpu.engine.queue import BoundedQueue, OverflowPolicy
from live_video_magnification_tpu.engine.mailbox import DisplayFrame, LatestFrameMailbox
from live_video_magnification_tpu.engine.config import AtomicConfig
from live_video_magnification_tpu.engine.pool import FramePool
from live_video_magnification_tpu.engine.instrumentation import Instrumentation, StatsSnapshot
from live_video_magnification_tpu.engine.processing import ProcessingChain
from live_video_magnification_tpu.engine.controller import PlaybackController
