"""Offline export: the reference's export/ subsystem, TPU-native.

Two processing paths share the SAME chain implementation as live preview:
  * Exporter — the streaming worker (frame at a time, ordered), mirroring the
    reference Exporter thread semantics (split composition, codec fallbacks,
    abort cleanup, progress snapshots);
  * batch — the high-throughput path: lax.scan over device-resident frame
    chunks with carried temporal state and checkpoint/resume, the configuration
    the TPU actually shines at (BASELINE.md config 5).
"""

from live_video_magnification_tpu.export.types import (
    ExportFormat,
    ExportPhase,
    ExportProgress,
    ExportRequest,
    SplitMode,
)
from live_video_magnification_tpu.export.sources import (
    BufferExportFrameSource,
    FileExportFrameSource,
    IExportFrameSource,
)
from live_video_magnification_tpu.export.recording import RecordingBuffer
from live_video_magnification_tpu.export.exporter import Exporter
