"""Export request/progress types (reference export/ExportTypes.hpp:11-51).

Capture rate (algorithm Hz, inside ProcessorConfig.magnification.framerate) and
file fps are independent: process 1000 fps slow-motion footage, write a 30 fps
file.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

from live_video_magnification_tpu.models.params import ProcessorConfig


class SplitMode(enum.Enum):
    NONE = "none"
    LEFT_RIGHT = "left-right"
    TOP_BOTTOM = "top-bottom"


class ExportFormat(enum.Enum):
    MP4_H264 = "mp4-h264"
    AVI_MJPG = "avi-mjpg"
    MKV_FFV1 = "mkv-ffv1"  # lossless


class ExportPhase(enum.Enum):
    IDLE = "idle"
    RECORDING = "recording"
    PROCESSING = "processing"
    DONE = "done"
    FAILED = "failed"
    ABORTED = "aborted"


@dataclasses.dataclass(frozen=True)
class ExportRequest:
    config: ProcessorConfig
    output_path: str
    file_fps: float = 30.0
    split: SplitMode = SplitMode.NONE
    text_overlay: bool = False
    format: ExportFormat = ExportFormat.MP4_H264
    start_frame: int = 0
    end_frame: Optional[int] = None  # exclusive; None = to the end


@dataclasses.dataclass
class ExportProgress:
    phase: ExportPhase = ExportPhase.IDLE
    frames_done: int = 0
    frames_total: Optional[int] = None  # None = indeterminate
    error: Optional[str] = None
