"""Video IO (decode/encode) helpers."""

from live_video_magnification_tpu.io.video import read_video, write_video, video_info
