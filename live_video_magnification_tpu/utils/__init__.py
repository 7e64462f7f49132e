"""Shared helpers."""

from live_video_magnification_tpu.utils.metrics import psnr_u8
