"""The three magnification pipelines as pure, scannable step functions.

Each mode module exposes:
  * a static config (shapes/levels/framerate — compile-time),
  * an init_state() building the carried-state pytree,
  * a step(state, frame_u8, dyn) -> (state, out_u8) pure function, jittable and
    usable under lax.scan for batch export,
  * a process_clip() convenience scan.

Streaming is T=1 steps with donated state; batch export is lax.scan over the
same step — live preview and export share one chain by construction, the
functional analogue of the reference's single chain factory
(reference ChainBuilder.hpp:11-12).
"""

from live_video_magnification_tpu.models.params import (
    MagnificationMode,
    MagnificationParams,
    MagUiValues,
    PreprocessParams,
    ProcessorConfig,
    defaults_for,
    motion_blend_to_hz,
    motion_hz_to_blend,
    to_params,
    to_ui,
)
from live_video_magnification_tpu.models import motion, color, riesz
from live_video_magnification_tpu.models.chain import MagnificationChain
