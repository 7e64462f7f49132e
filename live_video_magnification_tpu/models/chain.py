"""The processing chain: preprocess -> grayscale -> magnification, on device.

Functional re-design of the reference chain (ChainBuilder.cpp:11-29 and the
three processors). One jitted step per structural configuration computes BOTH
the "original" tap (stage-0 output, pre-magnification post-geometry —
ChainBuilder.cpp:19-29) and the processed frame; live preview and batch export
call the same compiled function, so they can never diverge (the functional
analogue of the shared chain factory, ChainBuilder.hpp:11-12).

Host-side responsibilities (this module):
  * structural tracking / temporal-state reset (StructuralTracker),
  * level clamping to calculateMaxLevels (MagnificationProcessor.cpp:31-34),
  * Butterworth coefficient computation + the cutoff-change reset protocol and
    NaN-degenerate re-init loop of phase mode (MagnifyCore.hpp:226-254),
  * jit-cache keyed on the structural configuration.

Device-side: everything per-pixel, in planar [C, H, W] uint8/f32.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from live_video_magnification_tpu.models import color as color_mode
from live_video_magnification_tpu.models import motion as motion_mode
from live_video_magnification_tpu.models import riesz as riesz_mode
from live_video_magnification_tpu.models.params import (
    MagnificationMode,
    PreprocessParams,
    ProcessorConfig,
)
from live_video_magnification_tpu.models.structural import StructuralTracker
from live_video_magnification_tpu.ops.color import bgr_to_gray_u8
from live_video_magnification_tpu.ops.pyramid import calculate_max_levels
from live_video_magnification_tpu.ops.resize import resize_area
from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs


def preprocess_geometry(p: PreprocessParams, h: int, w: int) -> Tuple[int, int, int, int, int, int]:
    """Static crop rect + output size per PreprocessProcessor.cpp:14-43.

    Returns (y, x, ch, cw, oh, ow): crop offset/size and post-downscale size.
    """
    divisor = min(max(p.downscale, 1), 8)
    x, y, cw, ch = 0, 0, w, h
    if p.roi_enabled:
        x = int(round(float(p.roi_x) * w))
        y = int(round(float(p.roi_y) * h))
        rw = int(round(float(p.roi_w) * w))
        rh = int(round(float(p.roi_h) * h))
        x = min(max(x, 0), w - 1)
        y = min(max(y, 0), h - 1)
        cw = min(max(rw, 1), w - x)
        ch = min(max(rh, 1), h - y)
    if divisor > 1:
        ow = max(1, cw // divisor)
        oh = max(1, ch // divisor)
    else:
        oh, ow = ch, cw
    return y, x, ch, cw, oh, ow


class _StaticKey(NamedTuple):
    mode: MagnificationMode
    levels: int          # clamped
    channels: int        # channels entering magnification (after grayscale)
    in_channels: int
    h: int               # source frame h/w
    w: int
    grayscale: bool
    geometry: Tuple[int, int, int, int, int, int]
    framerate: float
    # Kernel-variant flags (LVMT_PHASE_FUSED / LVMT_TAIL / LVMT_MXU_DTYPE),
    # resolved ONCE at static_key time so toggling an env var after a chain
    # compiled cannot serve a stale trace — the jit cache is keyed on them
    # (ADVICE round-2). tail_mode/mxu_dtype need only BE in the key: the
    # traced functions read the environment themselves at (re)trace time.
    # Full mode STRINGS, not booleans — LVMT_TAIL=mxu and the hybrid
    # LVMT_MXU_DTYPE modes must not collide with the defaults (round 4).
    phase_fused: bool = False
    tail_mode: str = "jnp"
    mxu_dtype: str = "f32"
    mxu_precision: str = "highest"
    conv9_variant: str = "auto"  # must match _conv9_variant's env default
    tail_io: str = "f32"         # LVMT_TAIL_IO: transient-plane dtype
    tail_vert: str = "mxu"       # LVMT_TAIL_VERT: vertical-blur formulation
    tail_db: str = "auto"        # LVMT_TAIL_DB: strip-DMA double buffering
    pyr_io: str = "f32"          # LVMT_PYR_IO: pyramid band-plane dtype
    tail_tile: str = "64"        # LVMT_TAIL_TILE: amplify-kernel tile rows
    fast_gamma: str = "0"        # LVMT_FAST_GAMMA: Newton-root Lab gamma
    tail_pack: str = "0"         # LVMT_TAIL_PACK: stacked one-DMA strips


class ChainStep(NamedTuple):
    """A compiled chain step + its state constructor."""

    fn: object       # jitted (state, frame_u8, dyn) -> (state, processed, original)
    raw_fn: object   # the unjitted step (for embedding in lax.scan batch loops)
    init_state: object
    key: _StaticKey


def _build_pre_stages(key: _StaticKey):
    """The two stateless chain stages (crop/downscale + grayscale) for a key,
    shared by the per-frame step and the time-parallel batch path. The crop
    and downscale halves are also returned separately so the HWC entry point
    can crop BEFORE the planar transpose (permuting only the ROI, not the full
    decode frame — a measured 25% of the 1080p host-loop step)."""
    y0, x0, ch_crop, cw_crop, oh, ow = key.geometry

    def downscale(frame_u8):
        if (oh, ow) != (ch_crop, cw_crop):
            # INTER_AREA on u8: OpenCV computes in fixed point; we compute f32 and
            # round (PSNR-equivalent; exact for integer box averages of u8 would
            # differ at half-ULP ties only).
            return jnp.clip(
                jnp.rint(resize_area(frame_u8.astype(jnp.float32), (oh, ow))), 0, 255
            ).astype(jnp.uint8)
        return frame_u8

    def preprocess(frame_u8):
        out = frame_u8
        if (y0, x0, ch_crop, cw_crop) != (0, 0, key.h, key.w):
            out = out[:, y0 : y0 + ch_crop, x0 : x0 + cw_crop]
        return downscale(out)

    def gray_stage(frame_u8):
        if key.grayscale and key.in_channels >= 3:
            return bgr_to_gray_u8(frame_u8)
        return frame_u8

    return preprocess, downscale, gray_stage


def _build_step(key: _StaticKey) -> ChainStep:
    y0, x0, ch_crop, cw_crop, oh, ow = key.geometry
    mode, levels = key.mode, key.levels
    preprocess, downscale, gray_stage = _build_pre_stages(key)

    if mode is MagnificationMode.LAPLACE:
        model_step = partial(motion_mode.step, levels=levels)
        init = lambda: motion_mode.init_state(oh, ow, key.channels, levels)
    elif mode is MagnificationMode.COLOR:
        model_step = partial(color_mode.step, levels=levels, framerate=key.framerate)
        init = lambda: color_mode.init_state(oh, ow, key.channels, levels, key.framerate)
    elif mode is MagnificationMode.PHASE and key.channels >= 3:
        model_step = partial(riesz_mode.step, levels=levels, phase_fused=key.phase_fused)
        init = lambda: riesz_mode.init_state(oh, ow, levels)
    else:  # NONE, too-small frames (levels < 1), or phase-on-gray: identity
        model_step = None
        init = lambda: jnp.zeros((), jnp.int32)

    def _core(state, pre, dyn):
        original = pre
        magin = gray_stage(pre)
        if model_step is None:
            return state, magin, original
        new_state, out = model_step(state, magin, dyn)
        return new_state, out, original

    def step(state, frame_u8, dyn):
        return _core(state, preprocess(frame_u8), dyn)

    def step_hwc(state, frame_hwc_u8, dyn):
        """Same step with HWC u8 IO: layout transforms run on device, so the
        host hands over frames exactly as decoded (no 2x memcpy per frame).
        The ROI crop happens in HWC layout so only the ROI is planarized."""
        crop = frame_hwc_u8
        if (y0, x0, ch_crop, cw_crop) != (0, 0, key.h, key.w):
            crop = crop[y0 : y0 + ch_crop, x0 : x0 + cw_crop]
        pre = downscale(jnp.transpose(crop, (2, 0, 1)))
        new_state, out, original = _core(state, pre, dyn)
        return (
            new_state,
            jnp.transpose(out, (1, 2, 0)),
            jnp.transpose(original, (1, 2, 0)),
        )

    compiled = jax.jit(step_hwc, donate_argnums=(0,))
    return ChainStep(compiled, step, init, key)


def parallel_clip_fn(key: _StaticKey):
    """The mode's time-parallel whole-clip function for a static key, or None
    for the identity path. Signature: fn(frames_tchw_u8, dyn, state=state) ->
    (state, outs) — the sequence-parallel export path (SURVEY.md §5)."""
    if key.mode is MagnificationMode.LAPLACE:
        return partial(motion_mode.process_clip_parallel, levels=key.levels)
    if key.mode is MagnificationMode.COLOR:
        return partial(
            color_mode.process_clip_parallel, levels=key.levels, framerate=key.framerate
        )
    if key.mode is MagnificationMode.PHASE and key.channels >= 3:
        return partial(riesz_mode.process_clip_parallel, levels=key.levels)
    return None


class MagnificationChain:
    """Host-side stateful wrapper: the equivalent of the reference's
    [Preprocess, Grayscale, Magnification] chain instance with its
    StructuralTracker and per-mode temporal state."""

    def __init__(self):
        self._tracker = StructuralTracker()
        self._steps: dict = {}
        self._state = None
        self._key: Optional[_StaticKey] = None
        # phase-mode host-side filter bookkeeping
        self._riesz_cutoffs: Optional[Tuple[float, float, float]] = None
        self._riesz_coeffs = None

    def reset(self) -> None:
        """Drop all temporal state (IProcessor::reset crash-recovery semantics)."""
        self._tracker.reset()
        self._state = None
        self._key = None
        self._riesz_cutoffs = None
        self._riesz_coeffs = None

    # -- dynamic parameter marshalling ----------------------------------------------------------

    def _dyn_params(self, cfg: ProcessorConfig, key: _StaticKey):
        p = cfg.magnification
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        if key.mode is MagnificationMode.LAPLACE:
            return motion_mode.MotionDynParams(
                f32(p.amplification), f32(p.co_wavelength), f32(p.co_low), f32(p.co_high),
                f32(p.chrom_attenuation),
            )
        if key.mode is MagnificationMode.COLOR:
            return color_mode.ColorDynParams(f32(p.amplification), f32(p.co_low), f32(p.co_high))
        if key.mode is MagnificationMode.PHASE and key.channels >= 3:
            cutoffs = (p.co_low, p.co_high, p.framerate)
            reset_filters = False
            if self._riesz_cutoffs is None:
                self._riesz_coeffs = (
                    butterworth_bandpass_coeffs(p.co_low, p.framerate),
                    butterworth_bandpass_coeffs(p.co_high, p.framerate),
                )
                self._riesz_cutoffs = cutoffs
            elif cutoffs != self._riesz_cutoffs:
                # Cutoff change: recompute + reset both filters + rebuild prior
                # pyramid from the current frame (MagnifyCore.hpp:243-254).
                self._riesz_coeffs = (
                    butterworth_bandpass_coeffs(p.co_low, p.framerate),
                    butterworth_bandpass_coeffs(p.co_high, p.framerate),
                )
                self._riesz_cutoffs = cutoffs
                reset_filters = True
            (b_lo, a_lo), (b_hi, a_hi) = self._riesz_coeffs
            force_init = bool(np.isnan(a_lo[0]) or np.isnan(a_hi[0]))
            return riesz_mode.RieszDynParams(
                f32(p.amplification),
                f32(p.co_wavelength * math.pi / 100.0),
                jnp.asarray(b_lo, jnp.float32),
                jnp.asarray(a_lo, jnp.float32),
                jnp.asarray(b_hi, jnp.float32),
                jnp.asarray(a_hi, jnp.float32),
                jnp.asarray(reset_filters),
                jnp.asarray(force_init),
            )
        return jnp.zeros(())  # identity path takes no params

    # -- per-frame entry ------------------------------------------------------------------------

    def static_key(self, cfg: ProcessorConfig, h: int, w: int, channels: int) -> _StaticKey:
        geometry = preprocess_geometry(cfg.preprocess, h, w)
        oh, ow = geometry[4], geometry[5]
        mag_channels = 1 if (cfg.grayscale and channels >= 3) else channels
        mode = cfg.magnification.mode
        max_levels = calculate_max_levels((oh, ow))
        if mode is not MagnificationMode.NONE and max_levels < 1:
            mode = MagnificationMode.NONE  # too small to magnify -> identity
        levels = min(max(cfg.magnification.levels, 1), max(max_levels, 1))
        return _StaticKey(
            mode, levels, mag_channels, channels, h, w, bool(cfg.grayscale), geometry,
            float(cfg.magnification.framerate),
            os.environ.get("LVMT_PHASE_FUSED", "0") == "1",
            os.environ.get("LVMT_TAIL", "jnp"),
            os.environ.get("LVMT_MXU_DTYPE", "f32"),
            os.environ.get("LVMT_MXU_PRECISION", "highest").lower(),
            os.environ.get("LVMT_CONV9", "auto"),
            os.environ.get("LVMT_TAIL_IO", "f32"),
            os.environ.get("LVMT_TAIL_VERT", "mxu"),
            os.environ.get("LVMT_TAIL_DB", "auto"),
            os.environ.get("LVMT_PYR_IO", "f32"),
            os.environ.get("LVMT_TAIL_TILE", "64"),
            os.environ.get("LVMT_FAST_GAMMA", "0"),
            os.environ.get("LVMT_TAIL_PACK", "0"),
        )

    def process(self, frame_u8_hwc, cfg: ProcessorConfig):
        """Run the chain once. frame_u8_hwc: [H, W, C] or [H, W] uint8 — the
        decode layout; planarization happens on device inside the jitted step.

        Returns (processed_u8, original_u8) device arrays, both [H', W', C'].
        """
        if frame_u8_hwc.ndim == 2:
            frame_u8_hwc = frame_u8_hwc[..., None]
        h, w, c = frame_u8_hwc.shape
        key = self.static_key(cfg, h, w, c)

        if key not in self._steps:
            self._steps[key] = _build_step(key)
        step = self._steps[key]

        structural = self._tracker.update(
            cfg, key.levels, key.channels, (key.geometry[4], key.geometry[5])
        ) or key != self._key
        if structural or self._state is None:
            self._state = step.init_state()
            self._key = key
            self._riesz_cutoffs = None
            self._riesz_coeffs = None

        dyn = self._dyn_params(cfg, key)
        self._state, processed, original = step.fn(
            self._state, jnp.asarray(frame_u8_hwc), dyn
        )
        return processed, original
