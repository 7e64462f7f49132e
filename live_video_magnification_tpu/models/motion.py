"""Motion (Laplace) magnification: Laplacian pyramid + temporal IIR bandpass.

Pure, scannable re-design of the reference's laplaceMagnify
(reference src/processing/magnification/MagnifyCore.hpp:83-160):

  u8 -> f32/255 -> BGR->Lab (color input) -> Laplacian pyramid (levels+1) ->
  per-level IIR bandpass against carried EMA state -> spatial-wavelength
  amplification ladder (level 0 and residual zeroed) -> collapse -> chroma
  attenuation -> out = input + motion -> Lab->BGR -> u8 (x255 + 1/255 bias).

First-frame semantics fall out without a branch: the EMA state is seeded with
the first frame's pyramid, making the bandpass exactly zero, so output == input
(matching MagnifyCore.hpp:98-103's explicit first-frame path).

State is a pytree of 2*(levels+1) float32 arrays; a step is O(pixels) VPU work.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from live_video_magnification_tpu.ops.color import (
    bgr_to_lab,
    lab_to_bgr,
    to_u8,
    u8_to_unit_f32,
)
from live_video_magnification_tpu.ops.pyramid import (
    build_laplace_pyr,
    collapse_laplace_pyr,
    pyramid_sizes,
)
from live_video_magnification_tpu.ops.temporal import iir_filter


class MotionDynParams(NamedTuple):
    """Per-frame (traced) parameters — slider changes never recompile."""

    amplification: jnp.ndarray   # alpha
    co_wavelength: jnp.ndarray   # lambda_c analogue
    co_low: jnp.ndarray          # IIR blend coefficient [0,1]
    co_high: jnp.ndarray
    chrom_attenuation: jnp.ndarray


class MotionState(NamedTuple):
    count: jnp.ndarray               # frames seen (int32)
    lowpass_hi: Tuple[jnp.ndarray, ...]  # per level (levels+1), [C,h,w] f32
    lowpass_lo: Tuple[jnp.ndarray, ...]


def init_state(h: int, w: int, channels: int, levels: int) -> MotionState:
    sizes = [(h, w)] + pyramid_sizes(h, w, levels)
    # Distinct arrays per leaf: shared buffers would break argument donation.
    hi = tuple(jnp.zeros((channels, lh, lw), jnp.float32) for lh, lw in sizes)
    lo = tuple(jnp.zeros((channels, lh, lw), jnp.float32) for lh, lw in sizes)
    return MotionState(jnp.zeros((), jnp.int32), hi, lo)


def step(
    state: MotionState,
    frame_u8: jnp.ndarray,  # [C, H, W] uint8
    dyn: MotionDynParams,
    *,
    levels: int,
) -> Tuple[MotionState, jnp.ndarray]:
    channels, h, w = frame_u8.shape
    color = channels >= 3

    x = u8_to_unit_f32(frame_u8)
    inp = bgr_to_lab(x) if color else x

    pyr = build_laplace_pyr(inp, levels)

    first = state.count == 0
    lp_hi = [jnp.where(first, p, s) for p, s in zip(pyr, state.lowpass_hi)]
    lp_lo = [jnp.where(first, p, s) for p, s in zip(pyr, state.lowpass_lo)]

    motion: List[jnp.ndarray] = []
    new_hi, new_lo = [], []
    for lvl in range(levels):
        dst, nh, nl = iir_filter(pyr[lvl], lp_hi[lvl], lp_lo[lvl], dyn.co_low, dyn.co_high)
        motion.append(dst)
        new_hi.append(nh)
        new_lo.append(nl)
    motion.append(pyr[levels])  # residual; zeroed by the ladder below
    new_hi.append(lp_hi[levels])
    new_lo.append(lp_lo[levels])

    # Amplification ladder (MagnifyCore.hpp:114-134): representative wavelength
    # sqrt(w^2+h^2)/3 halved per level; gain = min(alpha, (lambda/(8*delta)-1)*2);
    # residual and the finest difference level are zeroed.
    delta = dyn.co_wavelength / (8.0 * (1.0 + dyn.amplification))
    lam0 = math.sqrt(float(w * w + h * h)) / 3.0
    amplified: List[jnp.ndarray] = [None] * (levels + 1)
    lam = lam0
    for lvl in range(levels, -1, -1):
        curr_alpha = (lam / (delta * 8.0) - 1.0) * 2.0
        if lvl == levels or lvl == 0:
            amplified[lvl] = motion[lvl] * 0.0
        else:
            amplified[lvl] = motion[lvl] * jnp.minimum(dyn.amplification, curr_alpha).astype(
                jnp.float32
            )
        lam /= 2.0
    motion_img = collapse_laplace_pyr(amplified)

    if color:
        motion_img = motion_img * jnp.stack(
            [
                jnp.ones((), jnp.float32),
                dyn.chrom_attenuation.astype(jnp.float32),
                dyn.chrom_attenuation.astype(jnp.float32),
            ]
        ).reshape(3, 1, 1)

    output = inp + motion_img

    out_u8 = to_u8(lab_to_bgr(output) if color else output, 255.0, 1.0 / 255.0)

    new_state = MotionState(state.count + 1, tuple(new_hi), tuple(new_lo))
    return new_state, out_u8


def process_clip(
    frames_u8: jnp.ndarray,  # [T, C, H, W] uint8
    dyn: MotionDynParams,
    *,
    levels: int,
    state: MotionState | None = None,
) -> Tuple[MotionState, jnp.ndarray]:
    """Batch export path: lax.scan of step over the time axis."""
    t, c, h, w = frames_u8.shape
    if state is None:
        state = init_state(h, w, c, levels)

    def body(st, frame):
        return step(st, frame, dyn, levels=levels)

    return jax.lax.scan(body, state, frames_u8)


def process_clip_parallel(
    frames_u8: jnp.ndarray,  # [T, C, H, W] uint8
    dyn: MotionDynParams,
    *,
    levels: int,
    state: MotionState | None = None,
) -> Tuple[MotionState, jnp.ndarray]:
    """Time-parallel batch export: the EMA recurrences as associative scans.

    The two temporal low-passes are affine recurrences l_t = a*l_{t-1} + b_t
    (a = 1-cutoff, b_t = cutoff*x_t), so the whole clip can be filtered with
    lax.associative_scan over the time axis instead of a sequential carry —
    O(log T) depth. This is the sequence-parallel formulation (SURVEY.md §5):
    under a mesh the T axis can be sharded and XLA turns the scan combines at
    shard boundaries into collectives.

    `state` enables chunked continuation: the carried EMA pair seeds the scan
    (first-frame seeding falls out of the count==0 case, mirroring step()'s
    arithmetic exactly). Returns (final_state, outs [T, C, H, W] u8) like
    process_clip.
    """
    t, c, h, w = frames_u8.shape
    color = c >= 3
    if state is None:
        state = init_state(h, w, c, levels)
    first = state.count == 0

    def to_input(frame_u8):
        x = u8_to_unit_f32(frame_u8)
        return bgr_to_lab(x) if color else x

    inputs = jax.vmap(to_input)(frames_u8)                  # [T, C, H, W] f32
    pyrs = jax.vmap(lambda im: tuple(build_laplace_pyr(im, levels)))(inputs)

    co_low = jnp.where(dyn.co_low == 0.0, 0.01, dyn.co_low)
    co_high = dyn.co_high

    def ema_scan(xs, cutoff, carry):
        # l_t = (1-cutoff) l_{t-1} + cutoff x_t. The t=0 element folds in the
        # seed: first frame uses its own pyramid (step()'s where(first, ...)),
        # continuation uses the carried EMA state — same arithmetic either way.
        seed = jnp.where(first, xs[0], carry)
        b0 = (1.0 - cutoff) * seed + cutoff * xs[0]
        a = jnp.concatenate(
            [jnp.ones((1,), xs.dtype), jnp.full((t - 1,), 1.0 - cutoff, xs.dtype)]
        )
        b = jnp.concatenate([b0[None], cutoff * xs[1:]], axis=0)
        a = a.reshape((t,) + (1,) * (xs.ndim - 1))

        def combine(lhs, rhs):
            (a1, b1), (a2, b2) = lhs, rhs
            return a1 * a2, a2 * b1 + b2

        # `a` stays [T, 1, ...] — broadcasting inside combine avoids materializing
        # a full frame-sized coefficient tensor.
        _, l = jax.lax.associative_scan(combine, (a, b), axis=0)
        return l

    motion_levels = []
    new_hi, new_lo = [], []
    for lvl in range(levels):
        xs = pyrs[lvl]
        l_hi = ema_scan(xs, co_high, state.lowpass_hi[lvl])
        l_lo = ema_scan(xs, co_low, state.lowpass_lo[lvl])
        motion_levels.append(l_hi - l_lo)
        new_hi.append(l_hi[-1])
        new_lo.append(l_lo[-1])
    motion_levels.append(pyrs[levels])  # residual (zeroed below)
    # Residual EMA slots: seeded on the global first frame, then carried.
    new_hi.append(jnp.where(first, pyrs[levels][0], state.lowpass_hi[levels]))
    new_lo.append(jnp.where(first, pyrs[levels][0], state.lowpass_lo[levels]))

    delta = dyn.co_wavelength / (8.0 * (1.0 + dyn.amplification))
    lam = math.sqrt(float(w * w + h * h)) / 3.0
    amplified = [None] * (levels + 1)
    for lvl in range(levels, -1, -1):
        curr_alpha = (lam / (delta * 8.0) - 1.0) * 2.0
        if lvl == levels or lvl == 0:
            amplified[lvl] = motion_levels[lvl] * 0.0
        else:
            amplified[lvl] = motion_levels[lvl] * jnp.minimum(
                dyn.amplification, curr_alpha
            ).astype(jnp.float32)
        lam /= 2.0

    def finalize(pyr_t, inp):
        motion_img = collapse_laplace_pyr(pyr_t)
        if color:
            motion_img = motion_img * jnp.stack(
                [
                    jnp.ones((), jnp.float32),
                    dyn.chrom_attenuation.astype(jnp.float32),
                    dyn.chrom_attenuation.astype(jnp.float32),
                ]
            ).reshape(3, 1, 1)
        out = inp + motion_img
        return to_u8(lab_to_bgr(out) if color else out, 255.0, 1.0 / 255.0)

    outs = jax.vmap(finalize)(tuple(amplified), inputs)
    new_state = MotionState(state.count + t, tuple(new_hi), tuple(new_lo))
    return new_state, outs
