"""Color magnification: Gaussian pyramid + ideal FFT bandpass over a rolling window.

Pure, scannable re-design of the reference's colorMagnify
(reference src/processing/magnification/MagnifyCore.hpp:163-206):

  u8 -> f32 (NO /255) -> Gaussian pyramid, take smallest level -> push as newest
  column of a rolling window of optimal_buffer_size(fps) frames -> ideal FFT
  bandpass over the time axis (min-max normalized over the whole window) ->
  x amplification -> reconstruct column min(1, cols-1) via pyrUps + resize ->
  out = input + colorImg -> rescale u8 by the output's own min/max.

TPU re-design: the rolling window is a device-resident [W, C, hs, ws] tensor
(time-major); the bandpass is a circulant matmul over the time axis (see
ops/temporal.py) which is exact for the growing warm-up window lengths without
recompilation — the window length is a traced scalar, not a shape.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from live_video_magnification_tpu.ops.color import to_u8
from live_video_magnification_tpu.ops.pyramid import (
    build_gauss_pyr,
    pyramid_sizes,
    reconstruct_from_gauss_level,
)
from live_video_magnification_tpu.ops.temporal import (
    ideal_bandpass_apply,
    minmax_normalize,
    optimal_buffer_size,
)


class ColorDynParams(NamedTuple):
    amplification: jnp.ndarray
    co_low: jnp.ndarray   # Hz
    co_high: jnp.ndarray  # Hz


class ColorState(NamedTuple):
    count: jnp.ndarray    # frames pushed so far (int32, saturates at window size semantics)
    window: jnp.ndarray   # [W, C, hs, ws] f32 rolling window, rows 0..L-1 active, oldest first


def window_size(framerate: float) -> int:
    return optimal_buffer_size(int(framerate))


def init_state(h: int, w: int, channels: int, levels: int, framerate: float) -> ColorState:
    hs, ws = pyramid_sizes(h, w, levels)[levels - 1]
    win = jnp.zeros((window_size(framerate), channels, hs, ws), jnp.float32)
    return ColorState(jnp.zeros((), jnp.int32), win)


def step(
    state: ColorState,
    frame_u8: jnp.ndarray,  # [C, H, W] uint8
    dyn: ColorDynParams,
    *,
    levels: int,
    framerate: float,
) -> Tuple[ColorState, jnp.ndarray]:
    channels, h, w = frame_u8.shape
    w_static = state.window.shape[0]

    inp = frame_u8.astype(jnp.float32)  # convertTo(CV_32F): stays in [0,255]

    pyr = build_gauss_pyr(inp, levels)
    small = pyr[levels - 1]

    # img2tempMat semantics (SpatialFilter.cpp:63-84): append newest; once full,
    # drop the oldest. Implemented as conditional roll + dynamic row write.
    full = state.count >= w_static
    rolled = jnp.where(full, jnp.roll(state.window, -1, axis=0), state.window)
    idx = jnp.minimum(state.count, w_static - 1)
    window = jax.lax.dynamic_update_index_in_dim(rolled, small, idx, 0)
    length = jnp.minimum(state.count + 1, w_static)  # active column count

    filtered = ideal_bandpass_apply(
        window.reshape(w_static, -1), length, dyn.co_low, dyn.co_high, framerate
    )
    # normalize(0,1,MINMAX) over the active window, all channels jointly; an
    # empty bandpass mask yields a constant window which OpenCV maps to zeros
    # (guard inside minmax_normalize, reference-C++-verified)
    row_valid = (jnp.arange(w_static) < length)[:, None]
    filtered = minmax_normalize(filtered, valid_mask=row_valid)

    filtered = filtered * dyn.amplification.astype(jnp.float32)

    # Reconstructed column is min(1, cols-1) — index 1 in steady state
    # (MagnifyCore.hpp:186-192).
    col = jnp.minimum(1, length - 1)
    small_filtered = jax.lax.dynamic_index_in_dim(filtered, col, 0, keepdims=False).reshape(
        small.shape
    )
    color_img = reconstruct_from_gauss_level(small_filtered, levels, (h, w))

    output = inp + color_img

    # Rescale by the output's own min/max across all channels (MagnifyCore.hpp:199-203).
    omn = jnp.min(output)
    omx = jnp.max(output)
    out_u8 = to_u8(output, 255.0 / (omx - omn), -omn * 255.0 / (omx - omn))

    # Warm-up: fewer than 2 columns => raw frame passthrough (MagnifyCore.hpp:180).
    out_u8 = jnp.where(length < 2, frame_u8, out_u8)

    # Saturate the counter at the window size (all downstream checks only need
    # "full"), so indefinite streaming cannot overflow it.
    return ColorState(jnp.minimum(state.count + 1, w_static), window), out_u8


def process_clip(
    frames_u8: jnp.ndarray,  # [T, C, H, W] uint8
    dyn: ColorDynParams,
    *,
    levels: int,
    framerate: float,
    state: ColorState | None = None,
) -> Tuple[ColorState, jnp.ndarray]:
    t, c, h, w = frames_u8.shape
    if state is None:
        state = init_state(h, w, c, levels, framerate)

    def body(st, frame):
        return step(st, frame, dyn, levels=levels, framerate=framerate)

    return jax.lax.scan(body, state, frames_u8)


def process_clip_parallel(
    frames_u8: jnp.ndarray,  # [T, C, H, W] uint8
    dyn: ColorDynParams,
    *,
    levels: int,
    framerate: float,
    state: ColorState | None = None,
) -> Tuple[ColorState, jnp.ndarray]:
    """Time-parallel batch export of color mode (SURVEY.md §5 sequence parallelism).

    Every frame's output depends on the rolling window of the last
    min(t+1, N) pyramid-top frames (MagnifyCore.hpp:163-206). Batched form:
    build all pyramid tops with vmap, gather each frame's window directly from
    the [T, ...] sequence (a sliding-window gather instead of the sequential
    roll+write), and vmap the circulant-matmul bandpass + normalize +
    reconstruct + output rescale over T. No sequential dependency remains, so
    the T axis shards cleanly across a mesh (the window gather becomes a halo
    read of at most N-1 neighbor frames).

    `state` enables chunked continuation: the carried window's active rows are
    prepended to the chunk's pyramid tops so every gather sees the same rolling
    window the sequential path would. Returns (final_state, outs [T,C,H,W] u8)
    like process_clip.
    """
    t_total, channels, h, w = frames_u8.shape
    n_win = window_size(framerate)
    if state is None:
        state = init_state(h, w, channels, levels, framerate)

    inputs = frames_u8.astype(jnp.float32)  # convertTo(CV_32F): stays in [0,255]
    smalls = jax.vmap(lambda im: build_gauss_pyr(im, levels)[levels - 1])(inputs)
    flat = smalls.reshape(t_total, -1)  # [T, P]

    # Prepend the carried window (active rows 0..count-1, oldest first) so it
    # ends exactly at index n_win of the combined sequence: rolling by
    # n_win - count puts the newest carried frame at combined[n_win - 1].
    count = jnp.minimum(state.count, n_win)  # active carried rows
    carried = jnp.roll(state.window.reshape(n_win, -1), n_win - count, axis=0)
    combined = jnp.concatenate([carried, flat], axis=0)      # [N + T, P]

    ts = jnp.arange(t_total)
    lengths = jnp.minimum(count + ts + 1, n_win)             # active columns
    # window row j of frame t (oldest first) = combined[end_t - L_t + j] with
    # end_t = n_win + t + 1; rows >= L are don't-care (masked inside
    # ideal_bandpass_apply); clamp the gather index.
    base = n_win + ts + 1 - lengths
    idx = jnp.minimum(base[:, None] + jnp.arange(n_win)[None, :], n_win + t_total - 1)
    windows = combined[idx]                                  # [T, N, P]

    def per_frame(window_fp, length, inp, raw_u8):
        filtered = ideal_bandpass_apply(
            window_fp, length, dyn.co_low, dyn.co_high, framerate
        )
        row_valid = (jnp.arange(n_win) < length)[:, None]
        filtered = minmax_normalize(filtered, valid_mask=row_valid)
        filtered = filtered * dyn.amplification.astype(jnp.float32)
        col = jnp.minimum(1, length - 1)
        small_f = jax.lax.dynamic_index_in_dim(filtered, col, 0, keepdims=False)
        small_f = small_f.reshape(smalls.shape[1:])
        color_img = reconstruct_from_gauss_level(small_f, levels, (h, w))
        output = inp + color_img
        omn = jnp.min(output)
        omx = jnp.max(output)
        out_u8 = to_u8(output, 255.0 / (omx - omn), -omn * 255.0 / (omx - omn))
        return jnp.where(length < 2, raw_u8, out_u8)

    outs = jax.vmap(per_frame)(windows, lengths, inputs, frames_u8)

    # Final window: the last min(count + T, N) combined rows, oldest first at
    # rows 0..L-1 (the sequential layout), remaining rows zeroed.
    l_final = jnp.minimum(count + t_total, n_win)
    fidx = jnp.minimum(n_win + t_total - l_final + jnp.arange(n_win), n_win + t_total - 1)
    final_rows = combined[fidx]
    final_rows = jnp.where((jnp.arange(n_win) < l_final)[:, None], final_rows, 0.0)
    new_state = ColorState(l_final, final_rows.reshape(state.window.shape))
    return new_state, outs
