"""Riesz pyramid ops (Wadhwa ICCP'14) matching the reference numerics.

Reproduces reference src/processing/magnification/RieszPyramid.cpp:
  * build_riesz_pyramid     — buildPyramid (:215-238): 9x9 high-pass band gets the
    Riesz transform (1x5 band kernel + transpose, :66-78); 9x9 2*low-pass band is
    decimated by plain even-pixel subsampling (:254-278).
  * phase_difference_and_amplitude — the quaternion conjugate product, quaternion
    log, NaN patching, and 13x13 sigma=3 amplitude blur (:81-111).
  * normalize_phase / amplify_level — (:114-144), including the reference's
    clamped arcCos quirk (x < -1 maps to -1.0, NOT acos(-1); :8-23) and
    cv::THRESH_TRUNC amplification clamping.
  * collapse_riesz_pyramid  — nearest-upsample + even-pixel zero-injection +
    2*low-pass + next octave's high-pass (:304-325).

All arrays are single-channel [H, W] float32 (phase mode magnifies Lab luminance
only, MagnifyCore.hpp:217-222). Levels are a static-length list (pytree).
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from live_video_magnification_tpu.ops.conv import (
    correlate2d,
    correlate_cols,
    correlate_rows,
    sep_correlate2d,
)
from live_video_magnification_tpu.ops.kernels import (
    AMPLITUDE_BLUR_KERNEL_1D,
    RIESZ_BAND_KERNEL,
    RIESZ_HIGHPASS_9x9,
    RIESZ_LOWPASS_9x9,
)
from live_video_magnification_tpu.ops.resize import resize_nearest_even_inject
from live_video_magnification_tpu.ops.temporal import CompExp


class RieszLevel(NamedTuple):
    """One pyramid level: band-passed octave + its Riesz transform pair."""

    lowpass: jnp.ndarray  # the reference's itsLowpass (the band image)
    riesz: CompExp        # (real/x, imag/y) Riesz components


def riesz_level_sizes(h: int, w: int, levels: int) -> List[Tuple[int, int]]:
    """Level sizes: ceil-halved per decimation; last level not decimated further."""
    sizes = []
    for i in range(levels):
        sizes.append((h, w))
        if i < levels - 1:
            h, w = h // 2 + h % 2, w // 2 + w % 2
    return sizes


def _subsample(x: jnp.ndarray) -> jnp.ndarray:
    """Plain even-pixel decimation with ceil sizes (RieszPyramid.cpp:254-278)."""
    return x[..., ::2, ::2]


def _band_build(octave: jnp.ndarray) -> RieszLevel:
    """RieszPyramidLevel::build — Riesz transform of a band image (:66-78)."""
    r = correlate_rows(octave, RIESZ_BAND_KERNEL)
    i = correlate_cols(octave, RIESZ_BAND_KERNEL)
    return RieszLevel(lowpass=octave, riesz=CompExp(r, i))


def _use_fused_build(h: int, w: int) -> bool:
    """Pallas fused level build: on for TPU-class backends, off on CPU (where the
    interpreter would crawl) and for tiny levels. Override with LVMT_PALLAS=0/1."""
    flag = os.environ.get("LVMT_PALLAS", "auto")
    from live_video_magnification_tpu.ops.pallas.riesz_build import MIN_FUSED_DIM

    if min(h, w) < MIN_FUSED_DIM or flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() != "cpu"


def _tail_mode() -> str:
    """Streaming-tail implementation, LVMT_TAIL in {jnp, pallas, mxu}.

    'jnp' (default): XLA-fused shifted-add 13-tap blurs — measured 5.64 ms vs
    the scratch-ref kernel's 7.26 ms at 4K (round-3 A/B, docs/ROOFLINE.md).
    'pallas': the riesz_amplify_fused VPU kernel (kept for A/B).
    'mxu': riesz_amplify_mxu — banded-matmul blurs in the proven conv9_mxu
    formulation (round-4 candidate for the remaining tail gap)."""
    return os.environ.get("LVMT_TAIL", "jnp")


def _use_amplify_kernel() -> bool:
    """Whether the streaming tail uses the riesz_amplify_fused Pallas kernel
    (LVMT_TAIL=pallas) instead of the default jnp normalize+amplify."""
    return _tail_mode() == "pallas"


def _pyr_io_bf16() -> bool:
    """LVMT_PYR_IO=bf16: the per-level pyramid band planes (highpass + Riesz
    pair — the planes the phase front, the amplify tail, and the carried
    prior pyramid all re-read) are emitted as bfloat16 by the build kernels —
    half their HBM bytes across build writes, front reads, tail reads, and
    state writes. The decimated octave cascade and everything the collapse
    consumes stay f32 (the octave feeds every coarser level, and the
    residual merges into the output). All consumers cast to f32 on load, so
    only the STORAGE is quantized, never the arithmetic. Trace-time flag,
    keyed into the chain jit cache (models/chain.py); engages only on the
    streaming/auto path (use_pallas is None) — the sharded and time-parallel
    builders stay f32 and self-adapt their carried-state dtype to whatever
    the checkpoint holds."""
    return os.environ.get("LVMT_PYR_IO", "f32") == "bf16"


def _tail_io_bf16() -> bool:
    """LVMT_TAIL_IO=bf16: the TRANSIENT planes feeding the MXU tail
    (amplitude + phase-change pair) are written/read as bfloat16 — half the
    HBM bytes on 3 writes + 3 halo'd strip reads per level. Safe to quantize
    because these planes are per-frame intermediates: nothing accumulates
    across frames (the DF-II registers and phase accumulator stay f32).
    Trace-time flag, keyed into the chain jit cache (models/chain.py)."""
    return os.environ.get("LVMT_TAIL_IO", "f32") == "bf16"


def _hybrid_bf16(lvl: int):
    """Per-level (conv_bf16, band_bf16) for the MXU fast modes; None = the
    plain env-driven f32/bf16 resolution inside the kernels.

    LVMT_MXU_DTYPE=hybrid: the FINEST level (lvl 0) keeps f32 operands, all
    coarser levels run bf16 — the bf16 outlier pixels (max u8 delta 140,
    MXU_BF16_AB.json) sit at phase singularities whose reconstruction weight
    is dominated by the finest band, so this targets them at ~the bf16 rate
    (level 0 is 3/4 of the pixel mass but its stencils are the most
    MXU-efficient). LVMT_MXU_DTYPE=hybrid-band: the 1x5 Riesz band pair
    (whose output feeds the phase quotient directly) stays f32 everywhere,
    the 9x9 smoothing stencils go bf16."""
    mode = os.environ.get("LVMT_MXU_DTYPE", "f32")
    if mode == "hybrid":
        return (lvl > 0, lvl > 0)
    if mode == "hybrid-band":
        return (True, False)
    return (None, None)


def build_riesz_pyramid(
    frame: jnp.ndarray, levels: int, use_pallas: bool | None = None
) -> List[RieszLevel]:
    """buildPyramid (:215-238): levels-1 band levels + untouched final octave.

    use_pallas: None = auto (TPU backends, large-enough levels); False forces
    the plain jnp ops (required under GSPMD sharding, where a pallas_call is
    not partitionable).

    Kernel strategy per level (TPU): the 9x9 high-pass/low-pass stencils ride
    the MXU as banded matmuls (conv9_mxu / lp9_decimate_mxu — decimation folded
    into the band so the low-pass computes only the kept pixels) and the Riesz
    1x5/5x1 band pair as a 5-band matmul (band5_mxu); levels too small for the
    MXU tiles fall back to the fused VPU build kernel, then to plain jnp.
    LVMT_BUILD=fused forces the VPU fused kernel (A/B lever)."""
    pyr = []
    octave = frame
    pyr_bf16 = use_pallas is None and _pyr_io_bf16()

    def _cast_level(level: RieszLevel) -> RieszLevel:
        if not pyr_bf16:
            return level
        c = lambda x: x.astype(jnp.bfloat16)
        return RieszLevel(c(level.lowpass),
                          CompExp(c(level.riesz.cos), c(level.riesz.sin)))

    for lvl in range(levels - 1):
        h, w = octave.shape[-2], octave.shape[-1]
        fused_ok = use_pallas if use_pallas is not None else _use_fused_build(h, w)
        # An explicit use_pallas=True still goes through _use_mxu (backend +
        # MIN_MXU_DIM gating): the non-interpret MXU kernels only lower on TPU.
        mxu_ok = (
            octave.ndim == 2
            and fused_ok
            and _use_mxu(h, w)
            and os.environ.get("LVMT_BUILD", "auto") != "fused"
        )
        if mxu_ok:
            from live_video_magnification_tpu.ops.pallas.conv9_mxu import (
                band5_mxu,
                conv9_mxu,
                lp9_decimate_mxu,
            )

            conv_bf16, band_bf16 = _hybrid_bf16(lvl)
            od = "bf16" if pyr_bf16 else "f32"
            hp = conv9_mxu(octave, RIESZ_HIGHPASS_9x9, bf16=conv_bf16,
                           out_dtype=od)
            r, i = band5_mxu(hp, RIESZ_BAND_KERNEL, bf16=band_bf16,
                             out_dtype=od)
            sub = lp9_decimate_mxu(octave, 2.0 * RIESZ_LOWPASS_9x9,
                                   bf16=conv_bf16)
            pyr.append(RieszLevel(lowpass=hp, riesz=CompExp(r, i)))
            octave = sub
        elif octave.ndim == 2 and fused_ok and min(h, w) >= 16:
            from live_video_magnification_tpu.ops.pallas.riesz_build import (
                riesz_build_level_fused,
            )

            hp, r, i, sub = riesz_build_level_fused(octave)
            pyr.append(_cast_level(RieszLevel(lowpass=hp,
                                              riesz=CompExp(r, i))))
            octave = sub
        else:
            hp = correlate2d(octave, RIESZ_HIGHPASS_9x9)
            pyr.append(_cast_level(_band_build(hp)))
            lp = correlate2d(octave, 2.0 * RIESZ_LOWPASS_9x9)
            octave = _subsample(lp)
    pyr.append(_band_build(octave))  # residual octave: always f32
    return pyr


def clamped_arccos(x: jnp.ndarray) -> jnp.ndarray:
    """The reference's arcCos (:8-23): out-of-range inputs map to +-1.0 — not to
    acos of the clamp. Load-bearing for bit parity."""
    safe = jnp.arccos(jnp.clip(x, -1.0, 1.0))
    return jnp.where(x < -1.0, -1.0, jnp.where(x > 1.0, 1.0, safe))


def patch_nans(x: jnp.ndarray) -> jnp.ndarray:
    """cv::patchNaNs(x, 0): NaN -> 0 (infinities pass through)."""
    return jnp.where(jnp.isnan(x), 0.0, x)


def amplitude_blur(x: jnp.ndarray) -> jnp.ndarray:
    """GaussianBlur(13x13, sigma=3), reflect-101 (:110)."""
    return sep_correlate2d(x, AMPLITUDE_BLUR_KERNEL_1D, AMPLITUDE_BLUR_KERNEL_1D)


class PhaseResult(NamedTuple):
    phase_diff: CompExp
    amplitude: jnp.ndarray
    amplitude_blurred: jnp.ndarray


def phase_difference_and_amplitude(
    cur: RieszLevel, prior: RieszLevel, compute_blur: bool = True
) -> PhaseResult:
    """computePhaseDifferenceAndAmplitude (:81-111).

    Quaternion conjugate product cur * conj(prior); its log gives the phase
    difference split into orientation*(phi); amplitude is sqrt of the quaternion
    norm, blurred 13x13 sigma=3.
    """
    q_real = (
        cur.lowpass * prior.lowpass
        + cur.riesz.cos * prior.riesz.cos
        + cur.riesz.sin * prior.riesz.sin
    )
    # (prior.itsRiesz * (itsLowpass * -1)) + (itsRiesz * prior.itsLowpass)
    q_xy = CompExp(
        prior.riesz.cos * (-cur.lowpass) + cur.riesz.cos * prior.lowpass,
        prior.riesz.sin * (-cur.lowpass) + cur.riesz.sin * prior.lowpass,
    )
    xy_sq = q_xy.square_sum()
    q_amp = jnp.sqrt(q_real * q_real + xy_sq)
    phi = clamped_arccos(q_real / q_amp)
    xy_norm = jnp.sqrt(xy_sq)
    orientation = CompExp(q_xy.cos / xy_norm, q_xy.sin / xy_norm)
    phase_diff = CompExp(
        patch_nans(orientation.cos * phi), patch_nans(orientation.sin * phi)
    )
    amplitude = jnp.sqrt(q_amp)
    blurred = amplitude_blur(amplitude) if compute_blur else amplitude
    return PhaseResult(phase_diff, amplitude, blurred)


def normalize_phase(
    highpass_iir: CompExp,
    lowpass_iir: CompExp,
    amplitude: jnp.ndarray,
    amplitude_blurred: jnp.ndarray,
) -> CompExp:
    """RieszPyramidLevel::normalize (:114-127): amplitude-weighted blur of the
    band-passed phase change, divided by the blurred amplitude."""
    change = highpass_iir - lowpass_iir
    cos = amplitude_blur(change.cos * amplitude) / amplitude_blurred
    sin = amplitude_blur(change.sin * amplitude) / amplitude_blurred
    return CompExp(cos, sin)


def amplify_level(
    level: RieszLevel,
    normalized: CompExp,
    alpha,
    threshold,
) -> jnp.ndarray:
    """RieszPyramidLevel::amplify (:129-144). Returns the phase-rotated lowpass."""
    mag = jnp.sqrt(normalized.square_sum())
    mag2 = jnp.minimum(mag * alpha, threshold)  # cv::THRESH_TRUNC
    cos_rot = jnp.cos(mag2)
    sin_rot = jnp.sin(mag2)
    pair = level.riesz.cos * normalized.cos + level.riesz.sin * normalized.sin
    pair = patch_nans(pair / mag)
    return level.lowpass * cos_rot - pair * sin_rot


def _use_mxu(h: int, w: int) -> bool:
    """MXU banded-matmul stencils: on for TPU-class backends at large levels;
    same LVMT_PALLAS override as _use_fused_build."""
    from live_video_magnification_tpu.ops.pallas.conv9_mxu import MIN_MXU_DIM

    flag = os.environ.get("LVMT_PALLAS", "auto")
    if min(h, w) < MIN_MXU_DIM or flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() != "cpu"


def collapse_riesz_pyramid(
    lowpasses: List[jnp.ndarray], use_pallas: bool | None = None
) -> jnp.ndarray:
    """collapsePyramid (:304-325): zero-injected 2*low-pass upsample + high-pass
    of each finer octave, coarsest first.

    use_pallas: None = auto (MXU banded-matmul stencils on TPU backends for
    large even-dim levels); False forces plain jnp (GSPMD-sharded path)."""
    result = lowpasses[-1]
    for lvl in range(len(lowpasses) - 2, -1, -1):
        octave = lowpasses[lvl]
        h, w = octave.shape[-2], octave.shape[-1]
        mxu_ok = (
            octave.ndim == 2
            and h % 2 == 0
            and w % 2 == 0
            and (h, w) == (2 * result.shape[-2], 2 * result.shape[-1])
            and (use_pallas if use_pallas is not None else _use_mxu(h, w))
        )
        if mxu_ok:
            from live_video_magnification_tpu.ops.pallas.conv9_mxu import (
                conv9_mxu,
                lp9_inject_mxu,
            )

            conv_bf16, _band = _hybrid_bf16(lvl)
            lp = lp9_inject_mxu(result, 2.0 * RIESZ_LOWPASS_9x9, (h, w),
                                bf16=conv_bf16)
            hp = conv9_mxu(octave, RIESZ_HIGHPASS_9x9, bf16=conv_bf16)
        else:
            up_zero = resize_nearest_even_inject(result, (h, w))
            lp = correlate2d(up_zero, 2.0 * RIESZ_LOWPASS_9x9)
            hp = correlate2d(octave, RIESZ_HIGHPASS_9x9)
        result = lp + hp
    return result
