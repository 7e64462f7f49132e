"""End-to-end mode parity: JAX pipelines vs the cv2/numpy reference oracles.

This is the SURVEY.md §4(b) PSNR oracle: per-frame outputs of each magnification
mode must match the reference semantics well above the 40 dB bound on synthetic
clips with genuine motion + brightness pulsation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from live_video_magnification_tpu.models import color as color_mode
from live_video_magnification_tpu.models import motion as motion_mode
from live_video_magnification_tpu.models import riesz as riesz_mode
from live_video_magnification_tpu.models.params import motion_hz_to_blend
from live_video_magnification_tpu.ops.temporal import butterworth_bandpass_coeffs

from oracle import (
    ColorOracle,
    MotionOracle,
    RieszOracle,
    psnr_u8,
    synthetic_clip,
)


def chw(f):
    if f.ndim == 2:
        return f[None]
    return np.moveaxis(f, -1, 0)


def hwc(a):
    a = np.asarray(a)
    if a.shape[0] == 1:
        return a[0]
    return np.moveaxis(a, 0, -1)


FPS = 30.0


@pytest.mark.parametrize("color", [True, False])
def test_motion_matches_oracle(color):
    t, h, w, levels = 12, 48, 64, 3
    alpha, lam_c, chrom = 20.0, 500.0, 0.3
    co_low = motion_hz_to_blend(1.0, FPS)
    co_high = motion_hz_to_blend(4.0, FPS)
    frames = synthetic_clip(t, h, w, color=color, seed=1)

    oracle = MotionOracle()
    state = motion_mode.init_state(h, w, 3 if color else 1, levels)
    dyn = motion_mode.MotionDynParams(
        jnp.float32(alpha), jnp.float32(lam_c), jnp.float32(co_low),
        jnp.float32(co_high), jnp.float32(chrom),
    )
    for i, f in enumerate(frames):
        ref = oracle.step(f, alpha, lam_c, co_low, co_high, chrom, levels)
        state, out = motion_mode.step(state, jnp.asarray(chw(f)), dyn, levels=levels)
        p = psnr_u8(hwc(out), ref)
        assert p > 45.0, f"frame {i}: PSNR {p:.1f} dB"


@pytest.mark.parametrize("color", [True, False])
def test_color_matches_oracle(color):
    t, h, w, levels = 14, 48, 64, 3
    alpha, lo, hi = 100.0, 0.8, 1.6
    frames = synthetic_clip(t, h, w, color=color, seed=2)

    oracle = ColorOracle()
    state = color_mode.init_state(h, w, 3 if color else 1, levels, FPS)
    dyn = color_mode.ColorDynParams(jnp.float32(alpha), jnp.float32(lo), jnp.float32(hi))
    for i, f in enumerate(frames):
        ref = oracle.step(f, alpha, lo, hi, levels, FPS)
        state, out = color_mode.step(
            state, jnp.asarray(chw(f)), dyn, levels=levels, framerate=FPS
        )
        got = hwc(out)
        if i == 0:  # warmup: raw passthrough, bit-exact
            np.testing.assert_array_equal(got, f)
        p = psnr_u8(got, ref)
        assert p > 45.0, f"frame {i}: PSNR {p:.1f} dB"


def test_riesz_matches_oracle():
    t, h, w, levels = 10, 48, 64, 3
    alpha, wavelength = 30.0, 40.0  # threshold = wavelength*pi/100
    lo_hz, hi_hz = 0.5, 3.0
    frames = synthetic_clip(t, h, w, color=True, seed=3)

    oracle = RieszOracle()
    state = riesz_mode.init_state(h, w, levels)
    b_lo, a_lo = butterworth_bandpass_coeffs(lo_hz, FPS)
    b_hi, a_hi = butterworth_bandpass_coeffs(hi_hz, FPS)
    import math

    dyn = riesz_mode.RieszDynParams(
        jnp.float32(alpha),
        jnp.float32(wavelength * math.pi / 100.0),
        jnp.asarray(b_lo, jnp.float32),
        jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32),
        jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False),
        jnp.asarray(False),
    )
    for i, f in enumerate(frames):
        ref = oracle.step(f, alpha, wavelength, lo_hz, hi_hz, levels, FPS)
        state, out = riesz_mode.step(state, jnp.asarray(chw(f)), dyn, levels=levels)
        got = hwc(out)
        if i == 0:  # init frame: raw passthrough, bit-exact
            np.testing.assert_array_equal(got, f)
        p = psnr_u8(got, ref)
        assert p > 40.0, f"frame {i}: PSNR {p:.1f} dB"


def test_riesz_cutoff_change_resets_filters():
    """The cutoff-change protocol (MagnifyCore.hpp:243-254): filters reset, prior
    pyramid rebuilt from the current frame; outputs keep matching the oracle."""
    import math

    t, h, w, levels = 8, 32, 40, 2
    alpha, wavelength = 25.0, 50.0
    frames = synthetic_clip(t, h, w, color=True, seed=4)
    cutoffs = [(0.5, 3.0)] * 4 + [(1.0, 5.0)] * 4

    oracle = RieszOracle()
    state = riesz_mode.init_state(h, w, levels)
    prev = None
    for i, (f, (lo_hz, hi_hz)) in enumerate(zip(frames, cutoffs)):
        ref = oracle.step(f, alpha, wavelength, lo_hz, hi_hz, levels, FPS)
        b_lo, a_lo = butterworth_bandpass_coeffs(lo_hz, FPS)
        b_hi, a_hi = butterworth_bandpass_coeffs(hi_hz, FPS)
        changed = prev is not None and (lo_hz, hi_hz) != prev
        prev = (lo_hz, hi_hz)
        dyn = riesz_mode.RieszDynParams(
            jnp.float32(alpha),
            jnp.float32(wavelength * math.pi / 100.0),
            jnp.asarray(b_lo, jnp.float32),
            jnp.asarray(a_lo, jnp.float32),
            jnp.asarray(b_hi, jnp.float32),
            jnp.asarray(a_hi, jnp.float32),
            jnp.asarray(changed),
            jnp.asarray(False),
        )
        state, out = riesz_mode.step(state, jnp.asarray(chw(f)), dyn, levels=levels)
        p = psnr_u8(hwc(out), ref)
        if i > 0:
            assert p > 40.0, f"frame {i}: PSNR {p:.1f} dB"


def test_scan_equals_stepwise_motion():
    """process_clip (lax.scan batch path) must equal per-frame stepping."""
    t, h, w, levels = 6, 32, 32, 2
    frames = synthetic_clip(t, h, w, color=True, seed=5)
    arr = jnp.asarray(np.stack([chw(f) for f in frames]))
    dyn = motion_mode.MotionDynParams(
        jnp.float32(15.0), jnp.float32(300.0),
        jnp.float32(motion_hz_to_blend(1.0, FPS)), jnp.float32(motion_hz_to_blend(3.0, FPS)),
        jnp.float32(1.0),
    )
    _, scanned = motion_mode.process_clip(arr, dyn, levels=levels)
    state = motion_mode.init_state(h, w, 3, levels)
    for i in range(t):
        state, out = motion_mode.step(state, arr[i], dyn, levels=levels)
        np.testing.assert_array_equal(np.asarray(scanned[i]), np.asarray(out))


def test_parallel_clip_equals_sequential_motion():
    """Time-parallel associative-scan export == sequential scan (u8-exact)."""
    t, h, w, levels = 9, 32, 40, 2
    frames = synthetic_clip(t, h, w, color=True, seed=21)
    arr = jnp.asarray(np.stack([chw(f) for f in frames]))
    dyn = motion_mode.MotionDynParams(
        jnp.float32(18.0), jnp.float32(250.0),
        jnp.float32(motion_hz_to_blend(0.8, FPS)), jnp.float32(motion_hz_to_blend(3.5, FPS)),
        jnp.float32(0.4),
    )
    _, seq = motion_mode.process_clip(arr, dyn, levels=levels)
    _, par = motion_mode.process_clip_parallel(arr, dyn, levels=levels)
    d = np.abs(np.asarray(seq).astype(np.int16) - np.asarray(par).astype(np.int16))
    assert d.max() <= 1, f"max diff {d.max()} LSB"  # reassociated EMA rounding


def test_chain_static_key_tracks_every_kernel_variant_flag(monkeypatch):
    """Every kernel-variant env flag must key the chain jit cache with its
    FULL value (round-4 code review: LVMT_CONV9's key default disagreed with
    the kernel's 'auto' default, so unset->dense toggles would have served a
    stale trace — the bug class CLAUDE.md documents)."""
    from live_video_magnification_tpu.models.chain import MagnificationChain
    from live_video_magnification_tpu.models.params import (
        MagnificationMode,
        MagnificationParams,
        ProcessorConfig,
    )

    chain = MagnificationChain()
    cfg = ProcessorConfig(magnification=MagnificationParams(
        mode=MagnificationMode.PHASE, amplification=30.0, co_wavelength=40.0,
        co_low=0.5, co_high=3.0, levels=2, framerate=30.0))

    def key():
        return chain.static_key(cfg, 48, 64, 3)

    for var, kernel_default, others in [
        ("LVMT_TAIL", "jnp", ["pallas", "mxu", "level"]),
        ("LVMT_MXU_DTYPE", "f32", ["bf16", "hybrid", "hybrid-band"]),
        ("LVMT_CONV9", "auto", ["dense", "svd"]),
        ("LVMT_MXU_PRECISION", "highest", ["high", "default"]),
        ("LVMT_TAIL_IO", "f32", ["bf16"]),
        ("LVMT_TAIL_VERT", "mxu", ["vpu"]),
        ("LVMT_TAIL_DB", "auto", ["0", "1"]),
        ("LVMT_PYR_IO", "f32", ["bf16"]),
        ("LVMT_TAIL_TILE", "64", ["128", "auto"]),
        ("LVMT_FAST_GAMMA", "0", ["1"]),
    ]:
        monkeypatch.delenv(var, raising=False)
        unset_key = key()
        seen = {unset_key}
        for val in others:
            monkeypatch.setenv(var, val)
            k = key()
            assert k not in seen, f"{var}={val} collides with a cached key"
            seen.add(k)
        # the kernel-side default value must map to the SAME key as unset
        monkeypatch.setenv(var, kernel_default)
        assert key() == unset_key, (
            f"{var}={kernel_default} (the kernel default) must equal the "
            "unset key — otherwise the key default and the kernel default "
            "can disagree")
        monkeypatch.delenv(var)


def test_riesz_pyr_io_bf16_close_and_dtype_consistent(monkeypatch):
    """LVMT_PYR_IO=bf16 (round 5): pyramid band planes stored bfloat16,
    arithmetic still f32 (consumers cast on load). On the CPU jnp path this
    exercises the cast plumbing end-to-end: outputs stay close to the f32
    step, the carried prior pyramid is bf16 (residual f32), and a scanned
    clip carries the dtype consistently; clearing the flag restores f32."""
    import math

    import jax
    import numpy as np

    from oracle import synthetic_clip

    t, h, w, levels = 6, 48, 64, 3
    frames = synthetic_clip(t, h, w, color=True, seed=9)
    arr = jnp.asarray(np.stack([chw(f) for f in frames]))
    b_lo, a_lo = butterworth_bandpass_coeffs(0.5, FPS)
    b_hi, a_hi = butterworth_bandpass_coeffs(3.0, FPS)
    dyn = riesz_mode.RieszDynParams(
        jnp.float32(30.0), jnp.float32(40.0 * math.pi / 100.0),
        jnp.asarray(b_lo, jnp.float32), jnp.asarray(a_lo, jnp.float32),
        jnp.asarray(b_hi, jnp.float32), jnp.asarray(a_hi, jnp.float32),
        jnp.asarray(False), jnp.asarray(False),
    )

    monkeypatch.delenv("LVMT_PYR_IO", raising=False)
    _, ref = riesz_mode.process_clip(arr, dyn, levels=levels)

    monkeypatch.setenv("LVMT_PYR_IO", "bf16")
    st = riesz_mode.init_state(h, w, levels)
    for lvl in range(levels - 1):
        assert st.old[lvl].lowpass.dtype == jnp.bfloat16
    assert st.old[levels - 1].lowpass.dtype == jnp.float32  # residual octave
    st_out, got = riesz_mode.process_clip(arr, dyn, levels=levels, state=st)
    # carried dtype is preserved across the scan
    for lvl in range(levels - 1):
        assert st_out.old[lvl].lowpass.dtype == jnp.bfloat16
    assert st_out.acc[0].cos.dtype == jnp.float32  # filters stay f32
    d = np.abs(np.asarray(got).astype(np.int16) - np.asarray(ref).astype(np.int16))
    # storage-only quantization of the band planes: small u8 deltas
    assert d.max() <= 8, f"max diff {d.max()} u8"
    assert d.mean() < 0.5

    # the time-parallel path self-adapts to the carried dtype (its builder
    # stays f32; new_old casts back) — chunk interchange must not crash and
    # must keep the dtype
    st2 = riesz_mode.init_state(h, w, levels)
    st2, out_a = riesz_mode.process_clip_parallel(arr[:3], dyn, levels=levels,
                                                  state=st2)
    for lvl in range(levels - 1):
        assert st2.old[lvl].lowpass.dtype == jnp.bfloat16
    _st3, out_b = riesz_mode.process_clip(arr[3:], dyn, levels=levels,
                                          state=st2)
    assert out_a.shape[0] + out_b.shape[0] == t
