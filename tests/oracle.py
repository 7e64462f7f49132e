"""Reference oracles: per-frame numpy/cv2 reimplementation of MagnifyCore.

These reproduce the reference's per-frame algorithms (MagnifyCore.hpp:83-279)
with OpenCV calls, serving as the ground truth the JAX pipelines are compared
against (SURVEY.md §4's PSNR oracle without building the Qt app). Frames are
HWC uint8 BGR, like the reference's cv::Mat.

Known reference quirk reproduced *by intent, not by crash*: magnifyColor calls
cv::minMaxLoc on a multi-channel Mat (MagnifyCore.hpp:200), which throws in
OpenCV and degrades to passthrough upstream; the oracle (like the framework)
computes the evident intent — the global min/max over all channels.
"""

from __future__ import annotations

import math

import cv2
import numpy as np
import scipy.signal


def _to_u8(x, alpha, beta):
    return np.clip(np.rint(x.astype(np.float64) * alpha + beta), 0, 255).astype(np.uint8)


def calculate_max_levels(h, w):
    if w > 5 and h > 5:
        return 1 + calculate_max_levels((1 + h) // 2, (1 + w) // 2)
    return 0


# --- motion (laplaceMagnify) --------------------------------------------------------------------

class MotionOracle:
    def __init__(self):
        self.lowpass_hi = None
        self.lowpass_lo = None

    def step(self, in8u, amplification, co_wavelength, co_low, co_high, chrom, levels):
        color = in8u.ndim == 3 and in8u.shape[2] >= 3
        if color:
            inp = cv2.cvtColor((in8u / 255.0).astype(np.float32), cv2.COLOR_BGR2Lab)
        else:
            inp = (in8u / 255.0).astype(np.float32)

        pyr = []
        cur = inp
        for _ in range(levels):
            down = cv2.pyrDown(cur)
            up = cv2.pyrUp(down, dstsize=(cur.shape[1], cur.shape[0]))
            pyr.append(cur - up)
            cur = down
        pyr.append(cur)

        if self.lowpass_hi is None:
            self.lowpass_hi = [p.copy() for p in pyr]
            self.lowpass_lo = [p.copy() for p in pyr]
            output = inp
        else:
            clo = 0.01 if co_low == 0 else co_low
            motion = [None] * (levels + 1)
            for lvl in range(levels):
                self.lowpass_hi[lvl] = (1 - co_high) * self.lowpass_hi[lvl] + co_high * pyr[lvl]
                self.lowpass_lo[lvl] = (1 - clo) * self.lowpass_lo[lvl] + clo * pyr[lvl]
                motion[lvl] = self.lowpass_hi[lvl] - self.lowpass_lo[lvl]
            motion[levels] = pyr[levels]

            h, w = inp.shape[:2]
            delta = co_wavelength / (8.0 * (1.0 + amplification))
            lam = math.sqrt(w * w + h * h) / 3.0
            for lvl in range(levels, -1, -1):
                curr_alpha = (lam / (delta * 8.0) - 1.0) * 2.0
                if lvl == levels or lvl == 0:
                    motion[lvl] = motion[lvl] * 0
                else:
                    motion[lvl] = motion[lvl] * min(amplification, curr_alpha)
                lam /= 2.0

            cur = motion[levels]
            for lvl in range(levels - 1, -1, -1):
                cur = cv2.pyrUp(cur, dstsize=(motion[lvl].shape[1], motion[lvl].shape[0])) + motion[lvl]
            motion_img = cur
            if color:
                motion_img = motion_img.copy()
                motion_img[..., 1] *= chrom
                motion_img[..., 2] *= chrom
            output = inp + motion_img

        if color:
            out = cv2.cvtColor(output, cv2.COLOR_Lab2BGR)
        else:
            out = output
        return _to_u8(out, 255.0, 1.0 / 255.0)


# --- color (colorMagnify) -----------------------------------------------------------------------

def _ideal_filter(window, lo, hi, fps):
    """idealFilter on an (N, T) or (N, T, C) window; returns same shape."""
    if lo == 0.0:
        lo += 0.01
    chans = [window] if window.ndim == 2 else [window[..., c] for c in range(window.shape[2])]
    outs = []
    for cur in chans:
        h = cv2.getOptimalDFTSize(cur.shape[0])
        tmp = cv2.copyMakeBorder(cur, 0, h - cur.shape[0], 0, 0, cv2.BORDER_CONSTANT, value=0)
        tmp = cv2.dft(tmp, flags=cv2.DFT_ROWS | cv2.DFT_SCALE)
        w = tmp.shape[1]
        fl = 2 * lo * w / fps
        fh = 2 * hi * w / fps
        x = np.arange(w, dtype=np.float64)
        mask = np.tile(((x >= fl) & (x <= fh)).astype(np.float32), (tmp.shape[0], 1))
        tmp = cv2.mulSpectrums(tmp, mask, flags=cv2.DFT_ROWS)
        tmp = cv2.idft(tmp, flags=cv2.DFT_ROWS | cv2.DFT_SCALE)
        outs.append(tmp[: cur.shape[0], :])
    dst = outs[0] if window.ndim == 2 else np.stack(outs, axis=-1)
    mn, mx = float(dst.min()), float(dst.max())
    # cv::normalize NORM_MINMAX guard: constant input -> scale 0, shift dmin=0
    # (empty bandpass mask case; verified vs the compiled reference core).
    if mx - mn <= np.finfo(np.float64).eps:
        return np.zeros_like(dst)
    return (dst - mn) / (mx - mn)


def optimal_buffer_size(fps):
    n = max(2 * int(fps), 16)
    return 1 << max(0, math.ceil(math.log2(n)))


class ColorOracle:
    def __init__(self):
        self.window = None

    def step(self, in8u, amplification, lo, hi, levels, fps):
        inp = in8u.astype(np.float32)
        pyr = []
        cur = inp
        for _ in range(levels):
            cur = cv2.pyrDown(cur)
            pyr.append(cur)
        small = pyr[levels - 1]

        col = small.reshape(-1, 1) if small.ndim == 2 else small.reshape(-1, 1, small.shape[2])
        if self.window is None:
            self.window = col.copy()
        else:
            self.window = np.concatenate([self.window, col], axis=1)
        max_images = optimal_buffer_size(fps)
        if self.window.shape[1] > max_images:
            self.window = self.window[:, 1:].copy()

        if self.window.shape[1] < 2:
            return in8u.copy()

        filtered = _ideal_filter(self.window, lo, hi, fps) * amplification
        idx = min(1, filtered.shape[1] - 1)
        small_f = filtered[:, idx].reshape(small.shape)

        cur = small_f
        for _ in range(levels):
            cur = cv2.pyrUp(cur)
        color_img = cv2.resize(cur, (inp.shape[1], inp.shape[0]))

        output = inp + color_img
        mn, mx = output.min(), output.max()
        return _to_u8(output, 255.0 / (mx - mn), -mn * 255.0 / (mx - mn))


# --- phase (rieszMagnify) -----------------------------------------------------------------------

_LP9 = np.array(
    [
        [-0.0001, -0.0007, -0.0023, -0.0046, -0.0057, -0.0046, -0.0023, -0.0007, -0.0001],
        [-0.0007, -0.0030, -0.0047, -0.0025, -0.0003, -0.0025, -0.0047, -0.0030, -0.0007],
        [-0.0023, -0.0047, 0.0054, 0.0272, 0.0387, 0.0272, 0.0054, -0.0047, -0.0023],
        [-0.0046, -0.0025, 0.0272, 0.0706, 0.0910, 0.0706, 0.0272, -0.0025, -0.0046],
        [-0.0057, -0.0003, 0.0387, 0.0910, 0.1138, 0.0910, 0.0387, -0.0003, -0.0057],
        [-0.0046, -0.0025, 0.0272, 0.0706, 0.0910, 0.0706, 0.0272, -0.0025, -0.0046],
        [-0.0023, -0.0047, 0.0054, 0.0272, 0.0387, 0.0272, 0.0054, -0.0047, -0.0023],
        [-0.0007, -0.0030, -0.0047, -0.0025, -0.0003, -0.0025, -0.0047, -0.0030, -0.0007],
        [-0.0001, -0.0007, -0.0023, -0.0046, -0.0057, -0.0046, -0.0023, -0.0007, -0.0001],
    ],
    np.float32,
)
_HP9 = np.array(
    [
        [0.0000, 0.0003, 0.0011, 0.0022, 0.0027, 0.0022, 0.0011, 0.0003, 0.0000],
        [0.0003, 0.0020, 0.0059, 0.0103, 0.0123, 0.0103, 0.0059, 0.0020, 0.0003],
        [0.0011, 0.0059, 0.0151, 0.0249, 0.0292, 0.0249, 0.0151, 0.0059, 0.0011],
        [0.0022, 0.0103, 0.0249, 0.0402, 0.0469, 0.0402, 0.0249, 0.0103, 0.0022],
        [0.0027, 0.0123, 0.0292, 0.0469, -0.9455, 0.0469, 0.0292, 0.0123, 0.0027],
        [0.0022, 0.0103, 0.0249, 0.0402, 0.0469, 0.0402, 0.0249, 0.0103, 0.0022],
        [0.0011, 0.0059, 0.0151, 0.0249, 0.0292, 0.0249, 0.0151, 0.0059, 0.0011],
        [0.0003, 0.0020, 0.0059, 0.0103, 0.0123, 0.0103, 0.0059, 0.0020, 0.0003],
        [0.0000, 0.0003, 0.0011, 0.0022, 0.0027, 0.0022, 0.0011, 0.0003, 0.0000],
    ],
    np.float32,
)
_BAND = np.array([[-0.2, -0.48, 0.0, 0.48, 0.2]], np.float32)


def _f2d(img, kernel):
    return cv2.filter2D(img, cv2.CV_32F, kernel, anchor=(-1, -1), delta=0,
                        borderType=cv2.BORDER_REFLECT_101)


def _subsample(img):
    return img[::2, ::2].copy()


def _inject_even(img):
    out = np.zeros_like(img)
    out[::2, ::2] = img[::2, ::2]
    return out


def _arccos_clamped(x):
    out = np.empty_like(x)
    lo_mask = x < -1.0
    hi_mask = x > 1.0
    mid = ~(lo_mask | hi_mask)
    out[lo_mask] = -1.0
    out[hi_mask] = 1.0
    out[mid] = np.arccos(x[mid])
    return out


class RieszOracle:
    """Literal per-frame reimplementation of rieszMagnify + RieszPyramid."""

    def __init__(self):
        self.state = None  # dict with cur/old pyramids + filter state

    @staticmethod
    def _build_pyramid(frame, levels):
        pyr = []
        octave = frame
        for i in range(levels - 1):
            hp = _f2d(octave, _HP9)
            pyr.append({"lp": hp, "r": _f2d(hp, _BAND), "i": _f2d(hp, _BAND.T)})
            lp = _f2d(octave, 2.0 * _LP9)
            octave = _subsample(lp)
        pyr.append({"lp": octave, "r": _f2d(octave, _BAND), "i": _f2d(octave, _BAND.T)})
        return pyr

    def step(self, in8u, amplification, co_wavelength, co_low, co_high, levels, fps):
        if in8u.ndim != 3 or in8u.shape[2] < 3:
            return in8u.copy()
        lab = cv2.cvtColor((in8u / 255.0).astype(np.float32), cv2.COLOR_BGR2Lab)
        luma = lab[..., 0]

        blo, alo = scipy.signal.butter(2, co_low / (fps / 2.0)) if fps else (np.full(3, np.nan),) * 2
        bhi, ahi = scipy.signal.butter(2, co_high / (fps / 2.0)) if fps else (np.full(3, np.nan),) * 2

        st = self.state
        if st is None or np.isnan(alo[0]) or np.isnan(ahi[0]):
            cur = self._build_pyramid(luma, levels)
            nlv = levels - 1
            zeros = lambda lvl: {
                "phase_c": np.zeros_like(cur[lvl]["lp"]),
                "phase_s": np.zeros_like(cur[lvl]["lp"]),
                "r0_c": np.zeros_like(cur[lvl]["lp"]),
                "r0_s": np.zeros_like(cur[lvl]["lp"]),
                "r1_c": np.zeros_like(cur[lvl]["lp"]),
                "r1_s": np.zeros_like(cur[lvl]["lp"]),
            }
            self.state = {
                "old": cur,
                "lo": [zeros(l) for l in range(nlv)],
                "hi": [zeros(l) for l in range(nlv)],
                "cutoffs": (co_low, co_high),
            }
            return in8u.copy()

        if (co_low, co_high) != st["cutoffs"]:
            for f in st["lo"] + st["hi"]:
                for k in f:
                    f[k][:] = 0.0
            st["old"] = self._build_pyramid(luma, levels)
            st["cutoffs"] = (co_low, co_high)

        cur = self._build_pyramid(luma, levels)
        lowpasses = []
        threshold = co_wavelength * math.pi / 100.0
        for lvl in range(levels - 1):
            c, o = cur[lvl], st["old"][lvl]
            q_real = c["lp"] * o["lp"] + c["r"] * o["r"] + c["i"] * o["i"]
            qx = o["r"] * (-c["lp"]) + c["r"] * o["lp"]
            qy = o["i"] * (-c["lp"]) + c["i"] * o["lp"]
            xy_sq = qx * qx + qy * qy
            q_amp = np.sqrt(q_real * q_real + xy_sq)
            with np.errstate(all="ignore"):
                phi = _arccos_clamped(q_real / q_amp)
                xyn = np.sqrt(xy_sq)
                pd_c = np.nan_to_num(qx / xyn * phi, nan=0.0, posinf=np.inf, neginf=-np.inf)
                pd_s = np.nan_to_num(qy / xyn * phi, nan=0.0, posinf=np.inf, neginf=-np.inf)
            amplitude = np.sqrt(q_amp)
            amp_blur = cv2.GaussianBlur(amplitude, (13, 13), 3.0,
                                        borderType=cv2.BORDER_REFLECT_101)

            def df2(f, b, a):
                f["phase_c"] += pd_c
                f["phase_s"] += pd_s
                res_c = f["phase_c"] * b[0] + f["r0_c"]
                res_s = f["phase_s"] * b[0] + f["r0_s"]
                f["r0_c"] = f["phase_c"] * b[1] + f["r1_c"] - res_c * a[1]
                f["r0_s"] = f["phase_s"] * b[1] + f["r1_s"] - res_s * a[1]
                f["r1_c"] = f["phase_c"] * b[2] - res_c * a[2]
                f["r1_s"] = f["phase_s"] * b[2] - res_s * a[2]
                return res_c, res_s

            lo_c, lo_s = df2(st["lo"][lvl], blo, alo)
            hi_c, hi_s = df2(st["hi"][lvl], bhi, ahi)

            # normalize + amplify (RieszPyramid.cpp:114-144)
            kernel = cv2.getGaussianKernel(13, 3.0, cv2.CV_32F)
            ch_c = (hi_c - lo_c) * amplitude
            ch_s = (hi_s - lo_s) * amplitude
            ch_c = cv2.sepFilter2D(ch_c, -1, kernel, kernel, borderType=cv2.BORDER_REFLECT_101)
            ch_s = cv2.sepFilter2D(ch_s, -1, kernel, kernel, borderType=cv2.BORDER_REFLECT_101)
            with np.errstate(all="ignore"):
                t_c = ch_c / amp_blur
                t_s = ch_s / amp_blur
                mag = np.sqrt(t_c * t_c + t_s * t_s)
                mag2 = np.minimum(mag * amplification, threshold)
                pair = c["r"] * t_c + c["i"] * t_s
                pair = np.nan_to_num(pair / mag, nan=0.0, posinf=np.inf, neginf=-np.inf)
            lowpasses.append(c["lp"] * np.cos(mag2) - pair * np.sin(mag2))

        lowpasses.append(cur[levels - 1]["lp"])
        st["old"] = cur

        result = lowpasses[-1]
        for lvl in range(levels - 2, -1, -1):
            octave = lowpasses[lvl]
            up = cv2.resize(result, (octave.shape[1], octave.shape[0]),
                            interpolation=cv2.INTER_NEAREST)
            lp = _f2d(_inject_even(up), 2.0 * _LP9)
            hp = _f2d(octave, _HP9)
            result = lp + hp

        out = lab.copy()
        out[..., 0] = result
        out = cv2.cvtColor(out, cv2.COLOR_Lab2BGR)
        return _to_u8(out, 255.0, 1.0 / 255.0)


def psnr_u8(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * math.log10(255.0**2 / mse)


def realistic_clip(t, h, w, fps=30.0, seed=0):
    """Higher-fidelity synthetic footage for full-chain PSNR tests: multi-scale
    texture with SUBPIXEL global motion at two frequencies, a locally pulsing
    region (the "pulse under skin" use case), and a weak global brightness
    oscillation — the signal classes all three magnification modes target."""
    rng = np.random.default_rng(seed)
    coarse = cv2.GaussianBlur(rng.random((h * 2, w * 2, 3)).astype(np.float32), (0, 0), 8.0)
    fine = cv2.GaussianBlur(rng.random((h * 2, w * 2, 3)).astype(np.float32), (0, 0), 1.5)
    yy, xx = np.mgrid[0 : h * 2, 0 : w * 2].astype(np.float32)
    grad = (0.15 * xx / (w * 2) + 0.1 * yy / (h * 2))[..., None]
    base = 0.25 + 0.45 * (0.6 * coarse + 0.4 * fine) + grad
    # locally pulsing blob (radius ~ h/6) near the center
    cy, cx = h, w
    blob = np.exp(-(((yy - cy) / (h / 3.0)) ** 2 + ((xx - cx) / (w / 3.0)) ** 2))[..., None]
    frames = []
    for i in range(t):
        ph = 2 * math.pi * i / fps
        dx = 0.8 * math.sin(1.3 * ph) + 0.4 * math.sin(2.7 * ph)   # subpixel
        dy = 0.6 * math.cos(1.3 * ph) + 0.3 * math.sin(3.1 * ph)
        m = np.float32([[1, 0, dx], [0, 1, dy]])
        shifted = cv2.warpAffine(base, m, (w * 2, h * 2), flags=cv2.INTER_LINEAR)
        pulse_local = 1.0 + 0.015 * math.sin(1.0 * ph) * blob      # ~1.0/2pi-scaled Hz
        pulse_global = 1.0 + 0.008 * math.sin(1.2 * ph)
        img = shifted * pulse_local * pulse_global
        crop = img[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
        frames.append(np.clip(crop * 255.0, 0, 255).astype(np.uint8))
    return frames


class ChainOracle:
    """The FULL reference chain (ChainBuilder.cpp:11-29): PreprocessProcessor
    (normalized ROI crop, clamped, >=1px + INTER_AREA downscale,
    PreprocessProcessor.cpp:10-51) -> GrayscaleProcessor -> mode oracle, with
    the level clamp of MagnificationProcessor.cpp:31-34."""

    def __init__(self, mode, **params):
        self.mode = mode
        self.params = params
        self._inner = {"laplace": MotionOracle, "color": ColorOracle,
                       "phase": RieszOracle}[mode]()

    def preprocess(self, frame, roi=None, downscale=1):
        h, w = frame.shape[:2]
        x, y, cw, ch = 0, 0, w, h
        if roi is not None:
            rx, ry, rw, rh = roi
            x = min(max(int(round(rx * w)), 0), w - 1)
            y = min(max(int(round(ry * h)), 0), h - 1)
            cw = min(max(int(round(rw * w)), 1), w - x)
            ch = min(max(int(round(rh * h)), 1), h - y)
        out = frame[y : y + ch, x : x + cw]
        d = min(max(downscale, 1), 8)
        if d > 1:
            out = cv2.resize(out, (max(1, cw // d), max(1, ch // d)),
                             interpolation=cv2.INTER_AREA)
        return out

    def step(self, frame, roi=None, downscale=1, grayscale=False):
        pre = self.preprocess(frame, roi, downscale)
        magin = cv2.cvtColor(pre, cv2.COLOR_BGR2GRAY) if grayscale else pre
        p = dict(self.params)
        oh, ow = magin.shape[:2]
        p["levels"] = min(max(p["levels"], 1), max(calculate_max_levels(oh, ow), 1))
        if self.mode == "laplace":
            out = self._inner.step(magin, p["amplification"], p["co_wavelength"],
                                   p["co_low"], p["co_high"], p["chrom"], p["levels"])
        elif self.mode == "color":
            out = self._inner.step(magin, p["amplification"], p["lo"], p["hi"],
                                   p["levels"], p["fps"])
        else:
            out = self._inner.step(magin, p["amplification"], p["co_wavelength"],
                                   p["lo"], p["hi"], p["levels"], p["fps"])
        return out, pre


def synthetic_clip(t, h, w, color=True, seed=0):
    """Translating texture + pulsing brightness: exercises motion AND color bands."""
    rng = np.random.default_rng(seed)
    base = rng.random((h * 2, w * 2, 3 if color else 1)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 3.0).reshape(h * 2, w * 2, -1)
    frames = []
    for i in range(t):
        dx = 1.5 * math.sin(2 * math.pi * 1.0 * i / 30.0)  # ~1 Hz wobble at 30 fps
        dy = 1.0 * math.cos(2 * math.pi * 1.0 * i / 30.0)
        m = np.float32([[1, 0, dx], [0, 1, dy]])
        shifted = cv2.warpAffine(base, m, (w * 2, h * 2))[h // 2 : h // 2 + h,
                                                          w // 2 : w // 2 + w]
        pulse = 1.0 + 0.02 * math.sin(2 * math.pi * 1.1 * i / 30.0)  # ~1.1 Hz
        f = np.clip(shifted.reshape(h, w, -1) * pulse * 255.0, 0, 255).astype(np.uint8)
        frames.append(f if color else f[..., 0])
    return frames
