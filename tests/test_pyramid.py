"""Golden tests: pyramid ops vs OpenCV (the reference's numeric substrate).

The reference builds pyramids with cv::pyrDown/pyrUp (SpatialFilter.cpp:13-61);
our ops must match OpenCV to float tolerance for the PSNR>=40dB parity bound.
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from live_video_magnification_tpu.ops.pyramid import (
    build_gauss_pyr,
    build_laplace_pyr,
    calculate_max_levels,
    collapse_laplace_pyr,
    pyr_down,
    pyr_up,
    reconstruct_from_gauss_level,
)
from live_video_magnification_tpu.ops.resize import (
    resize_area,
    resize_linear,
    resize_nearest_even_inject,
)

RNG = np.random.default_rng(1234)


def rand_img(h, w):
    return RNG.random((h, w)).astype(np.float32)


@pytest.mark.parametrize("h,w", [(64, 64), (63, 65), (31, 47), (480, 640), (17, 10)])
def test_pyr_down_matches_opencv(h, w):
    img = rand_img(h, w)
    ref = cv2.pyrDown(img)
    got = np.asarray(pyr_down(jnp.asarray(img)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


@pytest.mark.parametrize("h,w", [(32, 32), (31, 33), (17, 23), (240, 320)])
def test_pyr_up_even_matches_opencv(h, w):
    img = rand_img(h, w)
    ref = cv2.pyrUp(img)
    got = np.asarray(pyr_up(jnp.asarray(img)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


@pytest.mark.parametrize("h,w", [(33, 47), (63, 65), (101, 99)])
def test_pyr_up_odd_dst_matches_opencv(h, w):
    """pyrUp(pyrDown(x), x.size()) with odd sizes — the Laplacian build path."""
    img = rand_img(h, w)
    down = cv2.pyrDown(img)
    ref = cv2.pyrUp(down, dstsize=(w, h))
    got = np.asarray(pyr_up(jnp.asarray(down), (h, w)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def _cv_laplace_pyr(img, levels):
    pyr = []
    cur = img
    for _ in range(levels):
        down = cv2.pyrDown(cur)
        up = cv2.pyrUp(down, dstsize=(cur.shape[1], cur.shape[0]))
        pyr.append(cur - up)
        cur = down
    pyr.append(cur)
    return pyr


@pytest.mark.parametrize("h,w,levels", [(64, 64, 3), (123, 77, 4), (480, 640, 5)])
def test_laplace_build_and_collapse(h, w, levels):
    img = rand_img(h, w)
    ref_pyr = _cv_laplace_pyr(img, levels)
    got_pyr = build_laplace_pyr(jnp.asarray(img), levels)
    assert len(got_pyr) == levels + 1
    for r, g in zip(ref_pyr, got_pyr):
        np.testing.assert_allclose(np.asarray(g), r, rtol=0, atol=5e-6)
    # collapse: reference buildImgFromLaplacePyr
    cur = ref_pyr[levels]
    for lvl in range(levels - 1, -1, -1):
        cur = cv2.pyrUp(cur, dstsize=(ref_pyr[lvl].shape[1], ref_pyr[lvl].shape[0])) + ref_pyr[lvl]
    got = np.asarray(collapse_laplace_pyr(got_pyr))
    np.testing.assert_allclose(got, cur, rtol=0, atol=2e-5)
    # round-trip sanity: collapse(build(x)) == x
    np.testing.assert_allclose(got, img, rtol=0, atol=2e-5)


@pytest.mark.parametrize("h,w,levels", [(64, 64, 3), (123, 77, 3), (480, 640, 4)])
def test_gauss_pyr_and_reconstruct(h, w, levels):
    img = rand_img(h, w)
    cur = img
    ref_pyr = []
    for _ in range(levels):
        cur = cv2.pyrDown(cur)
        ref_pyr.append(cur)
    got_pyr = build_gauss_pyr(jnp.asarray(img), levels)
    for r, g in zip(ref_pyr, got_pyr):
        np.testing.assert_allclose(np.asarray(g), r, rtol=0, atol=5e-6)
    # reconstruction: pyrUp x levels then INTER_LINEAR resize (SpatialFilter.cpp:40-50)
    cur = ref_pyr[-1]
    for _ in range(levels):
        cur = cv2.pyrUp(cur)
    ref = cv2.resize(cur, (w, h))
    got = np.asarray(reconstruct_from_gauss_level(got_pyr[-1], levels, (h, w)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_calculate_max_levels():
    # SpatialFilter.cpp:5-11 — halve (ceil) while both dims > 5
    def ref(h, w):
        if w > 5 and h > 5:
            return 1 + ref((1 + h) // 2, (1 + w) // 2)
        return 0

    for h, w in [(480, 640), (6, 6), (5, 100), (7, 7), (1080, 1920), (11, 9)]:
        assert calculate_max_levels((h, w)) == ref(h, w)


@pytest.mark.parametrize("h,w,oh,ow", [(64, 64, 32, 32), (100, 100, 33, 33), (480, 640, 60, 80)])
def test_resize_area_matches_opencv(h, w, oh, ow):
    img = rand_img(h, w)
    ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_AREA)
    got = np.asarray(resize_area(jnp.asarray(img), (oh, ow)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


@pytest.mark.parametrize("h,w,oh,ow", [(64, 64, 67, 61), (128, 128, 123, 77), (33, 47, 64, 64)])
def test_resize_linear_matches_opencv(h, w, oh, ow):
    img = rand_img(h, w)
    ref = cv2.resize(img, (ow, oh))  # default INTER_LINEAR
    got = np.asarray(resize_linear(jnp.asarray(img), (oh, ow)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


@pytest.mark.parametrize("h,w", [(32, 32), (33, 47), (17, 23)])
def test_nearest_inject_matches_opencv(h, w):
    """INTER_NEAREST upsample + injectZerosEven (RieszPyramid.cpp:254-317)."""
    small = rand_img((h + 1) // 2, (w + 1) // 2)
    up = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    ref = np.zeros_like(up)
    ref[::2, ::2] = up[::2, ::2]
    got = np.asarray(resize_nearest_even_inject(jnp.asarray(small), (h, w)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_conv_impls_agree():
    """The lax.conv path (TPU) must match the shifted-adds path (CPU golden)."""
    from live_video_magnification_tpu.ops import conv as convmod
    from live_video_magnification_tpu.ops.kernels import RIESZ_HIGHPASS_9x9

    img = rand_img(47, 61)
    a = np.asarray(convmod._correlate2d_slices(jnp.asarray(img), RIESZ_HIGHPASS_9x9.astype(np.float64)))
    b = np.asarray(convmod._correlate2d_conv(jnp.asarray(img), RIESZ_HIGHPASS_9x9.astype(np.float64)))
    np.testing.assert_allclose(a, b, atol=2e-6)
