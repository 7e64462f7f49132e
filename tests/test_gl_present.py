"""The GL present path, EXECUTED headless (EGL surfaceless + llvmpipe).

Reference semantics under test (ui/DisplayWidget.cpp):
  - texture upload only when the mailbox seq advances; one seq check keeps
    both panes in lockstep (:216-236)
  - BGR bytes uploaded as RGB + .bgr shader swizzle; gray as GL_R8
    replicated (:39-52)
  - geometry change -> glTexImage2D re-alloc; same size -> glTexSubImage2D,
    row padding via GL_UNPACK_ROW_LENGTH (:133-158)
  - per-pane aspect-fit letterbox viewports, centered (:160-185)
  - the 4 view modes' pane placement (:187-210)
  - sequence gaps accounted as display skips (:229-234)
"""

import time

import numpy as np
import pytest

from live_video_magnification_tpu.engine.display import ViewMode
from live_video_magnification_tpu.engine.frame import Frame
from live_video_magnification_tpu.engine.gl_present import (
    GLDisplayLoop,
    GLPresenter,
    HeadlessGLContext,
    gl_available,
    letterbox,
    pane_layout,
)
from live_video_magnification_tpu.engine.instrumentation import Instrumentation
from live_video_magnification_tpu.engine.mailbox import DisplayFrame, LatestFrameMailbox

pytestmark = pytest.mark.skipif(
    not gl_available(), reason="no EGL surfaceless GL context in this image"
)

W, H = 128, 96


@pytest.fixture(scope="module")
def ctx():
    c = HeadlessGLContext(W, H)
    yield c
    c.destroy()


@pytest.fixture()
def presenter(ctx):
    ctx.make_current()
    p = GLPresenter()
    yield p
    p.destroy()


def bgr(b, g, r, h=48, w=64):
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = b, g, r
    return img


def pair(img, seq, orig=None):
    return DisplayFrame(Frame(seq=seq, data=img),
                        Frame(seq=seq, data=img if orig is None else orig))


# ---- pure-geometry units ----------------------------------------------


def test_pane_layout_matches_reference_modes():
    assert pane_layout(ViewMode.PROCESSED, 100, 80) == [(0, 0, 100, 80, False)]
    assert pane_layout(ViewMode.ORIGINAL, 100, 80) == [(0, 0, 100, 80, True)]
    assert pane_layout(ViewMode.SIDE_BY_SIDE, 101, 80) == [
        (0, 0, 50, 80, True), (50, 0, 51, 80, False)]
    assert pane_layout(ViewMode.TOP_BOTTOM, 100, 81) == [
        (0, 0, 100, 40, True), (0, 40, 100, 41, False)]


def test_letterbox_centers_and_fits():
    # wide frame in tall region: width-limited, vertically centered
    assert letterbox(200, 100, 0, 0, 100, 100) == (0, 25, 100, 50)
    # tall frame in wide region: height-limited, horizontally centered
    assert letterbox(100, 200, 0, 0, 100, 100) == (25, 0, 50, 100)
    assert letterbox(0, 10, 0, 0, 100, 100) is None
    assert letterbox(10, 10, 0, 0, 0, 100) is None


# ---- executed GL -------------------------------------------------------


def test_bgr_swizzle(ctx, presenter):
    presenter.paint(pair(bgr(255, 0, 0), seq=0), W, H)  # blue frame
    out = ctx.read_pixels()
    assert tuple(out[H // 2, W // 2]) == (0, 0, 255)  # display RGB blue


def test_gray_replicates_across_rgb(ctx, presenter):
    img = np.full((48, 64), 100, np.uint8)
    presenter.paint(pair(img, seq=0), W, H)
    out = ctx.read_pixels()
    assert tuple(out[H // 2, W // 2]) == (100, 100, 100)


def test_letterbox_bars_are_black(ctx, presenter):
    # 2:1 frame into the 4:3 framebuffer: bars top and bottom
    presenter.paint(pair(bgr(0, 0, 255, h=32, w=64), seq=0), W, H)
    out = ctx.read_pixels()
    assert tuple(out[H // 2, W // 2]) == (255, 0, 0)  # red content
    assert tuple(out[2, W // 2]) == (0, 0, 0)          # top bar
    assert tuple(out[H - 3, W // 2]) == (0, 0, 0)      # bottom bar
    assert tuple(out[H // 2, 2]) == (255, 0, 0)        # full width


def test_upload_only_on_new_seq(ctx, presenter):
    p0 = pair(bgr(10, 20, 30), seq=0)
    presenter.paint(p0, W, H)
    assert presenter.uploads == 1
    presenter.paint(p0, W, H)          # same seq: redraw, no upload
    presenter.paint(p0, W, H)
    assert presenter.uploads == 1
    presenter.paint(pair(bgr(1, 2, 3), seq=1), W, H)
    assert presenter.uploads == 2


def test_geometry_change_reallocates(ctx, presenter):
    presenter.paint(pair(bgr(1, 2, 3, h=48, w=64), seq=0), W, H)
    assert (presenter.uploads, presenter.reallocs) == (1, 1)
    presenter.paint(pair(bgr(1, 2, 3, h=48, w=64), seq=1), W, H)
    assert (presenter.uploads, presenter.reallocs) == (2, 1)  # sub-image
    presenter.paint(pair(bgr(1, 2, 3, h=24, w=32), seq=2), W, H)
    assert (presenter.uploads, presenter.reallocs) == (3, 2)  # re-alloc


def _painted_content_matches(ctx, presenter, view):
    """Paint a (48, 64, 3) BGR frame into the 128x96 fb (fills it exactly
    at 2x) and check several probe pixels carry the RIGHT row/col content —
    uniform-color checks cannot catch stride/row-shift upload bugs."""
    presenter.paint(pair(np.ascontiguousarray(view) * 0, seq=0), W, H)  # alloc
    presenter.paint(pair(view, seq=1), W, H)
    out = ctx.read_pixels()
    for fy, fx in [(5, 5), (5, 58), (42, 5), (42, 58), (24, 32)]:
        # nearest sample of the 2x-scaled texel; GL_LINEAR at texel centers
        got = out[fy * 2 + 1, fx * 2 + 1].astype(int)
        b, g, r = (int(v) for v in view[fy, fx])
        assert abs(got[0] - r) <= 2 and abs(got[1] - g) <= 2 \
            and abs(got[2] - b) <= 2, (fy, fx, got, (r, g, b))


def test_row_padded_frame_uploads_correctly(ctx, presenter):
    # a pooled-arena-style view with REAL per-pixel content: row stride
    # wider than width*channels. PyOpenGL densifies non-contiguous views,
    # so a stride-derived GL_UNPACK_ROW_LENGTH would shift every row
    # (regression: caught by the round-5 code review, rows read heap junk)
    backing = np.zeros((48, 80, 3), np.uint8)
    y = np.arange(48, dtype=np.uint8)[:, None] * 4
    x = np.arange(80, dtype=np.uint8)[None, :] * 3
    backing[:, :, 0] = y            # B encodes the row
    backing[:, :, 1] = x            # G encodes the column
    backing[:, :, 2] = 200
    _painted_content_matches(ctx, presenter, backing[:, :64])


def test_flipped_view_uploads_correctly(ctx, presenter):
    # negative-stride view (img[::-1]): must densify, not hand GL a
    # negative row length
    img = np.zeros((48, 64, 3), np.uint8)
    img[:, :, 0] = np.arange(48, dtype=np.uint8)[:, None] * 4
    img[:, :, 1] = np.arange(64, dtype=np.uint8)[None, :] * 3
    _painted_content_matches(ctx, presenter, img[::-1])


def test_side_by_side_panes(ctx):
    p = GLPresenter(view_mode=ViewMode.SIDE_BY_SIDE)
    try:
        proc = bgr(0, 0, 255, h=48, w=32)   # red (processed, right)
        orig = bgr(0, 255, 0, h=48, w=32)   # green (original, left)
        p.paint(pair(proc, seq=0, orig=orig), W, H)
        out = ctx.read_pixels()
        assert tuple(out[H // 2, W // 4]) == (0, 255, 0)
        assert tuple(out[H // 2, 3 * W // 4]) == (255, 0, 0)
        assert p.uploads == 2  # both panes from ONE seq check
    finally:
        p.destroy()


def test_top_bottom_panes(ctx):
    p = GLPresenter(view_mode=ViewMode.TOP_BOTTOM)
    try:
        proc = bgr(0, 0, 255, h=24, w=64)
        orig = bgr(255, 0, 0, h=24, w=64)
        p.paint(pair(proc, seq=0, orig=orig), W, H)
        out = ctx.read_pixels()
        assert tuple(out[H // 4, W // 2]) == (0, 0, 255)       # blue top
        assert tuple(out[3 * H // 4, W // 2]) == (255, 0, 0)   # red bottom
    finally:
        p.destroy()


def test_original_mode_uploads_only_original(ctx):
    p = GLPresenter(view_mode=ViewMode.ORIGINAL)
    try:
        p.paint(pair(bgr(0, 0, 255), seq=0, orig=bgr(255, 0, 0)), W, H)
        out = ctx.read_pixels()
        assert tuple(out[H // 2, W // 2]) == (0, 0, 255)  # the ORIGINAL blue
        assert p.uploads == 1  # needProc false in Original mode
    finally:
        p.destroy()


def test_seq_gap_counts_display_skips(ctx):
    instr = Instrumentation()
    p = GLPresenter(instr=instr)
    try:
        p.paint(pair(bgr(1, 1, 1), seq=0), W, H)
        p.paint(pair(bgr(2, 2, 2), seq=5), W, H)
        s = instr.snapshot()
        assert s.displayed == 2
        assert s.display_skipped == 4
    finally:
        p.destroy()


def test_empty_mailbox_paints_black(ctx, presenter):
    assert presenter.paint(None, W, H) is False
    out = ctx.read_pixels()
    assert out.max() == 0


def test_gl_loop_presents_live_engine_frames(ctx):
    """The full `lvmt live --gl` seam: PlaybackController (synthetic source,
    real processing chain) -> mailbox -> GLDisplayLoop on the headless
    context; displayed frames accumulate in the controller's shared
    Instrumentation (DisplayWidget.cpp:229-236 accounting)."""
    from live_video_magnification_tpu.engine.controller import PlaybackController
    from live_video_magnification_tpu.models.params import (
        MagnificationMode,
        MagnificationParams,
    )

    ctrl = PlaybackController()
    ctrl.set_magnification(MagnificationParams(
        mode=MagnificationMode.LAPLACE, amplification=10.0,
        co_low=0.3, co_high=0.6, levels=2, framerate=30.0))
    assert ctrl.open_synthetic(h=48, w=64, fps=30.0)
    ctx.release_current()
    loop = GLDisplayLoop(ctrl.mailbox, ctrl.instr, ctx, poll_hz=240.0)
    ctrl.play()
    loop.start()
    try:
        deadline = time.monotonic() + 60.0  # first jit compile dominates
        while (ctrl.stats().displayed < 3
               and time.monotonic() < deadline):
            time.sleep(0.1)
    finally:
        loop.stop()
        ctrl.close()
    assert ctrl.stats().displayed >= 3
    ctx.make_current()
    out = ctx.read_pixels()
    assert out.max() > 0  # the painted frame reached the framebuffer


def test_gl_display_loop_end_to_end(ctx):
    mailbox = LatestFrameMailbox()
    instr = Instrumentation()
    img = bgr(0, 128, 0)
    mailbox.publish(DisplayFrame(Frame(seq=0, data=img), Frame(seq=0, data=img)))
    ctx.release_current()  # the loop thread takes the context
    loop = GLDisplayLoop(mailbox, instr, ctx, poll_hz=240.0)
    loop.start()
    try:
        deadline = time.monotonic() + 5.0
        seq = 0
        while instr.snapshot().displayed < 3 and time.monotonic() < deadline:
            seq += 1
            mailbox.publish(
                DisplayFrame(Frame(seq=seq, data=img), Frame(seq=seq, data=img)))
            time.sleep(0.02)
    finally:
        loop.stop()
    assert instr.snapshot().displayed >= 3
    ctx.make_current()  # hand it back for the other tests
