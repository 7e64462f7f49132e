"""CLI end-to-end on tiny clips (the front-end surface, in-process)."""

import math
import os

import numpy as np
import pytest

from live_video_magnification_tpu import cli


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("clips")
    path = str(d / "in.avi")
    rng = np.random.default_rng(5)
    base = cv2.GaussianBlur(rng.random((96, 112, 3)).astype(np.float32), (0, 0), 3.0)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (80, 64))
    for i in range(14):
        m = np.float32([[1, 0, 1.5 * math.sin(2 * math.pi * i / 30)],
                        [0, 1, math.cos(2 * math.pi * i / 30)]])
        s = cv2.warpAffine(base, m, (112, 96))[16:80, 16:96]
        w.write(np.clip(s * 255, 0, 255).astype(np.uint8))
    w.release()
    return path


def _read(path):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames) if frames else np.empty((0,))


def test_info(clip_path, capsys):
    assert cli.main(["info", clip_path]) == 0
    out = capsys.readouterr().out
    assert "frames=14" in out and "size=80x64" in out


def test_magnify_streaming_export(clip_path, tmp_path):
    out = str(tmp_path / "out.avi")
    rc = cli.main(["magnify", clip_path, out, "--mode", "laplace", "--chunk", "5"])
    assert rc == 0
    frames = _read(out)
    assert frames.shape == (14, 64, 80, 3)


def test_magnify_range_and_time_parallel_match(clip_path, tmp_path):
    a = str(tmp_path / "a.avi")
    b = str(tmp_path / "b.avi")
    args = ["magnify", clip_path, "--mode", "laplace", "--start", "2", "--end", "12",
            "--chunk", "4"]
    assert cli.main([args[0], args[1], a] + args[2:]) == 0
    assert cli.main([args[0], args[1], b] + args[2:] + ["--time-parallel"]) == 0
    fa, fb = _read(a), _read(b)
    assert fa.shape[0] == 10
    d = np.abs(fa.astype(np.int16) - fb.astype(np.int16)).max()
    assert d <= 1  # MJPG is deterministic; <=1 LSB pre-encode difference


def test_magnify_checkpoint_stale_config_clean_error(clip_path, tmp_path, capsys):
    out = str(tmp_path / "o.avi")
    ck = str(tmp_path / "ck")
    assert cli.main(["magnify", clip_path, out, "--mode", "laplace",
                     "--chunk", "6", "--checkpoint", ck,
                     "--checkpoint-every", "6"]) == 0
    assert os.path.exists(ck + ".npz")
    # resuming a complete export is a no-op success
    out2 = str(tmp_path / "o2.avi")
    assert cli.main(["magnify", clip_path, out2, "--mode", "laplace",
                     "--chunk", "6", "--checkpoint", ck]) == 0
    # different config -> clean error, not a traceback
    rc = cli.main(["magnify", clip_path, str(tmp_path / "o3.avi"), "--mode",
                   "phase", "--checkpoint", ck])
    assert rc == 1
    assert "different configuration" in capsys.readouterr().err


def test_record_synthetic_end_to_end(tmp_path):
    out = str(tmp_path / "rec.avi")
    rc = cli.main(["record", out, "--duration", "1.0", "--size", "48", "64",
                   "--mode", "laplace", "--format", "avi"])
    assert rc == 0
    frames = _read(out)
    assert frames.shape[0] >= 10


def test_live_synthetic_runs(capsys):
    assert cli.main(["live", "--size", "48", "64", "--duration", "1.0",
                     "--mode", "laplace"]) == 0


def test_magnify_resume_writes_part_file_not_truncating(clip_path, tmp_path):
    """A resumed run must NOT truncate the partial output of the interrupted
    run (cv2.VideoWriter reopening would); it writes a .fromN part file."""
    out = str(tmp_path / "out.avi")
    ck = str(tmp_path / "ck")
    # "interrupted" run: first 8 frames, checkpointed
    assert cli.main(["magnify", clip_path, out, "--mode", "laplace",
                     "--chunk", "4", "--end", "8", "--checkpoint", ck,
                     "--checkpoint-every", "4"]) == 0
    assert _read(out).shape[0] == 8
    # resumed run over the full range: continues at 8 into a part file
    assert cli.main(["magnify", clip_path, out, "--mode", "laplace",
                     "--chunk", "4", "--checkpoint", ck]) == 0
    assert _read(out).shape[0] == 8  # untouched
    part = str(tmp_path / "out.from8.avi")
    assert _read(part).shape[0] == 6  # frames 8..13


def test_magnify_split_composition(clip_path, tmp_path):
    out = str(tmp_path / "split.avi")
    assert cli.main(["magnify", clip_path, out, "--mode", "laplace",
                     "--chunk", "5", "--split", "left-right", "--labels"]) == 0
    frames = _read(out)
    assert frames.shape[1:] == (64, 160, 3)  # width doubled by the panes
