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


def _write(path, frames_thwc, fps=20.0):
    import cv2

    h, w = frames_thwc.shape[1], frames_thwc.shape[2]
    wtr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    for f in frames_thwc:
        wtr.write(np.ascontiguousarray(f))
    wtr.release()


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


def test_live_gl_degrades_without_display(capsys, monkeypatch):
    """`lvmt live --gl` with no usable GL window (this image has no X
    server, so glfw.init fails) must fall back to stats-only and still
    exit 0 (engine/gl_present.py wiring, DisplayWidget present path)."""
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)  # glfw can be
    monkeypatch.delenv("XDG_SESSION_TYPE", raising=False)  # Wayland-built
    assert cli.main(["live", "--size", "48", "64", "--duration", "1.0",
                     "--mode", "laplace", "--gl", "--view", "side-by-side"]) == 0
    assert "--gl unavailable" in capsys.readouterr().err


def test_live_gl_success_path_presents_headless(monkeypatch):
    """`lvmt live --gl`'s SUCCESS branch — the main-thread paint/swap/stat
    loop in cmd_live (DisplayWidget present semantics) — executed headless by
    standing the EGL surfaceless context in for the glfw window. Asserts the
    engine's frames actually reach the GL textures (uploads advance) and the
    window-close exit works."""
    pytest.importorskip("OpenGL")
    import time

    from live_video_magnification_tpu.engine import gl_present

    if not gl_present.gl_available():
        pytest.skip("no EGL surfaceless GL context in this image")

    caps = {}
    real_presenter = gl_present.GLPresenter

    class _Presenter(real_presenter):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            caps["presenter"] = self

    class _Ctx(gl_present.HeadlessGLContext):
        """HeadlessGLContext + the window-only surface cmd_live touches
        (should_close); swap sleeps like vsync so the chain's first jit
        compile is not starved on a 2-core host."""

        def __init__(self, w, h, title=""):
            super().__init__(w, h)
            self.swaps = 0
            self.deadline = time.monotonic() + 90.0

        def should_close(self):
            p = caps.get("presenter")
            done = p is not None and p.uploads >= 2 and self.swaps >= 3
            return done or time.monotonic() > self.deadline

        def swap(self):
            self.swaps += 1
            super().swap()
            time.sleep(1.0 / 120.0)

    monkeypatch.setattr(gl_present, "GLPresenter", _Presenter)
    monkeypatch.setattr(gl_present, "WindowGLContext", _Ctx)
    assert cli.main(["live", "--size", "48", "64", "--duration", "300",
                     "--mode", "laplace", "--levels", "2", "--gl"]) == 0
    assert caps["presenter"].uploads >= 2  # real frames hit the textures
    assert caps["presenter"].reallocs >= 1  # first geometry allocation ran


def test_magnify_resume_writes_part_file_not_truncating(clip_path, tmp_path,
                                                        monkeypatch):
    """A resumed run must NOT truncate the partial output of the interrupted
    run (cv2.VideoWriter reopening would); it writes a .fromN part file."""
    monkeypatch.setattr(cli, "_concat_resumed_parts", lambda p, **k: None)
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


def test_concat_resumed_parts_with_ffmpeg(tmp_path, monkeypatch, capsys):
    """Auto-concat of resume part files (VERDICT round-2 item 6c): with ffmpeg
    on PATH the MANIFEST-listed parts are merged in frame order into the
    original output and the part files + manifest removed. A stub ffmpeg
    validates the concat list. A stale unlisted .fromN file is warned about
    and left untouched (ADVICE round-3)."""
    out = tmp_path / "clip.avi"
    out.write_bytes(b"BASE")
    (tmp_path / "clip.from8.avi").write_bytes(b"P8")
    (tmp_path / "clip.from20.avi").write_bytes(b"P20")
    (tmp_path / "clip.from3.avi").write_bytes(b"STALE")  # not in the manifest
    cli._record_part(str(out), str(tmp_path / "clip.from20.avi"), 20)
    cli._record_part(str(out), str(tmp_path / "clip.from8.avi"), 8)
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    stub = bin_dir / "ffmpeg"
    # replays the concat list into the -y output so order is observable
    stub.write_text(
        "#!/bin/sh\n"
        "# argv: -y -f concat -safe 0 -i <list> -c copy <out>\n"
        "lst=$7; dst=${10}\n"
        "grep \"^file \" \"$lst\" | sed \"s/^file '//;s/'$//\" | "
        "while read f; do cat \"$f\" >> \"$dst\"; done\n")
    stub.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    cli._concat_resumed_parts(str(out))
    assert out.read_bytes() == b"BASEP8P20"  # manifest start order
    assert not (tmp_path / "clip.from8.avi").exists()
    assert not (tmp_path / "clip.from20.avi").exists()
    assert not (tmp_path / "clip.parts.json").exists()
    assert (tmp_path / "clip.from3.avi").read_bytes() == b"STALE"  # untouched
    assert "unlisted part" in capsys.readouterr().err


def test_concat_skips_unmanifested_parts(tmp_path, monkeypatch, capsys):
    """Stray .fromN files with no manifest (older interrupted export) are never
    merged (ADVICE round-3)."""
    out = tmp_path / "clip.avi"
    out.write_bytes(b"BASE")
    (tmp_path / "clip.from8.avi").write_bytes(b"P8")
    monkeypatch.setenv("PATH", str(tmp_path / "definitely-empty"))
    cli._concat_resumed_parts(str(out))
    assert out.read_bytes() == b"BASE"
    assert (tmp_path / "clip.from8.avi").exists()
    assert "no manifest" in capsys.readouterr().err


def test_concat_without_ffmpeg_reencodes_with_cv2(clip_path, tmp_path,
                                                  monkeypatch, capsys):
    """Without ffmpeg in the image, the cv2 re-encode fallback still leaves the
    user ONE playable file (VERDICT round-3 item 7)."""
    frames = _read(clip_path)
    out = tmp_path / "clip.avi"
    part = tmp_path / "clip.from8.avi"
    _write(str(out), frames[:8])
    _write(str(part), frames[8:14])
    cli._record_part(str(out), str(part), 8)
    monkeypatch.setenv("PATH", str(tmp_path / "definitely-empty"))
    cli._concat_resumed_parts(str(out), fps=20.0)
    merged = _read(str(out))
    assert merged.shape[0] == 14
    assert not part.exists()
    assert not (tmp_path / "clip.parts.json").exists()
    assert "re-encoded the parts with cv2" in capsys.readouterr().err


def test_concat_with_missing_manifest_part_keeps_everything(tmp_path,
                                                            monkeypatch,
                                                            capsys):
    out = tmp_path / "clip.avi"
    out.write_bytes(b"BASE")
    cli._record_part(str(out), str(tmp_path / "clip.from8.avi"), 8)  # never written
    monkeypatch.setenv("PATH", str(tmp_path / "definitely-empty"))
    cli._concat_resumed_parts(str(out))
    assert out.read_bytes() == b"BASE"
    assert "missing part" in capsys.readouterr().err


def test_magnify_fast_flag_sets_mxu_dtype(clip_path, tmp_path, monkeypatch):
    """--fast opts into the bf16 MXU stencils (no-op numerically on the CPU
    backend where the MXU kernels are gated off, but the env must be set
    before the chain builds)."""
    # setenv first so monkeypatch registers a teardown restore (cli.main
    # mutates the real environment, and a leaked bf16 flag would flip every
    # later pallas golden test into the fast mode), then delenv so --fast's
    # defaults apply.
    for var in ("LVMT_MXU_DTYPE", "LVMT_TAIL", "LVMT_TAIL_IO",
                "LVMT_PYR_IO", "LVMT_FAST_GAMMA"):
        monkeypatch.setenv(var, "sentinel")
        monkeypatch.delenv(var)
    out = str(tmp_path / "fast.avi")
    assert cli.main(["magnify", clip_path, out, "--mode", "laplace",
                     "--chunk", "5", "--end", "6", "--fast"]) == 0
    assert os.environ.get("LVMT_MXU_DTYPE") == "bf16"
    # the measured best fast-mode pairing includes the MXU blur tail and
    # bf16 transient planes (round 5, R5_TAILDB_AB.json)
    assert os.environ.get("LVMT_TAIL") == "mxu"
    assert os.environ.get("LVMT_TAIL_IO") == "bf16"
    assert os.environ.get("LVMT_PYR_IO") == "bf16"
    assert _read(out).shape[0] == 6
    # explicit env settings win over the flag's defaults (code-review r4)
    monkeypatch.setenv("LVMT_MXU_DTYPE", "hybrid")
    monkeypatch.setenv("LVMT_TAIL", "jnp")
    cli._apply_fast_mode(type("A", (), {"fast": True})())
    assert os.environ["LVMT_MXU_DTYPE"] == "hybrid"
    assert os.environ["LVMT_TAIL"] == "jnp"


def test_live_playback_fps_flag_wires_to_controller(clip_path, monkeypatch):
    """`lvmt live --playback-fps` drives PlaybackController.set_playback_fps
    for file sources (VERDICT round-2 item 6a; StatusStrip.cpp:122-158)."""
    from live_video_magnification_tpu.engine.controller import PlaybackController

    calls = []
    orig = PlaybackController.set_playback_fps
    monkeypatch.setattr(PlaybackController, "set_playback_fps",
                        lambda self, fps: (calls.append(fps),
                                           orig(self, fps))[1])
    assert cli.main(["live", "--video", clip_path, "--duration", "0.5",
                     "--playback-fps", "12.5", "--mode", "laplace"]) == 0
    assert 12.5 in calls


def test_magnify_split_composition(clip_path, tmp_path):
    out = str(tmp_path / "split.avi")
    assert cli.main(["magnify", clip_path, out, "--mode", "laplace",
                     "--chunk", "5", "--split", "left-right", "--labels"]) == 0
    frames = _read(out)
    assert frames.shape[1:] == (64, 160, 3)  # width doubled by the panes


def test_cameras_subcommand_runs(capsys):
    """`lvmt cameras` (CameraSelectDialog's data source) exits 0 and prints
    either enumerated `idx: name` lines or the explicit none message — this
    image has no /dev/video* nodes, so typically the latter."""
    assert cli.main(["cameras"]) == 0
    out = capsys.readouterr().out
    assert out.strip()
    for line in out.strip().splitlines():
        assert line == "no cameras found" or line.split(":")[0].isdigit()


def test_bench_subcommand_forwards_to_bench_py(capsys, monkeypatch):
    """`lvmt bench ...` forwards its whole tail to the repo-root bench.py
    verbatim (flags included — argparse's REMAINDER-in-subparser limitation
    means the tail must bypass the lvmt parser), with an optional leading
    `--` stripped. --help exercises the real forwarding (path resolution,
    argv splice, runpy execution) without touching a device — bench.py
    imports jax only inside its benchmark functions."""
    monkeypatch.setattr("sys.argv", ["lvmt"])  # cmd_bench splices over argv
    for form in (["bench", "--help"], ["bench", "--", "--help"]):
        with pytest.raises(SystemExit) as exc:  # bench.py argparse exits 0
            cli.main(form)
        assert (exc.value.code or 0) == 0
        assert "--matrix" in capsys.readouterr().out
