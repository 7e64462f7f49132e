"""Command-line front end.

The reference ships a Qt GUI (src/ui/, src/app/); the framework equivalent is a
CLI over the same engine/controller/export stack:

  lvmt info <video>                     container info + max pyramid levels
  lvmt magnify <in> <out> [params]      offline magnification (batched TPU path)
  lvmt live [--camera N | --video F]    streaming pipeline with live stats
                                        (synthetic source when neither given)
  lvmt cameras                          enumerate capture devices
  lvmt bench [...]                      forwards to bench.py

Parameters are accepted in UI units (Hz bands, percent sliders) and mapped
through the single UI<->algorithm mapping (models/params.py), exactly like the
reference's panels, so CLI results match what the GUI-equivalent would produce.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time


def _add_mag_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--mode", default="laplace", choices=["laplace", "phase", "color", "none"])
    p.add_argument("--amplification", type=float, default=None, help="alpha (UI units)")
    p.add_argument("--wavelength", type=float, default=None, help="UI percent slider")
    p.add_argument("--low", type=float, default=None, help="band low (Hz)")
    p.add_argument("--high", type=float, default=None, help="band high (Hz)")
    p.add_argument("--chroma", type=int, default=None, help="chroma attenuation percent")
    p.add_argument("--levels", type=int, default=None)
    p.add_argument("--fps", type=float, default=None, help="capture/algorithm framerate")
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--downscale", type=int, default=1, choices=[1, 2, 4, 8])
    p.add_argument("--roi", type=float, nargs=4, metavar=("X", "Y", "W", "H"),
                   default=None, help="normalized ROI")
    p.add_argument("--fast", action="store_true",
                   help="bf16-operand MXU stencils (TPU fast mode: ~1.5x 4K "
                        "throughput at 44 dB vs the default f32 path — "
                        "docs/ROOFLINE.md); no effect on CPU backends")


def _apply_fast_mode(args) -> None:
    """--fast sets LVMT_MXU_DTYPE=bf16 + LVMT_TAIL=mxu + LVMT_TAIL_IO=bf16 +
    LVMT_PYR_IO=bf16 BEFORE any chain is built (all flags are resolved into
    the jit-cache key at chain build time). bf16 stencils + the MXU-banded
    blur tail (MXU vertical taps, double-buffered strips, bf16 transients) +
    bf16 pyramid band-plane STORAGE (arithmetic stays f32) is the measured
    best fast-mode pairing: 8.19 -> 7.6 -> 6.83/6.91 ms/4K-frame across the
    round-5 same-session A/Bs (R5_TAILIO_AB / R5_TAILDB_AB / R5_PYRIO_AB,
    accuracy unchanged at 44 dB); explicit env settings of any flag still
    win."""
    import os

    if getattr(args, "fast", False):
        # setdefault for ALL: an explicit env setting (e.g. a hybrid A/B)
        # always wins over the flag's default pairing
        os.environ.setdefault("LVMT_MXU_DTYPE", "bf16")
        os.environ.setdefault("LVMT_TAIL", "mxu")
        os.environ.setdefault("LVMT_TAIL_IO", "bf16")
        os.environ.setdefault("LVMT_PYR_IO", "bf16")


def _config_from_args(args, source_fps: float):
    from live_video_magnification_tpu.models.params import (
        MagnificationMode,
        PreprocessParams,
        ProcessorConfig,
        clamp_band_to_nyquist,
        defaults_for,
        to_params,
    )

    mode = {
        "laplace": MagnificationMode.LAPLACE,
        "phase": MagnificationMode.PHASE,
        "color": MagnificationMode.COLOR,
        "none": MagnificationMode.NONE,
    }[args.mode]
    ui = defaults_for(mode)
    ui.capture_fps = args.fps or source_fps
    if args.amplification is not None:
        ui.amplification = int(args.amplification)
    if args.wavelength is not None:
        ui.wavelength = args.wavelength
    if args.low is not None:
        ui.low = args.low
    if args.high is not None:
        ui.high = args.high
    if args.chroma is not None:
        ui.chroma = args.chroma
    if args.levels is not None:
        ui.levels = args.levels
    clamp_band_to_nyquist(ui)
    pre = PreprocessParams(downscale=args.downscale)
    if args.roi is not None:
        x, y, w, h = args.roi
        pre = dataclasses.replace(pre, roi_enabled=True, roi_x=x, roi_y=y, roi_w=w, roi_h=h)
    return ProcessorConfig(grayscale=args.grayscale, preprocess=pre, magnification=to_params(ui))


def cmd_info(args) -> int:
    from live_video_magnification_tpu.io.video import video_info
    from live_video_magnification_tpu.ops.pyramid import calculate_max_levels

    n, h, w, fps = video_info(args.video)
    print(f"frames={n} size={w}x{h} fps={fps:.3f} max_levels={calculate_max_levels((h, w))}")
    return 0


def cmd_magnify(args) -> int:
    """Streaming offline export: decode -> device chunk -> encode at constant
    host memory (a long 4K clip never materializes in RAM)."""
    import os

    _apply_fast_mode(args)

    import numpy as np

    from live_video_magnification_tpu.export.batch import ClipProcessor
    from live_video_magnification_tpu.export.exporter import compose
    from live_video_magnification_tpu.export.types import SplitMode
    from live_video_magnification_tpu.io.video import (
        VideoWriterStream,
        iter_video,
        video_info,
    )

    split = {"none": SplitMode.NONE, "left-right": SplitMode.LEFT_RIGHT,
             "top-bottom": SplitMode.TOP_BOTTOM}[args.split]

    total, h, w, fps = video_info(args.input)
    probe = next(iter_video(args.input, args.start, args.start + 1), None)
    if probe is None:
        print("no frames decoded", file=sys.stderr)
        return 1
    channels = 1 if probe.ndim == 2 else probe.shape[2]
    h, w = probe.shape[0], probe.shape[1]
    cfg = _config_from_args(args, fps)

    if getattr(args, "distributed", False):
        from live_video_magnification_tpu.parallel import distributed
        from live_video_magnification_tpu.parallel.batch_export import (
            export_video_distributed,
        )

        distributed.initialize()
        t0 = time.monotonic()
        stats: dict = {}
        final = export_video_distributed(
            args.input, args.output, cfg, chunk=args.chunk,
            file_fps=args.file_fps, start=args.start, end=args.end,
            split=split, labels=args.labels,
            checkpoint_path=args.checkpoint,
            checkpoint_every=args.checkpoint_every,
            stats=stats,
        )
        dt = time.monotonic() - t0
        # frames actually through the processor, not the container's total
        # (which video_info documents may lie) — advisor round 4
        n_frames = stats.get(
            "frames", (args.end if args.end is not None else total) - args.start)
        print(f"\nwrote {n_frames} frames to {final} "
              f"({n_frames/dt:.1f} fps processing, "
              f"{len(__import__('jax').devices())} devices)", file=sys.stderr)
        return 0

    proc = ClipProcessor(cfg, h, w, channels, time_parallel=args.time_parallel)
    start = args.start
    if args.checkpoint and os.path.exists(args.checkpoint + ".npz"):
        try:
            start = args.start + proc.load_checkpoint(args.checkpoint)
            print(f"resuming at frame {start}", file=sys.stderr)
        except ValueError as e:
            print(f"error: {e}\n(delete {args.checkpoint}.npz or pass a "
                  "different --checkpoint path to start fresh)", file=sys.stderr)
            return 1

    out_path = args.output
    if start > args.start and os.path.exists(args.output):
        # cv2.VideoWriter would truncate the partial file from the interrupted
        # run; a resumed run writes its continuation to a part file instead
        # (auto-concatenated after the run when ffmpeg is present).
        base, ext = os.path.splitext(args.output)
        out_path = f"{base}.from{start}{ext}"
        print(f"{args.output} exists — writing resumed frames to {out_path}",
              file=sys.stderr)

    end = args.end if args.end is not None else (total or None)
    goal = (end - args.start) if end is not None else None
    writer = VideoWriterStream(out_path, args.file_fps or fps)
    t0 = time.monotonic()

    def flush(buf):
        processed, original = proc.process_chunk(
            np.ascontiguousarray(np.moveaxis(np.stack(buf), -1, 1))
        )
        out_hwc = np.moveaxis(processed, 1, -1)
        if split is not SplitMode.NONE:
            # Same pane composition as the exporter (even dims + labels,
            # Exporter.cpp:53-88 semantics).
            orig_hwc = np.moveaxis(original, 1, -1)
            out_hwc = np.stack([
                compose(orig_hwc[i], out_hwc[i], split, args.labels)
                for i in range(out_hwc.shape[0])
            ])
        writer.write_chunk(out_hwc)
        done = proc.cursor
        print(f"\r{done}/{goal if goal is not None else '?'} frames",
              end="", file=sys.stderr)
        if args.checkpoint and args.checkpoint_every and (
            done % args.checkpoint_every
        ) < args.chunk:
            proc.save_checkpoint(args.checkpoint)

    buf = []
    for frame in iter_video(args.input, start, end):
        buf.append(frame if frame.ndim == 3 else frame[..., None])
        if len(buf) == args.chunk:
            flush(buf)
            buf = []
    if buf:
        flush(buf)
    dt = time.monotonic() - t0
    path = writer.close()
    if writer.frames_written == 0:
        if start > args.start:
            print("\nnothing to do: checkpoint cursor is at/past the end "
                  "(export already complete)", file=sys.stderr)
            return 0
        print("\nnothing exported (empty range)", file=sys.stderr)
        return 1
    print(f"\nwrote {writer.frames_written} frames to {path} "
          f"({writer.frames_written/dt:.1f} fps processing)", file=sys.stderr)
    if out_path != args.output:
        # Record THIS run's part in the manifest before merging: concat only
        # ever touches manifest-listed parts (a stale .fromN file from an
        # older export with different settings must never be merged in —
        # ADVICE round-3).
        _record_part(args.output, path, start)
        _concat_resumed_parts(args.output, fps=args.file_fps or fps)
    return 0


def _parts_manifest_path(output: str) -> str:
    base, _ext = os.path.splitext(output)
    return f"{base}.parts.json"


def _record_part(output: str, part_path: str, start: int) -> None:
    """Append a resumed run's continuation file to the output's part manifest
    (ordered by resume frame). The manifest is the source of truth for
    auto-concat; unknown .fromN files on disk are warned about, never merged."""
    import json as _json

    mpath = _parts_manifest_path(output)
    entries = []
    if os.path.exists(mpath):
        try:
            entries = _json.load(open(mpath))["parts"]
        except Exception:
            entries = []
    name = os.path.basename(part_path)
    if not any(e["path"] == name for e in entries):
        entries.append({"start": int(start), "path": name})
    entries.sort(key=lambda e: e["start"])
    with open(mpath, "w") as f:
        _json.dump({"output": os.path.basename(output), "parts": entries}, f)


def _concat_resumed_parts(output: str, fps: float | None = None) -> None:
    """Merge `output` + its manifest-listed `.fromN` continuation files back
    into ONE file: ffmpeg concat demuxer (stream copy) when ffmpeg is on PATH,
    else a cv2 re-encode fallback (lossless for FFV1/MJPG parts; mirrors the
    reference's codec-fallback philosophy, Exporter.cpp:92-118). Part files on
    disk that the manifest does not list are warned about and left alone
    (ADVICE round-3: stale parts from an older export must not be merged)."""
    import glob
    import json as _json
    import re
    import shutil

    base, ext = os.path.splitext(output)
    out_dir = os.path.dirname(output) or "."
    mpath = _parts_manifest_path(output)

    # Every .fromN sibling on disk, for the stray check.
    part_re = re.compile(re.escape(os.path.basename(base)) + r"\.from(\d+)\.\w+$")
    on_disk = {os.path.basename(p)
               for p in glob.glob(f"{glob.escape(base)}.from*")
               if part_re.match(os.path.basename(p))}

    manifest = []
    if os.path.exists(mpath):
        try:
            manifest = _json.load(open(mpath))["parts"]
        except Exception as e:
            print(f"unreadable part manifest {mpath} ({e}) — not merging",
                  file=sys.stderr)
            return
    if not manifest:
        if on_disk:
            print(f"found {len(on_disk)} .from* part file(s) with no manifest "
                  f"({mpath}) — possibly from an older export; not merging",
                  file=sys.stderr)
        return

    listed = [e["path"] for e in manifest]
    stray = sorted(on_disk - set(listed))
    if stray:
        print(f"ignoring {len(stray)} unlisted part file(s): "
              + ", ".join(stray), file=sys.stderr)
    missing = [n for n in listed if not os.path.exists(os.path.join(out_dir, n))]
    if missing:
        print(f"manifest lists missing part(s) {missing} — keeping everything "
              "unmerged", file=sys.stderr)
        return
    parts = [os.path.join(out_dir, n) for n in listed]
    ordered = [output] + parts

    # One shared merge implementation (io/video.py concat_videos): ffmpeg
    # stream copy when available, cv2 re-encode fallback otherwise — this
    # function only owns the manifest bookkeeping around it.
    from live_video_magnification_tpu.io.video import concat_videos, video_info

    had_ffmpeg = shutil.which("ffmpeg") is not None
    if fps is None:
        try:  # only the cv2 re-encode fallback actually consumes fps
            fps = video_info(output)[3] or 30.0
        except Exception:
            fps = 30.0
    try:
        final = concat_videos(ordered, output, fps)
    except Exception as e:
        print(f"concat failed ({e}) — kept {len(ordered)} part files; "
              "concatenate them with ffmpeg's concat demuxer", file=sys.stderr)
        return
    for p in parts:
        os.unlink(p)
    if final != output and os.path.exists(output):
        os.unlink(output)  # re-encode switched containers; old first segment
    os.unlink(mpath)
    if not had_ffmpeg:
        print("ffmpeg not found — re-encoded the parts with cv2 instead",
              file=sys.stderr)
    print(f"auto-concatenated {len(ordered)} parts into {final}",
          file=sys.stderr)


def cmd_live(args) -> int:
    _apply_fast_mode(args)
    from live_video_magnification_tpu.engine.controller import PlaybackController
    from live_video_magnification_tpu.engine.instrumentation import camera_health, file_health

    ctrl = PlaybackController()
    cfg = _config_from_args(args, 30.0)
    ctrl.set_grayscale(cfg.grayscale)
    ctrl.set_magnification(cfg.magnification)
    if args.camera is not None:
        ok = ctrl.open_camera(args.camera)
    elif args.video is not None:
        ok = ctrl.open_file(args.video)
    else:
        ok = ctrl.open_synthetic(h=args.size[0], w=args.size[1], fps=30.0)
    if not ok:
        print("failed to open source", file=sys.stderr)
        return 1
    if args.playback_fps is not None and not ctrl.is_camera:
        # file-source pacing override (reference StatusStrip.cpp:122-158)
        ctrl.set_playback_fps(args.playback_fps)

    # --gl: the GL-class present path (DisplayWidget.cpp semantics) in a glfw
    # window; runs on the MAIN thread (window-system requirement) with stats
    # interleaved. Without a usable display the run degrades to stats-only.
    gl_ctx = gl_presenter = None
    if getattr(args, "gl", False):
        try:
            from live_video_magnification_tpu.engine.display import ViewMode
            from live_video_magnification_tpu.engine.gl_present import (
                GLPresenter,
                WindowGLContext,
            )

            gl_ctx = WindowGLContext(960, 540, title="lvmt live")
            gl_presenter = GLPresenter(
                ctrl.instr, view_mode=ViewMode(args.view))
        except Exception as e:  # no display / no GL driver
            print(f"--gl unavailable ({e}); continuing stats-only",
                  file=sys.stderr)
            if gl_ctx is not None:  # window opened but the GL init failed
                gl_ctx.destroy()
            gl_ctx = gl_presenter = None

    ctrl.play()
    try:
        end = time.monotonic() + args.duration
        next_stat = 0.0
        while time.monotonic() < end:
            if gl_ctx is not None:
                if gl_ctx.should_close():
                    break
                gl_presenter.paint(ctrl.mailbox.latest(),
                                   gl_ctx.width, gl_ctx.height)
                gl_ctx.swap()  # vsync paces the present rate
            else:
                time.sleep(0.25)
            now = time.monotonic()
            if now < next_stat:
                continue
            next_stat = now + 0.25
            s = ctrl.stats()
            health = (
                camera_health(s.drop_fraction) if ctrl.is_camera
                else file_health(s.process_fps, ctrl.reported_fps())
            )
            print(
                f"\rfps={s.process_fps:6.1f} latency={s.latency_ms_mean:5.1f}ms "
                f"p95={s.latency_ms_p95:5.1f}ms q={s.queue_depth} drops={s.source_drops} "
                f"errors={s.proc_errors} [{health}]   ",
                end="", file=sys.stderr,
            )
    except KeyboardInterrupt:
        pass
    finally:
        print(file=sys.stderr)
        if gl_presenter is not None:
            gl_presenter.destroy()
        if gl_ctx is not None:
            gl_ctx.destroy()
        ctrl.close()
    return 0


def cmd_record(args) -> int:
    """Lossless camera recording -> offline magnified export
    (reference CameraSource.cpp:70-80 + MainWindow.cpp:576-585 flow)."""
    _apply_fast_mode(args)
    from live_video_magnification_tpu.engine.controller import PlaybackController
    from live_video_magnification_tpu.export.exporter import Exporter
    from live_video_magnification_tpu.export.sources import BufferExportFrameSource
    from live_video_magnification_tpu.export.types import (
        ExportFormat,
        ExportPhase,
        ExportRequest,
        SplitMode,
    )

    ctrl = PlaybackController()
    cfg = _config_from_args(args, 30.0)
    ctrl.set_grayscale(cfg.grayscale)
    ctrl.set_magnification(cfg.magnification)
    if args.camera is not None:
        ok = ctrl.open_camera(args.camera)
    else:
        ok = ctrl.open_synthetic(h=args.size[0], w=args.size[1], fps=30.0,
                                 as_camera=True)
    if not ok:
        print("failed to open source", file=sys.stderr)
        return 1
    ctrl.play()
    buf = ctrl.start_recording(max_bytes=args.max_bytes)
    if buf is None:
        print("recording unavailable (no camera-kind source)", file=sys.stderr)
        ctrl.close()
        return 1
    end = time.monotonic() + args.duration
    try:
        while time.monotonic() < end and not buf.closed:
            time.sleep(0.1)
            print(f"\rREC {buf.frame_count} frames "
                  f"{buf.byte_count / 1e6:.1f} MB", end="", file=sys.stderr)
    except KeyboardInterrupt:
        pass
    if buf.limit_reached:
        print("\nbyte cap reached — recording auto-stopped", file=sys.stderr)
    frames = ctrl.stop_recording()
    ctrl.close()
    print(f"\ncaptured {len(frames)} frames", file=sys.stderr)
    if not frames:
        print("nothing recorded", file=sys.stderr)
        return 1

    fmt = {"mp4": ExportFormat.MP4_H264, "avi": ExportFormat.AVI_MJPG,
           "mkv": ExportFormat.MKV_FFV1}[args.format]
    split = {"none": SplitMode.NONE, "left-right": SplitMode.LEFT_RIGHT,
             "top-bottom": SplitMode.TOP_BOTTOM}[args.split]
    req = ExportRequest(config=cfg, output_path=args.output,
                        file_fps=args.file_fps or 30.0, split=split,
                        text_overlay=args.labels, format=fmt)
    exp = Exporter()
    exp.start(BufferExportFrameSource(frames), req)
    while True:
        p = exp.progress()
        if p.phase in (ExportPhase.DONE, ExportPhase.FAILED, ExportPhase.ABORTED):
            break
        print(f"\rexporting {p.frames_done}/{p.frames_total}", end="", file=sys.stderr)
        time.sleep(0.2)
    exp.join(timeout=30.0)
    p = exp.progress()
    if p.phase is not ExportPhase.DONE:
        print(f"\nexport {p.phase.value}: {p.error}", file=sys.stderr)
        return 1
    print(f"\nwrote {p.frames_done} frames to {args.output}", file=sys.stderr)
    return 0


def cmd_bench(rest) -> int:
    import runpy
    import os

    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "bench.py")
    sys.argv = [bench] + list(rest)
    runpy.run_path(bench, run_name="__main__")
    return 0


def cmd_cameras(_args) -> int:
    from live_video_magnification_tpu.engine.source import enumerate_cameras

    cams = enumerate_cameras()
    if not cams:
        print("no cameras found")
    for idx, name in cams:
        print(f"{idx}: {name}")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:]) if argv is None else list(argv)

    # `bench` forwards its whole tail to bench.py verbatim, BEFORE argparse:
    # a sub-parser REMAINDER cannot carry unknown flags (`lvmt bench --small`
    # dies at the top-level parser — the long-standing argparse REMAINDER-in-
    # subparser limitation), and a `--` separator would leak into bench.py's
    # own parser. An optional leading `--` is accepted and stripped.
    if argv[:1] == ["bench"]:
        rest = argv[1:]
        if rest[:1] == ["--"]:
            rest = rest[1:]
        return cmd_bench(rest)

    ap = argparse.ArgumentParser(prog="lvmt", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info", help="video info")
    p.add_argument("video")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("magnify", help="offline magnification export")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--file-fps", type=float, default=None)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--time-parallel", action="store_true",
                   help="sequence-parallel chunks (associative scans over T) "
                        "instead of the sequential per-frame scan; bit-identical "
                        "output, intended for T-axis-sharded multi-chip meshes — "
                        "on a single device the default sequential scan is "
                        "3-4x faster (docs/TIME_PARALLEL.md)")
    p.add_argument("--split", default="none",
                   choices=["none", "left-right", "top-bottom"],
                   help="compose original|processed panes like the GUI export")
    p.add_argument("--labels", action="store_true", help="burn in pane labels")
    p.add_argument("--distributed", action="store_true",
                   help="BASELINE config-5 program: shard the frame axis over "
                        "every device of every host (per-host decode of only "
                        "its shard rows, one T-sharded SPMD call per chunk, "
                        "per-host encode, ordered concat). Run the same "
                        "command on every host of a pod slice; single-host it "
                        "shards over the local devices")
    _add_mag_args(p)
    p.set_defaults(fn=cmd_magnify)

    p = sub.add_parser("live", help="streaming pipeline with live stats")
    p.add_argument("--camera", type=int, default=None)
    p.add_argument("--video", default=None)
    p.add_argument("--size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--playback-fps", type=float, default=None,
                   help="override file-source playback pacing (ignored for cameras)")
    p.add_argument("--gl", action="store_true",
                   help="present in a GL window (glfw; falls back to "
                        "stats-only without a display)")
    p.add_argument("--view", default="processed",
                   choices=["processed", "original", "side-by-side",
                            "top-bottom"],
                   help="--gl view mode (DisplayWidget pane layouts)")
    _add_mag_args(p)
    p.set_defaults(fn=cmd_live)

    p = sub.add_parser("record", help="record (camera/synthetic) then export magnified")
    p.add_argument("output")
    p.add_argument("--camera", type=int, default=None)
    p.add_argument("--size", type=int, nargs=2, default=(480, 640),
                   help="synthetic source size when no camera")
    p.add_argument("--duration", type=float, default=5.0, help="record seconds")
    p.add_argument("--max-bytes", type=int, default=None, help="RAM cap (default 8 GB)")
    p.add_argument("--file-fps", type=float, default=None)
    p.add_argument("--format", default="mp4", choices=["mp4", "avi", "mkv"])
    p.add_argument("--split", default="none", choices=["none", "left-right", "top-bottom"])
    p.add_argument("--labels", action="store_true")
    _add_mag_args(p)
    p.set_defaults(fn=cmd_record)

    p = sub.add_parser("cameras", help="enumerate capture devices")
    p.set_defaults(fn=cmd_cameras)

    p = sub.add_parser("bench", help="run the headline benchmark (bench.py); "
                                     "all following args go to bench.py")
    p.add_argument("rest", nargs=argparse.REMAINDER)
    # unreachable (bench is intercepted above) — kept so `lvmt --help` lists it
    p.set_defaults(fn=lambda a: cmd_bench(a.rest))

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
