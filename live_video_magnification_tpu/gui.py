"""Desktop GUI front end (tkinter): the reference MainWindow's surface.

Mirrors the reference UI layer (src/ui/) on top of the same controller API the
CLI uses — nothing below this module knows it exists (the reference's "no pixel
data crosses signals/slots" rule maps to: the GUI pulls composed frames from
the display loop, and pushes only intent via PlaybackController setters):

  * toolbar: Open File / Open Camera / Synthetic, Export, view-mode combo
  * display canvas with ROI rubber-band drag (normalized rect composed onto the
    active ROI by the controller, PlaybackController.cpp:210-227 semantics)
  * processing panel: mode combo (per-mode defaults on switch,
    MagnificationControls semantics), amplification / wavelength / band (Hz,
    Nyquist-clamped) / chroma / levels sliders, resolution segment, grayscale
  * transport: play / pause / stop, loop, playback-fps (file), timeline slider
  * status strip: processed fps vs target or drop share with ok/warn/bad
    coloring (StatusHealth.hpp thresholds) + latency readout

Run: python -m live_video_magnification_tpu.gui [path]
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import numpy as np

from live_video_magnification_tpu.engine.controller import PlaybackController
from live_video_magnification_tpu.engine.display import DisplayLoop, ViewMode, compose_view
from live_video_magnification_tpu.engine.instrumentation import camera_health, file_health
from live_video_magnification_tpu.models.params import (
    MagnificationMode,
    clamp_band_to_nyquist,
    defaults_for,
    to_params,
)

_HEALTH_COLORS = {"ok": "#2e7d32", "warn": "#f9a825", "bad": "#c62828"}

_MODES = [
    ("Laplace (motion)", MagnificationMode.LAPLACE),
    ("Phase (Riesz)", MagnificationMode.PHASE),
    ("Color", MagnificationMode.COLOR),
]


def _frame_to_photo(tk, img: np.ndarray):
    """BGR/gray u8 -> tk.PhotoImage via PPM bytes (no extra deps)."""
    if img.ndim == 2:
        rgb = np.repeat(img[..., None], 3, axis=-1)
    else:
        rgb = img[..., ::-1]  # BGR -> RGB
    h, w = rgb.shape[:2]
    header = f"P6 {w} {h} 255 ".encode()
    return tk.PhotoImage(data=header + np.ascontiguousarray(rgb).tobytes(), format="PPM")


class MainWindow:
    def __init__(self):
        import tkinter as tk
        from tkinter import filedialog, ttk

        self.tk = tk
        self.filedialog = filedialog
        self.controller = PlaybackController()
        self.display = DisplayLoop(self.controller.mailbox, self.controller._instr)

        self.root = tk.Tk()
        self.root.title("Live Video Magnification (TPU)")
        self.root.geometry("1280x760")

        # --- toolbar -------------------------------------------------------------------------
        bar = ttk.Frame(self.root)
        bar.pack(side="top", fill="x")
        ttk.Button(bar, text="Open File", command=self.on_open_file).pack(side="left")
        ttk.Button(bar, text="Open Camera", command=self.on_open_camera).pack(side="left")
        ttk.Button(bar, text="Synthetic", command=self.on_open_synthetic).pack(side="left")
        ttk.Button(bar, text="Export…", command=self.on_export).pack(side="left")
        self.view_var = tk.StringVar(value="processed")
        view = ttk.Combobox(bar, textvariable=self.view_var, state="readonly", width=14,
                            values=[m.value for m in ViewMode])
        view.pack(side="right")
        view.bind("<<ComboboxSelected>>", lambda e: self._set_view())

        # --- center: canvas + panel ----------------------------------------------------------
        center = ttk.Frame(self.root)
        center.pack(fill="both", expand=True)
        self.canvas = tk.Canvas(center, bg="#101418", highlightthickness=0)
        self.canvas.pack(side="left", fill="both", expand=True)
        self.canvas.bind("<ButtonPress-1>", self.on_roi_press)
        self.canvas.bind("<B1-Motion>", self.on_roi_drag)
        self.canvas.bind("<ButtonRelease-1>", self.on_roi_release)

        panel = ttk.Frame(center, padding=8)
        panel.pack(side="right", fill="y")
        self._build_panel(panel)

        # --- transport -----------------------------------------------------------------------
        transport = ttk.Frame(self.root, padding=4)
        transport.pack(side="top", fill="x")
        ttk.Button(transport, text="▶", width=3, command=self.controller.play).pack(side="left")
        ttk.Button(transport, text="⏸", width=3, command=self.controller.pause).pack(side="left")
        ttk.Button(transport, text="⏹", width=3, command=self.controller.stop).pack(side="left")
        self.loop_var = tk.BooleanVar(value=False)
        ttk.Checkbutton(transport, text="Loop", variable=self.loop_var,
                        command=lambda: self.controller.set_loop(self.loop_var.get())
                        ).pack(side="left")
        self.timeline = ttk.Scale(transport, from_=0, to=1, command=self.on_seek)
        self.timeline.pack(side="left", fill="x", expand=True, padx=8)
        self._scrubbing = False
        self.timeline.bind("<ButtonPress-1>", lambda e: setattr(self, "_scrubbing", True))
        self.timeline.bind("<ButtonRelease-1>", lambda e: setattr(self, "_scrubbing", False))

        # --- status strip --------------------------------------------------------------------
        self.status = tk.Label(self.root, anchor="w", fg="white", bg="#202428")
        self.status.pack(side="bottom", fill="x")

        self._photo = None
        self._img_geom = None  # (x0, y0, draw_w, draw_h, frame_w, frame_h)
        self._roi_start = None
        self._roi_rect_id = None

        self.root.after(8, self._poll_display)       # ~120 Hz present timer
        self.root.after(250, self._poll_stats)       # 4 Hz stats
        self.root.after(60, self._poll_timeline)     # timeline refresh

    # --- processing panel ----------------------------------------------------------------------

    def _build_panel(self, panel):
        tk, ttk = self.tk, __import__("tkinter.ttk", fromlist=["ttk"])
        row = 0

        def label(text):
            nonlocal row
            ttk.Label(panel, text=text).grid(row=row, column=0, sticky="w")

        self.mode_var = tk.StringVar(value=_MODES[0][0])
        label("Mode")
        mode_box = ttk.Combobox(panel, textvariable=self.mode_var, state="readonly",
                                values=[n for n, _ in _MODES], width=18)
        mode_box.grid(row=row, column=1)
        mode_box.bind("<<ComboboxSelected>>", lambda e: self.on_mode_change())
        row += 1

        def slider(text, frm, to, init, step=1.0):
            nonlocal row
            ttk.Label(panel, text=text).grid(row=row, column=0, sticky="w")
            var = tk.DoubleVar(value=init)
            s = ttk.Scale(panel, from_=frm, to=to, variable=var,
                          command=lambda e: self.push_params())
            s.grid(row=row, column=1, sticky="ew")
            row += 1
            return var

        self.amp_var = slider("Amplification", 0, 200, 20)
        self.wave_var = slider("Wavelength %", 0, 100, 50)
        self.low_var = slider("Band low (Hz)", 0.05, 15, 1.0)
        self.high_var = slider("Band high (Hz)", 0.05, 15, 5.0)
        self.chroma_var = slider("Chroma %", 0, 100, 0)
        self.levels_var = slider("Levels", 1, 8, 4)
        self.fps_var = slider("Capture FPS", 1, 120, 30)

        self.gray_var = tk.BooleanVar(value=False)
        ttk.Checkbutton(panel, text="Grayscale", variable=self.gray_var,
                        command=lambda: self.controller.set_grayscale(self.gray_var.get())
                        ).grid(row=row, column=0, columnspan=2, sticky="w")
        row += 1

        ttk.Label(panel, text="Resolution").grid(row=row, column=0, sticky="w")
        self.res_var = tk.StringVar(value="1/1")
        res = ttk.Combobox(panel, textvariable=self.res_var, state="readonly",
                           values=["1/1", "1/2", "1/4", "1/8"], width=6)
        res.grid(row=row, column=1, sticky="w")
        res.bind("<<ComboboxSelected>>", lambda e: self.controller.set_downscale(
            int(self.res_var.get().split("/")[1])))
        row += 1
        ttk.Button(panel, text="Reset ROI", command=self.controller.reset_roi).grid(
            row=row, column=0, columnspan=2, sticky="ew")

    def _mode(self) -> MagnificationMode:
        for name, mode in _MODES:
            if name == self.mode_var.get():
                return mode
        return MagnificationMode.LAPLACE

    def on_mode_change(self):
        ui = defaults_for(self._mode())
        self.amp_var.set(ui.amplification)
        self.wave_var.set(ui.wavelength)
        self.low_var.set(ui.low)
        self.high_var.set(ui.high)
        self.chroma_var.set(ui.chroma)
        self.levels_var.set(ui.levels)
        self.push_params()

    def push_params(self):
        ui = defaults_for(self._mode())
        ui.amplification = int(self.amp_var.get())
        ui.wavelength = float(self.wave_var.get())
        ui.low = float(self.low_var.get())
        ui.high = float(self.high_var.get())
        ui.chroma = int(self.chroma_var.get())
        ui.levels = int(self.levels_var.get())
        ui.capture_fps = float(self.fps_var.get())
        clamp_band_to_nyquist(ui)
        self.controller.set_magnification(to_params(ui))

    # --- sources / transport ---------------------------------------------------------------------

    def on_open_file(self):
        path = self.filedialog.askopenfilename()
        if path:
            self.push_params()
            self.controller.open_file(path)
            self.controller.play()

    def on_open_camera(self):
        from live_video_magnification_tpu.engine.source import enumerate_cameras

        cams = enumerate_cameras()
        if cams:
            self.push_params()
            self.controller.open_camera(cams[0][0])
            self.controller.play()

    def on_open_synthetic(self):
        self.push_params()
        self.controller.open_synthetic(h=480, w=640, fps=30.0)
        self.controller.play()

    def on_seek(self, value):
        if self._scrubbing and self.controller.seekable():
            total = self.controller.frame_count()
            self.controller.seek_frame(int(float(value) * max(1, total - 1)))

    def on_export(self):
        path = self.filedialog.asksaveasfilename(defaultextension=".mp4")
        if not path:
            return
        from live_video_magnification_tpu.export.exporter import Exporter
        from live_video_magnification_tpu.export.sources import FileExportFrameSource
        from live_video_magnification_tpu.export.types import ExportRequest, SplitMode

        src_path = getattr(self, "_file_path", None)
        if src_path is None:
            return
        req = ExportRequest(config=self.controller.config_snapshot(), output_path=path,
                            split=SplitMode.LEFT_RIGHT, text_overlay=True)
        self._exporter = Exporter()
        self._exporter.start(FileExportFrameSource(src_path), req, self.controller.mailbox)

    # --- ROI drag ------------------------------------------------------------------------------

    def _canvas_to_norm(self, x, y):
        if self._img_geom is None:
            return None
        x0, y0, dw, dh, _, _ = self._img_geom
        return (min(max((x - x0) / dw, 0.0), 1.0), min(max((y - y0) / dh, 0.0), 1.0))

    def on_roi_press(self, e):
        self._roi_start = (e.x, e.y)

    def on_roi_drag(self, e):
        if self._roi_start is None:
            return
        if self._roi_rect_id is not None:
            self.canvas.delete(self._roi_rect_id)
        self._roi_rect_id = self.canvas.create_rectangle(
            *self._roi_start, e.x, e.y, outline="#4fc3f7")

    def on_roi_release(self, e):
        if self._roi_start is None:
            return
        p0 = self._canvas_to_norm(*self._roi_start)
        p1 = self._canvas_to_norm(e.x, e.y)
        self._roi_start = None
        if self._roi_rect_id is not None:
            self.canvas.delete(self._roi_rect_id)
            self._roi_rect_id = None
        if p0 is None or p1 is None:
            return
        x = min(p0[0], p1[0])
        y = min(p0[1], p1[1])
        w = abs(p1[0] - p0[0])
        h = abs(p1[1] - p0[1])
        if w > 0.01 and h > 0.01:
            self.controller.set_roi(x, y, w, h)

    # --- timers --------------------------------------------------------------------------------

    def _set_view(self):
        self.display.view_mode = ViewMode(self.view_var.get())

    def _poll_display(self):
        view = self.display.poll_once()
        if view is not None:
            cw = max(1, self.canvas.winfo_width())
            ch = max(1, self.canvas.winfo_height())
            fh, fw = view.shape[:2]
            scale = min(cw / fw, ch / fh)
            dw, dh = max(1, int(fw * scale)), max(1, int(fh * scale))
            if (dw, dh) != (fw, fh):
                ys = (np.arange(dh) * fh / dh).astype(int)
                xs = (np.arange(dw) * fw / dw).astype(int)
                view = view[ys][:, xs]
            self._photo = _frame_to_photo(self.tk, view)
            x0, y0 = (cw - dw) // 2, (ch - dh) // 2
            self.canvas.delete("frame")
            self.canvas.create_image(x0, y0, image=self._photo, anchor="nw", tags="frame")
            self._img_geom = (x0, y0, dw, dh, fw, fh)
        self.root.after(8, self._poll_display)

    def _poll_stats(self):
        s = self.controller.stats()
        if self.controller.is_camera:
            health = camera_health(s.drop_fraction)
            text = (f"{s.process_fps:5.1f} fps   drops {s.drop_fraction*100:4.1f}%   "
                    f"latency {s.latency_ms_mean:5.1f} ms (p95 {s.latency_ms_p95:.0f})")
        else:
            target = self.controller.reported_fps()
            health = file_health(s.process_fps, target)
            text = (f"{s.process_fps:5.1f} / {target:.0f} fps   q={s.queue_depth}   "
                    f"latency {s.latency_ms_mean:5.1f} ms (p95 {s.latency_ms_p95:.0f})   "
                    f"errors {s.proc_errors}")
        if health != "ok":
            text += "   — falling behind: shrink the ROI or increase downscale"
        self.status.configure(text=" " + text, bg=_HEALTH_COLORS[health])
        self.root.after(250, self._poll_stats)

    def _poll_timeline(self):
        if not self._scrubbing and self.controller.seekable():
            total = max(1, self.controller.frame_count() - 1)
            self.timeline.set(self.controller.current_frame() / total)
        self.root.after(60, self._poll_timeline)

    def run(self):
        try:
            self.root.mainloop()
        finally:
            self.controller.close()


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    win = MainWindow()
    if argv:
        win._file_path = argv[0]
        win.controller.open_file(argv[0])
        win.controller.play()
    win.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
