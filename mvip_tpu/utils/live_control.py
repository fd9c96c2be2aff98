"""Live training control: mutate run-time knobs while training.

Capability parity with the reference's tkinter control panel
(`DS_NeRF/run.py:1943-1975` `gui_application`, spawned unconditionally at
`run.py:548-550` — which breaks headless runs). Two frontends over one
`LiveControls` state object:

- `FileWatcher` (default, headless-safe): polls `<expdir>/control.json`; edit
  the file to change `feat_weight`, `i_video`, `render_factor`, `white_bkgd`
  (the reference panel's knobs) mid-run.
- `tk_panel` (opt-in via `--gui true`): the tkinter equivalent, launched on a
  daemon thread like the reference.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import asdict, dataclass


@dataclass
class LiveControls:
    feat_weight: float = 0.1
    i_video: int = 1500
    render_factor: int = 0
    white_bkgd: bool = False
    paused: bool = False


class FileWatcher:
    """Poll a JSON control file; apply updates onto a LiveControls instance."""

    def __init__(self, controls: LiveControls, path: str, poll_s: float = 2.0):
        self.controls = controls
        self.path = path
        self.poll_s = poll_s
        self._stop = threading.Event()
        # (re)seed the file with THIS run's knobs: config wins at startup, and a
        # stale control.json from a previous run must not silently override it;
        # edits made after the run starts are picked up by check()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as fh:
            json.dump(asdict(controls), fh, indent=1)
        self._mtime = os.path.getmtime(path)

    def check(self) -> bool:
        """Poll once (call from the train loop); True if controls changed."""
        try:
            mtime = os.path.getmtime(self.path)
            if mtime <= self._mtime:
                return False
            self._mtime = mtime
            with open(self.path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            return False
        changed = False
        for k, v in data.items():
            if hasattr(self.controls, k) and getattr(self.controls, k) != v:
                setattr(self.controls, k, type(getattr(self.controls, k))(v))
                changed = True
        return changed

    def watch_forever(self):
        while not self._stop.is_set():
            self.check()
            time.sleep(self.poll_s)

    def start_thread(self) -> threading.Thread:
        t = threading.Thread(target=self.watch_forever, daemon=True)
        t.start()
        return t

    def stop(self):
        self._stop.set()


def tk_panel(controls: LiveControls) -> "threading.Thread":
    """tkinter sliders/toggles mutating `controls` live (`run.py:1943-1975`).
    Runs on a daemon thread; requires a display."""

    import os as _os
    import sys as _sys

    if _sys.platform not in ("win32", "darwin") and not _os.environ.get("DISPLAY"):
        raise RuntimeError("no display available for the tkinter panel")

    def run():
        import tkinter as tk

        root = tk.Tk()
        root.title("mvip_tpu live controls")

        def slider(name, lo, hi, res):
            var = tk.DoubleVar(value=getattr(controls, name))
            tk.Label(root, text=name).pack()
            tk.Scale(
                root, from_=lo, to=hi, resolution=res, orient="horizontal",
                variable=var,
                command=lambda _=None: setattr(controls, name, var.get()),
            ).pack(fill="x")

        slider("feat_weight", 0.0, 1.0, 0.01)
        slider("i_video", 100, 50000, 100)
        slider("render_factor", 0, 16, 1)
        wb = tk.BooleanVar(value=controls.white_bkgd)
        tk.Checkbutton(
            root, text="white_bkgd", variable=wb,
            command=lambda: setattr(controls, "white_bkgd", wb.get()),
        ).pack()
        root.mainloop()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t
