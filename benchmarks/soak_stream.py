"""Model-layer streaming soak: Dock.push_frame + Dock.render end-to-end.

Measures the CONVENIENCE path (the thing a user of models.Dock actually
calls per frame), legacy per-scope route vs the fused one-program route
(round-3 Dock.render auto-fusing), with device-resident frames — the
serving shape, where a decoder lands frames in HBM.

End-to-end soak numbers are environment-bound on this dev setup (the
tunnel's per-frame panel fetch rides on them — see doc/performance.md
"Streaming"); the legacy-vs-fused comparison is same-harness and fair.

Usage: python benchmarks/soak_stream.py [n_frames] [WxH]
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax

from obs_color_monitor_tpu.config import DockConfig, ROIConfig
from obs_color_monitor_tpu.models import Dock
from obs_color_monitor_tpu.runtime import native

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
W, H = (
    tuple(int(v) for v in sys.argv[2].split("x")) if len(sys.argv) > 2
    else (320, 180)
)


def soak(label: str, mode: str) -> float:
    """mode: 'legacy' (per-scope dispatches), 'fused' (analyze + one
    render program = 2/frame), 'stream' (ONE program per frame)."""
    os.environ.pop("OCM_NO_FUSED_RENDER", None)
    os.environ.pop("OCM_NO_STREAM_STEP", None)
    if mode == "legacy":
        os.environ["OCM_NO_FUSED_RENDER"] = "1"
    elif mode == "fused":
        os.environ["OCM_NO_STREAM_STEP"] = "1"
    # pinned to the measured composition (all six scopes, no ROI band) —
    # the DockConfig default is the reference's new-dock panel since r3
    dock = Dock(DockConfig(show_roi=False, show_focuspeaking=True),
                roi=ROIConfig(interleave=0, target_scale=2))
    # 8 distinct device-resident ramp frames, cycled (content varies, no
    # per-frame host upload)
    frames = [
        jax.device_put(native.pattern("ramp", W, H, i)) for i in range(8)
    ]
    # warmup: compiles (legacy per-scope programs; + the fused program on
    # the fused route) land outside the timed region
    for i in range(3):
        dock.push_frame(frames[i])
        dock.render()
    # the loop uses render_async: dispatch-only, the device panel stays
    # resident (a real sink fetches/encodes downstream).  A per-frame
    # BLOCKING np.asarray fetch costs a full tunnel round trip (~30-200 ms)
    # on this dev setup and would measure the tunnel, not the pipeline.
    t0 = time.perf_counter()
    img = None
    for i in range(N):
        dock.push_frame(frames[i & 7])
        img = dock.render_async()
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    ms = dt / N * 1e3
    n_progs = (len(dock._fused_render_fns),
               len(dock._stream_fns or ()))
    print(
        f"{label:34s} {ms:7.3f} ms/frame = {1e3/ms:7.1f} fps  "
        f"(fused/stream programs: {n_progs[0]}/{n_progs[1]})",
        flush=True,
    )
    return ms


def soak_raw_step() -> float:
    """Floor of any per-frame-dispatch path on this setup: the raw
    one-program dock step called in the same loop shape (no model layer).
    The delta vs the stream route is the model layer's overhead; the
    delta vs the step's fori-loop slope (benchmarks/panel_slope.py) is
    the tunnel's per-execution cost, absent on local hardware."""
    from obs_color_monitor_tpu.dock_step import make_dock_step

    # same pinned composition as soak()'s modes (six scopes, no ROI band)
    # so the raw-vs-stream delta compares the SAME program
    step = make_dock_step(
        H, W, scale=2, out_width=512, out_height=1536,
        dock=DockConfig(show_roi=False, show_focuspeaking=True),
    )
    frames = [
        jax.device_put(native.pattern("ramp", W, H, i)) for i in range(8)
    ]
    for i in range(3):
        out = step(frames[i], np.float32(i))
    jax.block_until_ready(out.panel)
    t0 = time.perf_counter()
    for i in range(N):
        out = step(frames[i & 7], np.float32(i))
    jax.block_until_ready(out.panel)
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{'raw dock_step (floor)':34s} {ms:7.3f} ms/frame = "
          f"{1e3/ms:7.1f} fps", flush=True)
    return ms


if __name__ == "__main__":
    print(f"soak: {N} frames {W}x{H}, device-resident, backend="
          f"{jax.default_backend()}")
    legacy = soak("legacy per-scope route", "legacy")
    fused = soak("fused render (2 programs/frame)", "fused")
    stream = soak("stream step (1 program/frame)", "stream")
    raw = soak_raw_step()
    print(f"speedup: fused {legacy / fused:.2f}x  stream "
          f"{legacy / stream:.2f}x  (stream overhead vs raw step: "
          f"{(stream / raw - 1) * 100:.0f}%)", flush=True)
