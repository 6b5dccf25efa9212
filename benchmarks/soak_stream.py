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

if os.environ.get("OCM_PLATFORM"):
    # the axon plugin overrides JAX_PLATFORMS; force explicitly (CLAUDE.md)
    jax.config.update("jax_platforms", os.environ["OCM_PLATFORM"])

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
    render program = 2/frame), 'stream' (ONE program per frame, frames
    device-resident), 'stream-host' (same + per-frame host->HBM upload of
    the 4 B/px packed frame), 'stream-nv12' (per-frame host->HBM upload
    of raw 1.5 B/px NV12 planes, decode folded into the stream program),
    'drag' (a DIFFERENT ROI rect every frame — the mid-drag route: every
    frame rides Dock._consume_dynamic's one-cached-program dynamic-rect
    step, reference src/roi.c:343-521; uses the reference new-dock
    composition, ROI band + 5 scopes, since that is the panel a user
    drags in)."""
    os.environ.pop("OCM_NO_FUSED_RENDER", None)
    os.environ.pop("OCM_NO_STREAM_STEP", None)
    if mode == "legacy":
        os.environ["OCM_NO_FUSED_RENDER"] = "1"
    elif mode == "fused":
        os.environ["OCM_NO_STREAM_STEP"] = "1"
    # pinned to the measured composition (all six scopes, no ROI band) —
    # the DockConfig default is the reference's new-dock panel since r3.
    # The drag mode keeps the DEFAULT composition (ROI band + 5 scopes):
    # that is the panel drags happen in.
    dock = Dock(DockConfig() if mode == "drag"
                else DockConfig(show_roi=False, show_focuspeaking=True),
                roi=ROIConfig(interleave=0, target_scale=2))
    # 8 distinct ramp frames, cycled (content varies); device-resident
    # except in the host-upload variants
    if mode == "stream-nv12":
        rng = np.random.default_rng(0)
        # the realistic wire shape: ONE contiguous NV12 buffer per frame,
        # y/uv as adjacent views (push_nv12 detects this and uploads once)
        bufs = [
            rng.integers(0, 256, (H * 3 // 2, W), np.uint8)
            for _ in range(8)
        ]
        frames = [(b[:H], b[H:]) for b in bufs]
        push = lambda f: dock.push_nv12(*f)
    else:
        frames = [native.pattern("ramp", W, H, i) for i in range(8)]
        if mode != "stream-host":
            frames = [jax.device_put(f) for f in frames]
        push = dock.push_frame
    sw, sh = W // 2, H // 2
    if mode == "drag":
        # every frame gets a DIFFERENT rect (the right/bottom edges sweep
        # a quarter-capture range), so every frame takes the dynamic-rect
        # route; the full model layer is measured — per-frame config
        # writes, generation-memoized revalidation, dynamic-step dispatch,
        # fresh publication of every consumer
        def set_rect(i):
            cfg = dock.hub.config
            cfg.x0, cfg.y0 = 16, 16
            cfg.x1 = sw // 2 + (i % max(sw // 4, 2))
            cfg.y1 = sh // 2 + ((i * 3) % max(sh // 4, 2))

        base_push = push

        def push(f, _set=set_rect, _p=base_push):
            _set(push.i)
            push.i += 1
            _p(f)

        push.i = 0
    # warmup: compiles (legacy per-scope programs; + the fused program on
    # the fused route; + the dynamic-rect device step on the drag route,
    # which engages on frame 4: warm fused -> enter stream -> rect seen
    # changed) land outside the timed region
    for i in range(4 if mode == "drag" else 3):
        push(frames[i % len(frames)])
        dock.render()
    if mode == "drag":
        # the route must actually be the dynamic one-cached-program step
        assert dock._device_step_dynamic, "drag mode fell off the dynamic route"
        s = dock.hub.last_surface
        assert s is not None and s.dynamic_rect is not None, (
            "drag mode did not publish through the dynamic route"
        )
    # the loop uses render_async: dispatch-only, the device panel stays
    # resident (a real sink fetches/encodes downstream).  A per-frame
    # BLOCKING np.asarray fetch costs a full tunnel round trip (~30-200 ms)
    # on this dev setup and would measure the tunnel, not the pipeline.
    # The end-of-loop fence is a real FETCH of the last panel, not
    # block_until_ready: on the axon client block_until_ready is NOT a
    # trustworthy completion fence for pipelined per-frame dispatches —
    # 400 enqueued ~0.4 ms-device-time programs "drain" under it in ~10 ms
    # of wall, which is physically impossible (r5 probe_elide; a single
    # long fori-loop program DOES block for its full ~2 s runtime, so the
    # semantics are regime-dependent and unsafe to rely on).  Executions
    # are in-order on the one device stream, so fetching the LAST panel
    # fences all N frames; the single fetch adds ~RTT/N to the reading.
    t0 = time.perf_counter()
    img = None
    for i in range(N):
        push(frames[i & 7])
        img = dock.render_async()
    _ = np.asarray(img)
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


def soak_driver() -> float:
    """The composed production pipeline: PipelineDriver(dock=...) — queue
    + worker thread + the Dock's one-program stream step per frame
    (reference: one pipeline thread regardless of sink, common.c:375-403).
    The producer retries on a full queue (backpressure instead of drop),
    so the reading is the sustained throughput of the whole composed
    stack; on_panel keeps the last device panel for the end fence."""
    from obs_color_monitor_tpu.pipeline import PipelineDriver

    os.environ.pop("OCM_NO_FUSED_RENDER", None)
    os.environ.pop("OCM_NO_STREAM_STEP", None)
    dock = Dock(DockConfig(show_roi=False, show_focuspeaking=True),
                roi=ROIConfig(interleave=0, target_scale=2))
    frames = [
        jax.device_put(native.pattern("ramp", W, H, i)) for i in range(8)
    ]
    last = [None]
    drv = PipelineDriver(dock=dock, on_panel=lambda p: last.__setitem__(0, p))
    drv.start()
    try:
        for i in range(4):  # warm: layout discovery + stream program
            drv.push_frame(frames[i % 8])
            drv.flush()
        assert len(dock._stream_fns) == 1, "driver did not warm the stream route"
        t0 = time.perf_counter()
        for i in range(N):
            # full queue: backpressure, not drop.  A real sleep, not a
            # spin — a sleep(0) yield-loop contends with the worker for
            # the single host core (rejected pushes count as 'dropped')
            while not drv.push_frame(frames[i & 7]):
                time.sleep(0.0005)
        drv.flush()
        _ = np.asarray(last[0])  # real fetch = completion fence
        dt = time.perf_counter() - t0
    finally:
        drv.stop()
    ms = dt / N * 1e3
    st = drv.stats
    print(f"{'driver-fed dock (queue+thread)':34s} {ms:7.3f} ms/frame = "
          f"{1e3/ms:7.1f} fps  (processed {st['processed']}, errors "
          f"{st['errors']}; producer retries counted as dropped: "
          f"{st['dropped']})", flush=True)
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
    _ = np.asarray(out.panel)
    t0 = time.perf_counter()
    for i in range(N):
        out = step(frames[i & 7], np.float32(i))
    _ = np.asarray(out.panel)  # real fetch = completion fence (see soak)
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{'raw dock_step (floor)':34s} {ms:7.3f} ms/frame = "
          f"{1e3/ms:7.1f} fps", flush=True)
    return ms


def soak_host_stub() -> float:
    """Pure host residual of the stream route: warm the one-program path,
    then replace the cached device program with a canned-output stub and
    run the same loop — what remains is the per-frame Python (cache
    revalidation, leaf collection, publish-back) on this 1-core host.
    r3 measured ~0.23 ms/frame; r4's config-generation memoization is
    aimed squarely at this number."""
    os.environ.pop("OCM_NO_FUSED_RENDER", None)
    os.environ.pop("OCM_NO_STREAM_STEP", None)
    dock = Dock(DockConfig(show_roi=False, show_focuspeaking=True),
                roi=ROIConfig(interleave=0, target_scale=2))
    frames = [
        jax.device_put(native.pattern("ramp", W, H, i)) for i in range(8)
    ]
    for i in range(4):
        dock.push_frame(frames[i])
        dock.render_async()
    assert len(dock._stream_fns) == 1, "stream route not warmed"
    (skey,) = dock._stream_fns
    fn, rects, wy, hy = dock._stream_fns[skey]
    canned = fn(
        frames[0], np.float32(0.0),
        dock.waveform._buf[dock.waveform._r_buf],
    )
    jax.block_until_ready(canned)
    dock._stream_fns[skey] = (lambda *a: canned, rects, wy, hy)
    dock._stream_fast = None  # re-resolve through _stream_fns so the
    # steady-state shortcut carries the STUB, not the real program
    t0 = time.perf_counter()
    for i in range(N):
        dock.push_frame(frames[i & 7])
        dock.render_async()
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{'host residual (device stubbed)':34s} {ms:7.3f} ms/frame",
          flush=True)
    return ms


if __name__ == "__main__":
    # extra argv flags: "uploads" adds the host-upload + nv12 rows;
    # "quick" runs only the stream rows (production-shape sweeps, where
    # the legacy route's per-scope dispatches would dominate the budget)
    flags = set(sys.argv[3:])
    print(f"soak: {N} frames {W}x{H}, backend={jax.default_backend()}")
    if "quick" not in flags:
        legacy = soak("legacy per-scope route", "legacy")
        fused = soak("fused render (2 programs/frame)", "fused")
    stream = soak("stream step (1 program/frame)", "stream")
    if "drag" in flags:
        soak("mid-drag route (dynamic-rect program)", "drag")
    if "driver" in flags:
        soak_driver()
    if "uploads" in flags:
        soak("stream + host upload (4 B/px)", "stream-host")
        soak("stream + NV12 upload (1.5 B/px)", "stream-nv12")
    raw = soak_raw_step()
    host = soak_host_stub()
    if "quick" not in flags:
        print(f"speedup: fused {legacy / fused:.2f}x  stream "
              f"{legacy / stream:.2f}x  (stream overhead vs raw step: "
              f"{(stream / raw - 1) * 100:.0f}%; host residual "
              f"{host:.3f} ms/frame)", flush=True)
