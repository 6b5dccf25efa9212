"""One-program stream step (Dock.push_frame + render_async steady state).

When configs are static and only the default consumers are registered,
push_frame defers the analysis and render_async runs analyze + hub
publication + every scope render + the composite as ONE cached device
program per frame (VERDICT round-2 item 3; on a remote TPU each separate
program execution pays a round trip).  These tests pin (a) frame-by-frame
pixel AND published-statistics parity with the legacy hub route,
(b) single-program reuse, (c) interleave-skip semantics, (d) fallbacks:
custom consumers, push-without-render, bypass.
"""

import numpy as np
import pytest

from obs_color_monitor_tpu.config import DockConfig, ROIConfig
from obs_color_monitor_tpu.models import Dock


def _mk(stream=True, interleave=0, show_roi=False, rect=None):
    roi = ROIConfig(interleave=interleave, target_scale=1)
    if rect is not None:
        roi.x0, roi.y0, roi.x1, roi.y1 = rect
    dock = Dock(DockConfig(show_roi=show_roi), roi=roi)
    if not stream:
        dock._stream_fns = None  # legacy/fused only
    return dock


def _frames(n, rng, shape=(48, 96)):
    out = []
    for _ in range(n):
        f = rng.integers(0, 256, shape + (4,), dtype=np.uint8)
        f[..., 3] = 255
        out.append(f)
    return out


def _assert_scope_state_equal(a: Dock, b: Dock, msg=""):
    np.testing.assert_array_equal(
        a.histogram.counts(), b.histogram.counts(), err_msg=f"hist {msg}"
    )
    np.testing.assert_array_equal(
        a.waveform.counts(), b.waveform.counts(), err_msg=f"wv {msg}"
    )
    np.testing.assert_array_equal(
        np.asarray(a.vectorscope._read()),
        np.asarray(b.vectorscope._read()),
        err_msg=f"vs {msg}",
    )
    np.testing.assert_array_equal(
        np.asarray(a.zebra.render_image()),
        np.asarray(b.zebra.render_image()),
        err_msg=f"zebra {msg}",
    )


def test_stream_matches_legacy_frame_by_frame(rng):
    stream, legacy = _mk(), _mk(stream=False)
    for i, f in enumerate(_frames(6, rng)):
        stream.push_frame(f)
        legacy.push_frame(f)
        a = stream.render(width=128, height=600)
        b = legacy.render(width=128, height=600)
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
        _assert_scope_state_equal(stream, legacy, f"frame {i}")
    assert len(stream._stream_fns) == 1
    assert stream.hub.frames_processed == legacy.hub.frames_processed


def test_stream_with_roi_preview_and_rect(rng):
    """Static ROI rect: the rect is baked into the stream program (the hub
    route recompiles analyze per rect too); panel + stats stay identical."""
    kw = dict(show_roi=True, rect=(8, 4, 72, 40))
    stream, legacy = _mk(**kw), _mk(stream=False, **kw)
    for i, f in enumerate(_frames(4, rng)):
        stream.push_frame(f)
        legacy.push_frame(f)
        a = stream.render(width=128, height=700)
        b = legacy.render(width=128, height=700)
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
    _assert_scope_state_equal(stream, legacy)
    assert len(stream._stream_fns) == 1
    assert stream._rects == legacy._rects


def test_stream_program_reused_not_retraced(rng):
    dock = _mk()
    fs = _frames(6, rng)
    for f in fs[:3]:
        dock.push_frame(f)
        dock.render(width=128, height=600)
    assert len(dock._stream_fns) == 1
    (skey,) = dock._stream_fns
    fn, rects, wy, hy = dock._stream_fns[skey]
    calls = []

    def counting(*a):
        calls.append(1)
        return fn(*a)

    dock._stream_fns[skey] = (counting, rects, wy, hy)
    for f in fs[3:]:
        dock.push_frame(f)
        dock.render(width=128, height=600)
    assert len(calls) == 3
    assert len(dock._stream_fns) == 1


def test_stream_interleave_parity(rng):
    """interleave=1 (the reference default): every other frame is skipped;
    skipped frames re-render the published buffers (reference
    src/roi.c:266-277).  Stream route must match the hub bit-for-bit."""
    stream, legacy = _mk(interleave=1), _mk(stream=False, interleave=1)
    for i, f in enumerate(_frames(7, rng)):
        stream.push_frame(f)
        legacy.push_frame(f)
        a = stream.render(width=128, height=600)
        b = legacy.render(width=128, height=600)
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
    assert stream.hub.frames_processed == legacy.hub.frames_processed
    assert stream.hub.frames_skipped == legacy.hub.frames_skipped
    _assert_scope_state_equal(stream, legacy)


def test_push_without_render_flushes_through_hub(rng):
    """push-push-render: the unrendered frame must still be analyzed and
    published (headless consumers poll scope state between renders)."""
    stream, legacy = _mk(), _mk(stream=False)
    fs = _frames(5, rng)
    # warm up the stream route
    for f in fs[:2]:
        stream.push_frame(f)
        legacy.push_frame(f)
        stream.render(width=128, height=600)
        legacy.render(width=128, height=600)
    # two pushes, no render in between
    for f in fs[2:4]:
        stream.push_frame(f)
        legacy.push_frame(f)
    # the first of the two was flushed through the hub: published stats
    # advance identically (the second is pending analysis on the stream
    # dock and processed on the legacy dock — rendering flushes it)
    a = stream.render(width=128, height=600)
    b = legacy.render(width=128, height=600)
    np.testing.assert_array_equal(a, b)
    _assert_scope_state_equal(stream, legacy)
    assert stream.hub.frames_processed == legacy.hub.frames_processed


def test_custom_consumer_disables_stream(rng):
    """A registered non-default consumer must see every processed frame's
    surface_cb — the stream route steps aside entirely."""
    dock = _mk()
    seen = []

    class Probe:
        def needs(self):
            from obs_color_monitor_tpu.models.base import Needs

            return Needs(rgba=True)

        def surface_cb(self, surface):
            seen.append(surface.result.planes.shape)

        def tick(self, seconds=1.0 / 60.0):
            pass

    dock.hub.register(Probe())
    for f in _frames(4, rng):
        dock.push_frame(f)
        dock.render(width=128, height=600)
    assert len(seen) == 4
    assert len(dock._stream_fns) == 0


def test_bypass_disables_stream(rng):
    dock = _mk()
    fs = _frames(4, rng)
    for f in fs[:2]:
        dock.push_frame(f)
        dock.render(width=128, height=600)
    dock.waveform.config.bypass = True
    for f in fs[2:]:
        dock.push_frame(f)
        dock.render(width=128, height=600)
    # bypass needs the captured frame through the hub every frame
    assert dock.waveform._bypass_planes is not None


def test_config_change_rebuilds_stream_program(rng):
    stream, legacy = _mk(), _mk(stream=False)
    fs = _frames(5, rng)
    for f in fs[:3]:
        stream.push_frame(f)
        legacy.push_frame(f)
        stream.render(width=128, height=600)
        legacy.render(width=128, height=600)
    for d in (stream, legacy):
        d.waveform.config.intensity = 255
        d.histogram.config.logscale = True
    for i, f in enumerate(fs[3:]):
        stream.push_frame(f)
        legacy.push_frame(f)
        a = stream.render(width=128, height=600)
        b = legacy.render(width=128, height=600)
        np.testing.assert_array_equal(a, b, err_msg=f"post-change {i}")
    assert len(stream._stream_fns) == 2  # old + new key
