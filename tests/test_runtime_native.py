"""Native runtime: build, queue semantics, NV12 spec, patterns.

The NumPy fallbacks define the same spec, so every function is tested in
both modes when the native library builds.
"""

import numpy as np
import pytest

from obs_color_monitor_tpu.runtime import native


def test_native_builds():
    # informational: native should build on this image (g++ present)
    assert native.available(), "native runtime failed to build"


def _nv12_golden(y, uv, cs):
    """Independent restatement of the documented NV12 spec."""
    h, w = y.shape
    coef = {1: (6537, -1605, -3330, 8263), 2: (7343, -873, -2183, 8652)}[cs]
    kr_cr, kg_cb, kg_cr, kb_cb = coef
    out = np.empty((h, w, 4), np.uint8)
    for j in range(h):
        for i in range(w):
            yp = (int(y[j, i]) - 16) * 4769
            cb = int(uv[j // 2, (i // 2) * 2]) - 128
            cr = int(uv[j // 2, (i // 2) * 2 + 1]) - 128
            out[j, i, 0] = min(max((yp + kr_cr * cr + 2048) >> 12, 0), 255)
            out[j, i, 1] = min(max((yp + kg_cb * cb + kg_cr * cr + 2048) >> 12, 0), 255)
            out[j, i, 2] = min(max((yp + kb_cb * cb + 2048) >> 12, 0), 255)
            out[j, i, 3] = 255
    return out


@pytest.mark.parametrize("cs", [1, 2])
def test_nv12_bitexact(rng, cs):
    h, w = 16, 24
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    uv = rng.integers(0, 256, (h // 2, w), dtype=np.uint8)
    want = _nv12_golden(y, uv, cs)
    got = native.nv12_to_rgba(y, uv, cs=cs)
    np.testing.assert_array_equal(got, want)


def test_nv12_gray_anchor():
    """Y=128 gray, neutral chroma -> R=G=B ~130 (limited range expansion)."""
    y = np.full((4, 4), 128, np.uint8)
    uv = np.full((2, 4), 128, np.uint8)
    out = native.nv12_to_rgba(y, uv, cs=2)
    assert out[0, 0, 0] == out[0, 0, 1] == out[0, 0, 2]
    assert abs(int(out[0, 0, 0]) - 130) <= 1
    # black (16) and white (235)
    out = native.nv12_to_rgba(np.full((2, 2), 16, np.uint8), np.full((1, 2), 128, np.uint8))
    assert out[0, 0, 0] == 0
    out = native.nv12_to_rgba(np.full((2, 2), 235, np.uint8), np.full((1, 2), 128, np.uint8))
    assert out[0, 0, 0] == 255


def test_deinterleave(rng):
    f = rng.integers(0, 256, (8, 10, 4), dtype=np.uint8)
    planes = native.deinterleave_rgba(f)
    np.testing.assert_array_equal(planes, np.moveaxis(f, -1, 0))


def test_patterns():
    for kind in ("bars", "ramp", "zoneplate"):
        f = native.pattern(kind, 64, 32, frame_idx=5)
        assert f.shape == (32, 64, 4)
        assert (f[..., 3] == 255).all()
    # successive bar frames differ (moving marker)
    a = native.pattern("bars", 64, 32, 0)
    b = native.pattern("bars", 64, 32, 1)
    assert (a != b).any()


def test_native_queue_drop_semantics():
    q = native.NativeFrameQueue(depth=2, frame_shape=(4, 4, 4))
    f = np.arange(64, dtype=np.uint8).reshape(4, 4, 4)
    assert q.push(f)
    assert q.push(f + 1)
    assert not q.push(f + 2)  # full -> dropped
    assert q.n_dropped == 1
    got = q.pop()
    np.testing.assert_array_equal(got, f)
    assert q.push(f + 3)
    q.close()
    # drain remaining after close
    assert q.pop() is not None
    assert q.pop() is not None
    assert q.pop(timeout=0.01) is None


def test_frame_sources(tmp_path, rng):
    from obs_color_monitor_tpu.pipeline.ingest import (
        NV12Source,
        PatternSource,
        RawRGBASource,
    )

    src = PatternSource(64, 32, "bars")
    frames = list(src.frames(3))
    assert len(frames) == 3 and frames[0].shape == (32, 64, 4)

    raw = tmp_path / "clip.rgba"
    data = rng.integers(0, 256, (2, 16, 8, 4), dtype=np.uint8)
    raw.write_bytes(data.tobytes())
    rs = RawRGBASource(str(raw), 8, 16)
    got = list(rs.frames())
    assert len(got) == 2
    np.testing.assert_array_equal(got[0], data[0])

    nv = tmp_path / "clip.nv12"
    y = rng.integers(0, 256, (16, 8), dtype=np.uint8)
    uv = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    nv.write_bytes(y.tobytes() + uv.tobytes())
    ns = NV12Source(str(nv), 8, 16, cs=1)
    got = list(ns.frames())
    assert len(got) == 1
    np.testing.assert_array_equal(got[0], native.nv12_to_rgba(y, uv, cs=1))


def test_nv12_high_bit_depth(tmp_path, rng):
    """10/12/16-bit NV12 layouts round-shift to the 8-bit monitoring
    domain, in both alignments: LSB-justified (plain ``bits=N``) and
    MSB-aligned 16-bit words (real P010)."""
    from obs_color_monitor_tpu.pipeline.ingest import NV12Source

    w, h = 8, 6

    def to8(a, shift):
        return np.minimum((a.astype(np.uint32) + (1 << (shift - 1))) >> shift,
                          255).astype(np.uint8)

    # LSB-justified 10-bit: value 513 -> 128, 514 -> 129, 1023 -> 255 (clip)
    y = rng.integers(0, 1 << 10, (h, w)).astype("<u2")
    uv = rng.integers(0, 1 << 10, (h // 2, w)).astype("<u2")
    y.flat[:3] = (513, 514, 1023)
    p = tmp_path / "c.yuv10"
    p.write_bytes(y.tobytes() + uv.tobytes())
    (frame,) = NV12Source(str(p), w, h, cs=2, bits=10).frames()
    want8 = to8(y, 2)
    assert (want8.flat[0], want8.flat[1], want8.flat[2]) == (128, 129, 255)
    np.testing.assert_array_equal(
        frame, native.nv12_to_rgba(want8, to8(uv, 2), cs=2)
    )

    # MSB-aligned P010: the same 10-bit values shifted into the word top;
    # both alignments must decode identically
    p2 = tmp_path / "c.p010"
    p2.write_bytes((y << 6).astype("<u2").tobytes()
                   + (uv << 6).astype("<u2").tobytes())
    (frame2,) = NV12Source(
        str(p2), w, h, cs=2, bits=10, msb_aligned=True
    ).frames()
    np.testing.assert_array_equal(frame2, frame)

    with pytest.raises(ValueError, match="bits"):
        NV12Source(str(p), w, h, bits=9)


@pytest.mark.parametrize("cs", [1, 2])
def test_nv12_device_matches_native(rng, cs):
    """Device-side NV12 ingest is bit-identical to the C++ kernel."""
    from obs_color_monitor_tpu.ops.convert import nv12_to_planes

    h, w = 32, 48
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    uv = rng.integers(0, 256, (h // 2, w), dtype=np.uint8)
    want = native.nv12_to_rgba(y, uv, cs=cs)  # (H, W, 4)
    got = np.moveaxis(np.asarray(nv12_to_planes(y, uv, cs=cs)), 0, -1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("cs", [1, 2])
def test_nv12_packed_matches_native(rng, cs):
    """The packed-u32 device decode (the zero-copy ingest form every
    route consumes) carries the same bytes as the C++ kernel's RGBA."""
    from obs_color_monitor_tpu.ops.convert import nv12_to_packed

    h, w = 24, 64
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    uv = rng.integers(0, 256, (h // 2, w), dtype=np.uint8)
    want = native.nv12_to_rgba(y, uv, cs=cs).view(np.uint32).reshape(h, w)
    got = np.asarray(nv12_to_packed(y, uv, cs=cs))
    np.testing.assert_array_equal(got, want)


def test_push_nv12_routes_match_host_decode(rng):
    """Dock.push_nv12 / scope.push_nv12 publish the same statistics as
    pushing the host-decoded RGBA frame (the decode moved on device, the
    numbers must not)."""
    from obs_color_monitor_tpu.models import Dock, Histogram

    h, w = 32, 48
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    uv = rng.integers(0, 256, (h // 2, w), dtype=np.uint8)
    rgba = native.nv12_to_rgba(y, uv, cs=2)

    d_host, d_dev = Dock(), Dock()
    d_host.push_frame(rgba)
    d_host.flush()
    d_dev.push_nv12(y, uv)
    d_dev.flush()
    np.testing.assert_array_equal(
        np.asarray(d_host.scopes["histogram"].counts()),
        np.asarray(d_dev.scopes["histogram"].counts()),
    )
    np.testing.assert_array_equal(
        np.asarray(d_host.hub.last_surface.result.vs_counts),
        np.asarray(d_dev.hub.last_surface.result.vs_counts),
    )

    s_host, s_dev = Histogram(), Histogram()
    s_host.push_frame(rgba)
    s_host._hub.tick()
    s_dev.push_nv12(y, uv)
    s_dev._hub.tick()
    np.testing.assert_array_equal(
        np.asarray(s_host.counts()), np.asarray(s_dev.counts())
    )


def test_y4m_source(tmp_path, rng):
    from obs_color_monitor_tpu.pipeline.ingest import Y4MSource

    w, h = 16, 8
    y = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)
    buf = b"YUV4MPEG2 W16 H8 F30:1 Ip A1:1 C420jpeg\n"
    for i in range(2):
        buf += b"FRAME\n" + y[i].tobytes() + u[i].tobytes() + v[i].tobytes()
    p = tmp_path / "t.y4m"
    p.write_bytes(buf)

    src = Y4MSource(str(p), cs=1)
    assert (src.width, src.height) == (16, 8)
    frames = list(src.frames())
    assert len(frames) == 2
    # matches NV12 conversion of the interleaved planes
    uv = np.empty((h // 2, w), np.uint8)
    uv[:, 0::2] = u[0]
    uv[:, 1::2] = v[0]
    np.testing.assert_array_equal(frames[0], native.nv12_to_rgba(y[0], uv, cs=1))

    bad = tmp_path / "bad.y4m"
    bad.write_bytes(b"NOTY4M\n")
    with pytest.raises(ValueError):
        Y4MSource(str(bad))


def test_native_file_reader(tmp_path, rng):
    """C++ reader thread: reads, converts, pushes with drop-on-full."""
    from obs_color_monitor_tpu.runtime.native import (
        NativeFileReader,
        NativeFrameQueue,
    )

    h, w = 8, 16
    frames = rng.integers(0, 256, (5, h, w, 4), dtype=np.uint8)
    p = tmp_path / "clip.rgba"
    p.write_bytes(frames.tobytes())

    q = NativeFrameQueue(depth=8, frame_shape=(h, w, 4))
    r = NativeFileReader(str(p), w, h, q, fmt=NativeFileReader.FORMAT_RGBA)
    import time

    t0 = time.time()
    while not r.finished and time.time() - t0 < 5:
        time.sleep(0.01)
    assert r.frames_read == 5
    got = q.pop()
    np.testing.assert_array_equal(got, frames[0])
    r.stop()

    # NV12 path converts identically to nv12_to_rgba
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    uv = rng.integers(0, 256, (h // 2, w), dtype=np.uint8)
    nv = tmp_path / "c.nv12"
    nv.write_bytes(y.tobytes() + uv.tobytes())
    q2 = NativeFrameQueue(depth=4, frame_shape=(h, w, 4))
    r2 = NativeFileReader(str(nv), w, h, q2, fmt=NativeFileReader.FORMAT_NV12, cs=1)
    t0 = time.time()
    while not r2.finished and time.time() - t0 < 5:
        time.sleep(0.01)
    np.testing.assert_array_equal(q2.pop(), native.nv12_to_rgba(y, uv, cs=1))
    r2.stop()

    # drop-on-full with a tiny queue + loop mode
    q3 = NativeFrameQueue(depth=2, frame_shape=(h, w, 4))
    r3 = NativeFileReader(str(p), w, h, q3, loop=True)
    time.sleep(0.2)
    r3.stop()
    assert q3.n_dropped > 0 and len(q3) == 2


def test_native_queue_push_size_validation():
    """An undersized frame must be rejected in Python — the C side copies
    frame_bytes unconditionally (OOB read across the ABI otherwise)."""
    import pytest

    from obs_color_monitor_tpu.runtime import NativeFrameQueue

    q = NativeFrameQueue(2, (8, 8, 4))
    if not q.is_native:
        pytest.skip("native runtime unavailable")
    with pytest.raises(ValueError, match="bytes"):
        q.push(np.zeros((8, 8, 3), np.uint8))
    assert q.push(np.zeros((8, 8, 4), np.uint8))


def test_native_queue_destroy_with_blocked_consumer():
    """ocm_queue_destroy while a consumer is blocked inside ocm_queue_pop
    must wake it, wait for it to leave, and only then free (no
    use-after-free).  The consumer calls the raw C function so the Python
    wrapper object can really be destroyed mid-wait (ctypes releases the
    GIL during the call)."""
    import ctypes
    import threading
    import time as _t

    from obs_color_monitor_tpu.runtime import NativeFrameQueue
    from obs_color_monitor_tpu.runtime import native as native_mod

    q = NativeFrameQueue(2, (4, 4, 4))
    if not q.is_native:
        import pytest

        pytest.skip("native runtime unavailable")
    lib, ptr = native_mod._load(), q._q
    out = np.empty((4, 4, 4), np.uint8)
    results = []

    def consumer():
        # blocked on the queue's cv inside the C call, holding NO Python
        # reference to the wrapper
        results.append(
            lib.ocm_queue_pop(ptr, out.ctypes.data_as(ctypes.c_char_p), 30.0)
        )

    t = threading.Thread(target=consumer, daemon=True)
    t.start()
    _t.sleep(0.2)  # let the consumer block on the cv
    del q  # __del__ -> ocm_queue_destroy: close, wake, drain waiters, free
    t.join(timeout=5.0)
    assert not t.is_alive()
    assert results == [0]  # woken by close, no frame
