"""Video output sinks: Y4M recording, the ffmpeg encoder gate, CLI wiring.

The reference's output surface is OBS's own display/record path; the
standalone analog records rendered panels to .y4m (natively) or through
the system ffmpeg (`pipeline.sinks`).  The Y4M round trip must close:
what `Y4MSink` writes, `ingest.Y4MSource` reads back to within
limited-range quantization, using the same cs convention (1=BT.601,
2=BT.709) as the native decode kernel.
"""

import numpy as np
import pytest

from obs_color_monitor_tpu.__main__ import main
from obs_color_monitor_tpu.pipeline.ingest import Y4MSource
from obs_color_monitor_tpu.pipeline.sinks import (
    _FWD,
    FFmpegSink,
    RecordingTee,
    Y4MSink,
    ffmpeg_sink_cmd,
    open_video_sink,
    rgb_to_yuv_limited,
)


# ---------------------------------------------------------------------------
# forward conversion
# ---------------------------------------------------------------------------


def test_forward_matrix_rows():
    """Chroma rows sum to 0 (gray -> exactly 128) and Y rows to
    round(219/255 * 4096) = 3518, the inverse of the decoder's ky=4769."""
    for cs, (ky, kcb, kcr) in _FWD.items():
        assert sum(kcb) == 0 and sum(kcr) == 0, cs
        assert sum(ky) == 3518, cs


@pytest.mark.parametrize("cs", [1, 2])
def test_gray_maps_to_neutral_chroma(cs):
    frame = np.full((4, 8, 4), 0, np.uint8)
    for i, v in enumerate((0, 77, 128, 255)):
        frame[i] = v
    y, u, v = rgb_to_yuv_limited(frame, cs=cs)
    np.testing.assert_array_equal(u, 128)
    np.testing.assert_array_equal(v, 128)
    # black row -> Y=16, white row -> Y=235 (studio range endpoints)
    assert y[0].max() == 16 and y[3].min() == 235


def test_forward_studio_range(rng):
    frame = rng.integers(0, 256, (32, 48, 4), np.uint8)
    y, u, v = rgb_to_yuv_limited(frame, cs=2)
    assert y.min() >= 16 and y.max() <= 235
    assert u.min() >= 16 and u.max() <= 240
    assert v.min() >= 16 and v.max() <= 240


def test_forward_rejects_bad_cs():
    with pytest.raises(ValueError):
        rgb_to_yuv_limited(np.zeros((2, 2, 4), np.uint8), cs=0)


# ---------------------------------------------------------------------------
# Y4M sink
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cs", [1, 2])
def test_y4m_roundtrip(tmp_path, rng, cs):
    """write -> read reproduces the input to within limited-range
    quantization (C444 keeps the sink spatially lossless, so the only
    loss is the 219/224-step level quantization both ways)."""
    w, h = 33, 17  # odd dims: C444 has no subsampling constraint
    frames = [rng.integers(0, 256, (h, w, 4), np.uint8) for _ in range(3)]
    p = tmp_path / "rec.y4m"
    with Y4MSink(str(p), w, h, fps=29.97, cs=cs) as sink:
        for f in frames:
            sink.write(f)
    assert sink.n_written == 3

    src = Y4MSource(str(p), cs=cs)
    assert (src.width, src.height) == (w, h)
    back = list(src.frames())
    assert len(back) == 3
    for f, b in zip(frames, back):
        err = np.abs(f[..., :3].astype(int) - b[..., :3].astype(int))
        assert err.max() <= 4, err.max()
        assert err.mean() < 1.5
        np.testing.assert_array_equal(b[..., 3], 255)


def test_y4m_header_fraction_fps(tmp_path):
    p = tmp_path / "r.y4m"
    Y4MSink(str(p), 8, 4, fps=23.976).close()
    hdr = open(p, "rb").readline().decode()
    assert hdr.startswith("YUV4MPEG2 W8 H4 F")
    num, den = hdr.split(" F")[1].split()[0].split(":")
    assert abs(int(num) / int(den) - 23.976) < 1e-3
    assert " C444" in hdr


def test_y4m_sink_rejects_wrong_geometry(tmp_path):
    with Y4MSink(str(tmp_path / "r.y4m"), 8, 4) as sink:
        with pytest.raises(ValueError):
            sink.write(np.zeros((5, 8, 4), np.uint8))
        with pytest.raises(ValueError):
            sink.write(np.zeros((4, 8, 4), np.float32))
    with pytest.raises(ValueError):
        Y4MSink(str(tmp_path / "r2.y4m"), 0, 4)
    with pytest.raises(ValueError):
        Y4MSink(str(tmp_path / "r3.y4m"), 8, 4, cs=3)


def test_y4m_accepts_rgb_without_alpha(tmp_path, rng):
    p = tmp_path / "rgb.y4m"
    f = rng.integers(0, 256, (4, 8, 3), np.uint8)
    with Y4MSink(str(p), 8, 4) as sink:
        sink.write(f)
    (back,) = Y4MSource(str(p), cs=2).frames()
    assert back.shape == (4, 8, 4)


# ---------------------------------------------------------------------------
# ffmpeg sink gate / dispatch
# ---------------------------------------------------------------------------


def _have_ffmpeg():
    import shutil

    return shutil.which("ffmpeg") is not None


def test_open_video_sink_dispatch(tmp_path):
    s = open_video_sink(str(tmp_path / "a.y4m"), 8, 4)
    assert isinstance(s, Y4MSink)
    s.close()
    if not _have_ffmpeg():
        with pytest.raises(RuntimeError, match="ffmpeg"):
            open_video_sink(str(tmp_path / "a.mp4"), 8, 4)


@pytest.mark.skipif(not _have_ffmpeg(), reason="no system ffmpeg")
def test_ffmpeg_sink_encodes(tmp_path, rng):
    p = tmp_path / "a.mp4"
    with FFmpegSink(str(p), 32, 16, fps=30.0) as sink:
        for _ in range(4):
            sink.write(rng.integers(0, 256, (16, 32, 4), np.uint8))
    assert p.stat().st_size > 0


def test_ffmpeg_cmd_pins_output_format():
    """For rgba input libx264 would pick yuv444p (High 4:4:4 — refused by
    most players/hardware decoders); the sink always pins yuv420p (odd
    dims are padded to even in the filter chain) and tags/converts with
    the cs the caller asked for."""
    cmd = ffmpeg_sink_cmd("o.mp4", 128, 64, 30.0, cs=2)
    assert cmd[cmd.index("-pix_fmt", cmd.index("pipe:0")) + 1] == "yuv420p"
    assert cmd[cmd.index("-colorspace") + 1] == "bt709"
    assert "scale=out_color_matrix=bt709:out_range=tv" in cmd
    # even dims: no pad stage in the filter chain
    assert "pad=" not in cmd[cmd.index("-vf") + 1]
    # BT.601 tags
    cmd601 = ffmpeg_sink_cmd("o.mp4", 128, 64, 30.0, cs=1)
    assert cmd601[cmd601.index("-colorspace") + 1] == "smpte170m"
    # odd dims: padded to even so yuv420p is still pinned
    codd = ffmpeg_sink_cmd("o.mp4", 33, 17, 30.0)
    assert codd[codd.index("-pix_fmt", codd.index("pipe:0")) + 1] == "yuv420p"
    assert "pad=ceil(iw/2)*2:ceil(ih/2)*2" in codd[codd.index("-vf") + 1]
    # caller overrides come last so they win
    cx = ffmpeg_sink_cmd("o.mp4", 128, 64, 30.0, extra_args=["-pix_fmt", "yuv422p"])
    last = max(i for i, a in enumerate(cx) if a == "-pix_fmt")
    assert cx[last + 1] == "yuv422p"


# ---------------------------------------------------------------------------
# recording tee
# ---------------------------------------------------------------------------


def test_y4m_source_parses_fps(tmp_path):
    p = tmp_path / "r.y4m"
    Y4MSink(str(p), 8, 4, fps=60.0).close()
    assert Y4MSource(str(p), cs=2).fps == 60.0


def test_recording_tee_source_rate(tmp_path, capsys):
    """The tee labels the recording at the SOURCE's rate (a 60 fps input
    must not come back labeled 30 fps), unless --fps overrides."""
    src_p = tmp_path / "in.y4m"
    Y4MSink(str(src_p), 8, 4, fps=60.0).close()
    src = Y4MSource(str(src_p), cs=2)

    rec = tmp_path / "rec.y4m"
    tee = RecordingTee(str(rec), 0.0, src, cs=2)
    assert tee.fps == 60.0
    tee.write(np.zeros((4, 8, 4), np.uint8))
    tee.close()
    assert "video: 1 frames" in capsys.readouterr().out
    assert Y4MSource(str(rec), cs=2).fps == 60.0
    # explicit --fps wins over the source rate
    assert RecordingTee(str(rec), 24.0, src, cs=2).fps == 24.0
    # sources without a rate fall back to 30
    assert RecordingTee(str(rec), 0.0, object(), cs=2).fps == 30.0


def test_recording_tee_close_error_modes(tmp_path, monkeypatch, capsys):
    """close(raise_errors=False) downgrades a failing sink close to a
    stderr note (finally-block semantics: never mask the loop's own
    exception); raise_errors=True propagates it."""
    from obs_color_monitor_tpu.pipeline import sinks as sinks_mod

    class BoomSink:
        n_written = 0

        def write(self, img):
            self.n_written += 1

        def close(self):
            raise RuntimeError("ffmpeg exited with status 1")

    monkeypatch.setattr(
        sinks_mod, "open_video_sink", lambda *a, **k: BoomSink()
    )
    tee = RecordingTee(str(tmp_path / "x.mp4"), 30.0, None, cs=2)
    tee.write(np.zeros((4, 8, 4), np.uint8))
    tee.close(raise_errors=False)  # must not raise
    assert "video sink close failed" in capsys.readouterr().err
    tee2 = RecordingTee(str(tmp_path / "y.mp4"), 30.0, None, cs=2)
    tee2.write(np.zeros((4, 8, 4), np.uint8))
    with pytest.raises(RuntimeError, match="ffmpeg exited"):
        tee2.close()
    # closing an never-opened tee is a no-op
    RecordingTee(str(tmp_path / "z.mp4"), 30.0, None, cs=2).close()


# ---------------------------------------------------------------------------
# CLI wiring
# ---------------------------------------------------------------------------


def test_cli_dock_out_video(tmp_path):
    out = tmp_path / "dock.png"
    vid = tmp_path / "dock.y4m"
    rc = main([
        "dock", "--pattern", "bars", "--size", "192x108",
        "--frames", "4", "--interleave", "0",
        "--out", str(out), "--out-video", str(vid),
        "--out-width", "128", "--out-height", "384",
    ])
    assert rc == 0
    src = Y4MSource(str(vid), cs=2)
    assert (src.width, src.height) == (128, 384)
    frames = list(src.frames())
    assert len(frames) == 4
    # the recorded panel is the rendered dock, not blank
    assert np.asarray(frames[-1])[..., :3].std() > 1
    assert out.exists()


def test_cli_dock_out_video_one_program(tmp_path):
    """--out-video also records on the one-program (make_dock_step)
    route, where a panel is rendered per frame anyway."""
    vid = tmp_path / "dock1p.y4m"
    rc = main([
        "dock", "--pattern", "ramp", "--size", "192x108",
        "--frames", "3", "--one-program",
        "--out", str(tmp_path / "d.png"), "--out-video", str(vid),
        "--out-width", "128", "--out-height", "384",
    ])
    assert rc == 0
    assert len(list(Y4MSource(str(vid), cs=2).frames())) == 3


def test_cli_live_out_video_tee(tmp_path, capsys):
    """--out-video on the --live route records what the MJPEG server
    publishes (the recording tee, both for dock and per-scope views)."""
    vid = tmp_path / "live.y4m"
    rc = main([
        "scope", "zebra", "--pattern", "bars", "--size", "64x48",
        "--frames", "3", "--live", "--port", "0", "--fps", "240",
        "--out", str(tmp_path / "z.png"), "--out-video", str(vid),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "published 3" in out
    assert "video: 3 frames" in out
    assert len(list(Y4MSource(str(vid), cs=2).frames())) == 3


def test_cli_scope_out_video(tmp_path):
    vid = tmp_path / "vs.y4m"
    rc = main([
        "scope", "vectorscope", "--pattern", "ramp", "--size", "160x90",
        "--frames", "3", "--out", str(tmp_path / "vs.png"),
        "--out-video", str(vid),
    ])
    assert rc == 0
    src = Y4MSource(str(vid), cs=2)
    assert (src.width, src.height) == (256, 256)
    assert len(list(src.frames())) == 3
