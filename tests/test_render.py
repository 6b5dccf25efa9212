"""Renderer checks: hand-computed anchors + structural invariants.

The bit-exactness contract covers integer statistics (golden model); the
renderers are checked against hand-derived pixels of the reference draw
shaders (data/vectorscope.effect, waveform.effect, histogram.effect).
"""

import numpy as np
import pytest

from obs_color_monitor_tpu.colorspace import Colorspace
from obs_color_monitor_tpu.config import DisplayMode, GraticuleColor, ShowKey
from obs_color_monitor_tpu.ops import render, graticule
from obs_color_monitor_tpu.utils.draw import alpha_blend_u8


def test_vectorscope_render_white():
    counts = np.zeros((256, 256), np.uint8)
    counts[10, 20] = 4  # v=10, u=20
    img = np.asarray(render.render_vectorscope(counts, intensity=25, cs=1, white=True))
    # row = 255-10 = 245, col=20; value = min(4*25,255) = 100
    assert tuple(img[245, 20]) == (100, 100, 100, 255)
    assert img[0, 0].tolist() == [0, 0, 0, 255]
    # saturation
    counts[10, 20] = 255
    img = np.asarray(render.render_vectorscope(counts, intensity=25, cs=1, white=True))
    assert tuple(img[245, 20])[:3] == (255, 255, 255)


def test_vectorscope_render_chroma_center():
    """At the exact center the tint is ~the base gray (color=0.5)."""
    counts = np.full((256, 256), 255, np.uint8)
    img = np.asarray(render.render_vectorscope(counts, intensity=255, cs=2, white=False))
    # center pixels (col 127/128, row 127/128): fu = +-1, fv = +-1 -> ~0.5*255
    c = img[127, 127].astype(int)
    assert abs(c[0] - 128) <= 2 and abs(c[1] - 128) <= 2 and abs(c[2] - 128) <= 2
    # right edge (u high): strong blue contribution via color_u
    right = img[128, 255].astype(int)
    left = img[128, 0].astype(int)
    assert right[2] > 200 and left[2] < 60  # blue grows with u
    # top edge (v high): red via color_v
    top = img[0, 128].astype(int)
    bot = img[255, 128].astype(int)
    assert top[0] > 200 and bot[0] < 60


def test_vectorscope_chroma_formula_exact():
    """Spot-check one pixel against the hand-computed shader formula."""
    counts = np.zeros((256, 256), np.uint8)
    counts[55, 200] = 10  # v=55 -> row 200; u=200 -> col 200
    img = np.asarray(render.render_vectorscope(counts, intensity=10, cs=1, white=False))
    v = min(10 * 10, 255)  # 100
    # BT601 tint: color=.5, cu=(0,-.3441,1.772), cv=(1.402,-.7141,0)
    fu = (2 * 200 + 1 - 256) / 256.0
    fv = (256 - (2 * 200 + 1)) / 256.0
    expect = []
    for c, cu, cv in ((0.5, 0.0, 1.402), (0.5, -0.3441, -0.7141), (0.5, 1.772, 0.0)):
        val = (c + cu * fu + cv * fv) * v
        expect.append(int(np.clip(round(val), 0, 255)))
    got = img[200, 200][:3].astype(int).tolist()
    assert np.abs(np.array(got) - np.array(expect)).max() <= 1  # Q12 vs float


def test_waveform_render_overlay_rgb():
    counts = np.zeros((3, 256, 8), np.uint8)
    counts[0, 100, 3] = 2  # R level 100 at column 3
    img = np.asarray(
        render.render_waveform(counts, intensity=51, display=0, n_components=3, yuv_mode=False)
    )
    assert img.shape == (256, 8, 4)
    assert tuple(img[255 - 100, 3]) == (102, 0, 0, 255)


def test_waveform_render_overlay_yuv_luma_is_green():
    """Luma-only waveform renders green (reference byte-1 position)."""
    counts = np.zeros((3, 256, 4), np.uint8)
    counts[0, 200, 1] = 5  # Y channel (our c0)
    img = np.asarray(
        render.render_waveform(counts, intensity=51, display=0, n_components=1, yuv_mode=True)
    )
    assert tuple(img[55, 1]) == (0, 255, 0, 255)


def test_waveform_render_stack_parade():
    counts = np.zeros((3, 256, 8), np.uint8)
    counts[1, 0, 0] = 255  # G level 0, col 0
    stack = np.asarray(
        render.render_waveform(counts, intensity=255, display=1, n_components=3, yuv_mode=False)
    )
    assert stack.shape == (768, 8, 4)
    # G band is band 1 (rows 256..511); level 0 -> band row 255 -> abs 511
    assert tuple(stack[511, 0]) == (0, 255, 0, 255)
    parade = np.asarray(
        render.render_waveform(counts, intensity=255, display=2, n_components=3, yuv_mode=False)
    )
    assert parade.shape == (256, 24, 4)
    assert tuple(parade[255, 8]) == (0, 255, 0, 255)


def test_waveform_stack_tint():
    counts = np.zeros((3, 256, 4), np.uint8)
    counts[0, 10, 2] = 255
    img = np.asarray(
        render.render_waveform(counts, intensity=255, display=1, n_components=3, yuv_mode=False)
    )
    # R band tint row (1.0, 0.41, 0.41) * 255
    assert tuple(img[245, 2][:3]) == (255, 105, 105)


def test_histogram_render_overlay():
    levels = np.zeros((3, 256), np.float32)
    levels[0, 10] = 50.0
    hi = np.array([100.0, 1.0, 1.0], np.float32)
    img = np.asarray(
        render.render_histogram(levels, hi, level_height=200, display=0, n_components=3, yuv_mode=False)
    )
    assert img.shape == (200, 256, 4)
    col = img[:, 10, 0]
    # fill where 50 >= (1-(row+.5)/200)*100  -> row >= 99.5 -> rows 100..199
    assert col[99] == 0 and col[100] == 255 and col[199] == 255
    # empty bins stay dark except bottom row (level 0 >= ~0 threshold edge)
    assert img[0, 0, 0] == 0


def test_histogram_render_stack():
    levels = np.full((3, 256), 1.0, np.float32)
    hi = np.ones(3, np.float32)
    img = np.asarray(
        render.render_histogram(levels, hi, level_height=100, display=1, n_components=3, yuv_mode=False)
    )
    assert img.shape == (300, 256, 4)
    # full bars everywhere; band tints
    assert tuple(img[0, 0][:3]) == (255, 105, 105)
    assert tuple(img[100, 0][:3]) == (0, 255, 0)
    assert tuple(img[200, 0][:3]) == (135, 135, 255)


def test_blend_overlay_matches_golden(small_frame):
    ov = np.zeros_like(small_frame)
    ov[10:20, 10:20] = (255, 191, 0, 128)
    want = alpha_blend_u8(small_frame, ov)
    got = np.asarray(render.blend_overlay(small_frame, ov))
    np.testing.assert_array_equal(got, want)


def test_zoom_center():
    img = np.arange(256 * 256 * 4, dtype=np.uint8).reshape(256, 256, 4)
    out = np.asarray(render.zoom_center(img, zoom=2.0))
    assert out.shape == img.shape
    # center preserved: output center pixel samples source center
    assert (out[128, 128] == img[128, 128]).all() or (out[128, 128] == img[127, 127]).all()
    # zoom=1 identity
    np.testing.assert_array_equal(np.asarray(render.zoom_center(img, zoom=1.0)), img)


def test_vectorscope_graticule_overlay():
    ov = graticule.vectorscope_graticule(
        int(GraticuleColor.AMBER_IQ), 0x0054FF, int(Colorspace.BT709)
    )
    assert ov.shape == (256, 256, 4)
    drawn = ov[..., 3] > 0
    assert drawn.sum() > 200  # boxes + labels + lines
    assert (ov[drawn][:, :3] == (255, 191, 0)).all()
    # none
    assert graticule.vectorscope_graticule(0, 0x0054FF, 1) is None
    # green variant
    ov_g = graticule.vectorscope_graticule(2, 0x0054FF, 1)
    drawn_g = ov_g[..., 3] > 0
    assert (ov_g[drawn_g][:, :3] == (0, 255, 0)).all()


def test_waveform_graticule_lines():
    ov = graticule.waveform_graticule(5, 64, int(DisplayMode.OVERLAY), 3)
    assert ov.shape == (256, 64, 4)
    rows = np.nonzero((ov[..., 3] > 0).any(axis=1))[0]
    # lines at 256*i/5 = 0,51,102,153,204,(255 clamped)
    assert 51 in rows and 102 in rows
    stack = graticule.waveform_graticule(5, 64, int(DisplayMode.STACK), 3)
    assert stack.shape == (768, 64, 4)
    assert graticule.waveform_graticule(0, 64, 0, 3) is None


def test_histogram_graticule():
    ov = graticule.histogram_graticule(5, -1.0, 200, 0, 3, 0, 0, False)
    assert ov.shape == (200, 256, 4)
    cols = np.nonzero((ov[..., 3] > 0).any(axis=0))[0]
    assert len(cols) >= 5
    # horizontal lines with fixed level: step 500 of 1000 -> 3 lines
    ov2 = graticule.histogram_graticule(0, 500.0, 200, 0, 3, 1000, 0, False)
    rows = np.nonzero((ov2[..., 3] > 0).any(axis=1))[0]
    assert len(rows) == 3
    assert graticule.histogram_graticule(0, -1.0, 200, 0, 3, 0, 0, False) is None


@pytest.mark.parametrize("key", [ShowKey.LEFT, ShowKey.OUTSIDE, ShowKey.BELOW, ShowKey.TOP])
def test_falsecolor_key_overlay(key):
    ov = graticule.falsecolor_key_overlay(key, 320, 180, Colorspace.BT709)
    w, h = graticule.key_canvas_size(key, 320, 180)
    assert ov.shape == (h, w, 4)
    assert (ov[..., 3] > 0).sum() > 50
    assert graticule.falsecolor_key_overlay(ShowKey.NONE, 320, 180, Colorspace.BT709) is None


def test_histogram_step_choices():
    """1/2/5 ladder between bounds (reference histogram.c:196-215)."""
    ch = graticule.histogram_step_choices(50.0 / 64, 32768.0)
    assert ch[0] == -1.0
    assert 1.0 in ch and 2.0 in ch and 5.0 in ch and 20000.0 in ch
    assert all(c <= 32768.0 for c in ch[1:])
    assert all(c >= 50.0 / 64 for c in ch[1:])
    ch2 = graticule.histogram_step_choices(1.0 / 64, 50.0)
    assert 0.02 in ch2 and 50.0 in ch2


def test_colorspace_auto_default():
    from obs_color_monitor_tpu.colorspace import (
        Colorspace,
        calc_colorspace,
        set_default_video_colorspace,
    )

    assert calc_colorspace(Colorspace.AUTO) == Colorspace.BT709
    set_default_video_colorspace(Colorspace.BT601)
    try:
        assert calc_colorspace(0) == Colorspace.BT601
        assert calc_colorspace(2) == Colorspace.BT709  # explicit wins
        with pytest.raises(ValueError):
            set_default_video_colorspace(Colorspace.AUTO)
    finally:
        set_default_video_colorspace(Colorspace.BT709)


def test_waveform_render_stackuv_paradeuv():
    """n=2 (Chroma) uses the UV variants: bands .x (V, red tint) and .z
    (U, blue tint) — reference waveform.effect:55-83 + BGRA order."""
    counts = np.zeros((3, 256, 4), np.uint8)  # (Y, U, V) planes
    counts[1, 30, 0] = 255  # U level 30 at col 0
    counts[2, 200, 1] = 255  # V level 200 at col 1
    img = np.asarray(
        render.render_waveform(counts, intensity=255, display=1, n_components=2, yuv_mode=True)
    )
    assert img.shape == (512, 4, 4)
    # top band = display channel 0 = V (red tint row (1,.41,.41))
    assert tuple(img[255 - 200, 1][:3]) == (255, 105, 105)
    # bottom band = display channel 2 = U (blue tint row (.53,.53,1))
    assert tuple(img[256 + 255 - 30, 0][:3]) == (135, 135, 255)
    parade = np.asarray(
        render.render_waveform(counts, intensity=255, display=2, n_components=2, yuv_mode=True)
    )
    assert parade.shape == (256, 8, 4)
    assert tuple(parade[255 - 200, 1][:3]) == (255, 105, 105)  # V left
    assert tuple(parade[255 - 30, 4][:3]) == (135, 135, 255)  # U right


def test_histogram_render_uv_stack():
    levels = np.zeros((3, 256), np.float32)  # (Y, U, V)
    levels[1, :] = 1.0  # U full
    hi = np.ones(3, np.float32)
    img = np.asarray(
        render.render_histogram(levels, hi, level_height=100, display=1, n_components=2, yuv_mode=True)
    )
    assert img.shape == (200, 256, 4)
    # top band = V (empty -> black), bottom = U (full, blue tint)
    assert tuple(img[0, 0][:3]) == (0, 0, 0)
    assert tuple(img[100, 0][:3]) == (135, 135, 255)


def test_vectorscope_zoom_formula():
    """zoom *= exp(dy * 5e-4), floored at 1 (reference vectorscope.c:473-482)."""
    from obs_color_monitor_tpu.models import Vectorscope

    vs = Vectorscope()
    vs.zoom_by(1386.3)  # exp(0.69315) ~ 2
    assert abs(vs.config.zoom - 2.0) < 1e-3
    vs.zoom_by(-1e6)
    assert vs.config.zoom == 1.0
