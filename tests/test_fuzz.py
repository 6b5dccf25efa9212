"""Shape/config fuzz: odd sizes through every kernel, random dock configs.

The reference only ever sees OBS-canvas sizes; a standalone framework must
hold for arbitrary frames (tiling/padding edge cases are where bit-exactness
bugs hide).
"""

import numpy as np
import pytest

from obs_color_monitor_tpu import golden
from obs_color_monitor_tpu.colorspace import Colorspace
from obs_color_monitor_tpu.config import (
    Components,
    DisplayMode,
    DockConfig,
    LevelMode,
    ROIConfig,
)
from obs_color_monitor_tpu.models import Dock
from obs_color_monitor_tpu.ops import pallas_stats, stats
from obs_color_monitor_tpu.ops.fused import analyze

SHAPES = [(1, 1), (7, 3), (8, 128), (31, 257), (130, 96), (257, 129)]


@pytest.mark.parametrize("shape", SHAPES)
def test_stats_odd_shapes_bitexact(rng, shape):
    h, w = shape
    f = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    f[..., 3] = np.where(rng.random((h, w)) < 0.2, 0, 255)
    yuv = golden.rgb_to_yuv_u8(f, Colorspace.BT601)
    res = analyze(
        f,
        cs=1,
        need_vs=True,
        need_wv_rgb=True,
        need_hi_rgb=True,
        backend="xla",
    )
    np.testing.assert_array_equal(
        np.asarray(res.vs_counts), golden.vectorscope_counts(yuv)
    )
    np.testing.assert_array_equal(
        np.asarray(res.wv_rgb), golden.waveform_counts(f, None, Components.RGB)
    )
    np.testing.assert_array_equal(
        np.asarray(res.hi_rgb), golden.histogram_counts(f, None, Components.RGB)
    )


@pytest.mark.parametrize("shape", [(1, 1), (31, 257), (130, 96)])
def test_pallas_odd_shapes_bitexact(rng, shape):
    import os

    interpret = not bool(os.environ.get("OCM_TEST_TPU"))
    h, w = shape
    f = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    f[..., 3] = np.where(rng.random((h, w)) < 0.2, 0, 255)
    yuv = golden.rgb_to_yuv_u8(f, Colorspace.BT709)
    vs, wv = pallas_stats.fused_vs_wv_pallas_i32(
        np.moveaxis(f[..., :3], -1, 0),
        np.moveaxis(yuv, -1, 0),
        f[..., 3] != 0,
        interpret=interpret,
    )
    np.testing.assert_array_equal(
        np.minimum(np.asarray(vs), 255).astype(np.uint8),
        golden.vectorscope_counts(yuv),
    )
    np.testing.assert_array_equal(
        np.minimum(np.asarray(wv), 255).astype(np.uint8),
        golden.waveform_counts(f, None, Components.RGB),
    )


def test_frame_smaller_than_scale_skipped(rng):
    """Reference returns without staging when scaled size is 0
    (src/common.c:251-254)."""
    from obs_color_monitor_tpu.models import CaptureHub, Histogram
    from obs_color_monitor_tpu.config import HistogramConfig

    hub = CaptureHub(ROIConfig(target_scale=16, interleave=0))
    his = Histogram(HistogramConfig())
    hub.register(his)
    hub.tick()
    tiny = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    assert hub.process(tiny) is None
    assert hub.frames_skipped == 1
    assert his.counts() is None


def test_random_dock_configs(rng):
    """Random settings through the dock: shapes sane, no crashes."""
    for trial in range(3):
        dock = Dock(
            DockConfig(
                show_roi=bool(rng.integers(2)),
                show_vectorscope=bool(rng.integers(2)),
                show_waveform=True,
                show_histogram=bool(rng.integers(2)),
            ),
            roi=ROIConfig(target_scale=int(rng.integers(1, 4)), interleave=0),
        )
        dock.waveform.update(
            display=DisplayMode(int(rng.integers(3))),
            components=[Components.RGB, Components.Y, Components.UV, Components.YUV][
                int(rng.integers(4))
            ],
        )
        dock.histogram.update(
            level_mode=LevelMode(int(rng.integers(3))),
            logscale=bool(rng.integers(2)),
        )
        f = rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)
        f[..., 3] = 255
        dock.push_frame(f)
        dock.push_frame(f)
        img = dock.render(width=200, height=800)
        assert img.shape == (800, 200, 4)


def test_fused_combo_yuv_mode_bitexact(rng):
    """VS + YUV-mode waveform take the fused kernel path too."""
    f = rng.integers(0, 256, (64, 96, 4), dtype=np.uint8)
    f[..., 3] = 255
    yuv = golden.rgb_to_yuv_u8(f, Colorspace.BT601)
    res = analyze(
        f, cs=1, need_vs=True, need_wv_yuv=True, need_hi_yuv=True, backend="xla"
    )
    np.testing.assert_array_equal(
        np.asarray(res.wv_yuv), golden.waveform_counts(f, yuv, Components.YUV)
    )
    np.testing.assert_array_equal(
        np.asarray(res.hi_yuv), golden.histogram_counts(f, yuv, Components.YUV)
    )
    np.testing.assert_array_equal(
        np.asarray(res.vs_counts), golden.vectorscope_counts(yuv)
    )


def test_dock_step_overlays_on_capture(rng):
    """Dock-parity: overlays run on the scaled capture
    (reference dock points every scope at the ROI source)."""
    from obs_color_monitor_tpu.dock_step import make_dock_step

    f = rng.integers(0, 256, (64, 128, 4), dtype=np.uint8)
    f[..., 3] = 255
    step = make_dock_step(64, 128, scale=2, out_width=128, out_height=900)
    out = step(f, np.float32(0.0))
    assert out.panel.shape == (900, 128, 4)
    step_full = make_dock_step(
        64, 128, scale=2, out_width=128, out_height=900, overlays_on_capture=False
    )
    out2 = step_full(f, np.float32(0.0))
    assert out2.panel.shape == (900, 128, 4)


def test_full_step_nv12_input(rng):
    """NV12 ingest variant of the full step matches the RGBA path."""
    from obs_color_monitor_tpu.api import make_full_step
    from obs_color_monitor_tpu.colorspace import Colorspace
    from obs_color_monitor_tpu.runtime import native

    h, w = 64, 96
    y = rng.integers(16, 236, (h, w), dtype=np.uint8)
    uv = rng.integers(16, 240, (h // 2, w), dtype=np.uint8)
    rgba = native.nv12_to_rgba(y, uv, cs=2)

    s_nv = make_full_step(h, w, cs=Colorspace.BT709, scale=1, input_format="nv12")
    s_rgba = make_full_step(h, w, cs=Colorspace.BT709, scale=1)
    out_nv = s_nv((y, uv), np.float32(0.0))
    out_rgba = s_rgba(rgba, np.float32(0.0))
    np.testing.assert_array_equal(
        np.asarray(out_nv.vs_counts), np.asarray(out_rgba.vs_counts)
    )
    np.testing.assert_array_equal(
        np.asarray(out_nv.hi_counts), np.asarray(out_rgba.hi_counts)
    )
    np.testing.assert_array_equal(
        np.asarray(out_nv.zebra), np.asarray(out_rgba.zebra)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_frame_pipeline_vs_golden_direct(rng, seed):
    """The two-kernel pipeline (interpret) vs the golden model DIRECTLY —
    random shape/scale/colorspace/alpha, stats AND all three overlays
    (elsewhere the pipeline is verified transitively via the ingest
    kernels; this pins it to the spec itself)."""
    import jax.numpy as jnp

    from obs_color_monitor_tpu.colorspace import Colorspace
    from obs_color_monitor_tpu.golden import reference as gref
    from obs_color_monitor_tpu.ops.pallas_pipeline import frame_pipeline

    r = np.random.default_rng(1000 + seed)
    h4 = int(r.integers(10, 200))
    w4 = int(r.integers(10, 300))
    scale = int(r.choice([1, 2]))
    if h4 // scale < 1 or w4 // scale < 1:
        scale = 1
    cs = int(r.choice([1, 2]))
    zb_cs = int(r.choice([1, 2]))
    fc_cs = int(r.choice([1, 2]))
    tm = float(r.uniform(0, 12))
    th_lo, th_hi = sorted(float(x) for x in r.uniform(0, 1, 2))
    pk_th_f = float(r.uniform(0.01, 0.3))
    pk_col_f = (1.0, float(r.uniform(0, 1)), 0.0, 1.0)
    pk_u8 = gref.quantize_unorm8(np.asarray(pk_col_f, np.float32))
    f = r.integers(0, 256, (h4, w4, 4), np.uint8)
    f[..., 3] = np.where(r.random((h4, w4)) < 0.3, 0, 255)  # sparse alpha-0

    planes = jnp.asarray(np.moveaxis(f, -1, 0).copy())
    vs, wv, ds, zb, fc, fp = frame_pipeline(
        planes, jnp.float32(tm), cs=cs, scale=scale,
        th_low=th_lo, th_high=th_hi, zb_cs=zb_cs, fc_cs=fc_cs,
        peak_th=gref.peaking_threshold_fixed(pk_th_f),
        peak_rgba=tuple(int(x) for x in pk_u8),
        interpret=True,
    )
    scaled = golden.downscale(f, scale)
    yuv = golden.rgb_to_yuv_u8(scaled, Colorspace(cs))
    np.testing.assert_array_equal(
        np.asarray(vs).clip(0, 255).astype(np.uint8),
        golden.vectorscope_counts(yuv),
    )
    np.testing.assert_array_equal(
        np.asarray(wv).clip(0, 255).astype(np.uint8),
        golden.waveform_counts(scaled, None, Components.RGB),
    )
    np.testing.assert_array_equal(np.moveaxis(np.asarray(ds), 0, -1), scaled)
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(zb), 0, -1),
        golden.zebra(f, th_lo, th_hi, tm, Colorspace(zb_cs)),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(fc), 0, -1),
        golden.falsecolor(f, Colorspace(fc_cs)),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(fp), 0, -1),
        golden.focus_peaking(f, pk_th_f, pk_col_f),
    )


@pytest.mark.parametrize("comp", [0x04, 0x03, 0x20, 0x60, 0x50])
def test_partial_components_pallas_path(rng, comp):
    """Partial component masks (R-only, G+B, Y-only, Y|V, U|V) through the
    PIPELINE kernel + the device-side channel select, with alpha-0 pixels.

    Pins the apply-select-AFTER-saturation device order against the golden
    model's zero-BEFORE-counting order: equivalent because disabled
    channels are zeroed rather than summed (VERDICT r2 weak-4)."""
    import os

    import jax.numpy as jnp

    from obs_color_monitor_tpu.ops.pallas_pipeline import frame_pipeline
    from obs_color_monitor_tpu.ops.stats import apply_channel_select

    comp = Components(comp)
    h, w = 40, 72
    f = rng.integers(0, 256, (h, w, 4), np.uint8)
    f[..., 3] = np.where(rng.random((h, w)) < 0.3, 0, 255)
    yuv_fam = comp.is_yuv
    planes = jnp.asarray(np.moveaxis(f, -1, 0).copy())
    interpret = not bool(os.environ.get("OCM_TEST_TPU"))
    vs, wv_i32, ds, _, _, _ = frame_pipeline(
        planes, 0.0, cs=2, scale=1, yuv_data=yuv_fam, with_overlays=False,
        interpret=interpret,
    )
    sel = comp.channel_select()
    wv = apply_channel_select(jnp.minimum(wv_i32, 255).astype(jnp.uint8), sel)
    hi = apply_channel_select(pallas_stats.histogram_from_waveform(wv_i32), sel)
    yuv = golden.rgb_to_yuv_u8(f, Colorspace.BT709)
    fam = yuv if yuv_fam else None
    np.testing.assert_array_equal(
        np.asarray(wv), golden.waveform_counts(f, fam, comp)
    )
    np.testing.assert_array_equal(
        np.asarray(hi), golden.histogram_counts(f, fam, comp)
    )


def test_composite_cache_bounded_under_live_resize(rng):
    """An actual_size focus-peaking dock being live-resized churns
    _composite_fns (the key includes crop offsets); the cache must stay
    bounded and keep rendering (VERDICT r2 weak-5)."""
    from obs_color_monitor_tpu.config import FocusPeakingConfig

    dock = Dock(
        DockConfig(
            show_vectorscope=False, show_waveform=False, show_histogram=False,
            show_zebra=False, show_falsecolor=False, show_focuspeaking=True,
        ),
        roi=ROIConfig(interleave=0, target_scale=1),
        focuspeaking=FocusPeakingConfig(actual_size=True),
    )
    f = rng.integers(0, 256, (64, 96, 4), dtype=np.uint8)
    f[..., 3] = 255
    dock.push_frame(f)
    for i in range(40):
        img = dock.render(width=40 + i, height=30 + i)
        assert img.shape == (30 + i, 40 + i, 4)
        assert len(dock._composite_fns) <= 33
        assert len(dock._fused_render_fns) <= 9


def test_packed_u32_input_parity(rng):
    """The zero-copy (H, W) u32 packed frame form must match the (H, W, 4)
    u8 form bit-for-bit on every entry point: make_full_step
    (input_format="packed"), make_dock_step (auto-detected), the dynamic-ROI
    step, and the model layer (CaptureHub.process).  The packed view is the
    fast serving form — identical memory, no per-frame relayout (xprof r3,
    doc/performance.md)."""
    import jax.numpy as jnp

    from obs_color_monitor_tpu.api import make_full_step
    from obs_color_monitor_tpu.colorspace import Colorspace
    from obs_color_monitor_tpu.config import DockConfig
    from obs_color_monitor_tpu.dock_step import make_dock_step

    h, w = 48, 64
    rgba = rng.integers(0, 256, (h, w, 4), np.uint8)
    rgba[rng.random((h, w)) < 0.1, 3] = 0
    packed = rgba.view(np.uint32).reshape(h, w)

    s1 = make_full_step(h, w, cs=Colorspace.BT709, scale=2)
    s2 = make_full_step(h, w, cs=Colorspace.BT709, scale=2,
                        input_format="packed")
    a, b = s1(rgba, np.float32(1.0)), s2(packed, np.float32(1.0))
    for name in a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )

    d1 = make_dock_step(h, w, scale=2, out_width=128, out_height=700)
    o1, o2 = d1(rgba, np.float32(0.5)), d1(packed, np.float32(0.5))
    np.testing.assert_array_equal(np.asarray(o1.panel), np.asarray(o2.panel))

    dd = make_dock_step(h, w, scale=1, out_width=128, out_height=700,
                        dynamic_roi=True, dock=DockConfig(show_roi=True))
    r = np.asarray([4, 4, 40, 30], np.int32)
    o3, o4 = dd(rgba, np.float32(0.5), r), dd(packed, np.float32(0.5), r)
    np.testing.assert_array_equal(np.asarray(o3.panel), np.asarray(o4.panel))

    dk1 = Dock(roi=ROIConfig(interleave=0, target_scale=1))
    dk2 = Dock(roi=ROIConfig(interleave=0, target_scale=1))
    p1 = p2 = None
    for _ in range(3):
        dk1.push_frame(rgba)
        dk2.push_frame(jnp.asarray(packed))
        p1 = dk1.render(width=128, height=600)
        p2 = dk2.render(width=128, height=600)
    np.testing.assert_array_equal(p1, p2)


@pytest.mark.parametrize("bits,msb", [(10, True), (10, False), (12, False),
                                      (14, False), (16, False)])
def test_full_step_nv12_16bit_input_fuzz(bits, msb):
    """Every 16-bit NV12 depth/alignment through the full step matches
    host round-shift + the 8-bit NV12 path (random plane content, odd-ish
    geometry per depth) — the device shift+decode property end-to-end.
    Parametrized explicitly: an earlier random-draw version's fixed seeds
    deterministically never picked bits=10/12 or the MSB arm."""
    from obs_color_monitor_tpu.api import make_full_step
    from obs_color_monitor_tpu.colorspace import Colorspace
    from obs_color_monitor_tpu.ops.convert import nv12_shift

    r = np.random.default_rng(0xF00D + bits + msb)
    h = int(r.choice([32, 48, 62]))
    w = int(r.choice([64, 96, 132]))
    shift = nv12_shift(bits, msb)
    hi = 1 << bits
    y16 = r.integers(0, hi, (h, w)).astype(np.uint16)
    uv16 = r.integers(0, hi, (h // 2, w)).astype(np.uint16)
    if msb:
        y16 = (y16 << (16 - bits)).astype(np.uint16)
        uv16 = (uv16 << (16 - bits)).astype(np.uint16)

    def to8(a):  # the ingest host policy
        v = (a.astype(np.uint32) + (1 << (shift - 1))) >> shift
        return np.minimum(v, 255).astype(np.uint8)

    s16 = make_full_step(h, w, cs=Colorspace.BT601, scale=1,
                         input_format="nv12", nv12_shift=shift)
    s8 = make_full_step(h, w, cs=Colorspace.BT601, scale=1,
                        input_format="nv12")
    out16 = s16((y16, uv16), np.float32(0.0))
    out8 = s8((to8(y16), to8(uv16)), np.float32(0.0))
    for name in ("vs_counts", "wv_counts", "hi_counts"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out16, name)),
            np.asarray(getattr(out8, name)),
            err_msg=f"{name} bits={bits} msb={msb} {h}x{w}",
        )
