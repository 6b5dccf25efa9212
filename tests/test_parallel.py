"""Multi-device sharding on the virtual 8-device CPU mesh.

Bit-exactness must survive sharding: batch-DP trivially, spatial sharding
because integer partial counts psum-merge before saturation.
"""

import jax
import numpy as np
import pytest

from obs_color_monitor_tpu import golden
from obs_color_monitor_tpu.colorspace import Colorspace
from obs_color_monitor_tpu.config import Components
from obs_color_monitor_tpu.parallel import batch_analyze, make_mesh, spatial_analyze


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_batch_dp_bitexact(rng):
    frames = rng.integers(0, 256, size=(8, 32, 48, 4), dtype=np.uint8)
    frames[..., 3] = 255
    mesh = make_mesh(8)
    vs, hi, wv = batch_analyze(frames, mesh, cs=2)
    assert vs.shape == (8, 256, 256)
    for b in range(8):
        yuv = golden.rgb_to_yuv_u8(frames[b], Colorspace.BT709)
        np.testing.assert_array_equal(
            np.asarray(vs[b]), golden.vectorscope_counts(yuv)
        )
        np.testing.assert_array_equal(
            np.asarray(hi[b]),
            golden.histogram_counts(frames[b], None, Components.RGB),
        )
        np.testing.assert_array_equal(
            np.asarray(wv[b]),
            golden.waveform_counts(frames[b], None, Components.RGB),
        )


@requires_8
def test_spatial_sharding_bitexact(rng):
    """Rows sharded over 8 devices; saturation must still be global."""
    # craft a frame where one (u,v) bin exceeds 255 ONLY globally:
    # 8 row-blocks x 40 identical pixels = 320 > 255, but 40 < 255 per shard
    frame = rng.integers(0, 256, size=(64, 40, 4), dtype=np.uint8)
    frame[..., 3] = 255
    frame[:, :, :3] = 128  # flat gray: every pixel same (u,v)
    mesh = make_mesh(8, axis="rows")
    vs, hi, wv = spatial_analyze(frame, mesh, cs=1)
    yuv = golden.rgb_to_yuv_u8(frame, Colorspace.BT601)
    want_vs = golden.vectorscope_counts(yuv)
    np.testing.assert_array_equal(np.asarray(vs), want_vs)
    assert want_vs.max() == 255  # saturation actually exercised
    np.testing.assert_array_equal(
        np.asarray(hi), golden.histogram_counts(frame, None, Components.RGB)
    )
    np.testing.assert_array_equal(
        np.asarray(wv), golden.waveform_counts(frame, None, Components.RGB)
    )


@requires_8
def test_spatial_sharding_requires_divisible(rng):
    frame = np.zeros((30, 16, 4), np.uint8)
    mesh = make_mesh(8, axis="rows")
    with pytest.raises(ValueError):
        spatial_analyze(frame, mesh, cs=1)


@requires_8
def test_batched_step_sharded(rng):
    """make_batched_step: batch-DP serving over the mesh, bit-exact."""
    from obs_color_monitor_tpu import golden
    from obs_color_monitor_tpu.api import make_batched_step
    from obs_color_monitor_tpu.colorspace import Colorspace
    from obs_color_monitor_tpu.config import Components
    from obs_color_monitor_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    step = make_batched_step(32, 48, mesh=mesh, cs=Colorspace.BT709, scale=1)
    frames = rng.integers(0, 256, (8, 32, 48, 4), dtype=np.uint8)
    frames[..., 3] = 255
    sh = NamedSharding(mesh, P("batch"))
    fr = jax.device_put(frames, sh)
    tm = jax.device_put(np.zeros(8, np.float32), sh)
    out = step(fr, tm)
    assert out.panel.shape if hasattr(out, "panel") else True
    assert out.vs_counts.shape == (8, 256, 256)
    for b in range(0, 8, 3):
        yuv = golden.rgb_to_yuv_u8(frames[b], Colorspace.BT709)
        np.testing.assert_array_equal(
            np.asarray(out.vs_counts[b]), golden.vectorscope_counts(yuv)
        )
        np.testing.assert_array_equal(
            np.asarray(out.hi_counts[b]),
            golden.histogram_counts(frames[b], None, Components.RGB),
        )


@requires_8
def test_spatial_pipeline_bitexact(rng):
    """The FULL sharded pass: stats psum-merged AND overlays computed in
    place with the 1-row focus-peaking halo exchange — all bit-exact vs the
    golden single-device model (cross-shard stencil rows included)."""
    from obs_color_monitor_tpu.parallel import spatial_pipeline

    frame = rng.integers(0, 256, size=(64, 48, 4), dtype=np.uint8)
    frame[..., 3] = 255
    frame[rng.random((64, 48)) < 0.05, 3] = 0  # alpha-skipped pixels
    # strong horizontal edges exactly at the shard boundaries (rows % 8)
    frame[::8, :, :3] = 255
    tm = 3.25
    from obs_color_monitor_tpu.golden.reference import peaking_threshold_fixed

    peak_fixed = peaking_threshold_fixed(0.05)
    mesh = make_mesh(8, axis="rows")
    vs, hi, wv, zb, fc, fp = spatial_pipeline(
        frame, mesh, cs=2, tm=tm, th_low=0.5, th_high=0.9, peak_th=peak_fixed
    )
    yuv = golden.rgb_to_yuv_u8(frame, Colorspace.BT709)
    np.testing.assert_array_equal(np.asarray(vs), golden.vectorscope_counts(yuv))
    np.testing.assert_array_equal(
        np.asarray(hi), golden.histogram_counts(frame, None, Components.RGB)
    )
    np.testing.assert_array_equal(
        np.asarray(wv), golden.waveform_counts(frame, None, Components.RGB)
    )
    to_rgba = lambda p: np.moveaxis(np.asarray(p), 0, -1)
    np.testing.assert_array_equal(
        to_rgba(zb), golden.zebra(frame, 0.5, 0.9, tm, Colorspace.BT709)
    )
    np.testing.assert_array_equal(
        to_rgba(fc), golden.falsecolor(frame, Colorspace.BT709)
    )
    want_fp = golden.focus_peaking(frame, 0.05, (1.0, 0.0, 0.0, 1.0))
    got_fp = to_rgba(fp)
    np.testing.assert_array_equal(got_fp, want_fp)
    # the crafted edge rows actually produce cross-shard peaking pixels
    assert (got_fp[8] != frame[8]).any()


@requires_8
def test_yuv_family_sharded(rng):
    """components='yuv': Y/U/V waveform data with NO alpha skip, on both
    multi-device helpers (reference src/waveform.c:148-154), including a
    saturation-crossing count that only exceeds 255 after the psum merge."""
    from obs_color_monitor_tpu.parallel import spatial_pipeline

    frame = rng.integers(0, 256, size=(64, 40, 4), dtype=np.uint8)
    frame[..., 3] = 0  # alpha must NOT skip in YUV mode
    frame[:, :8, :3] = 128  # flat gray column block: per-column counts 64;
    frame[:, 8:16, :3] = frame[:1, 8:16, :3]  # constant columns: vs bin > 255
    yuv = golden.rgb_to_yuv_u8(frame, Colorspace.BT601)

    mesh = make_mesh(8, axis="rows")
    vs, hi, wv = spatial_analyze(frame, mesh, cs=1, components="yuv")
    np.testing.assert_array_equal(np.asarray(vs), golden.vectorscope_counts(yuv))
    np.testing.assert_array_equal(
        np.asarray(hi), golden.histogram_counts(frame, yuv, Components.YUV)
    )
    np.testing.assert_array_equal(
        np.asarray(wv), golden.waveform_counts(frame, yuv, Components.YUV)
    )

    mesh_b = make_mesh(8)
    frames = np.stack([frame] * 8)
    vsb, hib, wvb = batch_analyze(frames, mesh_b, cs=1, components="yuv")
    np.testing.assert_array_equal(np.asarray(vsb[3]), golden.vectorscope_counts(yuv))
    np.testing.assert_array_equal(
        np.asarray(wvb[5]), golden.waveform_counts(frame, yuv, Components.YUV)
    )

    full = spatial_pipeline(frame, mesh, cs=1, components="yuv")
    np.testing.assert_array_equal(np.asarray(full[2]), np.asarray(wv))
