"""Pallas kernels vs golden (interpret mode on CPU; real Mosaic on TPU when
OCM_TEST_TPU=1)."""

import os

import jax
import numpy as np
import pytest

from obs_color_monitor_tpu import golden
from obs_color_monitor_tpu.colorspace import Colorspace
from obs_color_monitor_tpu.config import Components
from obs_color_monitor_tpu.ops import pallas_stats

INTERPRET = not bool(os.environ.get("OCM_TEST_TPU"))


def _mk(rng, h, w):
    f = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    f[..., 3] = np.where(rng.random((h, w)) < 0.1, 0, 255)
    return f


@pytest.mark.parametrize("shape", [(128, 128), (96, 130), (300, 257)])
def test_vectorscope_pallas_bitexact(rng, shape):
    f = _mk(rng, *shape)
    yuv = golden.rgb_to_yuv_u8(f, Colorspace.BT709)
    got = np.asarray(pallas_stats.vectorscope_pallas_i32(np.moveaxis(yuv, -1, 0), interpret=INTERPRET))
    want = golden.vectorscope_counts(yuv)
    np.testing.assert_array_equal(np.minimum(got, 255).astype(np.uint8), want)
    assert got.sum() == shape[0] * shape[1]  # every pixel counted exactly once


@pytest.mark.parametrize("shape", [(128, 128), (96, 130), (300, 257)])
def test_waveform_pallas_bitexact(rng, shape):
    f = _mk(rng, *shape)
    got = np.asarray(
        pallas_stats.waveform_pallas_i32(
            np.moveaxis(f[..., :3], -1, 0), f[..., 3] != 0, interpret=INTERPRET
        )
    )
    want = golden.waveform_counts(f, None, Components.RGB)
    np.testing.assert_array_equal(np.minimum(got, 255).astype(np.uint8), want)


def test_histogram_from_waveform_bitexact(rng):
    f = _mk(rng, 96, 130)
    wv = pallas_stats.waveform_pallas_i32(np.moveaxis(f[..., :3], -1, 0), f[..., 3] != 0, interpret=INTERPRET)
    got = np.asarray(pallas_stats.histogram_from_waveform(wv))
    want = golden.histogram_counts(f, None, Components.RGB)
    np.testing.assert_array_equal(got, want)


def test_vectorscope_pallas_saturation_semantics():
    """Flat image: one bin holds every pixel before clamping."""
    yuv = np.zeros((64, 64, 3), dtype=np.uint8)
    yuv[..., 1] = 7
    yuv[..., 2] = 9
    got = np.asarray(pallas_stats.vectorscope_pallas_i32(np.moveaxis(yuv, -1, 0), interpret=INTERPRET))
    assert got[9, 7] == 64 * 64
    assert got.sum() == 64 * 64


@pytest.mark.parametrize("shape", [(128, 128), (96, 130)])
def test_fused_vs_wv_bitexact(rng, shape):
    f = _mk(rng, *shape)
    yuv = golden.rgb_to_yuv_u8(f, Colorspace.BT709)
    vs, wv = pallas_stats.fused_vs_wv_pallas_i32(
        np.moveaxis(f[..., :3], -1, 0),
        np.moveaxis(yuv, -1, 0),
        f[..., 3] != 0,
        interpret=INTERPRET,
    )
    np.testing.assert_array_equal(
        np.minimum(np.asarray(vs), 255).astype(np.uint8),
        golden.vectorscope_counts(yuv),
    )
    np.testing.assert_array_equal(
        np.minimum(np.asarray(wv), 255).astype(np.uint8),
        golden.waveform_counts(f, None, Components.RGB),
    )
    np.testing.assert_array_equal(
        np.asarray(pallas_stats.histogram_from_waveform(wv)),
        golden.histogram_counts(f, None, Components.RGB),
    )


@pytest.mark.parametrize("shape", [(128, 256), (130, 190), (258, 514)])
@pytest.mark.parametrize("yuv_data", [False, True])
def test_fused_ingest_stats_scale2_bitexact(rng, shape, yuv_data):
    """The one-pass Mosaic ingest (downscale x2 + YUV + mask + stripe) +
    stats must equal golden: downscale -> convert -> accumulate
    (reference src/common.c:141-250 + the scope loops)."""
    f = _mk(rng, *shape)
    planes = np.moveaxis(f, -1, 0)
    vs_i32, wv_i32, dsp = pallas_stats.fused_ingest_stats_scale2(
        planes, cs=2, yuv_data=yuv_data, interpret=INTERPRET
    )
    scaled = golden.downscale(f, 2)
    yuv = golden.rgb_to_yuv_u8(scaled, Colorspace.BT709)
    np.testing.assert_array_equal(
        np.minimum(np.asarray(vs_i32), 255).astype(np.uint8),
        golden.vectorscope_counts(yuv),
    )
    comp = Components.YUV if yuv_data else Components.RGB
    yuv_arg = yuv if yuv_data else None
    np.testing.assert_array_equal(
        np.minimum(np.asarray(wv_i32), 255).astype(np.uint8),
        golden.waveform_counts(scaled, yuv_arg, comp),
    )
    np.testing.assert_array_equal(
        np.asarray(pallas_stats.histogram_from_waveform(wv_i32)),
        golden.histogram_counts(scaled, yuv_arg, comp),
    )
    np.testing.assert_array_equal(
        np.asarray(dsp), np.moveaxis(scaled, -1, 0)
    )


@pytest.mark.parametrize("shape", [(128, 128), (67, 190)])
@pytest.mark.parametrize("yuv_data", [False, True])
def test_fused_ingest_stats_scale1_bitexact(rng, shape, yuv_data):
    """Scale-1 one-pass ingest (YUV + mask + stripe, no downscale) vs golden."""
    f = _mk(rng, *shape)
    planes = np.moveaxis(f, -1, 0)
    vs_i32, wv_i32 = pallas_stats.fused_ingest_stats_scale1(
        planes, cs=2, yuv_data=yuv_data, interpret=INTERPRET
    )
    yuv = golden.rgb_to_yuv_u8(f, Colorspace.BT709)
    np.testing.assert_array_equal(
        np.minimum(np.asarray(vs_i32), 255).astype(np.uint8),
        golden.vectorscope_counts(yuv),
    )
    comp = Components.YUV if yuv_data else Components.RGB
    yuv_arg = yuv if yuv_data else None
    np.testing.assert_array_equal(
        np.minimum(np.asarray(wv_i32), 255).astype(np.uint8),
        golden.waveform_counts(f, yuv_arg, comp),
    )
    np.testing.assert_array_equal(
        np.asarray(pallas_stats.histogram_from_waveform(wv_i32)),
        golden.histogram_counts(f, yuv_arg, comp),
    )
