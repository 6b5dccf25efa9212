"""Bit-exactness of the whole-frame pipeline kernel (interpret mode).

frame_pipeline fuses ingest + the three overlay scopes into one Mosaic
pass (ops/pallas_pipeline.py); every output must match the separate ops
exactly — statistics vs the fused-ingest kernels, overlays vs the XLA
ops (themselves golden-verified in test_overlays).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from obs_color_monitor_tpu.ops import overlays as ov
from obs_color_monitor_tpu.ops import pallas_stats as ps
from obs_color_monitor_tpu.ops.pallas_pipeline import frame_pipeline

ARGS = dict(
    th_low=0.75, th_high=1.0, zb_cs=2, fc_cs=1,
    peak_th=3062, peak_rgba=(255, 84, 0, 255),
)

# CPU suite: interpret mode (the kernels' portable emulation).  Hardware
# suite (OCM_TEST_TPU): the REAL Mosaic kernels — the stronger assertion,
# and interpret mode executed on the experimental axon backend is not
# trustworthy: at (17, 33) (one mostly-padded tile) the interpret-mode
# composition of the reference ingest+stats kernels miscounts (r5 probe,
# diff 1112 vs golden) while the REAL kernels are bit-exact at the same
# shape in the same process; all pieces are individually exact — an
# interpret-lowering platform artifact, tracked in CLAUDE.md.
INTERP = not bool(os.environ.get("OCM_TEST_TPU"))


@pytest.mark.parametrize(
    "h4,w4,scale,yuv_data",
    [
        (270, 480, 2, False),
        (135, 240, 1, False),
        (129, 131, 2, True),   # odd dims: stripe/band padding + remainders
        (64, 128, 1, True),
        (65, 144, 2, False),   # h4%64==1: last band has no scaled rows
        (13, 17, 2, False),    # smaller than one band/stripe
        (270, 480, 4, False),  # scale-4 fused (r4): center-2x2 sampling
        (131, 133, 4, True),   # scale-4 odd dims
        (65, 144, 4, False),   # scale-4 band overhang: padded-ds crop path
        (140, 270, 8, False),  # the generic even-scale selection (r4)
        (131, 270, 8, True),   # scale-8 odd height + yuv family
    ],
)
def test_pipeline_matches_separate_ops(h4, w4, scale, yuv_data):
    rng = np.random.default_rng(h4 * w4 + scale)
    p = jnp.asarray(rng.integers(0, 256, (4, h4, w4), np.uint8))
    tm = jnp.float32(2.5)
    vs, wv, ds, zb, fc, fp = frame_pipeline(
        p, tm, cs=2, scale=scale, yuv_data=yuv_data, interpret=INTERP, **ARGS
    )
    if scale == 2:
        rvs, rwv, rds = ps.fused_ingest_stats_scale2(
            p, cs=2, yuv_data=yuv_data, interpret=INTERP
        )
    elif scale > 2:
        from obs_color_monitor_tpu.ops.convert import downscale_planes

        rds = downscale_planes(p, scale=scale)
        rvs, rwv = ps.fused_ingest_stats_scale1(
            rds, cs=2, yuv_data=yuv_data, interpret=INTERP
        )
    else:
        rvs, rwv = ps.fused_ingest_stats_scale1(
            p, cs=2, yuv_data=yuv_data, interpret=INTERP
        )
        rds = p
    pc = jnp.asarray(np.array(ARGS["peak_rgba"], np.uint8))
    for name, a, b in [
        ("vs", vs, rvs),
        ("wv", wv, rwv),
        ("ds", ds, rds),
        ("zb", zb, ov.zebra_planes(p, th_low=0.75, th_high=1.0, tm=tm, cs=2)),
        ("fc", fc, ov.falsecolor_planes(p, cs=1)),
        ("fp", fp, ov.focus_peaking_planes(p, ARGS["peak_th"], pc)),
    ]:
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pipeline_no_overlays_mode():
    """with_overlays=False (the dock/serving stats path) must produce the
    same statistics; the pad width w4=257 > s*scale*128 also exercises the
    overlay-vs-stats padding split."""
    rng = np.random.default_rng(11)
    p = jnp.asarray(rng.integers(0, 256, (4, 133, 257), np.uint8))
    tm = jnp.float32(1.0)
    ref = frame_pipeline(p, tm, cs=1, scale=2, interpret=INTERP, **ARGS)
    got = frame_pipeline(
        p, tm, cs=1, scale=2, interpret=INTERP, with_overlays=False, **ARGS
    )
    for i, name in enumerate(["vs", "wv", "ds", "zb", "fc", "fp"]):
        if got[i] is None:
            assert name in ("zb", "fc", "fp")
            continue
        assert np.array_equal(np.asarray(got[i]), np.asarray(ref[i])), name


def test_pipeline_alpha_skip():
    """Transparent pixels: skipped by the waveform, counted by the VS."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (4, 96, 160), np.uint8)
    arr[3] = 255
    arr[3, :48] = 0  # top half transparent, bottom fully opaque
    p = jnp.asarray(arr)
    vs, wv, *_ = frame_pipeline(
        p, jnp.float32(0.0), cs=1, scale=1, yuv_data=False, interpret=INTERP, **ARGS
    )
    assert int(np.asarray(wv).sum()) == 3 * 48 * 160  # opaque rows only
    assert int(np.asarray(vs).sum()) == 96 * 160  # every pixel


@pytest.mark.parametrize("h4,w4,scale", [(270, 480, 2), (65, 144, 2),
                                          (64, 130, 1),
                                          # scales 4/8 with w4p = s*128*scale
                                          # OVERHANGING w4 (partially-OOB
                                          # input blocks unique to deep
                                          # scales) — the api full step runs
                                          # packed at these scales (r4)
                                          (140, 300, 4), (140, 300, 8)])
def test_pipeline_packed_input(h4, w4, scale):
    """packed=True consumes the u32 bitcast view of the interleaved frame
    (no planarize pass) and must match the planar path bit-for-bit."""
    import jax

    rng = np.random.default_rng(h4 + w4)
    p = jnp.asarray(rng.integers(0, 256, (4, h4, w4), np.uint8))
    tm = jnp.float32(1.5)
    ref = frame_pipeline(p, tm, cs=2, scale=scale, interpret=INTERP, **ARGS)
    rgba = np.ascontiguousarray(np.moveaxis(np.asarray(p), 0, -1))
    x32 = jax.lax.bitcast_convert_type(jnp.asarray(rgba), jnp.uint32)
    got = frame_pipeline(x32, tm, cs=2, scale=scale, packed=True,
                         interpret=INTERP, **ARGS)
    for name, a, b in zip(["vs", "wv", "ds", "zb", "fc", "fp"], ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pipeline_rejects_other_scales():
    p = jnp.zeros((4, 32, 32), jnp.uint8)
    with pytest.raises(ValueError):
        frame_pipeline(
            p, jnp.float32(0.0), cs=2, scale=3, interpret=INTERP, **ARGS
        )


@pytest.mark.skipif(
    not __import__("os").environ.get("OCM_TEST_TPU"),
    reason="compiled-HLO check needs the real Mosaic lowering",
)
def test_sampled_checksum_cannot_dce_kernel():
    """bench.py checksums Mosaic overlay outputs with a contiguous row-block
    SAMPLE (x[:, :64, :]) on the argument that XLA cannot partially
    dead-code-eliminate a custom call: consuming any slice keeps the WHOLE
    kernel in the program.  Machine-check that claim: a jit that reduces
    only the sample still contains the pallas custom-call in its compiled
    HLO (bench.py honesty, doc/performance.md Methodology)."""
    import jax

    def g(p, tm):
        vs, wv, ds, zb, fc, fp = frame_pipeline(p, tm, cs=2, scale=1, **ARGS)
        return jnp.sum(zb[:, :64, :].astype(jnp.int32))

    txt = (
        jax.jit(g)
        .lower(
            jax.ShapeDtypeStruct((4, 128, 256), jnp.uint8),
            jax.ShapeDtypeStruct((), jnp.float32),
        )
        .compile()
        .as_text()
    )
    assert "custom-call" in txt


@pytest.mark.parametrize("shape", [(130, 300), (70, 140)])
def test_pipeline_col_split_bitexact(shape):
    """The column-split build (two half-width passes per band, halo columns
    at the seam) must be bit-identical to the full-width kernel — including
    the focus-peaking stencil across the split seam and odd stripe counts
    (s=3 -> halves of 2).  Built for 4K scale-1 with overlays, whose
    full-width working set misses VMEM (doc/performance.md)."""
    import jax

    h4, w4 = shape
    rng = np.random.default_rng(h4 * w4)
    p = jnp.asarray(rng.integers(0, 256, (4, h4, w4), np.uint8))
    tm = jnp.float32(2.5)
    ref = frame_pipeline(p, tm, cs=2, scale=1, interpret=INTERP, **ARGS)
    got = frame_pipeline(p, tm, cs=2, scale=1, interpret=INTERP, col_split=2,
                         **ARGS)
    for name, a, b in zip(["vs", "wv", "ds", "zb", "fc", "fp"], ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    # packed-input variant splits identically
    rgba = np.ascontiguousarray(np.moveaxis(np.asarray(p), 0, -1))
    x32 = jax.lax.bitcast_convert_type(jnp.asarray(rgba), jnp.uint32)
    got_p = frame_pipeline(x32, tm, cs=2, scale=1, packed=True,
                           interpret=INTERP, col_split=2, **ARGS)
    for name, a, b in zip(["vs", "wv", "ds", "zb", "fc", "fp"], ref, got_p):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pipeline_fits_split_admits_4k_scale1():
    """4K scale-1 WITH overlays: full-width build misses VMEM, the column
    split fits (the reason col_split exists)."""
    from obs_color_monitor_tpu.ops.pallas_pipeline import pipeline_fits

    assert not pipeline_fits(2160, 3840, 1, with_overlays=True)
    assert pipeline_fits(2160, 3840, 1, with_overlays=True, col_split=2)
    # and the split is refused where it cannot hold
    assert not pipeline_fits(2160, 3840, 2, with_overlays=True, col_split=2)
    with pytest.raises(ValueError):
        frame_pipeline(jnp.zeros((4, 32, 256), jnp.uint8), jnp.float32(0.0),
                       cs=2, scale=2, col_split=2, interpret=INTERP, **ARGS)
