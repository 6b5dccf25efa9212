"""Fused single-pass frame analysis (planar hot path).

The reference's ROI hub renders/reads back a frame once and fans the mapped
surface out to N scope callbacks, each running its own CPU loop over the
same pixels (reference src/roi.c:315-341, src/common.c:335-373).  On TPU the
natural design is ONE jitted function that planarizes the frame once
(interleaved (H,W,4) u8 is lane-hostile — see ops.convert), reads it once
from HBM, and produces every requested statistic — XLA fuses the YUV
conversion into all consumers and nothing is traversed twice.

``analyze`` is the single entry: static flags select which statistics are
computed (compiled once per flag/shape combination, like the reference's
per-scope effect techniques).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .convert import (
    downscale_planes,
    planarize,
    rgb_to_yuv_planes,
    roi_crop_planes,
)
from .stats import (
    histogram_counts,
    vectorscope_counts_i32,
    waveform_counts,
    select_planes,
)
from . import pallas_stats


def default_backend() -> str:
    """'pallas' on real TPU, 'xla' elsewhere (Mosaic kernels need hardware;
    the interpreter is for tests only)."""
    return "pallas" if jax.default_backend() not in ("cpu",) else "xla"


class AnalysisResult(NamedTuple):
    """Per-frame statistics; entries are None unless requested.

    ``planes``/``yuv_planes`` are PLANAR (C, H, W) u8.
    """

    yuv_planes: jax.Array | None  # (3, H, W) u8
    vs_counts: jax.Array | None  # (256, 256) u8
    wv_rgb: jax.Array | None  # (3, 256, W) u8
    wv_yuv: jax.Array | None
    hi_rgb: jax.Array | None  # (3, 256) u32
    hi_yuv: jax.Array | None
    planes: jax.Array | None  # the scaled/cropped frame (4, H, W)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cs",
        "scale",
        "rect",
        "need_vs",
        "need_wv_rgb",
        "need_wv_yuv",
        "need_hi_rgb",
        "need_hi_yuv",
        "keep_rgba",
        "backend",
        "is_planar",
        "is_packed",
    ),
)
def analyze(
    frame: jax.Array,
    cs: int,
    scale: int = 1,
    rect: tuple[int, int, int, int] | None = None,
    need_vs: bool = False,
    need_wv_rgb: bool = False,
    need_wv_yuv: bool = False,
    need_hi_rgb: bool = False,
    need_hi_yuv: bool = False,
    keep_rgba: bool = True,
    backend: str | None = None,
    is_planar: bool = False,
    is_packed: bool = False,
    tm: jax.Array | float | None = None,
    rect_dyn: jax.Array | None = None,
) -> AnalysisResult:
    """One pass: planarize -> downscale -> crop -> convert -> statistics.

    frame: uint8 (H, W, 4) RGBA, or (4, H, W) planar with is_planar=True,
    or the (H, W) u32 bitcast view of the interleaved frame with
    is_packed=True (the pipeline kernel then extracts bytes itself and no
    planarize pass exists in the program).  ``rect`` is the ROI
    (x0, y0, x1, y1) in *scaled* coordinates (reference
    src/common.c:273-282).  backend: 'pallas' (Mosaic kernels, TPU) or
    'xla'; None = auto.  ``tm`` (traced scalar) does not change any result;
    threading the caller's per-frame clock into the frame-reading Mosaic
    kernel makes every statistic loop-variant, so benchmark/streaming loops
    need no input-XOR anti-hoist copy (doc/performance.md Methodology).

    ``rect_dyn`` is a DYNAMIC (4,) i32 ROI (x0, y0, x1, y1) in scaled
    coordinates (mutually exclusive with the static ``rect``): statistics
    count only in-rect pixels, bit-identical to the static crop — the
    waveform keeps full width with out-of-rect columns zero — but changing
    the rect never recompiles (reference interactive drag, src/roi.c:343-521).
    ``planes``/``yuv_planes`` then stay FULL-capture (uncropped).
    """
    if backend is None:
        backend = default_backend()
    pall = backend == "pallas"

    if is_packed:
        planes = None  # resolved lazily: the fast path never needs it
    else:
        planes = frame if is_planar else planarize(frame)

    # Fast path: the default dock/serving shape — scale 2, full frame, VS +
    # one waveform/histogram family — runs the frame-pipeline band kernel
    # (downscale+YUV+mask+SWAR waveform in one pass) + the tile-matmul
    # vectorscope kernel (ops/pallas_pipeline.py, overlays disabled).
    rgb_fam = need_wv_rgb or need_hi_rgb
    yuv_fam = need_wv_yuv or need_hi_yuv
    from .pallas_pipeline import pipeline_fits

    if is_planar or is_packed:
        h_in, w_in = frame.shape[-2], frame.shape[-1]
    else:
        h_in, w_in = frame.shape[-3], frame.shape[-2]
    if (
        pall
        and rect is None
        and need_vs
        and (rgb_fam != yuv_fam)
        and pipeline_fits(h_in, w_in, scale, with_overlays=False)
    ):
        from .pallas_pipeline import frame_pipeline

        vs_i32, wv_i32, dsp, _, _, _ = frame_pipeline(
            frame if is_packed else planes,
            0.0 if tm is None else tm,
            rect_dyn,
            cs=cs, scale=scale, yuv_data=yuv_fam, with_overlays=False,
            packed=is_packed,
        )
        vs = jnp.minimum(vs_i32, 255).astype(jnp.uint8)
        wv_u8 = jnp.minimum(wv_i32, 255).astype(jnp.uint8)
        hi = pallas_stats.histogram_from_waveform(wv_i32)
        return AnalysisResult(
            yuv_planes=None,
            vs_counts=vs,
            wv_rgb=wv_u8 if (rgb_fam and need_wv_rgb) else None,
            wv_yuv=wv_u8 if (yuv_fam and need_wv_yuv) else None,
            hi_rgb=hi if (rgb_fam and need_hi_rgb) else None,
            hi_yuv=hi if (yuv_fam and need_hi_yuv) else None,
            planes=dsp if keep_rgba else None,
        )

    if planes is None:
        from .convert import planarize_packed

        planes = planarize_packed(frame)  # slow path of is_packed
    planes = downscale_planes(planes, scale=scale)
    if rect is not None:
        planes = roi_crop_planes(planes, *rect)

    # dynamic ROI on the generic path: never crop — restrict counting with
    # an iota rect mask (waveform/histogram via the existing mask machinery;
    # vectorscope by zeroing U/V outside and subtracting the outside count
    # at (0,0), exactly like geometry padding)
    in_rect = None
    if rect_dyn is not None:
        assert rect is None, "rect and rect_dyn are mutually exclusive"
        r = jnp.asarray(rect_dyn, jnp.int32)
        hh, ww = planes.shape[-2], planes.shape[-1]
        rx0 = jnp.clip(r[0], 0, ww)
        ry0 = jnp.clip(r[1], 0, hh)
        rx1 = jnp.clip(r[2], rx0, ww)
        ry1 = jnp.clip(r[3], ry0, hh)
        ri = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
        in_rect = (ri >= ry0) & (ri < ry1) & (ci >= rx0) & (ci < rx1)
        n_out = jnp.int32(hh * ww) - (rx1 - rx0) * (ry1 - ry0)

    need_yuv = need_vs or need_wv_yuv or need_hi_yuv
    yuv = rgb_to_yuv_planes(planes, cs=cs) if need_yuv else None
    # vectorscope counting source: U/V zeroed outside the dynamic rect
    # (waveform YUV data stays unmasked — its mask argument handles the rect)
    yuv_vs = yuv
    if in_rect is not None and yuv is not None:
        yuv_vs = jnp.where(in_rect[None], yuv, jnp.uint8(0))

    use_fused_combo = pall and need_vs and (
        need_wv_rgb or need_hi_rgb or need_wv_yuv or need_hi_yuv
    )
    if need_vs and not use_fused_combo:
        if pall:
            vs_i = pallas_stats.vectorscope_pallas_i32(yuv_vs)
        else:
            vs_i = vectorscope_counts_i32(yuv_vs)
        if in_rect is not None:
            vs_i = vs_i.at[0, 0].add(-n_out)
        vs = jnp.minimum(vs_i, 255).astype(jnp.uint8)
    else:
        vs = None

    def _wv_hi(data, mask, need_wv, need_hi):
        wv = hi = None
        if pall and (need_wv or need_hi):
            wv_i32 = pallas_stats.waveform_pallas_i32(data, mask)
            if need_wv:
                wv = jnp.minimum(wv_i32, 255).astype(jnp.uint8)
            if need_hi:
                hi = pallas_stats.histogram_from_waveform(wv_i32)
        else:
            if need_wv:
                wv = waveform_counts(data, mask)
            if need_hi:
                hi = histogram_counts(data, mask)
        return wv, hi

    wv_rgb = hi_rgb = wv_yuv = hi_yuv = None
    fused_spent = False
    if need_wv_rgb or need_hi_rgb:
        data, mask = select_planes(planes, None, is_yuv=False)
        if in_rect is not None:
            mask = mask & in_rect
        if use_fused_combo:
            # the dock's hot combo: one kernel, one DMA pass for VS + counts
            vs_i32, wv_i32 = pallas_stats.fused_vs_wv_pallas_i32(data, yuv_vs, mask)
            if in_rect is not None:
                vs_i32 = vs_i32.at[0, 0].add(-n_out)
            vs = jnp.minimum(vs_i32, 255).astype(jnp.uint8)
            fused_spent = True
            if need_wv_rgb:
                wv_rgb = jnp.minimum(wv_i32, 255).astype(jnp.uint8)
            if need_hi_rgb:
                hi_rgb = pallas_stats.histogram_from_waveform(wv_i32)
        else:
            wv_rgb, hi_rgb = _wv_hi(data, mask, need_wv_rgb, need_hi_rgb)
    if need_wv_yuv or need_hi_yuv:
        data, mask = select_planes(planes, yuv, is_yuv=True)
        if in_rect is not None:
            mask = mask & in_rect
        if use_fused_combo and not fused_spent:
            vs_i32, wv_i32 = pallas_stats.fused_vs_wv_pallas_i32(data, yuv_vs, mask)
            if in_rect is not None:
                vs_i32 = vs_i32.at[0, 0].add(-n_out)
            vs = jnp.minimum(vs_i32, 255).astype(jnp.uint8)
            if need_wv_yuv:
                wv_yuv = jnp.minimum(wv_i32, 255).astype(jnp.uint8)
            if need_hi_yuv:
                hi_yuv = pallas_stats.histogram_from_waveform(wv_i32)
        else:
            wv_yuv, hi_yuv = _wv_hi(data, mask, need_wv_yuv, need_hi_yuv)

    return AnalysisResult(
        yuv_planes=yuv,
        vs_counts=vs,
        wv_rgb=wv_rgb,
        wv_yuv=wv_yuv,
        hi_rgb=hi_rgb,
        hi_yuv=hi_yuv,
        planes=planes if keep_rgba else None,
    )
