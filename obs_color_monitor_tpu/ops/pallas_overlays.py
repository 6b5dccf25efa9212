"""Fused single-pass overlay kernel: zebra + false color + focus peaking.

The reference renders these as three separate GPU shader passes over the
same frame (src/zebra.c:599-628, src/focuspeaking.c:273-309); the XLA path
(ops.overlays) mirrors that as three jitted ops.  This Mosaic kernel
computes all three in ONE pass over the planar frame — the frame is read
once, the luma is shared (per-scope colorspaces supported: two lumas cost
two extra multiplies), and the focus-peaking stencil gets its row halo from
single-row neighbor blocks (the column halo is an in-block roll).  The
halo blocks are 1 row tall — reading whole neighbor blocks would triple
the input DMA traffic.

Bit-exact vs ops.overlays (same integer/f32 fixed-point math).  Everything
inside the kernel is int32/float32: bool masks over mixed u8/f32 tile
granularities hit Mosaic relayout errors, so u8 appears only at the block
reads/writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..colorspace import Colorspace, FIXED_SHIFT, LUMA_COEF
from ..golden.reference import (
    FALSECOLOR_BANDS,
    falsecolor_band_colors_u8,
    luma_threshold_fixed,
)

_RB = 32  # rows per grid block

_BAND_COLORS = falsecolor_band_colors_u8()
_BAND_THRESH = np.asarray(
    [luma_threshold_fixed(t) for t, _ in FALSECOLOR_BANDS[:-1]], dtype=np.float32
)


def _luma(kl, r, g, b):
    return kl[0] * r + kl[1] * g + kl[2] * b


def _overlay_band_math(params, cur, prev_row, next_row, tm, ri, ci,
                       left_col=None, right_col=None, rect=None):
    """Shared zebra/falsecolor/focuspeaking math on one row band.

    cur: 4 (R, W) i32 planes; prev_row/next_row: 3 (1, W) i32 halo rows;
    ri/ci: global row/column index arrays (R, W); params as in the kernels
    (h/w are the REAL frame dims — pad rows/cols beyond them produce
    garbage the caller slices off).  Returns (zb, fc, fp) u8 stacks.
    Used by the standalone fused-overlay kernel and the frame-pipeline
    mega kernel (ops/pallas_pipeline.py).

    left_col/right_col: for STRIPED callers whose block is not the full
    image width — 3 (R, 1) i32 columns adjacent to the block (global
    columns ci[0]-1 and ci[-1]+1), fixing up the focus-peaking stencil's
    circular rolls at the block edges.  None = full-width behavior (the
    wrapped-in columns coincide with the image edge and are masked).

    rect: optional DYNAMIC (x0, y0, x1, y1) i32 scalars — makes pixels
    inside the rect come out bit-identical to running the overlay on the
    CROPPED frame (the reference's ROI-fed overlay scopes consume the crop,
    src/roi.c:329-341): the zebra stripe phase is anchored at the rect
    origin (phase is additive in integers, so tm absorbs -(x0+y0)) and the
    focus-peaking edge-clamp zeros move to the rect borders.  Pixels
    OUTSIDE the rect are unspecified-but-harmless (callers sample only the
    rect region).  Mutually exclusive with left_col/right_col.
    """
    (h, w, zb_lo, zb_hi, kl_zb, kl_fc, peak_th, peak_rgba) = params
    shape = ri.shape
    arr_w = shape[-1]  # may exceed the real w (padded columns, sliced off)
    r, g, b = (cur[c].astype(jnp.float32) for c in range(3))
    if rect is not None:
        assert left_col is None and right_col is None
        rx0, ry0, rx1, ry1 = rect
        tm = tm - (rx0 + ry0).astype(jnp.float32)

    # ---- zebra (reference data/zebra.effect:26-48) ----
    luma_zb = _luma(kl_zb, r, g, b)
    phase = (
        jnp.floor(ri.astype(jnp.float32) + ci.astype(jnp.float32) + 1.0 + tm).astype(
            jnp.int32
        )
        % 6
    )
    stripe = (luma_zb >= zb_lo) & (luma_zb <= zb_hi) & (phase < 3)
    zb = [jnp.where(stripe, 0, cur[c]) for c in range(3)]
    zb.append(jnp.where(stripe, 255, cur[3]))
    zb = jnp.stack([x.astype(jnp.uint8) for x in zb], axis=0)

    # ---- false color: 12-band ladder, transition-deduped
    #      (reference data/falsecolor.effect:38-61) ----
    luma_fc = luma_zb if kl_fc == kl_zb else _luma(kl_fc, r, g, b)
    fc = []
    for c in range(4):
        out = jnp.full(shape, int(_BAND_COLORS[-1][c]), jnp.int32)
        prev_val = int(_BAND_COLORS[-1][c])
        for i in range(len(_BAND_THRESH) - 1, -1, -1):
            v = int(_BAND_COLORS[i][c])
            if v == prev_val:
                continue
            out = jnp.where(luma_fc < np.float32(_BAND_THRESH[i]), v, out)
            prev_val = v
        fc.append(out)
    fc = jnp.stack([x.astype(jnp.uint8) for x in fc], axis=0)

    # ---- focus peaking: 4-neighbor cross, edge diffs zero
    #      (reference data/focuspeaking.effect:26-48) ----
    def absdiff3(a3, b3):
        acc = None
        for a, bb in zip(a3, b3):
            d = jnp.abs(a - bb)
            acc = d if acc is None else acc + d
        return acc  # (R, W) i32

    rgb32 = cur[:3]
    if left_col is not None or right_col is not None:
        lci = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    right = [pltpu.roll(x, arr_w - 1, 1) for x in rgb32]  # x[col+1] (circular)
    if right_col is not None:
        right = [
            jnp.where(lci == arr_w - 1, rc, r)
            for r, rc in zip(right, right_col)
        ]
    dxf = absdiff3(right, rgb32)
    # forward diff: zero at the last real column AND the padding beyond it
    # (the circular roll wraps column 0 into the last padded column); with
    # a rect, the right edge clamp moves to the rect border (rx1-1 <= w-1,
    # so the padding columns stay covered)
    dxf = jnp.where(ci >= (w - 1 if rect is None else rx1 - 1), 0, dxf)
    sxr = pltpu.roll(dxf, 1, 1)  # dx[col-1]; rolled-in col 0 is 0 (masked)
    if left_col is not None:
        # block-local col 0 is an interior column: dx[col-1] comes from the
        # halo column (zero only at the true image edge ci == 0)
        dxf_m1 = absdiff3([x[:, 0:1] for x in rgb32], left_col)
        sxr = jnp.where(lci == 0, jnp.where(ci == 0, 0, dxf_m1), sxr)
    if rect is not None:
        # dx[col-1] at the rect's left edge comes from outside the rect —
        # zero it (the crop's left-edge clamp)
        sxr = jnp.where(ci <= rx0, 0, sxr)
    sx = dxf + sxr
    up = [
        jnp.concatenate([p, x[:-1]], axis=0) for x, p in zip(rgb32, prev_row)
    ]
    down = [
        jnp.concatenate([x[1:], nx], axis=0) for x, nx in zip(rgb32, next_row)
    ]
    du = jnp.where(
        ri <= (0 if rect is None else ry0), 0, absdiff3(rgb32, up)
    )
    dd = jnp.where(
        ri >= (h - 1 if rect is None else ry1 - 1), 0, absdiff3(down, rgb32)
    )
    peak = (sx + du + dd) >= peak_th
    fp = [jnp.where(peak, int(peak_rgba[c]), cur[c]) for c in range(4)]
    fp = jnp.stack([x.astype(jnp.uint8) for x in fp], axis=0)
    return zb, fc, fp


def _pack_u32(stack):
    """(4, R, W) u8 channel stack -> (R, W) u32 packed RGBA (in-kernel
    compose: downstream resamplers read whole pixels on single lanes, so
    no u32<->4xu8 relayout copy ever materializes outside the kernel)."""
    s = stack.astype(jnp.uint32)
    return s[0] | (s[1] << 8) | (s[2] << 16) | (s[3] << 24)


def _ov_kernel(dyn, packed_out, params, cur_ref, prev_ref, nxt_ref, tm_ref,
               *rest):
    w = params[1]
    if dyn:
        rect_ref = rest[0]
        rest = rest[1:]
        rect = tuple(rect_ref[0, i] for i in range(4))
    else:
        rect = None
    zb_ref, fc_ref, fp_ref = rest
    r_blk = pl.program_id(0)
    tm = tm_ref[0, 0]
    cur = [cur_ref[c].astype(jnp.int32) for c in range(4)]  # (RB, W) i32
    ri = r_blk * _RB + jax.lax.broadcasted_iota(jnp.int32, (_RB, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_RB, w), 1)
    prev_row = [prev_ref[c][7:8].astype(jnp.int32) for c in range(3)]
    next_row = [nxt_ref[c][0:1].astype(jnp.int32) for c in range(3)]
    zb, fc, fp = _overlay_band_math(
        params, cur, prev_row, next_row, tm, ri, ci, rect=rect
    )
    if packed_out:
        zb_ref[:], fc_ref[:], fp_ref[:] = (
            _pack_u32(zb), _pack_u32(fc), _pack_u32(fp)
        )
    else:
        zb_ref[:], fc_ref[:], fp_ref[:] = zb, fc, fp


@functools.partial(
    jax.jit,
    static_argnames=(
        "th_low", "th_high", "zb_cs", "fc_cs", "peak_th", "peak_rgba",
        "interpret", "packed_out",
    ),
)
def fused_overlays_planes(
    planes: jax.Array,
    tm: jax.Array | float,
    th_low: float,
    th_high: float,
    zb_cs: int,
    fc_cs: int,
    peak_th: int,
    peak_rgba: tuple[int, int, int, int],
    rect: jax.Array | None = None,
    interpret: bool = False,
    packed_out: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(4, H, W) u8 -> (zebra, falsecolor, focuspeaking) planar u8, one pass.

    Bit-exact twins of ops.overlays.{zebra,falsecolor,focus_peaking}_planes
    with the scopes' own colorspaces (reference zbs_render technique select,
    src/zebra.c:620).

    ``rect`` is an optional DYNAMIC (4,) i32 (x0, y0, x1, y1): pixels inside
    it match the overlays of the CROPPED frame bit-for-bit (stripe phase
    anchored at the rect origin, focus-peaking edges clamped at the rect
    borders); outside pixels are unspecified (the dynamic-ROI dock samples
    only the rect region).  Changing the rect never recompiles.

    ``packed_out=True`` returns each overlay as its (H, W) u32 packed-RGBA
    view instead of planes — composed IN the kernel, so consumers that
    resample whole pixels (the dock's slot samplers) never pay the
    u32<->4xu8 relayout copies that planes_to_rgba + a later bitcast cost
    (~0.05 ms/frame on the 4K parity panel, xprof r3).
    """
    _, h, w = planes.shape
    nb = -(-h // _RB)
    hp = nb * _RB
    x = jnp.pad(planes, ((0, 0), (0, hp - h), (0, 0)))
    kl = lambda cs: tuple(
        float(int(round(v * (1 << FIXED_SHIFT)))) for v in LUMA_COEF[Colorspace(cs)]
    )
    params = (
        h,
        w,
        float(luma_threshold_fixed(th_low)),
        float(luma_threshold_fixed(th_high)),
        kl(zb_cs),
        kl(fc_cs),
        int(peak_th),
        tuple(int(v) for v in peak_rgba),
    )
    blk = lambda f: pl.BlockSpec((4, _RB, w), f, memory_space=pltpu.VMEM)
    row8 = lambda f: pl.BlockSpec((4, 8, w), f, memory_space=pltpu.VMEM)
    # 8-row halo blocks (Mosaic requires 2nd-minor block dims % 8 == 0):
    # the prev halo row r*_RB-1 is always row 7 of 8-row block r*_RB//8-1,
    # the next halo row (r+1)*_RB is row 0 of block (r+1)*_RB//8; the edge
    # clamps feed rows the kernel masks out anyway (ri==0 / ri==h-1).
    dyn = rect is not None
    in_specs = [
        blk(lambda r: (0, r, 0)),
        row8(lambda r: (0, jnp.maximum(r * (_RB // 8) - 1, 0), 0)),
        row8(lambda r: (0, jnp.minimum((r + 1) * (_RB // 8), hp // 8 - 1), 0)),
        pl.BlockSpec((1, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [x, x, x, jnp.reshape(jnp.asarray(tm, jnp.float32), (1, 1))]
    if dyn:
        rc = jnp.asarray(rect, jnp.int32)
        rx0 = jnp.clip(rc[0], 0, w)
        ry0 = jnp.clip(rc[1], 0, h)
        rx1 = jnp.clip(rc[2], rx0, w)
        ry1 = jnp.clip(rc[3], ry0, h)
        in_specs.append(
            pl.BlockSpec((1, 4), lambda r: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(jnp.stack([rx0, ry0, rx1, ry1]).reshape(1, 4))
    if packed_out:
        out_specs = (
            pl.BlockSpec((_RB, w), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ) * 3
        out_shape = tuple(
            jax.ShapeDtypeStruct((hp, w), jnp.uint32) for _ in range(3)
        )
    else:
        out_specs = (blk(lambda r: (0, r, 0)),) * 3
        out_shape = tuple(
            jax.ShapeDtypeStruct((4, hp, w), jnp.uint8) for _ in range(3)
        )
    zb, fc, fp = pl.pallas_call(
        functools.partial(_ov_kernel, dyn, packed_out, params),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if packed_out:
        return zb[:h], fc[:h], fp[:h]
    return zb[:, :h], fc[:, :h], fp[:, :h]
