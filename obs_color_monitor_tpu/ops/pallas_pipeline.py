"""The whole-frame Mosaic pipeline: ONE pass over the full-resolution frame.

Round-3 design, profiled with xprof (benchmarks/sweep_r3c.py — the xprof
device times are the only trustworthy sub-chain numbers on the tunneled
dev setup).  Findings that shaped this file:

  * Mosaic does NOT overlap MXU matmuls with VPU work inside a kernel:
    a fused VS+waveform kernel costs exactly VS + waveform — and an
    attempt to hide the SWAR waveform inside the band kernel cost MORE
    than the standalone SWAR (int16 read-modify-write on the resident
    accumulator + int32->int16 packing per stripe: +0.61 ms vs 0.34,
    xprof).  So the band kernel only produces tiles, and kernel B fuses
    the vectorscope matmuls with the SWAR waveform (serial inside, but
    one launch and no flat-row reshape glue).
  * Per-row K=128 NT matmuls straight from (rows,128) tiles are FASTER
    end-to-end than K=8192 flat-row matmuls: same MXU op count, smaller
    one-hot builds, and no lane-merging reshape/copy glue in XLA
    (0.78 vs 1.02 ms per 4K frame, sweep_r3c/r3d).
  * The downscale's row-pair matmul operand (pair sums <= 510) is not
    bf16-exact; splitting it into two <=255 halves (each bf16-exact) and
    running two default-precision matmuls beats Precision.HIGHEST.

Kernel A (_pipeline_kernel), grid step = one 64-input-row band over the
planar frame OR its packed (H, W) u32 bitcast view (packed=True — byte
extraction in-kernel, no planarize pass in the program):
  - zebra / false color / focus peaking on the full-res rows (optional;
    shared read + shared luma — the reference renders these as three
    separate GPU passes, src/zebra.c:599-628, src/focuspeaking.c:273-309);
    the focus-peaking row halo comes from 8-row neighbor blocks;
  - the scale-1/2 downscale (reference src/common.c:141-168,249-250),
    RGB->YUV (data/common.effect:23-43), alpha pre-zeroing;
  - U/V and the (alpha-masked or YUV) waveform-data channels written as
    (S, NB, OH, 128) tiles for kernel B; the scaled RGBA planes written
    exact-shaped for the dock/ROI consumers.

Kernel B (pallas_stats._vs_swar_tiles_kernel): vectorscope one-hot NT
matmuls (tree-reduced) + SWAR waveform over band-PAIR tiles; a trailing
odd band is handled by zeroing the phantom tile (counts land at
(0,0)/bin-0 like geometry padding and the corrections use the padded
band count).

Everything is bit-exact vs the separate ops (tests/test_pipeline_kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_stats as ps
from .pallas_overlays import _overlay_band_math

_COLS = 128
_BAND = 64  # input rows per grid step


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pipeline_fits(
    height: int, width: int, scale: int, with_overlays: bool,
    col_split: int = 1,
) -> bool:
    """Conservative static check that the band kernel's double-buffered
    working set fits the ~16 MB VMEM (4K scale-1 WITH overlays does not —
    the compiler measured 18.1 MB; callers fall back to the separate
    ingest + overlay kernels).

    Provenance of the constants: the per-step byte count below is the sum
    of the kernel's block shapes (input band + two 8-row halo blocks +
    overlay bands + stats tiles + ds band + downscale selection matrices),
    doubled for Mosaic's input/
    output double buffering; the 4.5 MB slack was fit empirically against
    the jax-0.9 Mosaic "Insufficient VMEM" errors observed while admitting
    shapes near the 4K scale-1 boundary (18.1 MB reported there).  A
    toolchain change to VMEM accounting shifts the boundary: a shape this
    over-admits fails at COMPILE time with that error rather than falling
    back — set OCM_NO_PIPELINE_FUSION=1 to force the separate-kernel path,
    and re-fit the slack (benchmarks/probe_toolchain.py exercises the
    boundary shapes).
    """
    import os

    if os.environ.get("OCM_NO_PIPELINE_FUSION"):
        return False
    # any scale whose output rows tile the 64-row band in >=8-row blocks:
    # 1, 2 and the even middle-2x2 scales 4/8.  Odd scales >1 and
    # non-divisors would cross band boundaries; scale 16+ makes the ds
    # output block's 2nd-minor dim 4 (< 8), which Mosaic rejects unless
    # it equals the array dim — those take the separate-kernel path.
    if scale != 1 and (scale % 2 or _BAND % scale or _BAND // scale < 8):
        return False
    if col_split != 1 and (scale != 1 or col_split != 2):
        return False
    w = width // scale
    if w < 1 or height // scale < 1:
        return False
    s = _cdiv(w, _COLS)
    if col_split == 2 and s < 2:
        return False
    s_blk = _cdiv(s, col_split)
    w4p = max(s * _COLS * scale, _cdiv(width, _COLS) * _COLS)
    wb = s_blk * _COLS if col_split > 1 else w4p
    oh = _BAND // scale
    band = 4 * _BAND * wb
    step = (
        band
        + 2 * 4 * 8 * wb
        + (2 * 4 * _BAND * _COLS if col_split > 1 else 0)  # column halos
        + (3 * band if with_overlays else 0)
        + 5 * s_blk * oh * _COLS
        + 4 * oh * s_blk * _COLS
        # downscale selection matrices (f32): 512 KB at scale 8
        + (4 * (scale * _COLS * _COLS + oh * scale * oh) if scale > 1 else 0)
    )
    return 2 * step + 4_500_000 < 16_000_000


def _downscale2_block(x, p2, q2):
    """(64, scale*128) f32 -> (64/scale, 128) exact downscale via two 0/1
    matmuls: p2 picks+sums the contributing columns of each block, q2 the
    contributing rows (both pair members at scale 2; the center pair of
    each 4-block at scale 4 — the reference's sample positions).  The
    <=510 column sums split into <=255 halves, each bf16-exact — two
    default-precision matmuls beat one Precision.HIGHEST; the final f32
    accumulation (<=2 terms per output) is exact, and floor((s+2)/4)
    equals the golden (s+2)>>2."""
    t = jax.lax.dot_general(
        x, p2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t1 = jnp.minimum(t, 255.0)
    t2 = t - t1
    mm = lambda a: jax.lax.dot_general(
        q2, a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.floor((mm(t1) + mm(t2) + 2.0) * 0.25)


def _pipeline_kernel(params, cur_ref, prv_ref, nxt_ref, p2_ref, q2_ref, tm_ref,
                     *rest):
    (h, w, w4p, s_total, scale, packed, yuv_data, kcoef, ov_params,
     with_ov, dyn, col_split, s_blk, wb) = params
    b = pl.program_id(0)
    c = pl.program_id(1) if col_split > 1 else 0
    oh = _BAND // scale
    tm = tm_ref[0, 0]
    cur = _extract_channels(cur_ref, packed)  # 4x (64, wb) i32

    refs = list(rest)
    if dyn:
        # dynamic ROI rect (x0, y0, x1, y1) in scaled coords, SMEM scalars:
        # masks ONLY the statistics outputs (u/v/data tiles) — the scaled
        # planes and overlays stay full-capture (the reference's ROI source
        # draws the whole target; consumers get the crop, src/roi.c:279-315)
        rect_ref = refs[0]
        refs = refs[1:]
        rx0, ry0 = rect_ref[0, 0], rect_ref[0, 1]
        rx1, ry1 = rect_ref[0, 2], rect_ref[0, 3]
    if col_split > 1:
        # neighbour 128-column blocks: their boundary columns are the
        # focus-peaking column halos at the split seam (the true image
        # edges stay masked by ci in _overlay_band_math)
        lblk_ref, rblk_ref = refs[:2]
        refs = refs[2:]
    if with_ov:
        zb_ref, fc_ref, fp_ref = refs[:3]
        refs = refs[3:]
    u_ref, v_ref, d0_ref, d1_ref, d2_ref, ds_ref = refs

    col0 = c * wb  # this split's global first column
    if with_ov:
        ri4 = b * _BAND + jax.lax.broadcasted_iota(jnp.int32, (_BAND, wb), 0)
        ci4 = col0 + jax.lax.broadcasted_iota(jnp.int32, (_BAND, wb), 1)
        prv = _extract_channels(prv_ref, packed, 3)
        nxt = _extract_channels(nxt_ref, packed, 3)
        prev_row = [p[7:8] for p in prv]
        next_row = [nx[0:1] for nx in nxt]
        if col_split > 1:
            lblk = _extract_channels(lblk_ref, packed, 3)
            rblk = _extract_channels(rblk_ref, packed, 3)
            left_col = [x[:, -1:] for x in lblk]
            right_col = [x[:, 0:1] for x in rblk]
        else:
            left_col = right_col = None
        zb_ref[:], fc_ref[:], fp_ref[:] = _overlay_band_math(
            ov_params, cur, prev_row, next_row, tm, ri4, ci4,
            left_col=left_col, right_col=right_col,
        )

    half = np.float32(1 << 11)
    inv = np.float32(1.0 / (1 << 12))
    for s in range(s_blk):
        if scale >= 2:
            ds = [
                _downscale2_block(
                    cur[ch][
                        :, s * scale * _COLS : (s + 1) * scale * _COLS
                    ].astype(jnp.float32),
                    p2_ref[:],
                    q2_ref[:],
                )
                for ch in range(4)
            ]
        else:
            ds = [
                cur[ch][:, s * _COLS : (s + 1) * _COLS].astype(jnp.float32)
                for ch in range(4)
            ]
        rowi = b * oh + jax.lax.broadcasted_iota(jnp.int32, (oh, _COLS), 0)
        coli = (
            col0 + s * _COLS
            + jax.lax.broadcasted_iota(jnp.int32, (oh, _COLS), 1)
        )
        valid = (rowi < h) & (coli < w)
        ds = [jnp.where(valid, x, 0.0) for x in ds]
        r8, g8, b8, a8 = ds

        def to_u8(x):
            return x.astype(jnp.int32).astype(jnp.uint8)

        ds_ref[:, :, s * _COLS : (s + 1) * _COLS] = jnp.stack(
            [to_u8(x) for x in ds], axis=0
        )
        if dyn:
            # out-of-rect stat slots read as 0 and land at (0,0)/bin-0 like
            # geometry padding; the caller's dynamic corrections remove them
            in_rect = (
                (rowi >= ry0) & (rowi < ry1) & (coli >= rx0) & (coli < rx1)
            )
            stat = lambda x: jnp.where(in_rect, x, jnp.uint8(0))
        else:
            stat = lambda x: x
        yuv = []
        for i in range(3):
            acc = (
                kcoef[i][0] * r8 + kcoef[i][1] * g8 + kcoef[i][2] * b8
                + np.float32(kcoef[i][3] + half)
            )
            q = jnp.clip(jnp.floor(acc * inv), 0.0, 255.0)
            yuv.append(jnp.where(valid, to_u8(q), jnp.uint8(0)))
        u_ref[s, 0] = stat(yuv[1])
        v_ref[s, 0] = stat(yuv[2])
        if yuv_data:
            # YUV component mode: waveform data = Y,U,V; no alpha skip
            # (the reference conversion writes a=1, data/common.effect:30,41)
            data = yuv
        else:
            mask = a8 != 0.0
            zero = jnp.uint8(0)
            data = [
                jnp.where(mask, to_u8(x), zero) for x in (r8, g8, b8)
            ]
        d0_ref[s, 0] = stat(data[0])
        d1_ref[s, 0] = stat(data[1])
        d2_ref[s, 0] = stat(data[2])


# ---------------------------------------------------------------------------
# Packed-input channel extraction (shared by the band kernel; also used by
# the measured-rejected mega-kernel experiment in benchmarks/mega_kernel.py)
# ---------------------------------------------------------------------------


def _extract_channels(x, packed: bool, n: int = 4):
    """Packed (R, W) u32 -> n (R, W) i32 byte planes; planar passthrough."""
    if packed:
        xi = jax.lax.bitcast_convert_type(x[:], jnp.int32)
        return [(xi >> (8 * c)) & 255 for c in range(n)]
    return [x[c].astype(jnp.int32) for c in range(n)]


@functools.partial(
    jax.jit,
    static_argnames=(
        "cs", "scale", "yuv_data", "with_overlays", "packed",
        "th_low", "th_high", "zb_cs", "fc_cs", "peak_th", "peak_rgba",
        "interpret", "col_split",
    ),
)
def frame_pipeline(
    planes: jax.Array,
    tm: jax.Array | float = 0.0,
    rect: jax.Array | None = None,
    *,
    cs: int,
    scale: int,
    yuv_data: bool = False,
    with_overlays: bool = True,
    packed: bool = False,
    th_low: float = 0.75,
    th_high: float = 1.0,
    zb_cs: int = 2,
    fc_cs: int = 2,
    peak_th: int = 3062,
    peak_rgba: tuple[int, int, int, int] = (255, 0, 0, 255),
    interpret: bool = False,
    col_split: int = 1,
):
    """(4, H4, W4) u8 planar frame -> everything, in two Mosaic kernels.

    With packed=True the input is instead the (H4, W4) u32 bitcast view of
    the interleaved RGBA frame — the kernel extracts the bytes itself, so
    the planarize pass and its pad copy disappear from the program.

    ``rect`` is an optional DYNAMIC (4,) i32 ROI (x0, y0, x1, y1) in SCALED
    coordinates (clamped here): statistics count only in-rect pixels (the
    waveform keeps its full (3,256,W) shape — out-of-rect columns are
    all-zero, in-rect columns bit-identical to a static crop), while
    ds_planes and the overlays stay full-capture.  Dragging the rect never
    recompiles — it enters the kernel as four SMEM scalars
    (doc/design-dynamic-roi.md).

    Returns (vs_i32 (256,256), wv_i32 (3,256,W), ds_planes (4,H,W),
    zebra, falsecolor, focuspeaking (4,H4,W4) u8) where H=H4//scale —
    statistics at the capture scale, overlays at full resolution (the
    reference's standalone-source defaults).  With with_overlays=False the
    overlay outputs are None (the dock feeds its overlay scopes from the
    shared capture instead).  Bit-exact twins of the separate ops.
    """
    from ..colorspace import Colorspace, FIXED_COEFFS, FIXED_SHIFT, LUMA_COEF
    from ..golden.reference import luma_threshold_fixed

    if scale != 1 and (scale % 2 or _BAND % scale or _BAND // scale < 8):
        raise ValueError(
            "frame_pipeline supports scale 1/2/4/8 (even divisors of the "
            f"64-row band with >=8 output rows per band), got {scale}"
        )
    if col_split not in (1, 2) or (col_split == 2 and scale != 1):
        raise ValueError("col_split=2 requires scale=1")
    h4, w4 = planes.shape[-2], planes.shape[-1]
    h, w = h4 // scale, w4 // scale
    s = _cdiv(w, _COLS)
    if col_split == 2 and s < 2:
        col_split = 1  # a single stripe cannot split
    oh = _BAND // scale
    # exact band count: a band whose OUTPUT block index would be entirely
    # out of range clamps onto the last block and clobbers it, so no output
    # array may be more than one partial block short of the grid
    nb = _cdiv(h4, _BAND)
    hp = nb * _BAND
    # wide enough for the s statistics stripes AND the full-res overlay
    # columns (w4 can exceed s*scale*128 when scale divides w4 unevenly)
    w4p = max(s * _COLS * scale, _cdiv(w4, _COLS) * _COLS)
    if packed:
        # (H4, W4) u32 view of the interleaved frame: no planarize, no pad
        # materialization — Pallas masks the out-of-range block regions and
        # the kernel's valid-masks/crops make their contents irrelevant
        x = planes
    else:
        x = jnp.pad(planes, ((0, 0), (0, hp - h4), (0, w4p - w4)))

    k = np.asarray(FIXED_COEFFS[Colorspace(cs)], np.float32)
    kcoef = tuple(tuple(float(v) for v in row) for row in k)
    kl = lambda c: tuple(
        float(int(round(v * (1 << FIXED_SHIFT)))) for v in LUMA_COEF[Colorspace(c)]
    )
    ov_params = (
        h4,
        w4,
        float(luma_threshold_fixed(th_low)),
        float(luma_threshold_fixed(th_high)),
        kl(zb_cs),
        kl(fc_cs),
        int(peak_th),
        tuple(int(v) for v in peak_rgba),
    )

    dyn = rect is not None
    if dyn:
        r = jnp.asarray(rect, jnp.int32)
        rx0 = jnp.clip(r[0], 0, w)
        ry0 = jnp.clip(r[1], 0, h)
        rx1 = jnp.clip(r[2], rx0, w)
        ry1 = jnp.clip(r[3], ry0, h)
        rect_c = jnp.stack([rx0, ry0, rx1, ry1]).reshape(1, 4)

    s_blk = _cdiv(s, col_split)  # statistics stripes per grid step
    wb = s_blk * _COLS if col_split > 1 else w4p  # lane width per grid step
    params = (h, w, w4p, s, scale, packed, yuv_data, kcoef, ov_params,
              with_overlays, dyn, col_split, s_blk, wb)

    # MXU column/row matrices for the even-scale downscale (dummies at
    # scale 1).  Scale 2 sums both members of each pair; every even scale
    # >= 4 is the reference's center-2x2 sample — select the two middle
    # columns/rows of each block (sample position (i+0.5)*s - 0.5 =
    # midpoint of the middle 2x2, ops/convert.downscale_planes) — same
    # (sum+2)>>2 rounding, so the kernel body is ONE generic block with
    # different 0/1 matrices.
    if scale >= 2:
        kc = jax.lax.broadcasted_iota(
            jnp.int32, (scale * _COLS, _COLS), 0
        )
        jc = jax.lax.broadcasted_iota(
            jnp.int32, (scale * _COLS, _COLS), 1
        )
        ir = jax.lax.broadcasted_iota(jnp.int32, (oh, scale * oh), 0)
        kr = jax.lax.broadcasted_iota(jnp.int32, (oh, scale * oh), 1)
        mid = (kc % scale == scale // 2 - 1) | (kc % scale == scale // 2)
        p2 = ((kc // scale == jc) & mid).astype(jnp.float32)
        midr = (kr % scale == scale // 2 - 1) | (kr % scale == scale // 2)
        q2 = ((kr // scale == ir) & midr).astype(jnp.float32)
    else:
        p2 = jnp.zeros((8, _COLS), jnp.float32)
        q2 = jnp.zeros((8, _COLS), jnp.float32)

    # index maps take (b,) or (b, c) depending on the grid rank; `ix` adapts
    # a (b, c)-style map so the col_split=1 path keeps its original 1-D grid
    # (and its compiled program) byte-identical
    split = col_split > 1
    ix = (lambda f: f) if split else (lambda f: (lambda b: f(b, 0)))
    sblk = s_blk if split else s  # tile stripes per block
    if packed:
        inspec = lambda: pl.BlockSpec(
            (_BAND, wb), ix(lambda b, c: (b, c)), memory_space=pltpu.VMEM
        )
        row8 = lambda f: pl.BlockSpec(
            (8, wb), (lambda *a: f(*a)[1:]), memory_space=pltpu.VMEM
        )
        colblk = lambda f: pl.BlockSpec(
            (_BAND, _COLS), ix(f), memory_space=pltpu.VMEM
        )
        nrb = _cdiv(h4, 8)
    else:
        inspec = lambda: pl.BlockSpec(
            (4, _BAND, wb), ix(lambda b, c: (0, b, c)), memory_space=pltpu.VMEM
        )
        row8 = lambda f: pl.BlockSpec((4, 8, wb), f, memory_space=pltpu.VMEM)
        colblk = lambda f: pl.BlockSpec(
            (4, _BAND, _COLS),
            ix(lambda b, c: (0,) + f(b, c)),
            memory_space=pltpu.VMEM,
        )
        nrb = hp // 8
    fullspec = lambda: pl.BlockSpec(
        (4, _BAND, wb), ix(lambda b, c: (0, b, c)), memory_space=pltpu.VMEM
    )
    tile = lambda: pl.BlockSpec(
        (sblk, 1, oh, _COLS), ix(lambda b, c: (c, b, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    tile_shape = jax.ShapeDtypeStruct((s, nb, oh, _COLS), jnp.uint8)
    # output arrays are EXACT-shaped: Pallas drops the out-of-range part of
    # edge blocks, so the padded-geometry crops (which materialized ~140 MB
    # of copies per 4K frame whenever a consumer needed the dense result)
    # disappear from the program entirely
    full_shape = lambda: jax.ShapeDtypeStruct((4, h4, w4), jnp.uint8)
    ds_spec = pl.BlockSpec(
        (4, oh, sblk * _COLS), ix(lambda b, c: (0, b, c)),
        memory_space=pltpu.VMEM,
    )
    # exact ds needs every band's block to start inside the array; at
    # scale 2 with h4 % 64 == 1 the last band's scaled rows all fall past
    # h (floor division) — pad the rows there and crop after (rare shape).
    # With a column split the same applies to the stripe axis: the second
    # half-block must start inside the array (s_blk < s holds by the s >= 2
    # guard, and s_blk*_COLS < w needs w > half width — true whenever the
    # split is worthwhile; fall back to padded width otherwise).
    ds_exact = (nb - 1) * oh < h and (not split or s_blk * _COLS < w)
    ds_shape = jax.ShapeDtypeStruct(
        (4, h if ds_exact else nb * oh,
         w if ds_exact else col_split * sblk * _COLS),
        jnp.uint8,
    )

    out_specs: list = []
    out_shape: list = []
    if with_overlays:
        out_specs += [fullspec(), fullspec(), fullspec()]
        out_shape += [full_shape(), full_shape(), full_shape()]
    out_specs += [tile(), tile(), tile(), tile(), tile(), ds_spec]
    out_shape += [tile_shape] * 5 + [ds_shape]

    in_specs = [
        inspec(),
        # 8-row halo blocks: the prev halo row b*64-1 is row 7 of 8-row
        # block b*8-1; the next halo row (b+1)*64 is row 0 of block
        # (b+1)*8; edge clamps feed rows the math masks out (ri==0/h4-1)
        row8(ix(lambda b, c: (0, jnp.maximum(b * (_BAND // 8) - 1, 0), c))),
        row8(
            ix(lambda b, c: (
                0, jnp.minimum((b + 1) * (_BAND // 8), nrb - 1), c
            ))
        ),
        pl.BlockSpec(p2.shape, ix(lambda b, c: (0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(q2.shape, ix(lambda b, c: (0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), ix(lambda b, c: (0, 0)),
                     memory_space=pltpu.SMEM),
    ]
    args = [x, x, x, p2, q2, jnp.reshape(jnp.asarray(tm, jnp.float32), (1, 1))]
    if dyn:
        in_specs.append(
            pl.BlockSpec((1, 4), ix(lambda b, c: (0, 0)),
                         memory_space=pltpu.SMEM)
        )
        args.append(rect_c)
    if split:
        # neighbour 128-column blocks for the focus-peaking column halos at
        # the split seam (clamped at the true edges; the kernel masks those)
        nlb = w4p // _COLS
        in_specs.append(
            colblk(lambda b, c: (b, jnp.maximum(c * s_blk - 1, 0)))
        )
        in_specs.append(
            colblk(lambda b, c: (b, jnp.minimum((c + 1) * s_blk, nlb - 1)))
        )
        args += [x, x]
    outs = pl.pallas_call(
        functools.partial(_pipeline_kernel, params),
        grid=(nb, col_split) if split else (nb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)

    outs = list(outs)
    if with_overlays:
        zb, fc, fp = outs[:3]
        outs = outs[3:]
    else:
        zb = fc = fp = None
    u_t, v_t, d0, d1, d2, dsp = outs
    if not ds_exact:
        dsp = dsp[:, :h, :w]
    vs, wv = ps.vs_swar_from_tiles(
        u_t, v_t, jnp.stack([d0, d1, d2], axis=0), oh=oh, w=w,
        interpret=interpret
    )

    # corrections use the PAIR-padded band count: with odd nb, kernel B
    # zeroes a phantom band whose oh*128 slots per stripe count at
    # (0,0)/bin-0 exactly like geometry padding
    nb_eff = nb + (nb % 2)
    if dyn:
        # every slot outside the rect reads u=v=0 / bin-0, exactly like
        # geometry padding — subtract total slots minus the rect population
        n_rect = (rx1 - rx0) * (ry1 - ry0)
        vs = vs.at[0, 0].add(n_rect - jnp.int32(s * _COLS * nb_eff * oh))
        ci = jnp.arange(w, dtype=jnp.int32)
        in_x = (ci >= rx0) & (ci < rx1)
        if yuv_data:
            corr = jnp.int32(nb_eff * oh) - jnp.where(in_x, ry1 - ry0, 0)
        else:
            # alpha-skipped pixels only count where they are inside the rect
            ri = jnp.arange(h, dtype=jnp.int32)[:, None]
            a0 = jnp.sum(
                (dsp[3] == 0) & (ri >= ry0) & (ri < ry1),
                axis=0,
                dtype=jnp.int32,
            )
            corr = jnp.int32(nb_eff * oh) - jnp.where(
                in_x, (ry1 - ry0) - a0, 0
            )
        wv = wv.at[:, 0, :].add(-corr[None, :])
        return vs, wv, dsp, zb, fc, fp
    n_pad = s * _COLS * nb_eff * oh - h * w
    vs = vs.at[0, 0].add(jnp.int32(-n_pad))
    # bin-0 corrections: alpha-skipped pixels (RGB mode) plus the pad rows,
    # which are not present in the exact-shaped ds
    if yuv_data:
        corr = jnp.full((w,), nb_eff * oh - h, jnp.int32)
    else:
        corr = jnp.sum(dsp[3] == 0, axis=0, dtype=jnp.int32) + jnp.int32(
            nb_eff * oh - h
        )
    wv = wv.at[:, 0, :].add(-corr[None, :])
    return vs, wv, dsp, zb, fc, fp
