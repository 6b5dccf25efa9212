"""Pallas TPU kernels for the statistics accumulators (round-2 design).

Same exact integer semantics as ops.stats (bit-exact vs the golden model),
but formulated so ALL hot work rides the MXU and the VPU only builds
one-hots in their cheapest layout:

  * Frames are pre-arranged in XLA into **column stripes**: a (H, W) plane
    becomes (S, Rf, 1, 8192) where each 8192-lane "flat row" holds 64 image
    rows x 128 columns of one stripe (lane L belongs to column L%128).
    In this layout a bins-first one-hot — ``iota(256,8192) == row`` — is a
    cheap sublane broadcast-compare (no transpose/relayout), measured ~10x
    cheaper than the pixels-first build of the round-1 kernels.
  * **Vectorscope** = ``one_hot(V) @ one_hot(U)^T`` per flat row: an NT
    matmul (contract the 8192-pixel lane axis of both int8 operands) into a
    VMEM-resident 256x256 int32 accumulator.  K=8192 per step keeps the MXU
    at ~80% of its int8 peak.
  * **Waveform** = SWAR bin-packing on the VPU over natural (64, 128)
    tiles (rows on sublanes, columns on lanes — the per-column reduction
    is a sublane sum, no lane reshape).  Bin b = 4g+j packs into 8-bit
    field j of an int32 at group row g: per pixel ``field = 1 << 8*(v&3)``,
    selected by ``v>>2 == g`` — 64 group-compares per pixel instead of the
    256 of a direct one-hot, and no matmul at all.  Row sums stay < 256
    (a tile has 64 rows) so fields cannot carry; unpack once per tile.
    This replaced the round-2 SEL-matmul reduction, which was 204 G MACs
    per 1080p frame of MXU work (MORE than the vectorscope matmul); the
    SWAR VPU work overlaps the VS matmul almost completely (fused kernel:
    1.79 -> 0.75 ms per 1080p frame, benchmarks/sweep_r3a.py).
  * **Masking without masks**: alpha-skipped pixels are pre-zeroed in XLA
    and their per-column population subtracted from bin 0 afterwards;
    stripe padding is likewise subtracted (bin (0,0) for the vectorscope,
    bin 0 per column for the waveform).  Exact integer corrections — no
    256-wide mask AND in the hot loop.

Histograms reuse the waveform accumulator: ``hist = wv.sum(-1)``
(identical counting semantics, reference src/histogram.c:357-395).

All outputs are raw int32 counts; saturation (and u8 cast) happens at the
caller so multi-device psum merges stay bit-exact (reference semantics:
u8 saturating increments, src/vectorscope.c:217-238, src/waveform.c:220-257
— saturation commutes with counting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 256
_LANES = 8192
_COLS = 128           # image columns per stripe
_ROWS = _LANES // _COLS  # image rows per flat row (64)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _stripe4(plane: jax.Array) -> jax.Array:
    """(H, W) u8 -> (S, Rf, 1, 8192) column-stripe layout, zero-padded.

    Lane L of a flat row belongs to image column (stripe*128 + L%128); the
    64 row-groups of a flat row are consecutive image rows.
    """
    h, w = plane.shape
    s = _cdiv(w, _COLS)
    rf = _cdiv(h, _ROWS)
    p = jnp.pad(plane, ((0, rf * _ROWS - h), (0, s * _COLS - w)))
    return p.reshape(rf * _ROWS, s, _COLS).swapaxes(0, 1).reshape(s, rf, 1, _LANES)


def _stripe_tiles(plane: jax.Array) -> jax.Array:
    """(H, W) u8 -> (S, Rf, 64, 128) natural tiles (rows on sublanes),
    zero-padded — same memory walk as _stripe4 without the flat reshape."""
    h, w = plane.shape
    s = _cdiv(w, _COLS)
    rf = _cdiv(h, _ROWS)
    p = jnp.pad(plane, ((0, rf * _ROWS - h), (0, s * _COLS - w)))
    return p.reshape(rf * _ROWS, s, _COLS).swapaxes(0, 1).reshape(s, rf, _ROWS, _COLS)


def _in4(c: int | None = None) -> pl.BlockSpec:
    if c is None:
        return pl.BlockSpec(
            (1, 1, 1, _LANES), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.BlockSpec(
        (c, 1, 1, 1, _LANES), lambda s, r: (0, s, r, 0, 0), memory_space=pltpu.VMEM
    )


def _tile_spec(c: int | None = None) -> pl.BlockSpec:
    """Block spec for (S, Rf, 64, 128) tile arrays (optionally C-stacked)."""
    if c is None:
        return pl.BlockSpec(
            (1, 1, _ROWS, _COLS), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.BlockSpec(
        (c, 1, 1, _ROWS, _COLS),
        lambda s, r: (0, s, r, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _swar_tile_counts(vals_u8: jax.Array, acc: jax.Array) -> jax.Array:
    """Add one (rows<=255, L) u8 tile's per-column bin counts to acc (256, L).

    SWAR packing: for each bin group g = v >> 2, an int32 accumulates the
    four bins 4g..4g+3 as 8-bit fields (field = 1 << 8*(v & 3)); the
    per-(group, column) sum over the tile's <=255 rows cannot carry across
    fields, so the unpack is exact.
    """
    assert vals_u8.shape[-2] <= 255, (
        f"SWAR 8-bit fields carry beyond 255 rows per tile, got "
        f"{vals_u8.shape[-2]}"
    )
    lanes = vals_u8.shape[-1]
    vals = vals_u8.astype(jnp.int32)
    grp = vals >> 2
    fld = jnp.int32(1) << ((vals & 3) * 8)
    n_grp = N_BINS // 4
    rows = []
    for g in range(n_grp):
        rows.append(jnp.sum(jnp.where(grp == g, fld, 0), axis=0, keepdims=True))
    packed = jnp.concatenate(rows, axis=0)  # (64, L)
    shift = (jax.lax.broadcasted_iota(jnp.int32, (N_BINS, lanes), 0) % 4) * 8
    un = jnp.broadcast_to(packed[:, None, :], (n_grp, 4, lanes)).reshape(
        N_BINS, lanes
    )
    return acc + ((un >> shift) & 255)


def _one_hot_bins_first(row: jax.Array, lanes: int = _LANES) -> jax.Array:
    """(.., lanes) u8 -> (256, lanes) int8 one-hot (sublane broadcast-compare)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, lanes), 0)
    return (iota == row.astype(jnp.int32)).astype(jnp.int8)


def _nt_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """(256, K) x (256, K) -> (256, 256) int32, contracting the lane axis."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


# ---------------------------------------------------------------------------
# Vectorscope
# ---------------------------------------------------------------------------

def _vs_kernel(u_ref, v_ref, out_ref):
    s = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when((s == 0) & (r == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ohu = _one_hot_bins_first(u_ref[0, 0])
    ohv = _one_hot_bins_first(v_ref[0, 0])
    out_ref[:] += _nt_matmul(ohv, ohu)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vectorscope_pallas_i32(yuv_planes: jax.Array, interpret: bool = False) -> jax.Array:
    """Unsaturated (256,256) int32 counts[v,u]; all pixels count.

    yuv_planes: uint8 (3, H, W) in Y,U,V plane order.
    """
    h, w = yuv_planes.shape[1], yuv_planes.shape[2]
    u_s = _stripe4(yuv_planes[1])
    v_s = _stripe4(yuv_planes[2])
    s, rf = u_s.shape[0], u_s.shape[1]
    counts = pl.pallas_call(
        _vs_kernel,
        grid=(s, rf),
        in_specs=[_in4(), _in4()],
        out_specs=pl.BlockSpec(
            (N_BINS, N_BINS), lambda s, r: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
        interpret=interpret,
    )(u_s, v_s)
    # stripe padding is zero-valued -> counted at (v=0, u=0); subtract exactly
    n_pad = s * _COLS * rf * _ROWS - h * w
    return counts.at[0, 0].add(jnp.int32(-n_pad))


# ---------------------------------------------------------------------------
# Waveform (+ histogram via column sum)
# ---------------------------------------------------------------------------

def _wv_kernel(c: int, data_ref, out_ref):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for ci in range(c):
        out_ref[ci] = _swar_tile_counts(data_ref[ci, 0, 0], out_ref[ci])


def _wv_corrections(mask: jax.Array, h: int, w: int, rf: int) -> jax.Array:
    """Per-column count of pixels that were force-zeroed: alpha-skipped ones
    plus the (rf*64 - h) stripe pad rows every column receives."""
    skipped = jnp.sum(~mask, axis=0, dtype=jnp.int32)
    return skipped + jnp.int32(rf * _ROWS - h)


@functools.partial(jax.jit, static_argnames=("interpret",))
def waveform_pallas_i32(
    planes_in: jax.Array, mask: jax.Array, interpret: bool = False
) -> jax.Array:
    """Unsaturated (C, 256, W) int32 per-column counts with alpha skip.

    planes_in: uint8 (C, H, W) value planes; mask: bool (H, W).
    """
    c, h, w = planes_in.shape
    vals = jnp.where(mask[None], planes_in, 0)
    tiles = jax.vmap(_stripe_tiles)(vals)  # (C, S, Rf, 64, 128)
    s, rf = tiles.shape[1], tiles.shape[2]
    wv = pl.pallas_call(
        functools.partial(_wv_kernel, c),
        grid=(s, rf),
        in_specs=[_tile_spec(c)],
        out_specs=pl.BlockSpec(
            (c, N_BINS, _COLS), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, N_BINS, s * _COLS), jnp.int32),
        interpret=interpret,
    )(tiles)
    wv = wv[:, :, :w]
    return wv.at[:, 0, :].add(-_wv_corrections(mask, h, w, rf)[None, :])


def histogram_from_waveform(wv_i32: jax.Array) -> jax.Array:
    """(C,256,W) i32 -> (C,256) u32; counting semantics are identical."""
    return wv_i32.sum(axis=-1).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Fused vectorscope + waveform (the dock's hot combination): one kernel,
# one shared grid — the VS matmul rides the MXU while the SWAR waveform
# rides the VPU, and Mosaic overlaps them (the fused kernel costs barely
# more than the VS matmul alone).
# ---------------------------------------------------------------------------

def _fused_kernel(c: int, u_ref, v_ref, data_ref, vs_ref, wv_ref):
    s = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when((s == 0) & (r == 0))
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    @pl.when(r == 0)
    def _():
        wv_ref[:] = jnp.zeros_like(wv_ref)

    ohu = _one_hot_bins_first(u_ref[0, 0])
    ohv = _one_hot_bins_first(v_ref[0, 0])
    vs_ref[:] += _nt_matmul(ohv, ohu)
    for ci in range(c):
        wv_ref[ci] = _swar_tile_counts(data_ref[ci, 0, 0], wv_ref[ci])


def _one_hot_row(row: jax.Array) -> jax.Array:
    """(128,) u8 -> (256, 128) int8 one-hot."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, _COLS), 0)
    return (iota == row.astype(jnp.int32)).astype(jnp.int8)


def _vs_rows_matmul(u_tile: jax.Array, v_tile: jax.Array, rows: int) -> jax.Array:
    """(rows, 128) U/V tiles -> (256, 256) counts via per-row K=128 NT
    matmuls.  Same MXU op count as one K=rows*128 flat-row matmul, but the
    one-hot builds are smaller and NO lane-merging reshape is needed in
    XLA — measured FASTER end-to-end than the flat-row formulation
    (0.78 vs 1.02 ms per 4K frame incl. the copies it avoids,
    benchmarks/sweep_r3c.py).  Returns the LIST of per-row products; the
    caller tree-reduces them (a serial acc += chain of (256,256) adds
    measured ~0.05 ms/frame slower — the dependent adds serialize behind
    the matmuls, benchmarks/sweep_r3h.py)."""
    return [
        _nt_matmul(_one_hot_row(v_tile[r]), _one_hot_row(u_tile[r]))
        for r in range(rows)
    ]


def _tree_sum(ms: list) -> jax.Array:
    while len(ms) > 1:
        ms = [a + b for a, b in zip(ms[::2], ms[1::2])] + (
            [ms[-1]] if len(ms) % 2 else []
        )
    return ms[0]


def _pair_tile_spec(c: int | None, rows: int) -> pl.BlockSpec:
    if c is None:
        return pl.BlockSpec(
            (1, 2, rows, _COLS), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.BlockSpec(
        (c, 1, 2, rows, _COLS),
        lambda s, r: (0, s, r, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _vs_swar_tiles_kernel(rows: int, nb_real: int, u_ref, v_ref, data_ref,
                          vs_ref, wv_ref):
    """Fused VS + SWAR waveform over band-PAIR tiles (kernel B of the frame
    pipeline; a per-band variant measured 0.17 ms/4K-frame slower — the
    pair halves the SWAR unpacks and the wv read-modify-writes).

    When the real band count is odd, the tile arrays are padded with one
    NEVER-WRITTEN band whose contents are undefined; the last pair's
    second tile is zeroed here, so its pixels count as (0,0)/bin-0 exactly
    like geometry padding and the caller's corrections (which use the
    padded band count) stay exact."""
    s = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when((s == 0) & (r == 0))
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    @pl.when(r == 0)
    def _():
        wv_ref[:] = jnp.zeros_like(wv_ref)

    ms = []
    tiles = []
    for j in range(2):
        u_t, v_t = u_ref[0, j], v_ref[0, j]
        d_t = [data_ref[ci, 0, j] for ci in range(3)]
        if j == 1 and nb_real % 2:
            pad = 2 * r + 1 >= nb_real  # scalar: last pair's pad tile
            zero = jnp.uint8(0)
            u_t = jnp.where(pad, zero, u_t)
            v_t = jnp.where(pad, zero, v_t)
            d_t = [jnp.where(pad, zero, d) for d in d_t]
        ms += _vs_rows_matmul(u_t, v_t, rows)
        tiles.append(d_t)
    vs_ref[:] += _tree_sum(ms)
    for ci in range(3):
        tile = jnp.concatenate([tiles[0][ci], tiles[1][ci]], axis=0)
        wv_ref[ci] = _swar_tile_counts(tile, wv_ref[ci])


def vs_swar_from_tiles(
    u_t: jax.Array,
    v_t: jax.Array,
    data_t: jax.Array,
    *,
    oh: int,
    w: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Tiles (S,NB,OH,128) + data (3,S,NB,OH,128) -> (vs i32, wv i32).

    w: real image width — the waveform output array is exact-shaped
    (3, 256, w); Pallas drops the out-of-range lanes of the last stripe's
    block, so no crop/copy is needed downstream.

    The tile arrays' band dim may include ONE trailing pad band (making it
    even for the pair grid); nb_real tells the kernel to zero it.
    """
    s, nb = u_t.shape[0], u_t.shape[1]
    nb_pad = nb + (nb % 2)
    if w is None:
        w = s * _COLS
    return pl.pallas_call(
        functools.partial(_vs_swar_tiles_kernel, oh, nb),
        grid=(s, nb_pad // 2),
        in_specs=[
            _pair_tile_spec(None, oh),
            _pair_tile_spec(None, oh),
            _pair_tile_spec(3, oh),
        ],
        out_specs=(
            pl.BlockSpec(
                (N_BINS, N_BINS), lambda si, ri: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, N_BINS, _COLS), lambda si, ri: (0, 0, si),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
            jax.ShapeDtypeStruct((3, N_BINS, w), jnp.int32),
        ),
        interpret=interpret,
    )(u_t, v_t, data_t)


# ---------------------------------------------------------------------------
# Fused scale-2 ingest: downscale x2 + RGB->YUV + alpha pre-zeroing + stripe
# layout, all in ONE Mosaic pass over the full-resolution frame.  Replaces
# the XLA downscale/convert/transpose chain on the hot path (~0.4 ms saved
# per 4K frame, measured).
#
# STATUS: superseded on the hot path by ops/pallas_pipeline.frame_pipeline
# (round-2 final); RETAINED as the independently-derived comparison twin
# the pipeline kernels are tested against (tests/test_pipeline_kernel.py)
# — an implementation with a different grid/layout that must produce the
# same integers is a stronger oracle than a refactored copy.  Column pairs ride the MXU (f32 matmul against a
# fixed pair matrix — exact for u8 sums); row pairs are a second tiny
# matmul at Precision.HIGHEST (pair sums <= 510 are NOT bf16-exact, so the
# default MXU operand precision would be off by one).
# ---------------------------------------------------------------------------

def _ingest_kernel(kcoef, h, w, s_total: int, scale: int, yuv_data: bool,
                   planes_ref, p2_ref, q2_ref,
                   u_ref, v_ref, d0_ref, d1_ref, d2_ref, ds_ref):
    """One grid step = one 64-output-row BAND across the full width; the
    stripe loop is unrolled inside (few fat steps amortize per-step
    overhead — the per-(s,r)-block variant measured 0.33 ms/4K frame of
    pure grid overhead, this one is ~free)."""
    r_blk = pl.program_id(0)
    half = np.float32(1 << 11)
    inv = np.float32(1.0 / (1 << 12))
    for s in range(s_total):
        if scale == 2:
            p2 = p2_ref[:]
            q2 = q2_ref[:]
            ds = []
            for c in range(4):
                x = (
                    planes_ref[c, :, s * 2 * _COLS : (s + 1) * 2 * _COLS]
                    .astype(jnp.int32)
                    .astype(jnp.float32)
                )  # (128, 256)
                t = jax.lax.dot_general(
                    x, p2,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                rp = jax.lax.dot_general(
                    q2, t,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    # t holds pair sums <= 510: NOT bf16-exact; the default
                    # MXU operand precision would be off by one
                    precision=jax.lax.Precision.HIGHEST,
                )
                ds.append(jnp.floor((rp + 2.0) * 0.25))  # (64,128) bilinear x2
        else:
            ds = [
                planes_ref[c, :, s * _COLS : (s + 1) * _COLS]
                .astype(jnp.int32)
                .astype(jnp.float32)
                for c in range(4)
            ]
        rowi = r_blk * _ROWS + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _COLS), 0)
        coli = s * _COLS + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _COLS), 1)
        # zero outside the real image: the stripe grid covers padded
        # geometry, and zeros land in bin 0 / (0,0) where the exact
        # corrections remove them
        valid = (rowi < h) & (coli < w)
        ds = [jnp.where(valid, x, 0.0) for x in ds]
        r8, g8, b8, a8 = ds

        def to_u8(x):
            return x.astype(jnp.int32).astype(jnp.uint8)

        ds_ref[:, :, s * _COLS : (s + 1) * _COLS] = jnp.stack(
            [to_u8(x) for x in ds], axis=0
        )
        yuv = []
        for i in range(3):
            acc = (
                kcoef[i][0] * r8 + kcoef[i][1] * g8 + kcoef[i][2] * b8
                + np.float32(kcoef[i][3] + half)
            )
            q = jnp.clip(jnp.floor(acc * inv), 0.0, 255.0)
            yuv.append(jnp.where(valid, to_u8(q), jnp.uint8(0)))
        u_ref[s, 0] = yuv[1]
        v_ref[s, 0] = yuv[2]
        if yuv_data:
            # YUV component mode: waveform data = Y,U,V; no alpha skip
            # (the reference conversion writes a=1, data/common.effect:30,41)
            d0_ref[s, 0] = yuv[0]
            d1_ref[s, 0] = yuv[1]
            d2_ref[s, 0] = yuv[2]
        else:
            mask = a8 != 0.0
            zero = jnp.uint8(0)
            d0_ref[s, 0] = jnp.where(mask, to_u8(r8), zero)
            d1_ref[s, 0] = jnp.where(mask, to_u8(g8), zero)
            d2_ref[s, 0] = jnp.where(mask, to_u8(b8), zero)


def _fused_ingest_stats(planes, cs: int, scale: int, yuv_data: bool,
                        interpret: bool):
    """Shared implementation: band-ingest kernel -> all-MXU stats kernel."""
    from ..colorspace import Colorspace, FIXED_COEFFS

    h4, w4 = planes.shape[-2], planes.shape[-1]
    h, w = h4 // scale, w4 // scale
    s = _cdiv(w, _COLS)
    rf = _cdiv(h, _ROWS)
    x = planes[:, : scale * h, : scale * w]
    x = jnp.pad(
        x,
        (
            (0, 0),
            (0, rf * scale * _ROWS - scale * h),
            (0, s * scale * _COLS - scale * w),
        ),
    )
    k = np.asarray(FIXED_COEFFS[Colorspace(cs)], np.float32)
    kcoef = tuple(tuple(float(v) for v in row) for row in k)
    # pair matrices for the MXU downscale (unused static branch at scale 1)
    p2 = (
        jax.lax.broadcasted_iota(jnp.int32, (2 * _COLS, _COLS), 0) // 2
        == jax.lax.broadcasted_iota(jnp.int32, (2 * _COLS, _COLS), 1)
    ).astype(jnp.float32)
    q2 = (
        jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 2 * _ROWS), 1) // 2
        == jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 2 * _ROWS), 0)
    ).astype(jnp.float32)
    sb = lambda: pl.BlockSpec(
        (s, 1, _ROWS, _COLS), lambda ri: (0, ri, 0, 0), memory_space=pltpu.VMEM
    )
    u_s, v_s, d0, d1, d2, dsp = pl.pallas_call(
        functools.partial(_ingest_kernel, kcoef, h, w, s, scale, yuv_data),
        grid=(rf,),
        in_specs=[
            pl.BlockSpec(
                (4, scale * _ROWS, s * scale * _COLS),
                lambda ri: (0, ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2 * _COLS, _COLS), lambda ri: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 2 * _ROWS), lambda ri: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            sb(), sb(), sb(), sb(), sb(),
            pl.BlockSpec(
                (4, _ROWS, s * _COLS), lambda ri: (0, ri, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            *(
                jax.ShapeDtypeStruct((s, rf, _ROWS, _COLS), jnp.uint8)
                for _ in range(5)
            ),
            jax.ShapeDtypeStruct((4, rf * _ROWS, s * _COLS), jnp.uint8),
        ),
        interpret=interpret,
    )(x, p2, q2)

    # (s, rf, 64, 128) rows are contiguous == the VS kernel's flat rows;
    # the waveform tiles are consumed in their natural layout directly
    resh = lambda a: a.reshape(s, rf, 1, _LANES)
    tiles = jnp.stack([d0, d1, d2], axis=0)  # (3, s, rf, 64, 128)
    vs, wv = pl.pallas_call(
        functools.partial(_fused_kernel, 3),
        grid=(s, rf),
        in_specs=[_in4(), _in4(), _tile_spec(3)],
        out_specs=(
            pl.BlockSpec(
                (N_BINS, N_BINS), lambda si, ri: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, N_BINS, _COLS), lambda si, ri: (0, 0, si), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
            jax.ShapeDtypeStruct((3, N_BINS, s * _COLS), jnp.int32),
        ),
        interpret=interpret,
    )(resh(u_s), resh(v_s), tiles)

    n_pad = s * _COLS * rf * _ROWS - h * w
    vs = vs.at[0, 0].add(jnp.int32(-n_pad))
    wv = wv[:, :, :w]
    if yuv_data:
        # zeros only come from the stripe padding (no alpha skip)
        corr = jnp.full((w,), rf * _ROWS - h, jnp.int32)
    else:
        # the ds alpha plane carries both alpha-skips and padding as zeros
        corr = jnp.sum(dsp[3] == 0, axis=0, dtype=jnp.int32)[:w]
    wv = wv.at[:, 0, :].add(-corr[None, :])
    return vs, wv, dsp[:, :h, :w]


@functools.partial(jax.jit, static_argnames=("cs", "yuv_data", "interpret"))
def fused_ingest_stats_scale1(
    planes: jax.Array,
    cs: int,
    yuv_data: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(4, H, W) u8 planar -> the scale-1 statistics (no downscale).

    Returns (vs_i32 (256,256), wv_i32 (3,256,W)): one Mosaic pass fuses
    RGB->YUV + alpha pre-zeroing + the stripe layout, feeding the all-MXU
    stats kernel (the scale-2 twin is fused_ingest_stats_scale2).
    """
    vs, wv, _ = _fused_ingest_stats(planes, cs, 1, yuv_data, interpret)
    return vs, wv


@functools.partial(jax.jit, static_argnames=("cs", "yuv_data", "interpret"))
def fused_ingest_stats_scale2(
    planes: jax.Array,
    cs: int,
    yuv_data: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full-resolution (4, H4, W4) u8 planar -> the scale-2 statistics.

    Returns (vs_i32 (256,256), wv_i32 (3,256,W), ds_planes (4,H,W)) where
    H=H4//2, W=W4//2: one Mosaic ingest pass (downscale+YUV+mask+stripe)
    feeding the all-MXU stats kernel.  yuv_data selects the waveform\'s
    component source (RGB with alpha skip, or Y/U/V unmasked).  Bit-exact
    vs the XLA chain (reference semantics: src/common.c:141-250 scaled
    render + conversion, then the accumulators).
    """
    return _fused_ingest_stats(planes, cs, 2, yuv_data, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_vs_wv_pallas_i32(
    planes_in: jax.Array,
    yuv_planes: jax.Array,
    mask: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One pass: (vs (256,256) i32, wv (C,256,W) i32), both unsaturated.

    planes_in: (C, H, W) u8 waveform value planes; yuv_planes: (3, H, W);
    mask: (H, W) bool (waveform alpha skip; VS counts every pixel).
    """
    c, h, w = planes_in.shape
    vals = jnp.where(mask[None], planes_in, 0)
    tiles = jax.vmap(_stripe_tiles)(vals)
    u_s = _stripe4(yuv_planes[1])
    v_s = _stripe4(yuv_planes[2])
    s, rf = u_s.shape[0], u_s.shape[1]
    vs, wv = pl.pallas_call(
        functools.partial(_fused_kernel, c),
        grid=(s, rf),
        in_specs=[_in4(), _in4(), _tile_spec(c)],
        out_specs=(
            pl.BlockSpec(
                (N_BINS, N_BINS), lambda s, r: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (c, N_BINS, _COLS), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
            jax.ShapeDtypeStruct((c, N_BINS, s * _COLS), jnp.int32),
        ),
        interpret=interpret,
    )(u_s, v_s, tiles)
    n_pad = s * _COLS * rf * _ROWS - h * w
    vs = vs.at[0, 0].add(jnp.int32(-n_pad))
    wv = wv[:, :, :w]
    wv = wv.at[:, 0, :].add(-_wv_corrections(mask, h, w, rf)[None, :])
    return vs, wv
