"""Statistics accumulators as MXU matmuls (XLA path, planar).

The reference computes these with per-pixel scalar scatter loops on the CPU
after a GPU->CPU readback (src/vectorscope.c:217-238, src/waveform.c:220-257,
src/histogram.c:357-395).  A data-dependent scatter is the one thing TPUs
refuse to do fast — so none of these are scatters here:

  * histogram (256 bins)   = 16x16 outer product of nibble one-hots,
                             ``A_hi^T @ A_lo`` on the MXU (int8 -> int32);
  * vectorscope (256x256)  = ``one_hot(U)^T @ one_hot(V)`` — a perfectly
                             MXU-shaped (256 x N) @ (N x 256) matmul,
                             scanned over pixel chunks;
  * waveform (256 x W)     = masked one-hot row-reduction, scanned over
                             row blocks (columns ride the lane axis).

All counts are exact int32 (one-hot entries are 0/1; int8 x int8 -> int32
accumulation is exact), then saturated exactly like the reference
(u8 min-255 for vectorscope/waveform — saturating increment commutes with
counting — and u32 for the histogram).

Inputs are PLANAR: value planes (C, H, W) u8 + mask (H, W) (see ops.convert
for the layout rationale).  Single-frame; batch via jax.vmap.

This is the portable XLA path; ops.pallas_stats holds the hand-scheduled
TPU kernels (selected by ops.fused.analyze on TPU backends).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

VS_SIZE = 256
WV_SIZE = 256
HI_SIZE = 256

# Pixels per vectorscope matmul chunk (scanned: constant compile time).
_VS_CHUNK = 8192
# Rows per waveform reduction block.
_WV_ROWS = 8
# Pixels per histogram matmul chunk.
_HI_CHUNK = 65536


def _one_hot_u8(vals: jax.Array, n: int, dtype=jnp.int8) -> jax.Array:
    """(...,) u8 -> (..., n) 0/1 one-hot via iota compare (no scatter)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, vals.shape + (n,), vals.ndim)
    return (vals.astype(jnp.int32)[..., None] == iota).astype(dtype)


# ---------------------------------------------------------------------------
# Histogram
# ---------------------------------------------------------------------------

@jax.jit
def histogram_counts(planes: jax.Array, mask: jax.Array) -> jax.Array:
    """256-bin per-channel counts.

    planes: uint8 (3, H, W); mask: bool (H, W) — pixels with alpha==0 are
    skipped (reference src/histogram.c:385-387).  Returns uint32 (3, 256).

    Nibble decomposition: count[b] = sum_p 1[hi(v_p)=hi(b)] * 1[lo(v_p)=lo(b)]
    -> a (16 x N) @ (N x 16) matmul per channel, int8 on the MXU, scanned
    over fixed-size pixel chunks (masked padding contributes nothing).
    """
    flat = planes.reshape(3, -1)
    n = flat.shape[1]
    pad = (-n) % _HI_CHUNK
    m = jnp.pad(mask.reshape(-1), (0, pad)).astype(jnp.int8)
    flat = jnp.pad(flat, ((0, 0), (0, pad)))
    nchunks = (n + pad) // _HI_CHUNK
    flat = flat.reshape(3, nchunks, _HI_CHUNK).swapaxes(0, 1)  # (chunks, 3, N)
    m = m.reshape(nchunks, _HI_CHUNK)

    def body(acc, args):
        d, mm = args  # (3, N), (N,)
        outs = []
        for c in range(3):
            hi = _one_hot_u8(d[c] >> 4, 16) * mm[:, None]
            lo = _one_hot_u8(d[c] & 15, 16)
            c16 = jax.lax.dot_general(
                hi,
                lo,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            outs.append(c16.reshape(HI_SIZE))
        return acc + jnp.stack(outs), None

    acc0 = jnp.zeros((3, HI_SIZE), jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, (flat, m))
    return acc.astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("sel", "level_fixed", "level_ratio_permille")
)
def histogram_hi_max(
    counts: jax.Array,
    sel: tuple[bool, bool, bool],
    n_pixels: jax.Array | int,
    level_fixed: int,
    level_ratio_permille: int,
) -> jax.Array:
    """Normalization ceiling (reference src/histogram.c:396-402,342-355).

    Static level config; n_pixels may be traced (ROI-dependent).
    Returns uint32 (3,).
    """
    if level_fixed > 0:
        v = jnp.uint32(max(1, int(level_fixed)))
        return jnp.full((3,), v, dtype=jnp.uint32)
    if level_ratio_permille > 0:
        # floor(n*p/1000) computed overflow-safe in uint32: with n = 1000q+r,
        # n*p/1000 = q*p + r*p/1000 exactly.  (A naive uint64 product silently
        # narrows to uint32 under JAX's default x64-off and overflows above
        # ~4.3M pixels; reference src/histogram.c:397-402 uses a real uint64.)
        n = jnp.asarray(n_pixels, dtype=jnp.uint32)
        p = jnp.uint32(level_ratio_permille)
        q, r = n // 1000, n % 1000
        v = q * p + (r * p) // 1000
        v = jnp.maximum(v, 1).astype(jnp.uint32)
        return jnp.full((3,), 1, dtype=jnp.uint32) * v
    hi = jnp.maximum(counts.max(axis=1), 1).astype(jnp.uint32)
    sel_arr = jnp.asarray(sel, dtype=bool)
    return jnp.where(sel_arr, hi, jnp.uint32(1))


@functools.partial(jax.jit, static_argnames=("sel", "logscale"))
def histogram_levels(
    counts: jax.Array, hi_max: jax.Array, sel: tuple[bool, bool, bool], logscale: bool
) -> tuple[jax.Array, jax.Array]:
    """Float draw levels + effective hi_max (reference src/histogram.c:404-417)."""
    sel_arr = jnp.asarray(sel, dtype=bool)[:, None]
    cf = counts.astype(jnp.float32)
    if logscale:
        s = 1.0 / jnp.log(hi_max.astype(jnp.float32) + 1.0)
        lv = jnp.where(counts > 0, jnp.log(cf + 1.0) * s[:, None], 0.0)
        lv = jnp.where(sel_arr, lv, 0.0)
        return lv, jnp.ones((3,), jnp.float32)
    return cf, hi_max.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Vectorscope
# ---------------------------------------------------------------------------

@jax.jit
def vectorscope_counts_i32(yuv_planes: jax.Array) -> jax.Array:
    """Unsaturated int32 vectorscope counts (for cross-device psum merges:
    saturation must happen AFTER the merge to stay bit-exact).

    yuv_planes: uint8 (3, H, W) in Y,U,V plane order.
    """
    u = yuv_planes[1].reshape(-1)
    v = yuv_planes[2].reshape(-1)
    n = u.shape[0]
    pad = (-n) % _VS_CHUNK
    valid = jnp.arange(n + pad, dtype=jnp.int32) < n
    u = jnp.pad(u, (0, pad))
    v = jnp.pad(v, (0, pad))
    nchunks = (n + pad) // _VS_CHUNK
    u = u.reshape(nchunks, _VS_CHUNK)
    v = v.reshape(nchunks, _VS_CHUNK)
    valid = valid.reshape(nchunks, _VS_CHUNK)

    def body(acc, args):
        uc, vc, mc = args
        a = _one_hot_u8(uc, VS_SIZE) * mc[:, None].astype(jnp.int8)
        b = _one_hot_u8(vc, VS_SIZE)
        acc = acc + jax.lax.dot_general(
            b,
            a,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc, None

    acc0 = jnp.zeros((VS_SIZE, VS_SIZE), jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, (u, v, valid))
    return acc


@jax.jit
def vectorscope_counts(yuv_planes: jax.Array) -> jax.Array:
    """256x256 CbCr occupancy, u8 saturating; counts[v, u], v ascending.

    Every pixel counts — no alpha skip (reference src/vectorscope.c:217-238).
    Saturating increment commutes with counting, so the clamp happens once.
    """
    return jnp.minimum(vectorscope_counts_i32(yuv_planes), 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Waveform
# ---------------------------------------------------------------------------

@jax.jit
def waveform_counts_i32(planes: jax.Array, mask: jax.Array) -> jax.Array:
    """Unsaturated int32 waveform counts (for cross-device psum merges).

    planes: uint8 (3, H, W); mask: bool (H, W).
    """
    h, w = planes.shape[1], planes.shape[2]
    pad = (-h) % _WV_ROWS
    datap = jnp.pad(planes, ((0, 0), (0, pad), (0, 0)))
    maskp = jnp.pad(mask, ((0, pad), (0, 0)))
    nblk = (h + pad) // _WV_ROWS
    datap = datap.reshape(3, nblk, _WV_ROWS, w).swapaxes(0, 1)  # (blk, 3, R, W)
    maskp = maskp.reshape(nblk, _WV_ROWS, w)

    def body(acc, args):
        d, m = args  # (3, R, W), (R, W)
        oh = _one_hot_u8(d, WV_SIZE)  # (3, R, W, 256)
        oh = oh * m[None, :, :, None].astype(jnp.int8)
        acc = acc + jnp.moveaxis(oh.sum(axis=1, dtype=jnp.int32), -1, 1)
        return acc, None

    acc0 = jnp.zeros((3, WV_SIZE, w), jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, (datap, maskp))
    return acc


@jax.jit
def waveform_counts(planes: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-column 256-level counts, u8 saturating.

    planes: uint8 (3, H, W); mask: bool (H, W) (alpha!=0,
    reference src/waveform.c:247-248).  Returns uint8 (3, 256, W) with the
    value axis ascending (reference flips rows at store; we flip at render).
    """
    return jnp.minimum(waveform_counts_i32(planes, mask), 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Channel selection helpers shared by histogram/waveform models
# ---------------------------------------------------------------------------

def select_planes(
    planes: jax.Array, yuv_planes: jax.Array | None, is_yuv: bool
) -> tuple[jax.Array, jax.Array]:
    """(data (3,H,W), mask (H,W)) per component mode.

    planes: the frame's (4,H,W).  YUV-mode surfaces always have alpha=255
    in the reference (the conversion shader writes a=1,
    data/common.effect:30,41), so that mask is all-true.
    """
    if is_yuv:
        assert yuv_planes is not None
        return yuv_planes, jnp.ones(yuv_planes.shape[-2:], dtype=bool)
    return planes[..., :3, :, :], planes[..., 3, :, :] != 0


def apply_channel_select(counts: jax.Array, sel: tuple[bool, bool, bool]) -> jax.Array:
    """Zero out disabled channels (reference zeroes its buffer first)."""
    sel_arr = np.asarray(sel, dtype=bool).reshape((3,) + (1,) * (counts.ndim - 1))
    return counts * jnp.asarray(sel_arr, dtype=counts.dtype)
