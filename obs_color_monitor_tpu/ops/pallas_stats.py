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
  * **Waveform** = ``one_hot(vals) @ SEL`` where SEL is the fixed 0/1
    selection matrix SEL[p, c] = [p % 128 == c]: the per-column reduction is
    itself an int8 MXU matmul, so the whole statistics pass is MXU-bound
    (the VPU reshape-reduce alternative measured 3x slower — lane-axis
    reshapes relayout).
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


def _sel_matrix() -> jax.Array:
    """SEL[p, c] = [p % 128 == c] as int8 (the waveform's column-reduction
    matmul operand); built on device, folded by XLA."""
    r = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _COLS), 0) % _COLS
    c = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _COLS), 1)
    return (r == c).astype(jnp.int8)


def _in4(c: int | None = None) -> pl.BlockSpec:
    if c is None:
        return pl.BlockSpec(
            (1, 1, 1, _LANES), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.BlockSpec(
        (c, 1, 1, 1, _LANES), lambda s, r: (0, s, r, 0, 0), memory_space=pltpu.VMEM
    )


def _one_hot_bins_first(row: jax.Array) -> jax.Array:
    """(1, 8192) u8 -> (256, 8192) int8 one-hot (sublane broadcast-compare)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, _LANES), 0)
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

def _wv_kernel(c: int, data_ref, sel_ref, out_ref):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for ci in range(c):
        oh = _one_hot_bins_first(data_ref[ci, 0, 0])
        out_ref[ci] += jax.lax.dot_general(
            oh, sel_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )


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
    striped = jax.vmap(_stripe4)(vals)  # (C, S, Rf, 1, LANES)
    s, rf = striped.shape[1], striped.shape[2]
    wv = pl.pallas_call(
        functools.partial(_wv_kernel, c),
        grid=(s, rf),
        in_specs=[
            _in4(c),
            pl.BlockSpec((_LANES, _COLS), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (c, N_BINS, _COLS), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, N_BINS, s * _COLS), jnp.int32),
        interpret=interpret,
    )(striped, _sel_matrix())
    wv = wv[:, :, :w]
    return wv.at[:, 0, :].add(-_wv_corrections(mask, h, w, rf)[None, :])


def histogram_from_waveform(wv_i32: jax.Array) -> jax.Array:
    """(C,256,W) i32 -> (C,256) u32; counting semantics are identical."""
    return wv_i32.sum(axis=-1).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Fused vectorscope + waveform (the dock's hot combination): one kernel,
# shared grid, everything on the MXU.
# ---------------------------------------------------------------------------

def _fused_kernel(c: int, u_ref, v_ref, data_ref, sel_ref, vs_ref, wv_ref):
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
        oh = _one_hot_bins_first(data_ref[ci, 0, 0])
        wv_ref[ci] += jax.lax.dot_general(
            oh, sel_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )


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
    striped = jax.vmap(_stripe4)(vals)
    u_s = _stripe4(yuv_planes[1])
    v_s = _stripe4(yuv_planes[2])
    s, rf = u_s.shape[0], u_s.shape[1]
    vs, wv = pl.pallas_call(
        functools.partial(_fused_kernel, c),
        grid=(s, rf),
        in_specs=[
            _in4(),
            _in4(),
            _in4(c),
            pl.BlockSpec((_LANES, _COLS), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
        ],
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
    )(u_s, v_s, striped, _sel_matrix())
    n_pad = s * _COLS * rf * _ROWS - h * w
    vs = vs.at[0, 0].add(jnp.int32(-n_pad))
    wv = wv[:, :, :w]
    wv = wv.at[:, 0, :].add(-_wv_corrections(mask, h, w, rf)[None, :])
    return vs, wv
