"""Pallas TPU kernels for the statistics accumulators.

These are the hand-scheduled versions of ops.stats: same exact integer
semantics (bit-exact vs the golden model), but with explicit VMEM
accumulators and tiling chosen for the v5e:

  * ``vectorscope_pallas`` — streams 128-row blocks; per 32x128 sub-tile it
    builds (4096, 256) int8 one-hots of U and V and rides
    ``one_hot(V)^T @ one_hot(U)`` on the MXU into a VMEM-resident 256x256
    int32 accumulator (the output block, constant index map — written back
    once).  Invalid (padding) pixels get value 256 and miss every bin; no
    multiply needed for masking.
  * ``waveform_pallas`` — grid (columns, rows); per column stripe a
    (C, 256, 128) int32 accumulator lives in the output block; the one-hot
    is built bins-on-sublanes (256, SUB, 128) so the row reduction needs no
    transpose.  The alpha-skip mask folds into the same value-256 trick.

Histograms reuse the waveform accumulator: ``hist = wv.sum(-1)``
(identical counting semantics, reference src/histogram.c:357-395).

All outputs are raw int32 counts; saturation (and u8 cast) happens at the
caller so multi-device psum merges stay bit-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 256
_ROW_BLOCK = 128
_COL_BLOCK = 128
# Rows per one-hot/matmul sub-tile inside a block.  Swept on v5e: 64 is
# ~1.5x faster than 32 (larger vector ops, K=8192 matmuls); 128 is equal
# but doubles transient VMEM.
_SUB = 64


def _pad_to(x: jax.Array, h: int, w: int, axes=(0, 1), fill=0) -> jax.Array:
    pads = [(0, 0)] * x.ndim
    pads[axes[0]] = (0, h - x.shape[axes[0]])
    pads[axes[1]] = (0, w - x.shape[axes[1]])
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads, constant_values=fill)
    return x


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


# ---------------------------------------------------------------------------
# Vectorscope
# ---------------------------------------------------------------------------

def _vs_kernel(h: int, w: int, u_ref, v_ref, out_ref):
    j = pl.program_id(0)  # column tile
    i = pl.program_id(1)  # row block (fast axis)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row0 = i * _ROW_BLOCK
    col0 = j * _COL_BLOCK

    def sub(s, _):
        u = u_ref[pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
        v = v_ref[pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
        # out-of-bounds rows/cols -> value 256 (misses every bin)
        rows = row0 + s * _SUB + jax.lax.broadcasted_iota(
            jnp.int32, (_SUB, _COL_BLOCK), 0
        )
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (_SUB, _COL_BLOCK), 1)
        u = jnp.where((rows < h) & (cols < w), u, 256)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N_BINS), 2)
        ohu = (u[:, :, None] == iota).astype(jnp.int8).reshape(
            _SUB * _COL_BLOCK, N_BINS
        )
        ohv = (v[:, :, None] == iota).astype(jnp.int8).reshape(
            _SUB * _COL_BLOCK, N_BINS
        )
        out_ref[:] += jax.lax.dot_general(
            ohv,
            ohu,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return _

    jax.lax.fori_loop(0, _ROW_BLOCK // _SUB, sub, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vectorscope_pallas_i32(yuv_planes: jax.Array, interpret: bool = False) -> jax.Array:
    """Unsaturated (256,256) int32 counts[v,u]; all pixels count.

    yuv_planes: uint8 (3, H, W) in Y,U,V plane order.
    """
    h, w = yuv_planes.shape[1], yuv_planes.shape[2]
    hp = _round_up(h, _ROW_BLOCK)
    wp = _round_up(w, _COL_BLOCK)
    u = _pad_to(yuv_planes[1], hp, wp)
    v = _pad_to(yuv_planes[2], hp, wp)
    grid = (wp // _COL_BLOCK, hp // _ROW_BLOCK)
    return pl.pallas_call(
        functools.partial(_vs_kernel, h, w),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_ROW_BLOCK, _COL_BLOCK), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_ROW_BLOCK, _COL_BLOCK), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (N_BINS, N_BINS), lambda j, i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
        interpret=interpret,
    )(u, v)


# ---------------------------------------------------------------------------
# Waveform (+ histogram via column sum)
# ---------------------------------------------------------------------------

def _wv_kernel(c: int, planes_ref, mask_ref, out_ref):
    i = pl.program_id(1)  # row block (fast axis)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def sub(s, _):
        m = mask_ref[pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1, 1), 0)
        for ci in range(c):
            vals = planes_ref[ci, pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
            vals = jnp.where(m != 0, vals, 256)  # skipped pixels miss all bins
            oh = (iota == vals[None, :, :]).astype(jnp.int8)  # (256, SUB, 128)
            out_ref[ci, :, :] += oh.sum(axis=1, dtype=jnp.int32)
        return _

    jax.lax.fori_loop(0, _ROW_BLOCK // _SUB, sub, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def waveform_pallas_i32(
    planes_in: jax.Array, mask: jax.Array, interpret: bool = False
) -> jax.Array:
    """Unsaturated (C, 256, W) int32 per-column counts with alpha skip.

    planes_in: uint8 (C, H, W) value planes; mask: bool (H, W).
    """
    c, h, w = planes_in.shape
    hp = _round_up(h, _ROW_BLOCK)
    wp = _round_up(w, _COL_BLOCK)
    planes = _pad_to(planes_in, hp, wp, axes=(1, 2))
    m = _pad_to(mask.astype(jnp.uint8), hp, wp)
    grid = (wp // _COL_BLOCK, hp // _ROW_BLOCK)
    out = pl.pallas_call(
        functools.partial(_wv_kernel, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (c, _ROW_BLOCK, _COL_BLOCK),
                lambda j, i: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_ROW_BLOCK, _COL_BLOCK), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (c, N_BINS, _COL_BLOCK), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, N_BINS, wp), jnp.int32),
        interpret=interpret,
    )(planes, m)
    return out[:, :, :w]


def histogram_from_waveform(wv_i32: jax.Array) -> jax.Array:
    """(C,256,W) i32 -> (C,256) u32; counting semantics are identical."""
    return wv_i32.sum(axis=-1).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Fused vectorscope + waveform (the dock's hot combination)
#
# The VS matmul rides the MXU while the waveform one-hot reduction rides the
# VPU; in one kernel Mosaic can overlap them, where separate pallas_calls
# serialize (~1.3 ms saved per 4K frame at scale 2).
# ---------------------------------------------------------------------------

def _fused_kernel(c: int, h: int, w: int, planes_ref, u_ref, v_ref, mask_ref,
                  vs_ref, wv_ref):
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    @pl.when(i == 0)
    def _():
        wv_ref[:] = jnp.zeros_like(wv_ref)

    row0 = i * _ROW_BLOCK
    col0 = j * _COL_BLOCK
    iota_px = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N_BINS), 2)
    iota_bins = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1, 1), 0)

    def body(s, _):
        # --- waveform: bins-on-sublanes one-hot row reduction (VPU) ---
        m = mask_ref[pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
        for ci in range(c):
            vals = planes_ref[ci, pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
            vals = jnp.where(m != 0, vals, 256)
            oh = (iota_bins == vals[None]).astype(jnp.int8)
            wv_ref[ci, :, :] += oh.sum(axis=1, dtype=jnp.int32)

        # --- vectorscope: one_hot(V)^T @ one_hot(U) (MXU) ---
        u = u_ref[pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
        v = v_ref[pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
        rows = row0 + s * _SUB + jax.lax.broadcasted_iota(
            jnp.int32, (_SUB, _COL_BLOCK), 0
        )
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (_SUB, _COL_BLOCK), 1)
        u = jnp.where((rows < h) & (cols < w), u, 256)
        ohu = (u[:, :, None] == iota_px).astype(jnp.int8).reshape(
            _SUB * _COL_BLOCK, N_BINS
        )
        ohv = (v[:, :, None] == iota_px).astype(jnp.int8).reshape(
            _SUB * _COL_BLOCK, N_BINS
        )
        vs_ref[:] += jax.lax.dot_general(
            ohv,
            ohu,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return _

    jax.lax.fori_loop(0, _ROW_BLOCK // _SUB, body, None)


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
    hp = _round_up(h, _ROW_BLOCK)
    wp = _round_up(w, _COL_BLOCK)
    planes = _pad_to(planes_in, hp, wp, axes=(1, 2))
    u = _pad_to(yuv_planes[1], hp, wp)
    v = _pad_to(yuv_planes[2], hp, wp)
    m = _pad_to(mask.astype(jnp.uint8), hp, wp)
    grid = (wp // _COL_BLOCK, hp // _ROW_BLOCK)
    vs, wv = pl.pallas_call(
        functools.partial(_fused_kernel, c, h, w),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (c, _ROW_BLOCK, _COL_BLOCK),
                lambda j, i: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_ROW_BLOCK, _COL_BLOCK), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_ROW_BLOCK, _COL_BLOCK), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_ROW_BLOCK, _COL_BLOCK), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (N_BINS, N_BINS), lambda j, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (c, N_BINS, _COL_BLOCK),
                lambda j, i: (0, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
            jax.ShapeDtypeStruct((c, N_BINS, wp), jnp.int32),
        ),
        interpret=interpret,
    )(planes, u, v, m)
    return vs, wv[:, :, :w]
