"""Overlay scopes: zebra, false color, focus peaking (JAX).

These are pure per-pixel GPU shaders in the reference with no readback
(SURVEY.md §3.3); here they are fused elementwise/stencil jit functions over
HBM-resident frames.  Luma thresholds use the same 2^12 fixed point as the
golden model — carried in integer-valued float32, which is exact below 2^24
and avoids the TPU's emulated (slow) int32 multiply.

All functions take uint8 RGBA (..., H, W, 4) and return the same shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .convert import luma_fixed
from ..colorspace import FIXED_SHIFT
from ..golden.reference import (
    FALSECOLOR_BANDS,
    falsecolor_band_colors_u8,
    luma_threshold_fixed,
)


@functools.partial(jax.jit, static_argnames=("cs", "th_low", "th_high"))
def zebra(
    rgba: jax.Array, th_low: float, th_high: float, tm: jax.Array | float, cs: int
) -> jax.Array:
    """Diagonal-stripe overlay (reference data/zebra.effect:26-48).

    Stripes where ``floor(x + y + 1 + tm) mod 6 < 3`` and
    th_low <= luma <= th_high; striped pixels become opaque black.
    ``tm`` is traced (the stripe clock animates every frame,
    reference src/zebra.c:660-666) — no recompile per tick.
    """
    luma = luma_fixed(rgba, cs=cs)  # integer-valued f32
    lo = np.float32(luma_threshold_fixed(th_low))
    hi = np.float32(luma_threshold_fixed(th_high))
    h, w = rgba.shape[-3], rgba.shape[-2]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    phase = jnp.floor(xx + yy + 1.0 + jnp.float32(tm)).astype(jnp.int32) % 6
    stripe = (luma >= lo) & (luma <= hi) & (phase < 3)
    black = jnp.asarray([0, 0, 0, 255], dtype=jnp.uint8)
    return jnp.where(stripe[..., None], black, rgba)


# Precomputed device constants for the 12-band cascade.
_BAND_COLORS = falsecolor_band_colors_u8()  # (12, 4) u8
_BAND_THRESH = np.asarray(
    [luma_threshold_fixed(t) for t, _ in FALSECOLOR_BANDS[:-1]], dtype=np.float32
)  # (11,) upper bounds, exclusive


@functools.partial(jax.jit, static_argnames=("cs",))
def falsecolor(rgba: jax.Array, cs: int) -> jax.Array:
    """12-band false color (reference data/falsecolor.effect:38-61).

    The cascade is a monotone threshold ladder, so the color is a chain of
    11 selects on the f32 luma — no per-pixel gather (XLA TPU gathers are
    serialized and were ~10x the cost of the whole op).
    """
    luma = luma_fixed(rgba, cs=cs)  # (..., H, W) f32
    out = jnp.broadcast_to(
        jnp.asarray(_BAND_COLORS[-1]), rgba.shape[:-1] + (4,)
    )
    # walk the ladder top-down: luma < th_i selects band i
    for i in range(len(_BAND_THRESH) - 1, -1, -1):
        sel = (luma < _BAND_THRESH[i])[..., None]
        out = jnp.where(sel, jnp.asarray(_BAND_COLORS[i]), out)
    return out


@functools.partial(jax.jit, static_argnames=("cs", "lut_n"))
def falsecolor_lut(rgba: jax.Array, lut: jax.Array, cs: int, lut_n: int) -> jax.Array:
    """User 1-D LUT false color (reference data/falsecolor.effect:36-37).

    Point-sampled with clamp at u = luma: ``i = clip(floor(luma*N), 0, N-1)``
    using the fixed-point luma (scale 255 * 2^12).

    ``luma * N`` needs ~2^35 — past int32 (and JAX runs without x64) — so
    the floor-divide is split exactly: with luma = a*256 + b and
    D = 255*2^12 = 4080*256,

        (luma*N) // D = (a*N)//4080 + (((a*N) mod 4080)*256 + b*N) // D

    every intermediate < 2^27 for N <= 32768.
    """
    if lut_n > 32768:
        raise ValueError("falsecolor LUT larger than 32768 entries")
    luma = luma_fixed(rgba, cs=cs).astype(jnp.int32)
    a = luma >> 8
    b = luma & 255
    an = a * jnp.int32(lut_n)
    q = an // 4080
    r = an - q * 4080
    i = q + (r * 256 + b * jnp.int32(lut_n)) // (4080 * 256)
    i = jnp.clip(i, 0, lut_n - 1)
    return jnp.take(lut, i, axis=0)


@jax.jit
def focus_peaking(
    rgba: jax.Array, th_fixed: jax.Array | int, peaking_color_u8: jax.Array
) -> jax.Array:
    """4-neighbor edge highlight (reference data/focuspeaking.effect:26-48).

    d = sum over RGB and the +-dx/+-dy cross of |neighbor - center|
    (edge-clamped), compared in integer space against ``th_fixed`` from
    :func:`golden.peaking_threshold_fixed` (the shader's literal 0.3333
    constant baked in; computed on host so both paths share one integer).
    Matching pixels are replaced by the peaking color (u8 RGBA (4,)).

    NOTE (parity): like the reference, this is a cross-shaped gradient
    magnitude, not a true Sobel (SURVEY.md §2 #16).
    """
    rgb = rgba[..., :3]
    h, w = rgb.shape[-3], rgb.shape[-2]

    # |a-b| in u8 via max-min (no int32 widening); edge clamp means border
    # neighbor diffs are zero, so each axis needs one forward-difference
    # array contributed twice (as left- and right-neighbor), zero-padded at
    # the respective edge.  Everything stays u8/i16 — ~8x less traffic than
    # the naive roll-based formulation.
    def absdiff_sum(a, b):
        d = jnp.maximum(a, b) - jnp.minimum(a, b)
        return d.astype(jnp.int16).sum(axis=-1)  # <= 765, fits i16

    dx = absdiff_sum(rgb[..., :, 1:, :], rgb[..., :, :-1, :])  # (H, W-1)
    dy = absdiff_sum(rgb[..., 1:, :, :], rgb[..., :-1, :, :])  # (H-1, W)
    zx = jnp.zeros(dx.shape[:-1] + (1,), jnp.int16)
    sx = jnp.concatenate([dx, zx], axis=-1) + jnp.concatenate([zx, dx], axis=-1)
    zrow = jnp.zeros(dy.shape[:-2] + (1, w), jnp.int16)
    sy = jnp.concatenate([dy, zrow], axis=-2) + jnp.concatenate([zrow, dy], axis=-2)
    acc = (sx + sy).astype(jnp.int32)  # max 4*765 = 3060

    peak = acc >= jnp.asarray(th_fixed, jnp.int32)
    return jnp.where(peak[..., None], peaking_color_u8.astype(jnp.uint8), rgba)
