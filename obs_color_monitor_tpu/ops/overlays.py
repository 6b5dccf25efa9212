"""Overlay scopes: zebra, false color, focus peaking (JAX).

These are pure per-pixel GPU shaders in the reference with no readback
(SURVEY.md §3.3); here they are fused elementwise/stencil jit functions over
HBM-resident frames.  Luma thresholds use the same 20-bit fixed point as the
golden model so results are bit-exact on every backend.

All functions take uint8 RGBA (..., H, W, 4) and return the same shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .convert import luma_fixed
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
    luma = luma_fixed(rgba, cs=cs)
    lo = jnp.int32(luma_threshold_fixed(th_low))
    hi = jnp.int32(luma_threshold_fixed(th_high))
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
    [luma_threshold_fixed(t) for t, _ in FALSECOLOR_BANDS[:-1]], dtype=np.int32
)  # (11,) upper bounds, exclusive


@functools.partial(jax.jit, static_argnames=("cs",))
def falsecolor(rgba: jax.Array, cs: int) -> jax.Array:
    """12-band false color (reference data/falsecolor.effect:38-61).

    Band index = number of upper bounds <= luma (the cascade is a
    monotone threshold ladder) -> a sum of 11 compares, then a tiny LUT
    gather (12 entries broadcast as constants — no real gather, XLA turns
    ``take`` from a 12-row constant into selects).
    """
    luma = luma_fixed(rgba, cs=cs)  # (..., H, W) int32
    th = jnp.asarray(_BAND_THRESH)  # (11,)
    idx = (luma[..., None] >= th).sum(axis=-1).astype(jnp.int32)  # 0..11
    colors = jnp.asarray(_BAND_COLORS)  # (12, 4)
    return jnp.take(colors, idx, axis=0)


@functools.partial(jax.jit, static_argnames=("cs", "lut_n"))
def falsecolor_lut(rgba: jax.Array, lut: jax.Array, cs: int, lut_n: int) -> jax.Array:
    """User 1-D LUT false color (reference data/falsecolor.effect:36-37).

    Point-sampled with clamp at u = luma: ``i = clip(floor(luma*N), 0, N-1)``
    using the fixed-point luma (scale 255 * 2^20).

    ``luma * N`` needs ~2^40 — past int32 (and JAX runs without x64) — so
    the floor-divide is split exactly: with luma = a*2^12 + b and
    D = 255*2^20 = 65280*2^12,

        (luma*N) // D = (a*N)//65280 + (((a*N) mod 65280)*2^12 + b*N) // D

    every intermediate < 2^29 for N <= 32768.
    """
    if lut_n > 32768:
        raise ValueError("falsecolor LUT larger than 32768 entries")
    luma = luma_fixed(rgba, cs=cs)
    a = luma >> 12
    b = luma & 4095
    an = a * jnp.int32(lut_n)
    q = an // 65280
    r = an - q * 65280
    i = q + (r * 4096 + b * jnp.int32(lut_n)) // (65280 * 4096)
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
    rgb = rgba[..., :3].astype(jnp.int32)

    def shifted(dy, dx):
        # edge clamp via pad-with-edge then slice
        s = jnp.roll(rgb, shift=(-dy, -dx), axis=(-3, -2))
        h, w = rgb.shape[-3], rgb.shape[-2]
        # fix the wrapped border to clamp semantics
        if dy == 1:
            s = s.at[..., h - 1, :, :].set(rgb[..., h - 1, :, :])
        elif dy == -1:
            s = s.at[..., 0, :, :].set(rgb[..., 0, :, :])
        if dx == 1:
            s = s.at[..., :, w - 1, :].set(rgb[..., :, w - 1, :])
        elif dx == -1:
            s = s.at[..., :, 0, :].set(rgb[..., :, 0, :])
        return s

    acc = jnp.zeros(rgb.shape[:-1], jnp.int32)
    for dy, dx in ((0, 1), (1, 0), (0, -1), (-1, 0)):
        acc = acc + jnp.abs(shifted(dy, dx) - rgb).sum(axis=-1)

    peak = acc >= jnp.asarray(th_fixed, jnp.int32)
    return jnp.where(peak[..., None], peaking_color_u8.astype(jnp.uint8), rgba)
