"""Fused single-pass overlay kernel: zebra + false color + focus peaking.

The reference renders these as three separate GPU shader passes over the
same frame (src/zebra.c:599-628, src/focuspeaking.c:273-309); the XLA path
(ops.overlays) mirrors that as three jitted ops.  This Mosaic kernel
computes all three in ONE pass over the planar frame — the frame is read
once, the luma is shared (per-scope colorspaces supported: two lumas cost
two extra multiplies), and the focus-peaking stencil gets its row halo from
neighbor-block views (the column halo is an in-block roll).

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


def _ov_kernel(params, cur_ref, prev_ref, nxt_ref, tm_ref, zb_ref, fc_ref, fp_ref):
    (h, w, zb_lo, zb_hi, kl_zb, kl_fc, peak_th, peak_rgba) = params
    r_blk = pl.program_id(0)
    tm = tm_ref[0, 0]

    cur = [cur_ref[c].astype(jnp.int32) for c in range(4)]  # (RB, W) i32
    ri = r_blk * _RB + jax.lax.broadcasted_iota(jnp.int32, (_RB, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_RB, w), 1)
    r, g, b = (cur[c].astype(jnp.float32) for c in range(3))

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
    zb_ref[:] = jnp.stack([x.astype(jnp.uint8) for x in zb], axis=0)

    # ---- false color: 12-band ladder, transition-deduped
    #      (reference data/falsecolor.effect:38-61) ----
    luma_fc = luma_zb if kl_fc == kl_zb else _luma(kl_fc, r, g, b)
    fc = []
    for c in range(4):
        out = jnp.full((_RB, w), int(_BAND_COLORS[-1][c]), jnp.int32)
        prev_val = int(_BAND_COLORS[-1][c])
        for i in range(len(_BAND_THRESH) - 1, -1, -1):
            v = int(_BAND_COLORS[i][c])
            if v == prev_val:
                continue
            out = jnp.where(luma_fc < np.float32(_BAND_THRESH[i]), v, out)
            prev_val = v
        fc.append(out)
    fc_ref[:] = jnp.stack([x.astype(jnp.uint8) for x in fc], axis=0)

    # ---- focus peaking: 4-neighbor cross, edge diffs zero
    #      (reference data/focuspeaking.effect:26-48) ----
    def absdiff3(a3, b3):
        acc = None
        for a, bb in zip(a3, b3):
            d = jnp.abs(a - bb)
            acc = d if acc is None else acc + d
        return acc  # (RB, W) i32

    rgb32 = cur[:3]
    right = [pltpu.roll(x, w - 1, 1) for x in rgb32]  # x[col+1] (circular)
    dxf = absdiff3(right, rgb32)
    dxf = jnp.where(ci == w - 1, 0, dxf)  # forward diff; zero at the last col
    sx = dxf + pltpu.roll(dxf, 1, 1)  # + dx[col-1]; rolled-in col 0 is 0
    up = [
        jnp.concatenate([p[-1:].astype(jnp.int32), x[:-1]], axis=0)
        for x, p in zip(rgb32, (prev_ref[c] for c in range(3)))
    ]
    down = [
        jnp.concatenate([x[1:], nx[:1].astype(jnp.int32)], axis=0)
        for x, nx in zip(rgb32, (nxt_ref[c] for c in range(3)))
    ]
    du = jnp.where(ri == 0, 0, absdiff3(rgb32, up))
    dd = jnp.where(ri == h - 1, 0, absdiff3(down, rgb32))
    peak = (sx + du + dd) >= peak_th
    fp = [jnp.where(peak, int(peak_rgba[c]), cur[c]) for c in range(4)]
    fp_ref[:] = jnp.stack([x.astype(jnp.uint8) for x in fp], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "th_low", "th_high", "zb_cs", "fc_cs", "peak_th", "peak_rgba", "interpret",
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
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(4, H, W) u8 -> (zebra, falsecolor, focuspeaking) planar u8, one pass.

    Bit-exact twins of ops.overlays.{zebra,falsecolor,focus_peaking}_planes
    with the scopes' own colorspaces (reference zbs_render technique select,
    src/zebra.c:620).
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
    zb, fc, fp = pl.pallas_call(
        functools.partial(_ov_kernel, params),
        grid=(nb,),
        in_specs=[
            blk(lambda r: (0, r, 0)),
            blk(lambda r: (0, jnp.maximum(r - 1, 0), 0)),
            blk(lambda r: (0, jnp.minimum(r + 1, nb - 1), 0)),
            pl.BlockSpec((1, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(blk(lambda r: (0, r, 0)),) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((4, hp, w), jnp.uint8) for _ in range(3)
        ),
        interpret=interpret,
    )(x, x, x, jnp.reshape(jnp.asarray(tm, jnp.float32), (1, 1)))
    return zb[:, :h], fc[:, :h], fp[:, :h]
