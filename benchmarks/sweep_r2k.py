"""Round-2 sweep, part K: fused single-pass overlay kernel
(zebra + falsecolor + focuspeaking) at 4K."""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from obs_color_monitor_tpu.colorspace import Colorspace, LUMA_COEF, FIXED_SHIFT
from obs_color_monitor_tpu.golden.reference import (
    FALSECOLOR_BANDS,
    falsecolor_band_colors_u8,
    luma_threshold_fixed,
)

H4, W4 = 2160, 3840
RB = 32


def _round_trip_s():
    tiny = jax.jit(lambda x: x + 1)
    _ = np.asarray(tiny(jnp.int32(0)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(tiny(jnp.int32(0)))
        best = min(best, time.perf_counter() - t0)
    return best


RT = None


def bench(name, fn, args, n=16):
    global RT
    if RT is None:
        RT = _round_trip_s()
        print(f"# round trip {RT*1e3:.1f} ms", flush=True)

    def cks(out):
        return sum(jnp.sum(l.astype(jnp.int32)) for l in jax.tree_util.tree_leaves(out))

    def rep_f(*a):
        def body(i, acc):
            xs = tuple(
                jnp.bitwise_xor(x, (i % 2).astype(x.dtype)) if x.dtype == jnp.uint8 else x
                for x in a
            )
            return acc + cks(fn(*xs, i.astype(jnp.float32)))

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    try:
        rep = jax.jit(rep_f)
        t0 = time.perf_counter()
        _ = np.asarray(rep(*args))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(rep(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"PASS {name:44s} {(best - RT) * 1e3 / n:9.3f} ms (compile {tc:.0f}s)", flush=True)
    except Exception as e:
        print(f"FAIL {name:44s} {str(e)[:180]}", flush=True)


_BAND_COLORS = falsecolor_band_colors_u8()
_BAND_THRESH = np.asarray(
    [luma_threshold_fixed(t) for t, _ in FALSECOLOR_BANDS[:-1]], dtype=np.float32
)


def _ov_kernel(params, cur_ref, prev_ref, nxt_ref, tm_ref, zb_ref, fc_ref, fp_ref):
    (h, w, zb_lo, zb_hi, kl, fc_cs_same, peak_th, peak_rgba) = params
    r_blk = pl.program_id(0)
    tm = tm_ref[0, 0]

    # all pixel data lives in i32 inside the kernel: bool masks over mixed
    # u8/f32 tile granularities hit "invalid relayout" in Mosaic
    cur = [cur_ref[c].astype(jnp.int32) for c in range(4)]  # (RB, W) i32
    ri = r_blk * RB + jax.lax.broadcasted_iota(jnp.int32, (RB, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (RB, w), 1)

    # shared luma (integer-valued f32, scale 255*2^12)
    r, g, b = (cur[c].astype(jnp.float32) for c in range(3))
    luma = kl[0] * r + kl[1] * g + kl[2] * b

    # ---- zebra ----
    phase = jnp.floor(ri.astype(jnp.float32) + ci.astype(jnp.float32) + 1.0 + tm).astype(jnp.int32) % 6
    stripe = (luma >= zb_lo) & (luma <= zb_hi) & (phase < 3)
    zb = [jnp.where(stripe, 0, cur[c]) for c in range(3)]
    zb.append(jnp.where(stripe, 255, cur[3]))
    zb_ref[:] = jnp.stack([x.astype(jnp.uint8) for x in zb], axis=0)

    # ---- false color (12-band ladder, transition-deduped) ----
    fc = []
    for c in range(4):
        out = jnp.full((RB, w), int(_BAND_COLORS[-1][c]), jnp.int32)
        prev_val = int(_BAND_COLORS[-1][c])
        for i in range(len(_BAND_THRESH) - 1, -1, -1):
            v = int(_BAND_COLORS[i][c])
            if v == prev_val:
                continue
            out = jnp.where(luma < np.float32(_BAND_THRESH[i]), v, out)
            prev_val = v
        fc.append(out)
    fc_ref[:] = jnp.stack([x.astype(jnp.uint8) for x in fc], axis=0)

    # ---- focus peaking (4-neighbor cross, edge diffs zero) ----
    def absdiff3(a3, b3):
        acc = None
        for a, b in zip(a3, b3):
            d = jnp.abs(a - b)
            acc = d if acc is None else acc + d
        return acc  # (RB, W) i32

    rgb32 = cur[:3]
    right = [pltpu.roll(x, w - 1, 1) for x in rgb32]
    dxf = absdiff3(right, rgb32)
    dxf = jnp.where(ci == w - 1, 0, dxf)  # forward diff, zero at last col
    sx = dxf + pltpu.roll(dxf, 1, 1)  # + dx[c-1]; rolled-in col0 is dx[W-1]=0

    up = [
        jnp.concatenate([p[-1:].astype(jnp.int32), x[:-1]], axis=0)
        for x, p in zip(rgb32, (prev_ref[c] for c in range(3)))
    ]
    down = [
        jnp.concatenate([x[1:], nx[:1].astype(jnp.int32)], axis=0)
        for x, nx in zip(rgb32, (nxt_ref[c] for c in range(3)))
    ]
    du = absdiff3(rgb32, up)
    du = jnp.where(ri == 0, 0, du)
    dd = absdiff3(down, rgb32)
    dd = jnp.where(ri == h - 1, 0, dd)
    acc = sx + du + dd
    peak = acc >= peak_th
    fp = [jnp.where(peak, peak_rgba[c], cur[c]) for c in range(4)]
    fp_ref[:] = jnp.stack([x.astype(jnp.uint8) for x in fp], axis=0)


def fused_overlays(planes, tm, zb_lo, zb_hi, cs, peak_th, peak_rgba):
    c, h, w = planes.shape
    nb = -(-h // RB)
    hp = nb * RB
    x = jnp.pad(planes, ((0, 0), (0, hp - h), (0, 0)))
    kl = tuple(
        float(int(round(v * (1 << FIXED_SHIFT)))) for v in LUMA_COEF[Colorspace(cs)]
    )
    params = (h, w, float(luma_threshold_fixed(zb_lo)), float(luma_threshold_fixed(zb_hi)),
              kl, True, int(peak_th), tuple(int(v) for v in peak_rgba))
    blk = lambda f: pl.BlockSpec((4, RB, w), f, memory_space=pltpu.VMEM)
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
    )(x, x, x, jnp.reshape(tm.astype(jnp.float32), (1, 1)))
    return zb[:, :h], fc[:, :h], fp[:, :h]


def main():
    from obs_color_monitor_tpu.ops import overlays as ov

    rng = np.random.default_rng(0)
    planes4k = jax.device_put(rng.integers(0, 256, (4, H4, W4), np.uint8))
    pc = np.array([255, 84, 0, 255], np.uint8)
    pcj = jax.device_put(pc)

    only = set(sys.argv[1:])

    def want(name):
        return not only or any(k in name for k in only)

    if want("check"):
        z1, f1, p1 = jax.jit(
            lambda p, t: fused_overlays(p, t, 0.75, 1.0, 2, 3062, pc)
        )(planes4k, jnp.float32(7.0))
        z2 = ov.zebra_planes(planes4k, 0.75, 1.0, jnp.float32(7.0), cs=2)
        f2 = ov.falsecolor_planes(planes4k, cs=2)
        p2 = ov.focus_peaking_planes(planes4k, 3062, pcj)
        print(f"# fused overlays exact: zb={(np.asarray(z1)==np.asarray(z2)).all()}"
              f" fc={(np.asarray(f1)==np.asarray(f2)).all()}"
              f" fp={(np.asarray(p1)==np.asarray(p2)).all()}", flush=True)
    if want("fused"):
        bench("fused overlays 4K", lambda p, t: fused_overlays(p, t, 0.75, 1.0, 2, 3062, pc), (planes4k,))
    if want("current"):
        def cur3(p, t):
            return (ov.zebra_planes(p, 0.75, 1.0, t, cs=2),
                    ov.falsecolor_planes(p, cs=2),
                    ov.focus_peaking_planes(p, 3062, pcj))
        bench("current overlays 4K", cur3, (planes4k,))


if __name__ == "__main__":
    main()
