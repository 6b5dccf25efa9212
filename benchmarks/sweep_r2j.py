"""Round-2 sweep, part J: fused ingest kernel (downscale x2 + YUV + mask +
stripe) feeding the stats kernel; plus the (S,Rf,64,128)->(S,Rf,1,8192)
reshape cost question."""

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

from obs_color_monitor_tpu.ops import convert, pallas_stats as ps

H4, W4 = 2160, 3840
H, W = 1080, 1920
S = -(-W // 128)   # 15
RF = -(-H // 64)   # 17


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
            xs = tuple(jnp.bitwise_xor(x, (i % 2).astype(x.dtype)) for x in a)
            return acc + cks(fn(*xs))

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
        print(f"PASS {name:46s} {(best - RT) * 1e3 / n:9.3f} ms (compile {tc:.0f}s)", flush=True)
    except Exception as e:
        print(f"FAIL {name:46s} {str(e)[:180]}", flush=True)


def _pair_mats():
    p2 = (
        jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0) // 2
        == jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    ).astype(jnp.float32)
    q2 = (
        jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1) // 2
        == jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
    ).astype(jnp.float32)
    return p2, q2


def _ingest_kernel(kcoef, h_out, w_out, planes_ref, p2_ref, q2_ref, u_ref, v_ref,
                   r_ref, g_ref, b_ref, ds_ref):
    # planes block (4, 128, 256) u8 of the 4K planar frame
    p2 = p2_ref[:]
    q2 = q2_ref[:]
    ds = []
    for c in range(4):
        x = planes_ref[c].astype(jnp.int32).astype(jnp.float32)  # (128, 256); f32 matmuls:
        # tiny MAC counts, and Mosaic lacks u8->bf16 casts
        t = jax.lax.dot_general(  # column pairs: (128,256)@(256,128) f32
            x, p2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rp = jax.lax.dot_general(  # row pairs: (64,128)@(128,128) f32
            q2, t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # t holds pair sums <= 510: NOT bf16-exact, so the default
            # (bf16-operand) MXU precision is off by one — force full f32
            precision=jax.lax.Precision.HIGHEST,
        )
        ds.append(jnp.floor((rp + 2.0) * 0.25))  # (64,128) f32, 0..255
    r8, g8, b8, a8 = ds
    # zero everything outside the real image (the grid covers the padded
    # stripe geometry; the 4K input rows run out before RF*128)
    sblk = pl.program_id(0)
    rblk = pl.program_id(1)
    rowi = rblk * 64 + jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
    coli = sblk * 128 + jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
    valid = (rowi < h_out) & (coli < w_out)
    a8 = jnp.where(valid, a8, 0.0)
    ds = [jnp.where(valid, x, 0.0) for x in ds[:3]] + [a8]
    r8, g8, b8 = ds[0], ds[1], ds[2]
    ds_ref[:] = jnp.stack([x.astype(jnp.int32).astype(jnp.uint8) for x in ds], axis=0)[None, None]
    mask = a8 != 0.0
    # YUV (12-bit fixed point in f32, exact)
    half = np.float32(1 << 11)
    inv = np.float32(1.0 / (1 << 12))
    outs = []
    for i in range(3):
        acc = kcoef[i][0] * r8 + kcoef[i][1] * g8 + kcoef[i][2] * b8 + np.float32(
            kcoef[i][3] + half
        )
        outs.append(jnp.clip(jnp.floor(acc * inv), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8))
    u_ref[:] = jnp.where(valid, outs[1], jnp.uint8(0))[None, None]
    v_ref[:] = jnp.where(valid, outs[2], jnp.uint8(0))[None, None]
    zero = jnp.uint8(0)
    r_ref[:] = jnp.where(mask, r8.astype(jnp.int32).astype(jnp.uint8), zero)[None, None]
    g_ref[:] = jnp.where(mask, g8.astype(jnp.int32).astype(jnp.uint8), zero)[None, None]
    b_ref[:] = jnp.where(mask, b8.astype(jnp.int32).astype(jnp.uint8), zero)[None, None]


def ingest(planes4k, cs=2):
    """(4, 2160, 3840) u8 planar -> (u,v,r,g,b striped (S,RF,64,128) u8,
    ds planes (4, RF*64? ...) laid out (S, RF, 4, 64, 128))."""
    from obs_color_monitor_tpu.colorspace import Colorspace, FIXED_COEFFS

    k = np.asarray(FIXED_COEFFS[Colorspace(cs)], np.float32)
    kcoef = tuple(tuple(float(v) for v in row) for row in k)
    p2, q2 = _pair_mats()
    planes4k = jnp.pad(
        planes4k,
        ((0, 0), (0, RF * 128 - planes4k.shape[1]), (0, S * 256 - planes4k.shape[2])),
    )
    blk = lambda: pl.BlockSpec((1, 1, 64, 128), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ingest_kernel, kcoef, H, W),
        grid=(S, RF),
        in_specs=[
            pl.BlockSpec((4, 128, 256), lambda s, r: (0, r, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            blk(), blk(), blk(), blk(), blk(),
            pl.BlockSpec((1, 1, 4, 64, 128), lambda s, r: (s, r, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            *(jax.ShapeDtypeStruct((S, RF, 64, 128), jnp.uint8) for _ in range(5)),
            jax.ShapeDtypeStruct((S, RF, 4, 64, 128), jnp.uint8),
        ),
    )(planes4k, p2, q2)
    return out


def e2e_ingest_fused(planes4k):
    u4, v4, r4, g4, b4, dsb = ingest(planes4k)
    # layout-compat reshape: (S,RF,64,128) rows are contiguous = flat rows
    resh = lambda a: a.reshape(S, RF, 1, 64 * 128)
    striped = jnp.stack([resh(r4), resh(g4), resh(b4)], axis=0)
    u_s, v_s = resh(u4), resh(v4)
    import functools as ft

    vs, wv = pl.pallas_call(
        ft.partial(ps._fused_kernel, 3),
        grid=(S, RF),
        in_specs=[ps._in4(), ps._in4(), ps._in4(3),
                  pl.BlockSpec((ps._LANES, ps._COLS), lambda s, r: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((256, 256), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((3, 256, ps._COLS), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((256, 256), jnp.int32),
                   jax.ShapeDtypeStruct((3, 256, S * ps._COLS), jnp.int32)),
    )(u_s, v_s, striped, ps._sel_matrix())
    # corrections from the ds alpha blocks
    n_pad = S * 128 * RF * 64 - H * W
    vs = vs.at[0, 0].add(jnp.int32(-n_pad))
    wv = wv[:, :, :W]
    # per-column skipped counts: from ds alpha (S, RF, 4, 64, 128)
    alpha = dsb[:, :, 3]  # (S, RF, 64, 128)
    skipped = (alpha == 0).sum(axis=(1, 2), dtype=jnp.int32)  # (S, 128)
    skipped = skipped.reshape(S * 128)[:W]
    wv = wv.at[:, 0, :].add(-skipped[None, :])
    return vs, wv


def e2e_current(planes4k):
    sp = convert.downscale_planes(planes4k, scale=2)
    yuv = convert.rgb_to_yuv_planes(sp, cs=2)
    mask = sp[3] != 0
    return ps.fused_vs_wv_pallas_i32(sp[:3], yuv, mask)


def main():
    rng = np.random.default_rng(0)
    planes4k = jax.device_put(rng.integers(0, 256, (4, H4, W4), np.uint8))

    only = set(sys.argv[1:])

    def want(name):
        return not only or any(k in name for k in only)

    if want("check"):
        a = jax.jit(e2e_ingest_fused)(planes4k)
        b = jax.jit(e2e_current)(planes4k)
        ok_vs = (np.asarray(a[0]) == np.asarray(b[0])).all()
        ok_wv = (np.asarray(a[1]) == np.asarray(b[1])).all()
        print(f"# ingest-fused exact: vs={ok_vs} wv={ok_wv}", flush=True)
    if want("ingest_only"):
        bench("ingest kernel only", lambda p: ingest(p), (planes4k,))
    if want("e2e_new"):
        bench("e2e ingest-fused + stats", lambda p: e2e_ingest_fused(p), (planes4k,))
    if want("e2e_cur"):
        bench("e2e current (xla ingest) + stats", lambda p: e2e_current(p), (planes4k,))


if __name__ == "__main__":
    main()
