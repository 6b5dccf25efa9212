"""Round-2 sweep, part N: row-band ingest (fewer, fatter grid steps)."""

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

from obs_color_monitor_tpu.colorspace import Colorspace, FIXED_COEFFS
from obs_color_monitor_tpu.ops import pallas_stats as ps

H4, W4 = 2160, 3840
H, W = 1080, 1920
S = 15
RF = 17


def rt():
    tiny = jax.jit(lambda x: x + 1)
    _ = np.asarray(tiny(jnp.int32(0)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); _ = np.asarray(tiny(jnp.int32(0)))
        best = min(best, time.perf_counter() - t0)
    return best


RT = None


def bench(name, fn, args, n=20):
    global RT
    if RT is None:
        RT = rt()
        print(f"# rt {RT*1e3:.1f}", flush=True)

    def cks(o):
        return sum(jnp.sum(l.astype(jnp.int32)) for l in jax.tree_util.tree_leaves(o))

    def rep_f(*a):
        def body(i, acc):
            xs = tuple(jnp.bitwise_xor(x, (i % 2).astype(x.dtype)) for x in a)
            return acc + cks(fn(*xs))
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    try:
        rep = jax.jit(rep_f)
        _ = np.asarray(rep(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); _ = np.asarray(rep(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"PASS {name:40s} {(best-RT)*1e3/n:8.3f} ms", flush=True)
    except Exception as e:
        print(f"FAIL {name:40s} {str(e)[:160]}", flush=True)


def _band_kernel(kcoef, h, w, planes_ref, p2_ref, q2_ref, u_ref, v_ref,
                 d0_ref, d1_ref, d2_ref, ds_ref):
    p2 = p2_ref[:]
    q2 = q2_ref[:]
    r_blk = pl.program_id(0)
    for s in range(S):
        ds = []
        for c in range(4):
            x = planes_ref[c, :, s * 256 : (s + 1) * 256].astype(jnp.int32).astype(jnp.float32)
            t = jax.lax.dot_general(
                x, p2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rp = jax.lax.dot_general(
                q2, t, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            ds.append(jnp.floor((rp + 2.0) * 0.25))
        rowi = r_blk * 64 + jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
        coli = s * 128 + jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
        valid = (rowi < h) & (coli < w)
        ds = [jnp.where(valid, x, 0.0) for x in ds]
        r8, g8, b8, a8 = ds
        ds_ref[:, :, s * 128 : (s + 1) * 128] = jnp.stack(
            [x.astype(jnp.int32).astype(jnp.uint8) for x in ds], axis=0
        )
        mask = a8 != 0.0
        half = np.float32(1 << 11)
        inv = np.float32(1.0 / (1 << 12))
        yuv = []
        for i in range(3):
            acc = (kcoef[i][0] * r8 + kcoef[i][1] * g8 + kcoef[i][2] * b8
                   + np.float32(kcoef[i][3] + half))
            q = jnp.clip(jnp.floor(acc * inv), 0.0, 255.0)
            yuv.append(jnp.where(valid, q.astype(jnp.int32).astype(jnp.uint8), jnp.uint8(0)))
        u_ref[s, 0] = yuv[1]
        v_ref[s, 0] = yuv[2]
        zero = jnp.uint8(0)
        d0_ref[s, 0] = jnp.where(mask, r8.astype(jnp.int32).astype(jnp.uint8), zero)
        d1_ref[s, 0] = jnp.where(mask, g8.astype(jnp.int32).astype(jnp.uint8), zero)
        d2_ref[s, 0] = jnp.where(mask, b8.astype(jnp.int32).astype(jnp.uint8), zero)


def band_ingest(planes4k, cs=2):
    k = np.asarray(FIXED_COEFFS[Colorspace(cs)], np.float32)
    kcoef = tuple(tuple(float(v) for v in row) for row in k)
    p2 = (jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0) // 2
          == jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)).astype(jnp.float32)
    q2 = (jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1) // 2
          == jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)).astype(jnp.float32)
    x = jnp.pad(planes4k, ((0, 0), (0, RF * 128 - H4), (0, S * 256 - W4)))
    sb = lambda: pl.BlockSpec((S, 1, 64, 128), lambda r: (0, r, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_band_kernel, kcoef, H, W),
        grid=(RF,),
        in_specs=[
            pl.BlockSpec((4, 128, S * 256), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(sb(), sb(), sb(), sb(), sb(),
                   pl.BlockSpec((4, 64, S * 128), lambda r: (0, r, 0), memory_space=pltpu.VMEM)),
        out_shape=(*(jax.ShapeDtypeStruct((S, RF, 64, 128), jnp.uint8) for _ in range(5)),
                   jax.ShapeDtypeStruct((4, RF * 64, S * 128), jnp.uint8)),
    )(x, p2, q2)


def main():
    rng = np.random.default_rng(0)
    planes4k = jax.device_put(rng.integers(0, 256, (4, H4, W4), np.uint8))

    bench("band ingest (17 steps)", lambda p: band_ingest(p), (planes4k,))
    # exactness vs production ingest
    a = jax.jit(band_ingest)(planes4k)
    b = jax.jit(lambda p: ps.fused_ingest_stats_scale2(p, cs=2))(planes4k)
    # compare via the ds planes + running the stats on band outputs
    u4, v4, d0, d1, d2, dsp = a
    resh = lambda t: t.reshape(S, RF, 1, 8192)
    striped = jnp.stack([resh(d0), resh(d1), resh(d2)], axis=0)
    vs, wv = jax.jit(lambda u, v, d: pl.pallas_call(
        functools.partial(ps._fused_kernel, 3),
        grid=(S, RF),
        in_specs=[ps._in4(), ps._in4(), ps._in4(3),
                  pl.BlockSpec((8192, 128), lambda si, ri: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((256, 256), lambda si, ri: (0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((3, 256, 128), lambda si, ri: (0, 0, si), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((256, 256), jnp.int32),
                   jax.ShapeDtypeStruct((3, 256, S * 128), jnp.int32)),
    )(u, v, d, ps._sel_matrix()))(resh(u4), resh(v4), striped)
    n_pad = S * 128 * RF * 64 - H * W
    vs = np.asarray(vs).copy(); vs[0, 0] -= n_pad
    wv = np.asarray(wv)[:, :, :W].copy()
    corr = np.asarray(jnp.sum(dsp[3] == 0, axis=0, dtype=jnp.int32))[:W]
    wv[:, 0, :] -= corr
    print(f"# band exact: vs={(vs == np.asarray(b[0])).all()} wv={(wv == np.asarray(b[1])).all()}"
          f" ds={(np.asarray(dsp)[:, :H, :W] == np.asarray(b[2])).all()}", flush=True)


if __name__ == "__main__":
    main()
