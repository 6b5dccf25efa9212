"""Round-2 sweep, part L: i16 one-hot builds (2x packed VPU compares?);
kernel scheduling hints."""

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

from obs_color_monitor_tpu.ops import pallas_stats as ps

N_BINS = 256
H, W = 1080, 1920
LANES = 8192


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


def bench(name, fn, args, n=30):
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
        r0 = np.asarray(rep(*args))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(rep(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"PASS {name:46s} {(best - RT) * 1e3 / n:9.3f} ms (compile {tc:.0f}s, cks={r0})", flush=True)
    except Exception as e:
        print(f"FAIL {name:46s} {str(e)[:160]}", flush=True)


def _oh_i16(row):
    iota = jax.lax.broadcasted_iota(jnp.int16, (N_BINS, LANES), 0)
    return (iota == row.astype(jnp.int16)).astype(jnp.int8)


def _fused_kernel_i16(c, u_ref, v_ref, data_ref, sel_ref, vs_ref, wv_ref):
    s = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when((s == 0) & (r == 0))
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    @pl.when(r == 0)
    def _():
        wv_ref[:] = jnp.zeros_like(wv_ref)

    ohu = _oh_i16(u_ref[0, 0])
    ohv = _oh_i16(v_ref[0, 0])
    vs_ref[:] += jax.lax.dot_general(
        ohv, ohu, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    for ci in range(c):
        oh = _oh_i16(data_ref[ci, 0, 0])
        wv_ref[ci] += jax.lax.dot_general(
            oh, sel_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )


def fused_i16(u_s, v_s, striped, sel):
    s, rf = u_s.shape[0], u_s.shape[1]
    return pl.pallas_call(
        functools.partial(_fused_kernel_i16, 3),
        grid=(s, rf),
        in_specs=[ps._in4(), ps._in4(), ps._in4(3),
                  pl.BlockSpec((LANES, 128), lambda si, ri: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((N_BINS, N_BINS), lambda si, ri: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N_BINS, 128), lambda si, ri: (0, 0, si), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
            jax.ShapeDtypeStruct((3, N_BINS, s * 128), jnp.int32),
        ),
    )(u_s, v_s, striped, sel)


def main():
    rng = np.random.default_rng(0)
    only = set(sys.argv[1:])

    def want(name):
        return not only or any(k in name for k in only)

    rgb = jax.device_put(rng.integers(0, 256, (3, H, W), np.uint8))
    uv = jax.device_put(rng.integers(0, 256, (2, H, W), np.uint8))
    u_s = jax.device_put(np.asarray(ps._stripe4(uv[0])))
    v_s = jax.device_put(np.asarray(ps._stripe4(uv[1])))
    striped = jax.device_put(np.asarray(jax.vmap(ps._stripe4)(rgb)))
    sel = jax.device_put(np.asarray(ps._sel_matrix()))

    if want("i16"):
        bench("fused i16-compare builds", lambda a, b, d: fused_i16(a, b, d, sel), (u_s, v_s, striped), n=20)
        # exactness
        a = jax.jit(lambda a, b, d: fused_i16(a, b, d, sel))(u_s, v_s, striped)
        from obs_color_monitor_tpu.ops import stats
        vs = np.asarray(a[0]).copy()
        S, RF = -(-W // 128), -(-H // 64)
        vs[0, 0] -= S * 128 * RF * 64 - H * W
        want_vs = np.asarray(stats.vectorscope_counts_i32(jnp.stack([uv[0], uv[0], uv[1]])))
        print(f"# i16 exact vs={(vs == want_vs).all()}", flush=True)
    if want("i32"):
        bench("fused i32-compare builds (now)",
              lambda a, b, d: ps.fused_vs_wv_pallas_i32(rgb, jnp.stack([uv[0], uv[0], uv[1]]), jnp.ones((H, W), bool)),
              (u_s, v_s, striped), n=20)


if __name__ == "__main__":
    main()
