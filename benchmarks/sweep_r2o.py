"""Round-2 sweep, part O: banded stats kernel — grid (S,), statically
unrolled flat-row loop (fewer grid steps, like the band ingest)."""

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
        print(f"PASS {name:44s} {(best-RT)*1e3/n:8.3f} ms", flush=True)
    except Exception as e:
        print(f"FAIL {name:44s} {str(e)[:160]}", flush=True)


def _banded_kernel(rf, u_ref, v_ref, data_ref, sel_ref, vs_ref, wv_ref):
    si = pl.program_id(0)

    @pl.when(si == 0)
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    wv_ref[:] = jnp.zeros_like(wv_ref)
    iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, LANES), 0)
    for r in range(rf):
        ohu = (iota == u_ref[0, r, 0].astype(jnp.int32)).astype(jnp.int8)
        ohv = (iota == v_ref[0, r, 0].astype(jnp.int32)).astype(jnp.int8)
        vs_ref[:] += jax.lax.dot_general(
            ohv, ohu, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        for c in range(3):
            oh = (iota == data_ref[c, 0, r, 0].astype(jnp.int32)).astype(jnp.int8)
            wv_ref[c] += jax.lax.dot_general(
                oh, sel_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )


def banded_stats(u_s, v_s, striped, sel):
    s, rf = u_s.shape[0], u_s.shape[1]
    return pl.pallas_call(
        functools.partial(_banded_kernel, rf),
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, rf, 1, LANES), lambda si: (si, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rf, 1, LANES), lambda si: (si, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, rf, 1, LANES), lambda si: (0, si, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 128), lambda si: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N_BINS, N_BINS), lambda si: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N_BINS, 128), lambda si: (0, 0, si), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
            jax.ShapeDtypeStruct((3, N_BINS, S * 128), jnp.int32),
        ),
    )(u_s, v_s, striped, sel)


def main():
    rng = np.random.default_rng(0)
    rgb = jax.device_put(rng.integers(0, 256, (3, H, W), np.uint8))
    uv = jax.device_put(rng.integers(0, 256, (2, H, W), np.uint8))
    u_s = jax.device_put(np.asarray(ps._stripe4(uv[0])))
    v_s = jax.device_put(np.asarray(ps._stripe4(uv[1])))
    striped = jax.device_put(np.asarray(jax.vmap(ps._stripe4)(rgb)))
    sel = jax.device_put(np.asarray(ps._sel_matrix()))

    bench("banded stats grid(S)", lambda a, b, d: banded_stats(a, b, d, sel), (u_s, v_s, striped))
    bench("current stats grid(S,Rf)", lambda a, b, d: ps.fused_vs_wv_pallas_i32(
        rgb, jnp.stack([uv[0], uv[0], uv[1]]), jnp.ones((H, W), bool)), (u_s, v_s, striped))
    # exactness
    a = jax.jit(lambda a, b, d: banded_stats(a, b, d, sel))(u_s, v_s, striped)
    from obs_color_monitor_tpu.ops import stats
    vs = np.asarray(a[0]).copy()
    vs[0, 0] -= S * 128 * RF * 64 - H * W
    want_vs = np.asarray(stats.vectorscope_counts_i32(jnp.stack([uv[0], uv[0], uv[1]])))
    wv = np.asarray(a[1])[:, :, :W].copy()
    wv[:, 0, :] -= RF * 64 - H
    want_wv = np.asarray(stats.waveform_counts_i32(rgb, jnp.ones((H, W), bool)))
    print(f"# banded exact: vs={(vs == want_vs).all()} wv={(wv == want_wv).all()}", flush=True)


if __name__ == "__main__":
    main()
