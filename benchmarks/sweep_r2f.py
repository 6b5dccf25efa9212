"""Round-2 sweep, part F: hybrid fused kernel — VS on MXU (striped NT
matmul) + WV on VPU (planar 3D bins-first build + sublane reduce), one
grid.  Blocks (s, r): planar (64,128) block == striped flat row.
"""

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
        print(f"PASS {name:46s} {(best - RT) * 1e3 / n:9.3f} ms  (compile {tc:.0f}s, cks={r0})", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:200]
        print(f"FAIL {name:46s} {msg}", flush=True)


def stripe4(plane):
    h, w = plane.shape
    S = -(-w // 128)
    Rf = -(-h // 64)
    p = jnp.pad(plane, ((0, Rf * 64 - h), (0, S * 128 - w)))
    return p.reshape(Rf * 64, S, 128).swapaxes(0, 1).reshape(S, Rf, 1, LANES)


def pad_planar(planes):
    c, h, w = planes.shape
    S = -(-w // 128)
    Rf = -(-h // 64)
    return jnp.pad(planes, ((0, 0), (0, Rf * 64 - h), (0, S * 128 - w)))


# hybrid fused: VS striped NT matmul + 3-plane WV planar 3D VPU reduce
def fused_hybrid(u_s, v_s, rgb_p, sub):
    S, Rf = u_s.shape[0], u_s.shape[1]

    def kern(u_ref, v_ref, rgb_ref, vs_ref, wv_ref):
        s = pl.program_id(0)
        r = pl.program_id(1)

        @pl.when((s == 0) & (r == 0))
        def _():
            vs_ref[:] = jnp.zeros_like(vs_ref)

        @pl.when(r == 0)
        def _():
            wv_ref[:] = jnp.zeros_like(wv_ref)

        iota2 = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, LANES), 0)
        ohu = (iota2 == u_ref[0, 0].astype(jnp.int32)).astype(jnp.int8)
        ohv = (iota2 == v_ref[0, 0].astype(jnp.int32)).astype(jnp.int8)
        vs_ref[:] += jax.lax.dot_general(
            ohv, ohu,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        iota3 = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1, 1), 0)
        for c in range(3):
            def step(k, _):
                vals = rgb_ref[c, pl.ds(k * sub, sub), :].astype(jnp.int32)
                oh = (iota3 == vals[None]).astype(jnp.int8)
                wv_ref[c] += oh.sum(axis=1, dtype=jnp.int32)
                return _
            jax.lax.fori_loop(0, 64 // sub, step, None)

    return pl.pallas_call(
        kern,
        grid=(S, Rf),
        in_specs=[
            pl.BlockSpec((1, 1, 1, LANES), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, LANES), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 64, 128), lambda s, r: (0, r, s), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N_BINS, N_BINS), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N_BINS, 128), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
            jax.ShapeDtypeStruct((3, N_BINS, S * 128), jnp.int32),
        ),
    )(u_s, v_s, rgb_p)


def e2e_hybrid(rgb, uv, sub):
    u_s = stripe4(uv[0])
    v_s = stripe4(uv[1])
    rgb_p = pad_planar(rgb)
    vs, wv = fused_hybrid(u_s, v_s, rgb_p, sub)
    return vs, wv[:, :, :W]


# WV-only planar 3D (round-1 style, no in-kernel masking)
def wv_planar(rgb_p, sub):
    _, hp, wp = rgb_p.shape
    S, Rf = wp // 128, hp // 64

    def kern(rgb_ref, wv_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            wv_ref[:] = jnp.zeros_like(wv_ref)

        iota3 = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1, 1), 0)
        for c in range(3):
            def step(k, _):
                vals = rgb_ref[c, pl.ds(k * sub, sub), :].astype(jnp.int32)
                oh = (iota3 == vals[None]).astype(jnp.int8)
                wv_ref[c] += oh.sum(axis=1, dtype=jnp.int32)
                return _
            jax.lax.fori_loop(0, 64 // sub, step, None)

    return pl.pallas_call(
        kern,
        grid=(S, Rf),
        in_specs=[pl.BlockSpec((3, 64, 128), lambda s, r: (0, r, s), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, N_BINS, 128), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, N_BINS, S * 128), jnp.int32),
    )(rgb_p)


def main():
    rng = np.random.default_rng(0)
    only = set(sys.argv[1:])

    def want(name):
        return not only or any(k in name for k in only)

    rgb = jax.device_put(rng.integers(0, 256, (3, H, W), np.uint8))
    uv = jax.device_put(rng.integers(0, 256, (2, H, W), np.uint8))
    rgb_p = jax.device_put(np.asarray(pad_planar(rgb)))

    if want("wv_planar64"):
        bench("wv_planar 3D sub=64 (3 planes)", lambda p: wv_planar(p, 64), (rgb_p,))
    if want("wv_planar32"):
        bench("wv_planar 3D sub=32 (3 planes)", lambda p: wv_planar(p, 32), (rgb_p,))
    if want("hyb64"):
        bench("e2e hybrid sub=64", lambda r, u: e2e_hybrid(r, u, 64), (rgb, uv), n=20)
    if want("hyb32"):
        bench("e2e hybrid sub=32", lambda r, u: e2e_hybrid(r, u, 32), (rgb, uv), n=20)
    if want("check"):
        from obs_color_monitor_tpu.ops import stats
        vs, wv = jax.jit(lambda r, u: e2e_hybrid(r, u, 64))(rgb, uv)
        vs = np.asarray(vs).copy()
        wv = np.asarray(wv).copy()
        S, Rf = -(-W // 128), -(-H // 64)
        vs[0, 0] -= S * 128 * Rf * 64 - H * W
        wv[:, 0, :] -= Rf * 64 - H
        want_vs = np.asarray(stats.vectorscope_counts_i32(jnp.stack([uv[0], uv[0], uv[1]])))
        want_wv = np.asarray(stats.waveform_counts_i32(rgb, jnp.ones((H, W), bool)))
        print(f"# check vs={(vs == want_vs).all()} wv={(wv == want_wv).all()}", flush=True)


if __name__ == "__main__":
    main()
