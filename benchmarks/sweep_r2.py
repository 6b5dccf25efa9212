"""Round-2 kernel formulation sweep (run on real TPU hardware).

Tests which Mosaic formulations compile on this toolchain and how fast
they run, to pick the round-2 production kernel design.  Each candidate
is wrapped in try/except so one compile failure doesn't kill the sweep.

Usage: timeout 1200 python -u benchmarks/sweep_r2.py [names...] > /tmp/sweep.log 2>&1
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
ROWS = 1080
COLS = 1920
_SUB = 64


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


def bench(name, fn, arg, n=30):
    """fn(arg, i) -> pytree; repeat inside one fori_loop, report ms/call."""
    global RT
    if RT is None:
        RT = _round_trip_s()
        print(f"# round trip {RT*1e3:.1f} ms", flush=True)

    def cks(out):
        return sum(jnp.sum(l.astype(jnp.int32)) for l in jax.tree_util.tree_leaves(out))

    def rep_f(a):
        def body(i, acc):
            x = jnp.bitwise_xor(a, (i % 2).astype(a.dtype))
            return acc + cks(fn(x, i))

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    try:
        rep = jax.jit(rep_f)
        t0 = time.perf_counter()
        r0 = np.asarray(rep(arg))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(rep(arg))
            best = min(best, time.perf_counter() - t0)
        print(f"PASS {name:52s} {(best - RT) * 1e3 / n:9.3f} ms  (compile {tc:.0f}s, cks={r0})", flush=True)
        return (best - RT) / n
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"FAIL {name:52s} {msg}", flush=True)
        return None


# ---------------------------------------------------------------------------
# A. waveform-style build variants: one plane, (256, W) per-column counts
# ---------------------------------------------------------------------------

def wv_i32_baseline(plane):
    """Current production formulation: i32 compare bins-first + i32 reduce."""

    def kern(p_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1, 1), 0)

        def sub(s, _):
            vals = p_ref[pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
            oh = (iota == vals[None]).astype(jnp.int8)
            out_ref[:] += oh.sum(axis=1, dtype=jnp.int32)
            return _

        jax.lax.fori_loop(0, 128 // _SUB, sub, None)

    h, w = plane.shape
    return pl.pallas_call(
        kern,
        grid=(w // 128, h // 128),
        in_specs=[pl.BlockSpec((128, 128), lambda j, i: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N_BINS, 128), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, w), jnp.int32),
    )(plane)


def wv_u8cmp(plane):
    """u8 compare bins-first (packed compare?), i32 reduce."""

    def kern(p_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.uint8, (N_BINS, 1, 1), 0)

        def sub(s, _):
            vals = p_ref[pl.ds(s * _SUB, _SUB), :]
            oh = (iota == vals[None]).astype(jnp.int8)
            out_ref[:] += oh.sum(axis=1, dtype=jnp.int32)
            return _

        jax.lax.fori_loop(0, 128 // _SUB, sub, None)

    h, w = plane.shape
    return pl.pallas_call(
        kern,
        grid=(w // 128, h // 128),
        in_specs=[pl.BlockSpec((128, 128), lambda j, i: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N_BINS, 128), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, w), jnp.int32),
    )(plane)


def wv_i8acc(plane):
    """i32 compare, but accumulate the one-hot sums in int8 per 64-row block
    (64 < 127 so no overflow), upcast once per block."""

    def kern(p_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1, 1), 0)

        def sub(s, _):
            vals = p_ref[pl.ds(s * _SUB, _SUB), :].astype(jnp.int32)
            oh = (iota == vals[None]).astype(jnp.int8)
            out_ref[:] += oh.sum(axis=1, dtype=jnp.int8).astype(jnp.int32)
            return _

        jax.lax.fori_loop(0, 128 // _SUB, sub, None)

    h, w = plane.shape
    return pl.pallas_call(
        kern,
        grid=(w // 128, h // 128),
        in_specs=[pl.BlockSpec((128, 128), lambda j, i: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N_BINS, 128), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, w), jnp.int32),
    )(plane)


def wv_u8cmp_i8acc(plane):
    """u8 compare + int8 reduce."""

    def kern(p_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.uint8, (N_BINS, 1, 1), 0)

        def sub(s, _):
            vals = p_ref[pl.ds(s * _SUB, _SUB), :]
            oh = (iota == vals[None]).astype(jnp.int8)
            out_ref[:] += oh.sum(axis=1, dtype=jnp.int8).astype(jnp.int32)
            return _

        jax.lax.fori_loop(0, 128 // _SUB, sub, None)

    h, w = plane.shape
    return pl.pallas_call(
        kern,
        grid=(w // 128, h // 128),
        in_specs=[pl.BlockSpec((128, 128), lambda j, i: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N_BINS, 128), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, w), jnp.int32),
    )(plane)


# ---------------------------------------------------------------------------
# B. vectorscope variants
# ---------------------------------------------------------------------------

def vs_nt_matmul_compile(uv):
    """Does Mosaic accept an NT matmul (contract minor dims of both operands)?
    Build tiny bins-first one-hots per 128-px row and NT-matmul them."""

    def kern(u_ref, v_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 128), 0)

        def sub(s, acc):
            u = u_ref[s, :].astype(jnp.int32)[None, :]  # (1,128)
            v = v_ref[s, :].astype(jnp.int32)[None, :]
            ohu = (iota == u).astype(jnp.int8)  # (256,128)
            ohv = (iota == v).astype(jnp.int8)
            return acc + jax.lax.dot_general(
                ohv, ohu,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        out_ref[:] += jax.lax.fori_loop(
            0, 128, sub, jnp.zeros((N_BINS, N_BINS), jnp.int32)
        )

    h, w = uv.shape[1], uv.shape[2]
    return pl.pallas_call(
        kern,
        grid=(h // 128 * (w // 128),),
        in_specs=[
            pl.BlockSpec((128, 128), lambda i: (i % 8, i // 8), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (i % 8, i // 8), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_BINS, N_BINS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
    )(uv[0], uv[1])


def vs_flat_bins_first(uv_flat):
    """U,V pre-flattened to (rows, 8192) OUTSIDE the kernel.  Build
    (256, 8192) bins-first one-hots (sublane-broadcast of a lane-row) and
    NT-matmul with K=8192."""
    LANES = 8192

    def kern(u_ref, v_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, LANES), 0)
        u = u_ref[:].astype(jnp.int32)  # (1, 8192)
        v = v_ref[:].astype(jnp.int32)
        ohu = (iota == u).astype(jnp.int8)
        ohv = (iota == v).astype(jnp.int8)
        out_ref[:] += jax.lax.dot_general(
            ohv, ohu,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    n = uv_flat.shape[1]
    return pl.pallas_call(
        kern,
        grid=(n // LANES,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_BINS, N_BINS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
    )(uv_flat[:1], uv_flat[1:])


def vs_flat_bins_first_u8(uv_flat):
    """Same but u8 compares."""
    LANES = 8192

    def kern(u_ref, v_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.uint8, (N_BINS, LANES), 0)
        ohu = (iota == u_ref[:]).astype(jnp.int8)
        ohv = (iota == v_ref[:]).astype(jnp.int8)
        out_ref[:] += jax.lax.dot_general(
            ohv, ohu,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    n = uv_flat.shape[1]
    return pl.pallas_call(
        kern,
        grid=(n // LANES,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_BINS, N_BINS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
    )(uv_flat[:1], uv_flat[1:])


def vs_baseline(uv):
    from obs_color_monitor_tpu.ops import pallas_stats

    return pallas_stats.vectorscope_pallas_i32(uv_pad3(uv))


def uv_pad3(uv):
    # vectorscope_pallas_i32 wants (3,H,W); give it a fake Y plane
    return jnp.concatenate([uv[:1], uv], axis=0)


# ---------------------------------------------------------------------------
# C. primitive op-rate probes
# ---------------------------------------------------------------------------

def probe_i8_mul(x):
    """int8 elementwise multiply rate over a big VMEM block."""

    def kern(a_ref, out_ref):
        a = a_ref[:]
        acc = jnp.zeros_like(a)
        def body(i, acc):
            return acc + a * (a + i.astype(jnp.int8))
        out_ref[:] = jax.lax.fori_loop(0, 64, body, acc)

    return pl.pallas_call(
        kern,
        grid=(x.shape[0] // 256,),
        in_specs=[pl.BlockSpec((256, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
    )(x)


def probe_i32_mul(x):
    def kern(a_ref, out_ref):
        a = a_ref[:]
        acc = jnp.zeros_like(a)
        def body(i, acc):
            return acc + a * (a + i)
        out_ref[:] = jax.lax.fori_loop(0, 64, body, acc)

    return pl.pallas_call(
        kern,
        grid=(x.shape[0] // 256,),
        in_specs=[pl.BlockSpec((256, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
    )(x)


def probe_bitcast(x):
    """pltpu.bitcast u8 (512,512) -> u32: which shape comes out?"""

    def kern(a_ref, out_ref):
        w = pltpu.bitcast(a_ref[:], jnp.uint32)
        out_ref[:] = w

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0] // 4, x.shape[1]), jnp.uint32),
    )(x)


def main():
    rng = np.random.default_rng(0)
    only = set(sys.argv[1:])

    def want(name):
        return not only or any(k in name for k in only)

    plane = jax.device_put(rng.integers(0, 256, (ROWS + 8, COLS + 128), np.uint8)[:1080 // 8 * 8 + 8][:1152, :1920])
    plane = jax.device_put(rng.integers(0, 256, (1152, 1920), np.uint8))
    uv = jax.device_put(rng.integers(0, 256, (2, 1152, 1920), np.uint8))
    n_flat = 1152 * 1920
    uv_flat = jax.device_put(rng.integers(0, 256, (2, n_flat), np.uint8))
    i8blk = jax.device_put(rng.integers(-100, 100, (4096, 512)).astype(np.int8))
    i32blk = jax.device_put(rng.integers(-100, 100, (4096, 512)).astype(np.int32))
    u8sq = jax.device_put(rng.integers(0, 256, (512, 512), np.uint8))

    px = 1152 * 1920
    print(f"# plane pixels = {px} ({px/2.07e6:.2f}x of 1080p)", flush=True)

    if want("wv_i32_baseline"):
        bench("wv_i32_baseline (1 plane)", lambda x, i: wv_i32_baseline(x), plane)
    if want("wv_u8cmp "):
        bench("wv_u8cmp (1 plane)", lambda x, i: wv_u8cmp(x), plane)
    if want("wv_i8acc"):
        bench("wv_i8acc (1 plane)", lambda x, i: wv_i8acc(x), plane)
    if want("wv_u8cmp_i8acc"):
        bench("wv_u8cmp_i8acc (1 plane)", lambda x, i: wv_u8cmp_i8acc(x), plane)
    if want("vs_baseline"):
        bench("vs_baseline (pixels-first TN)", lambda x, i: vs_baseline(x), uv)
    if want("vs_nt"):
        bench("vs_nt_matmul K=128", lambda x, i: vs_nt_matmul_compile(x), uv, n=8)
    if want("vs_flat_bins_first "):
        bench("vs_flat_bins_first i32 K=8192", lambda x, i: vs_flat_bins_first(x), uv_flat)
    if want("vs_flat_bins_first_u8"):
        bench("vs_flat_bins_first_u8 K=8192", lambda x, i: vs_flat_bins_first_u8(x), uv_flat)
    if want("probe_i8_mul"):
        bench("probe_i8_mul (64x 2M i8 mul+add)", lambda x, i: probe_i8_mul(x), i8blk, n=10)
    if want("probe_i32_mul"):
        bench("probe_i32_mul (64x 2M i32 mul+add)", lambda x, i: probe_i32_mul(x), i32blk, n=10)
    if want("probe_bitcast"):
        bench("probe_bitcast u8->u32", lambda x, i: probe_bitcast(x), u8sq, n=10)


if __name__ == "__main__":
    main()
