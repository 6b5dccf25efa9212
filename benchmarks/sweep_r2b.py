"""Round-2 sweep, part B: waveform reduce strategies on the flat layout,
and the fused all-stats kernel (run on real TPU).

Layouts:
  * VS: U,V striped (S, Rf, 8192) u8 (pad -> correct counts[0,0])
  * WV: R,G,B striped, masked values pre-zeroed (correct wv[:,0,c])
  * stripe = 128 image columns; lane L of a chunk belongs to column L%128.
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
        print(f"PASS {name:48s} {(best - RT) * 1e3 / n:9.3f} ms  (compile {tc:.0f}s, cks={r0})", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:250]
        print(f"FAIL {name:48s} {msg}", flush=True)


def stripe(plane):
    """(H, W) u8 -> (S, Rf, 8192); pads with 0."""
    h, w = plane.shape
    S = -(-w // 128)
    Rf = -(-h // 64)
    p = jnp.pad(plane, ((0, Rf * 64 - h), (0, S * 128 - w)))
    p = p.reshape(Rf * 64, S, 128).swapaxes(0, 1).reshape(S, Rf, LANES)
    return p


def sel_matrix():
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, 128), 0) % 128
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, 128), 1)
    return (r == c).astype(jnp.int8)


# --- W3: flat build + MXU selection matmul reduce ---------------------------

def wv_w3(striped, sel):
    S, Rf = striped.shape[0], striped.shape[1]

    def kern(p_ref, sel_ref, out_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, LANES), 0)
        vals = p_ref[0].astype(jnp.int32)  # (1, 8192)
        oh = (iota == vals).astype(jnp.int8)
        out_ref[:] += jax.lax.dot_general(
            oh, sel_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return pl.pallas_call(
        kern,
        grid=(S, Rf),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda s, r: (s, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 128), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_BINS, 128), lambda s, r: (0, s), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, S * 128), jnp.int32),
    )(striped, sel)


# --- W4: flat build + reshape split + i32 sum over sub-axis ------------------

def wv_w4(striped):
    S, Rf = striped.shape[0], striped.shape[1]

    def kern(p_ref, out_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, LANES), 0)
        vals = p_ref[0].astype(jnp.int32)
        oh = (iota == vals).astype(jnp.int8)
        oh3 = oh.reshape(N_BINS, 64, 128)
        out_ref[:] += oh3.sum(axis=1, dtype=jnp.int32)

    return pl.pallas_call(
        kern,
        grid=(S, Rf),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda s, r: (s, r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_BINS, 128), lambda s, r: (0, s), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, S * 128), jnp.int32),
    )(striped)


# --- W5: flat build + int8 pairwise tree reduce ------------------------------

def wv_w5(striped):
    S, Rf = striped.shape[0], striped.shape[1]

    def kern(p_ref, out_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, LANES), 0)
        vals = p_ref[0].astype(jnp.int32)
        oh = (iota == vals).astype(jnp.int8).reshape(N_BINS, 64, 128)
        # int8 pairwise tree: counts <= 64 fit in int8
        x = oh
        for _ in range(6):
            half = x.shape[1] // 2
            x = x[:, :half, :] + x[:, half:, :]
        out_ref[:] += x[:, 0, :].astype(jnp.int32)

    return pl.pallas_call(
        kern,
        grid=(S, Rf),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda s, r: (s, r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_BINS, 128), lambda s, r: (0, s), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, S * 128), jnp.int32),
    )(striped)


# --- fused: VS + 3-plane WV --------------------------------------------------

def fused_f(u_s, v_s, rgb_s, sel, wv_reduce):
    """rgb_s: (3, S, Rf, 8192).  wv_reduce: 'mxu' | 'vpu' | 'i8tree'."""
    S, Rf = u_s.shape[0], u_s.shape[1]

    def kern(u_ref, v_ref, rgb_ref, sel_ref, vs_ref, wv_ref):
        s = pl.program_id(0)
        r = pl.program_id(1)

        @pl.when((s == 0) & (r == 0))
        def _():
            vs_ref[:] = jnp.zeros_like(vs_ref)

        @pl.when(r == 0)
        def _():
            wv_ref[:] = jnp.zeros_like(wv_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, LANES), 0)

        ohu = (iota == u_ref[0].astype(jnp.int32)).astype(jnp.int8)
        ohv = (iota == v_ref[0].astype(jnp.int32)).astype(jnp.int8)
        vs_ref[:] += jax.lax.dot_general(
            ohv, ohu,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        for c in range(3):
            oh = (iota == rgb_ref[c, 0, 0].astype(jnp.int32)[None]).astype(jnp.int8)
            if wv_reduce == "mxu":
                wv_ref[c] += jax.lax.dot_general(
                    oh, sel_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            elif wv_reduce == "vpu":
                wv_ref[c] += oh.reshape(N_BINS, 64, 128).sum(axis=1, dtype=jnp.int32)
            else:
                x = oh.reshape(N_BINS, 64, 128)
                for _ in range(6):
                    half = x.shape[1] // 2
                    x = x[:, :half, :] + x[:, half:, :]
                wv_ref[c] += x[:, 0, :].astype(jnp.int32)

    return pl.pallas_call(
        kern,
        grid=(S, Rf),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda s, r: (s, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda s, r: (s, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, 1, LANES), lambda s, r: (0, s, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 128), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N_BINS, N_BINS), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N_BINS, 128), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
            jax.ShapeDtypeStruct((3, N_BINS, S * 128), jnp.int32),
        ),
    )(u_s, v_s, rgb_s, sel)


# --- end-to-end: planes (3,H,W)+(2,H,W) -> stripe in XLA -> fused kernel -----

def e2e_fused(planes_rgb, uv, sel, wv_reduce):
    u_s = stripe(uv[0])
    v_s = stripe(uv[1])
    rgb_s = jax.vmap(stripe)(planes_rgb)
    vs, wv = fused_f(u_s, v_s, rgb_s, sel, wv_reduce)
    return vs, wv[:, :, :W]


def main():
    rng = np.random.default_rng(0)
    only = set(sys.argv[1:])

    def want(name):
        return not only or any(k in name for k in only)

    plane = jax.device_put(rng.integers(0, 256, (H, W), np.uint8))
    rgb = jax.device_put(rng.integers(0, 256, (3, H, W), np.uint8))
    uv = jax.device_put(rng.integers(0, 256, (2, H, W), np.uint8))
    sel = jax.device_put(np.asarray(sel_matrix()))

    striped1 = jax.device_put(np.asarray(stripe(plane)))
    print(f"# striped1 {striped1.shape}", flush=True)

    if want("w3"):
        bench("wv_w3 mxu-sel (1 plane, pre-striped)", lambda p: wv_w3(p, sel), (striped1,))
    if want("w4"):
        bench("wv_w4 reshape+i32sum (1 plane)", lambda p: wv_w4(p), (striped1,))
    if want("w5"):
        bench("wv_w5 i8 tree (1 plane)", lambda p: wv_w5(p), (striped1,))
    if want("stripe"):
        bench("stripe cost (1 plane, XLA)", lambda p: stripe(p), (plane,))
    if want("fused_mxu"):
        bench("e2e fused VS+3WV mxu-reduce", lambda r, u: e2e_fused(r, u, sel, "mxu"), (rgb, uv), n=20)
    if want("fused_vpu"):
        bench("e2e fused VS+3WV vpu-reduce", lambda r, u: e2e_fused(r, u, sel, "vpu"), (rgb, uv), n=20)
    if want("fused_i8"):
        bench("e2e fused VS+3WV i8tree-reduce", lambda r, u: e2e_fused(r, u, sel, "i8tree"), (rgb, uv), n=20)


if __name__ == "__main__":
    main()
