"""Round-2 sweep, part H: int4 MXU operands; waveform row-pack trick."""

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


def stripe_pack(plane, m):
    """(H, W) -> (S, Rf, m, 8192//m): flat row re-arranged so slice j holds
    rows j, j+m, j+2m... (group-major), enabling in-kernel row packing."""
    h, w = plane.shape
    S = -(-w // 128)
    Rf = -(-h // 64)
    p = jnp.pad(plane, ((0, Rf * 64 - h), (0, S * 128 - w)))
    # (Rf*64, S, 128) -> (S, Rf, 64/m groups, m, 128) -> (S, Rf, m, g, 128)
    g = 64 // m
    p = p.reshape(Rf, g, m, S, 128).transpose(3, 0, 2, 1, 4)
    return p.reshape(S, Rf, m, g * 128)


def vs_int4(u_s, v_s):
    S, Rf = u_s.shape[0], u_s.shape[1]

    def kern(u_ref, v_ref, out_ref):
        s = pl.program_id(0)
        r = pl.program_id(1)

        @pl.when((s == 0) & (r == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, LANES), 0)
        ohu = (iota == u_ref[0, 0].astype(jnp.int32)).astype(jnp.int4)
        ohv = (iota == v_ref[0, 0].astype(jnp.int32)).astype(jnp.int4)
        out_ref[:] += jax.lax.dot_general(
            ohv, ohu,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    IN = lambda: pl.BlockSpec((1, 1, 1, LANES), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(S, Rf),
        in_specs=[IN(), IN()],
        out_specs=pl.BlockSpec((N_BINS, N_BINS), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
    )(u_s, v_s)


CASTKIND = "i8"


def wv_pack(striped, m):
    """striped: (S, Rf, m, Kp).  ohm[bin, (g,c)] = sum_j [vals_j == bin],
    then a Kp-contraction matmul against SEL' (Kp, 128)."""
    S, Rf, _, Kp = striped.shape

    def kern(p_ref, out_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, Kp), 0)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (Kp, 128), 0) % 128
            == jax.lax.broadcasted_iota(jnp.int32, (Kp, 128), 1)
        ).astype(jnp.int8)
        acc = (iota == p_ref[0, 0, 0:1, :].astype(jnp.int32)).astype(jnp.int16)
        for j in range(1, m):
            acc += (iota == p_ref[0, 0, j : j + 1, :].astype(jnp.int32)).astype(jnp.int16)
        if CASTKIND == "i8":
            lhs, rhs = acc.astype(jnp.int8), sel
        elif CASTKIND == "i16":
            lhs, rhs = acc, sel
        else:
            lhs, rhs = acc.astype(jnp.bfloat16), sel.astype(jnp.bfloat16)
        out_ref[:] += jax.lax.dot_general(
            lhs, rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if CASTKIND != "bf16" else jnp.float32,
        ).astype(jnp.int32)

    return pl.pallas_call(
        kern,
        grid=(S, Rf),
        in_specs=[
            pl.BlockSpec((1, 1, m, Kp), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_BINS, 128), lambda s, r: (0, s), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BINS, S * 128), jnp.int32),
    )(striped)


def main():
    rng = np.random.default_rng(0)
    only = set(sys.argv[1:])

    def want(name):
        return not only or any(k in name for k in only)

    plane = jax.device_put(rng.integers(0, 256, (H, W), np.uint8))
    uv = jax.device_put(rng.integers(0, 256, (2, H, W), np.uint8))
    u_s = jax.device_put(np.asarray(stripe4(uv[0])))
    v_s = jax.device_put(np.asarray(stripe4(uv[1])))

    if want("vs_int4"):
        bench("vs_int4 NT matmul", lambda a, b: vs_int4(a, b), (u_s, v_s))
    global CASTKIND
    for ck in ("i8", "i16", "bf16"):
        for m in (8, 16):
            if want(f"wv_pack{m}{ck}"):
                CASTKIND = ck
                sp = jax.device_put(np.asarray(stripe_pack(plane, m)))
                bench(f"wv_pack m={m} {ck} (1 plane)", lambda p, m=m: wv_pack(p, m), (sp,))
    if want("check"):
        from obs_color_monitor_tpu.ops import stats

        sp = jax.device_put(np.asarray(stripe_pack(plane, 8)))
        wv = np.asarray(jax.jit(lambda p: wv_pack(p, 8))(sp)).copy()
        Rf = -(-H // 64)
        wv = wv[:, :W]
        wv[0, :] -= Rf * 64 - H
        want_wv = np.asarray(
            stats.waveform_counts_i32(plane[None], jnp.ones((H, W), bool))
        )[0]
        print(f"# wv_pack8 exact: {(wv == want_wv).all()}", flush=True)


if __name__ == "__main__":
    main()
