"""Round-3 sweep C: where the fused stats kernel's 1.2 ms goes.

Profiled with xprof (tunnel-noise-free device times): the VS-only and
SWAR-only halves of the fused kernel, VS with per-plane vs per-pair
matmuls, and a HIGHEST-free downscale (split the <=510 pair-sum operand
into two <=255 halves, each bf16-exact, two default-precision matmuls).
"""
import sys, functools
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import obs_color_monitor_tpu.ops.pallas_stats as ps

N = 256


def prof(name, fn, *args):
    from _util import op_profile_rows

    @jax.jit
    def run(*a):
        def body(i, acc):
            aa = [jnp.bitwise_xor(x, (i % 2).astype(jnp.uint8)) for x in a]
            out = fn(*aa)
            return acc + sum(jnp.sum(l.astype(jnp.int32)) for l in jax.tree_util.tree_leaves(out))
        return jax.lax.fori_loop(0, 16, body, jnp.int32(0))

    rows = op_profile_rows(run, args, 16, f"/tmp/tr_{name}")
    tot = sum(t for t, _ in rows)
    top = "; ".join(f"{n.split('.')[0]}={t:.3f}" for t, n in rows[:3] if t > 0.01)
    print(f"{name:28s} total={tot:7.4f} ms   {top}", flush=True)


s, nb, oh = 15, 34, 32
rng = np.random.default_rng(3)
u_t = jax.device_put(rng.integers(0, 256, (s, nb, oh, 128), np.uint8))
v_t = jax.device_put(rng.integers(0, 256, (s, nb, oh, 128), np.uint8))
d3 = jax.device_put(rng.integers(0, 256, (3, s, nb, oh, 128), np.uint8))


def _vs_only_kernel(lanes, u_ref, v_ref, vs_ref):
    si, ri = pl.program_id(0), pl.program_id(1)

    @pl.when((si == 0) & (ri == 0))
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    for j in range(2):
        ohu = ps._one_hot_bins_first(u_ref[0, j, 0], lanes)
        ohv = ps._one_hot_bins_first(v_ref[0, j, 0], lanes)
        vs_ref[:] += ps._nt_matmul(ohv, ohu)


def vs_only(u, v):
    lanes = oh * 128
    fl = lambda a: a.reshape(s, nb, 1, lanes)
    spec = pl.BlockSpec((1, 2, 1, lanes), lambda si, ri: (si, ri, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_vs_only_kernel, lanes),
        grid=(s, nb // 2),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((N, N), lambda si, ri: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.int32),
    )(fl(u), fl(v))


def _swar_only_kernel(c, data_ref, out_ref):
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for ci in range(c):
        tile = jnp.concatenate([data_ref[ci, 0, 0], data_ref[ci, 0, 1]], axis=0)
        out_ref[ci] = ps._swar_tile_counts(tile, out_ref[ci])


def swar_only(d):
    return pl.pallas_call(
        functools.partial(_swar_only_kernel, 3),
        grid=(s, nb // 2),
        in_specs=[pl.BlockSpec((3, 1, 2, oh, 128), lambda si, ri: (0, si, ri, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, N, 128), lambda si, ri: (0, 0, si), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, N, s * 128), jnp.int32),
    )(d)


# HIGHEST-free downscale: q2 @ t with t<=510 split into two bf16-exact halves
def _ds_kernel(mode, x_ref, p2_ref, q2_ref, o_ref):
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # (64, 256*s... per block (64,256))
    p2 = p2_ref[:]
    q2 = q2_ref[:]
    t = jax.lax.dot_general(x, p2, dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if mode == "highest":
        rp = jax.lax.dot_general(q2, t, dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    else:
        t1 = jnp.minimum(t, 255.0)
        t2 = t - t1
        mm = lambda a: jax.lax.dot_general(q2, a, dimension_numbers=(((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        rp = mm(t1) + mm(t2)
    o_ref[0] = jnp.floor((rp + 2.0) * 0.25).astype(jnp.int32).astype(jnp.uint8)


def ds_bench(mode):
    def f(x):
        h4, w4 = x.shape[-2], x.shape[-1]
        nb4 = h4 // 64
        p2 = (jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0) // 2
              == jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)).astype(jnp.float32)
        q2 = (jax.lax.broadcasted_iota(jnp.int32, (32, 64), 1) // 2
              == jax.lax.broadcasted_iota(jnp.int32, (32, 64), 0)).astype(jnp.float32)
        return pl.pallas_call(
            functools.partial(_ds_kernel, mode),
            grid=(nb4, w4 // 256),
            in_specs=[
                pl.BlockSpec((1, 64, 256), lambda r, c: (0, r, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((256, 128), lambda r, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((32, 64), lambda r, c: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 32, 128), lambda r, c: (0, r, c), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, h4 // 2, w4 // 2), jnp.uint8),
        )(x[None], p2, q2)
    return f


def main():
    # correctness of the split downscale
    x = jax.device_put(rng.integers(0, 256, (2176, 3840), np.uint8))
    a = np.asarray(ds_bench("highest")(x))
    b = np.asarray(ds_bench("split")(x))
    print("split-downscale exact:", np.array_equal(a, b), flush=True)

    prof("vs_only", vs_only, u_t, v_t)
    prof("swar_only", swar_only, d3)
    from obs_color_monitor_tpu.ops.pallas_pipeline import _stats_pairs
    prof("fused_pair", lambda u, v, d: _stats_pairs(u, v, d[0], d[1], d[2], oh=oh, interpret=False), u_t, v_t, d3)
    prof("ds_highest", ds_bench("highest"), x)
    prof("ds_split", ds_bench("split"), x)


# ---- F-variants: overlap engineering ----

def _fused_reorder_kernel(c, lanes, u_ref, v_ref, data_ref, vs_ref, wv_ref):
    """Issue the matmuls first, run SWAR before consuming their results."""
    si, ri = pl.program_id(0), pl.program_id(1)

    @pl.when((si == 0) & (ri == 0))
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    @pl.when(ri == 0)
    def _():
        wv_ref[:] = jnp.zeros_like(wv_ref)

    import jax as _jax
    mms = []
    for j in range(2):
        ohu = ps._one_hot_bins_first(u_ref[0, j, 0], lanes)
        ohv = ps._one_hot_bins_first(v_ref[0, j, 0], lanes)
        mms.append(ps._nt_matmul(ohv, ohu))
    for ci in range(c):
        tile = jnp.concatenate([data_ref[ci, 0, 0], data_ref[ci, 0, 1]], axis=0)
        wv_ref[ci] = ps._swar_tile_counts(tile, wv_ref[ci])
    vs_ref[:] += mms[0] + mms[1]


def fused_reorder(u, v, d):
    lanes = oh * 128
    fl = lambda a: a.reshape(s, nb, 1, lanes)
    spec = pl.BlockSpec((1, 2, 1, lanes), lambda si, ri: (si, ri, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_reorder_kernel, 3, lanes),
        grid=(s, nb // 2),
        in_specs=[spec, spec,
                  pl.BlockSpec((3, 1, 2, oh, 128), lambda si, ri: (0, si, ri, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((N, N), lambda si, ri: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N, 128), lambda si, ri: (0, 0, si), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, N), jnp.int32),
            jax.ShapeDtypeStruct((3, N, s * 128), jnp.int32),
        ),
    )(fl(u), fl(v), d)


def _vs_i16_kernel(lanes, u_ref, v_ref, vs_ref):
    si, ri = pl.program_id(0), pl.program_id(1)

    @pl.when((si == 0) & (ri == 0))
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    def oh16(row):
        iota = jax.lax.broadcasted_iota(jnp.int16, (N, lanes), 0)
        return (iota == row.astype(jnp.int16)).astype(jnp.int8)

    for j in range(2):
        vs_ref[:] += ps._nt_matmul(oh16(v_ref[0, j, 0]), oh16(u_ref[0, j, 0]))


def vs_i16(u, v):
    lanes = oh * 128
    fl = lambda a: a.reshape(s, nb, 1, lanes)
    spec = pl.BlockSpec((1, 2, 1, lanes), lambda si, ri: (si, ri, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_vs_i16_kernel, lanes),
        grid=(s, nb // 2),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((N, N), lambda si, ri: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.int32),
    )(fl(u), fl(v))


def main_f():
    ref_vs = np.asarray(vs_only(u_t, v_t))
    from obs_color_monitor_tpu.ops.pallas_pipeline import _stats_pairs
    rvs, rwv = _stats_pairs(u_t, v_t, d3[0], d3[1], d3[2], oh=oh, interpret=False)
    try:
        gvs, gwv = fused_reorder(u_t, v_t, d3)
        print("reorder exact:", np.array_equal(np.asarray(gvs), np.asarray(rvs)),
              np.array_equal(np.asarray(gwv), np.asarray(rwv)), flush=True)
        prof("fused_reorder", fused_reorder, u_t, v_t, d3)
    except Exception as e:
        print("fused_reorder FAIL:", str(e)[:200], flush=True)
    try:
        g = np.asarray(vs_i16(u_t, v_t))
        print("vs_i16 exact:", np.array_equal(g, ref_vs), flush=True)
        prof("vs_i16", vs_i16, u_t, v_t)
    except Exception as e:
        print("vs_i16 FAIL:", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
    main_f()
