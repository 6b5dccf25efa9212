"""Round-3 sweep H: kernel-B variants on real tile inputs (wall slope).

Baseline: _vs_swar_tiles_kernel (VS per-row K=128 NT matmuls, serial
accumulate; SWAR on 64-row band pairs) = 1.10 ms/4K-frame.
Variants: K=256 lane-concat row pairs; tree-reduced matmul accumulation;
4-band SWAR unpack; combinations.
"""
import sys
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import obs_color_monitor_tpu.ops.pallas_stats as ps

S, NB, OH = 15, 32, 32   # ~4K scale-2 tile geometry (32 bands: pair=4 divides)
N = 32


def slope(name, fn, args):
    from _util import slope_ms

    def build(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                aa = [jnp.bitwise_xor(x, (i % 2).astype(jnp.uint8)) for x in a]
                out = fn(*aa)
                return acc + sum(
                    jnp.sum(l.astype(jnp.int32))
                    for l in jax.tree_util.tree_leaves(out)
                )

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run

    try:
        print(f"{name:46s} {slope_ms(build, args, N):7.3f} ms/frame",
              flush=True)
    except Exception as e:
        print(f"{name:46s} FAIL {str(e)[:140]}", flush=True)


def tile_specs(pair):
    def one(c):
        if c is None:
            return pl.BlockSpec((1, pair, OH, 128), lambda s, r: (s, r, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((c, 1, pair, OH, 128), lambda s, r: (0, s, r, 0, 0),
                            memory_space=pltpu.VMEM)

    return one


def make_kernel(pair, k256, tree, swar_wide):
    def kern(u_ref, v_ref, d_ref, vs_ref, wv_ref):
        s = pl.program_id(0)
        r = pl.program_id(1)

        @pl.when((s == 0) & (r == 0))
        def _():
            vs_ref[:] = jnp.zeros_like(vs_ref)

        @pl.when(r == 0)
        def _():
            wv_ref[:] = jnp.zeros_like(wv_ref)

        ms = []
        for j in range(pair):
            u_t, v_t = u_ref[0, j], v_ref[0, j]
            if k256:
                for rr in range(0, OH, 2):
                    ohu = jnp.concatenate(
                        [ps._one_hot_row(u_t[rr]), ps._one_hot_row(u_t[rr + 1])],
                        axis=1)
                    ohv = jnp.concatenate(
                        [ps._one_hot_row(v_t[rr]), ps._one_hot_row(v_t[rr + 1])],
                        axis=1)
                    ms.append(ps._nt_matmul(ohv, ohu))
            else:
                for rr in range(OH):
                    ms.append(ps._nt_matmul(
                        ps._one_hot_row(v_t[rr]), ps._one_hot_row(u_t[rr])))
        if tree:
            while len(ms) > 1:
                ms = [a + b for a, b in zip(ms[::2], ms[1::2])] + (
                    [ms[-1]] if len(ms) % 2 else [])
            acc = ms[0]
        else:
            acc = None
            for m in ms:
                acc = m if acc is None else acc + m
        vs_ref[:] += acc

        if swar_wide:
            for ci in range(3):
                tile = jnp.concatenate(
                    [d_ref[ci, 0, j] for j in range(pair)], axis=0)
                wv_ref[ci] = ps._swar_tile_counts(tile, wv_ref[ci])
        else:
            for ci in range(3):
                for j in range(pair):
                    wv_ref[ci] = ps._swar_tile_counts(
                        d_ref[ci, 0, j], wv_ref[ci])

    return kern


def run_variant(pair, k256, tree, swar_wide, u, v, d):
    spec = tile_specs(pair)
    return pl.pallas_call(
        make_kernel(pair, k256, tree, swar_wide),
        grid=(S, NB // pair),
        in_specs=[spec(None), spec(None), spec(3)],
        out_specs=(
            pl.BlockSpec((256, 256), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 256, 128), lambda s, r: (0, 0, s),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((256, 256), jnp.int32),
            jax.ShapeDtypeStruct((3, 256, S * 128), jnp.int32),
        ),
    )(u, v, d)


def main():
    rng = np.random.default_rng(3)
    u = jax.device_put(rng.integers(0, 256, (S, NB, OH, 128), np.uint8))
    v = jax.device_put(rng.integers(0, 256, (S, NB, OH, 128), np.uint8))
    d = jax.device_put(rng.integers(0, 256, (3, S, NB, OH, 128), np.uint8))

    slope("baseline: pair=2 K=128 serial, swar-wide",
          lambda uu, vv, dd: run_variant(2, False, False, True, uu, vv, dd),
          (u, v, d))
    slope("K=256 concat pairs (serial acc)",
          lambda uu, vv, dd: run_variant(2, True, False, True, uu, vv, dd),
          (u, v, d))
    slope("K=128 tree acc",
          lambda uu, vv, dd: run_variant(2, False, True, True, uu, vv, dd),
          (u, v, d))
    slope("K=256 + tree acc",
          lambda uu, vv, dd: run_variant(2, True, True, True, uu, vv, dd),
          (u, v, d))
    slope("pair=4 K=256 tree, swar 128-row unpack",
          lambda uu, vv, dd: run_variant(4, True, True, True, uu, vv, dd),
          (u, v, d))
    slope("pair=4 K=128 serial, swar 128-row unpack",
          lambda uu, vv, dd: run_variant(4, False, False, True, uu, vv, dd),
          (u, v, d))


if __name__ == "__main__":
    main()
