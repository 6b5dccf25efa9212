"""Round-3 sweep I: kernel-B grid coarsening.  If each Mosaic grid step
carries fixed overhead, fewer+bigger steps win: process sp stripes x pair
bands per step (baseline geometry: sp=1, pair=2 -> 255 steps/frame).
K=128 row matmuls, tree accumulation (r3h winners).
"""
import sys
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import obs_color_monitor_tpu.ops.pallas_stats as ps

S, NB, OH = 15, 32, 32
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


def make_kernel(sp, pair, swar_rows):
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
        for si in range(sp):
            for j in range(pair):
                u_t, v_t = u_ref[si, j], v_ref[si, j]
                for rr in range(OH):
                    ms.append(ps._nt_matmul(
                        ps._one_hot_row(v_t[rr]), ps._one_hot_row(u_t[rr])))
        while len(ms) > 1:
            ms = [a + b for a, b in zip(ms[::2], ms[1::2])] + (
                [ms[-1]] if len(ms) % 2 else [])
        vs_ref[:] += ms[0]

        for si in range(sp):
            for ci in range(3):
                for j0 in range(0, pair, swar_rows // OH):
                    tile = jnp.concatenate(
                        [d_ref[ci, si, j0 + jj]
                         for jj in range(swar_rows // OH)], axis=0)
                    lo, hi = si * 128, (si + 1) * 128
                    wv_ref[ci, :, lo:hi] = ps._swar_tile_counts(
                        tile, wv_ref[ci, :, lo:hi])

    return kern


def run_variant(sp, pair, swar_rows, u, v, d):
    def uspec():
        return pl.BlockSpec((sp, pair, OH, 128), lambda s, r: (s, r, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        make_kernel(sp, pair, swar_rows),
        grid=(S // sp, NB // pair),
        in_specs=[
            uspec(), uspec(),
            pl.BlockSpec((3, sp, pair, OH, 128), lambda s, r: (0, s, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((256, 256), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 256, sp * 128), lambda s, r: (0, 0, s),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((256, 256), jnp.int32),
            jax.ShapeDtypeStruct((3, 256, S * 128), jnp.int32),
        ),
    )(u, v, d)


def main():
    rng = np.random.default_rng(3)
    # tiles reshaped so sp stripes sit together: (S, NB, OH, 128)
    u = jax.device_put(rng.integers(0, 256, (S, NB, OH, 128), np.uint8))
    v = jax.device_put(rng.integers(0, 256, (S, NB, OH, 128), np.uint8))
    d = jax.device_put(rng.integers(0, 256, (3, S, NB, OH, 128), np.uint8))

    for sp, pair, swar in [(1, 2, 64), (3, 2, 64), (5, 2, 64),
                           (3, 4, 128), (5, 4, 128), (15, 2, 64)]:
        steps = (S // sp) * (NB // pair)
        slope(f"sp={sp} pair={pair} swar={swar} ({steps} steps)",
              lambda uu, vv, dd, a=sp, b=pair, c=swar:
                  run_variant(a, b, c, uu, vv, dd),
              (u, v, d))


if __name__ == "__main__":
    main()
