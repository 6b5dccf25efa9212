"""Round-3 sweep J: int4 MXU operands for the vectorscope matmul.

probe_toolchain found int4 dot_general operands now compile when the
one-hot is materialized as int8 FIRST and cast (comparing directly in
int4 fails: Mosaic folds the cast into the compare -> illegal cmpi).
If the MXU runs int4 at 2x int8 throughput this halves the dominant
0.78 ms vectorscope term.  Values are checked exactly (0/1 one-hots).
"""
import sys
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import obs_color_monitor_tpu.ops.pallas_stats as ps
from _util import slope_ms

S, NB, OH = 15, 34, 32   # 4K scale-2 tile geometry
N = 32


def make_vs_kernel(dtype, tree):
    """dtype=int8: production form (direct one-hot -> dot).  dtype=int4:
    the one-hot must round-trip through a SCRATCH ref before the cast —
    Mosaic otherwise folds the select into the cast and emits an illegal
    int4 compare (probe_toolchain / sweep notes)."""

    def kern(u_ref, v_ref, vs_ref, su, sv):
        s = pl.program_id(0)
        r = pl.program_id(1)

        @pl.when((s == 0) & (r == 0))
        def _():
            vs_ref[:] = jnp.zeros_like(vs_ref)

        ms = []
        for j in range(2):
            u_t, v_t = u_ref[0, j], v_ref[0, j]
            for rr in range(OH):
                if dtype == jnp.int4:
                    su[:] = ps._one_hot_row(u_t[rr])
                    sv[:] = ps._one_hot_row(v_t[rr])
                    ohu = su[:].astype(jnp.int4)
                    ohv = sv[:].astype(jnp.int4)
                else:
                    ohu = ps._one_hot_row(u_t[rr]).astype(dtype)
                    ohv = ps._one_hot_row(v_t[rr]).astype(dtype)
                ms.append(ps._nt_matmul(ohv, ohu))
        if tree:
            vs_ref[:] += ps._tree_sum(ms)
        else:
            acc = None
            for m in ms:
                acc = m if acc is None else acc + m
            vs_ref[:] += acc

    return kern


def run_vs(dtype, tree, u, v):
    return pl.pallas_call(
        make_vs_kernel(dtype, tree),
        grid=(S, NB // 2),
        in_specs=[ps._pair_tile_spec(None, OH), ps._pair_tile_spec(None, OH)],
        out_specs=pl.BlockSpec((256, 256), lambda s, r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((256, 128), jnp.int8),
                        pltpu.VMEM((256, 128), jnp.int8)],
    )(u, v)


def slope(name, fn, args):
    def build(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                aa = [jnp.bitwise_xor(x, (i % 2).astype(jnp.uint8)) for x in a]
                return acc + jnp.sum(fn(*aa))

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run

    try:
        print(f"{name:40s} {slope_ms(build, args, N):7.3f} ms/frame",
              flush=True)
    except Exception as e:
        print(f"{name:40s} FAIL {str(e)[:120]}", flush=True)


def main():
    rng = np.random.default_rng(3)
    u = jax.device_put(rng.integers(0, 256, (S, NB, OH, 128), np.uint8))
    v = jax.device_put(rng.integers(0, 256, (S, NB, OH, 128), np.uint8))

    # exactness first: int4 counts must equal int8 counts
    try:
        a8 = np.asarray(run_vs(jnp.int8, True, u, v))
        a4 = np.asarray(run_vs(jnp.int4, True, u, v))
        print("int4 values:", "EXACT" if np.array_equal(a8, a4) else "WRONG",
              f"(sum {a4.sum()} vs {a8.sum()})", flush=True)
    except Exception as e:
        print("int4 exactness: FAIL", str(e)[:120], flush=True)

    slope("VS int8 tree (production form)", lambda uu, vv: run_vs(jnp.int8, True, uu, vv), (u, v))
    slope("VS int4 tree", lambda uu, vv: run_vs(jnp.int4, True, uu, vv), (u, v))
    slope("VS int4 serial", lambda uu, vv: run_vs(jnp.int4, False, uu, vv), (u, v))


if __name__ == "__main__":
    main()
