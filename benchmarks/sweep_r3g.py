"""Round-3 sweep G: why the mega kernel lost, and what a launch costs.

1. xprof op time of the mega kernel (is the body slower, or the launch?)
2. slope of a fori_loop over a TRIVIAL pallas kernel -> per-launch cost
3. slope of the two-kernel pipeline for reference
"""
import sys, time, functools
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 2160, 3840
N = 32
ARGS = dict(cs=2, scale=2, th_low=0.75, th_high=1.0, zb_cs=2, fc_cs=2,
            peak_th=3062, peak_rgba=(255, 0, 0, 255))


def csum(out):
    total = jnp.int32(0)
    for i, leaf in enumerate(out):
        if leaf is None:
            continue
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.shape[-1] > 1024:
            leaf = leaf[..., :64, :]
        total += jnp.sum(leaf.astype(jnp.int32))
    return total


def op_profile(name, fn, arg, n=16):
    from _util import op_profile_rows

    @jax.jit
    def run(x):
        def body(i, acc):
            f = jnp.bitwise_xor(x, (i % 2).astype(jnp.uint8))
            return acc + csum(fn(f))

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    rows = op_profile_rows(run, (arg,), n, f"/tmp/tr_{name}")
    tot = sum(t for t, _ in rows)
    top = "; ".join(f"{nm.split('.')[0]}={t:.3f}" for t, nm in rows[:4] if t > 0.005)
    print(f"{name:30s} op-sum={tot:7.4f} ms   {top}", flush=True)


def trivial_launch_cost():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    arr = jax.device_put(np.zeros((8, 128), np.int32))

    def chain(n):
        @jax.jit
        def run(x):
            def body(i, y):
                return pl.pallas_call(
                    k,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                )(y + i)

            return jax.lax.fori_loop(0, n, body, x)

        return run

    def timed(n):
        r = chain(n)
        _ = np.asarray(r(arr))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(r(arr))
            best = min(best, time.perf_counter() - t0)
        return best

    n = 256
    t1, t2 = timed(n), timed(2 * n)
    print(f"trivial pallas launch: {(t2-t1)/n*1e6:8.2f} us/launch", flush=True)

    # same chain with a plain XLA op for comparison
    def chain2(n):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, y: y + i, x)

        return run

    def timed2(n):
        r = chain2(n)
        _ = np.asarray(r(arr))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(r(arr))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed2(n), timed2(2 * n)
    print(f"plain XLA add loop:    {(t2-t1)/n*1e6:8.2f} us/iter", flush=True)


def main():
    from obs_color_monitor_tpu.ops.pallas_pipeline import frame_pipeline
    from mega_kernel import frame_pipeline_mega

    rng = np.random.default_rng(0)
    planar = jax.device_put(rng.integers(0, 256, (4, H, W), np.uint8))

    trivial_launch_cost()
    op_profile("mega_p1", lambda f: frame_pipeline_mega(
        f, 0.5, p_stripes=1, **ARGS), planar)
    op_profile("twokernel", lambda f: frame_pipeline(f, 0.5, **ARGS), planar)


if __name__ == "__main__":
    main()
