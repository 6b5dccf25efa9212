"""Round-3 sweep E: where the 0.25 ms/frame of non-op wall time lives.

Wall-clock slope (t(2n)-t(n))/n of nested variants of the bench program:
bare frame_pipeline -> + planarize -> + renders -> full step.  The slope
cancels the tunnel round trip; differences between variants attribute
the wall time that xprof op_profile doesn't count (op sequencing /
launch overhead).
"""
import sys
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp

H, W = 2160, 3840
N = 48


def slope(name, build):
    from _util import best_of

    t1 = best_of(build(N), args)
    t2 = best_of(build(2 * N), args)
    print(f"{name:42s} {(t2 - t1) / N * 1e3:7.3f} ms/frame "
          f"({t1*1e3:.1f} -> {t2*1e3:.1f})", flush=True)


rng = np.random.default_rng(0)
frame = jax.device_put(rng.integers(0, 256, (H, W, 4), np.uint8))
planar = jax.device_put(rng.integers(0, 256, (4, H, W), np.uint8))
args = ()


def csum(out, fullres_idx=()):
    total = jnp.int32(0)
    for i, leaf in enumerate(out):
        if leaf is None:
            continue
        if i in fullres_idx:
            leaf = leaf[:, :64, :]
        total += jnp.sum(leaf.astype(jnp.int32))
    return total


def main():
    global args
    from obs_color_monitor_tpu.ops.pallas_pipeline import frame_pipeline
    from obs_color_monitor_tpu.api import make_full_step
    from obs_color_monitor_tpu.colorspace import Colorspace

    # 1. bare pipeline on planar input (2 kernels, stats + overlays)
    def build_bare(n):
        @jax.jit
        def run(p):
            def body(i, acc):
                f = jnp.bitwise_xor(p, (i % 2).astype(jnp.uint8))
                out = frame_pipeline(f, 0.5, cs=2, scale=2)
                return acc + csum(out, fullres_idx=(3, 4, 5))

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run

    args = (planar,)
    slope("bare frame_pipeline (planar in)", build_bare)

    # 2. bare pipeline, stats only (overlays off)
    def build_stats(n):
        @jax.jit
        def run(p):
            def body(i, acc):
                f = jnp.bitwise_xor(p, (i % 2).astype(jnp.uint8))
                out = frame_pipeline(f, 0.5, cs=2, scale=2, with_overlays=False)
                return acc + csum(out)

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run

    slope("frame_pipeline stats-only", build_stats)

    # 3. full step, planar input (no planarize)
    step_p = make_full_step(H, W, cs=Colorspace.BT709, scale=2,
                            input_format="planar")

    def build_step_planar(n):
        @jax.jit
        def run(p):
            def body(i, acc):
                f = jnp.bitwise_xor(p, (i % 2).astype(jnp.uint8))
                out = step_p(f, i.astype(jnp.float32) * 0.0667)
                return acc + csum(out, fullres_idx=(3, 4, 5))

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run

    slope("full step (planar in)", build_step_planar)

    # 4. full step, rgba input (the bench program)
    step = make_full_step(H, W, cs=Colorspace.BT709, scale=2)

    def build_step(n):
        @jax.jit
        def run(f0):
            def body(i, acc):
                f = jnp.bitwise_xor(f0, (i % 2).astype(jnp.uint8))
                out = step(f, i.astype(jnp.float32) * 0.0667)
                return acc + csum(out, fullres_idx=(3, 4, 5))

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run

    args = (frame,)
    slope("full step (rgba in = bench.py)", build_step)


if __name__ == "__main__":
    main()
