"""Round-3 sweep F: mega-kernel (one pallas_call, per-stripe grid) vs the
two-kernel frame pipeline, 4K scale 2 with overlays.  Wall slope
(t(2n)-t(n))/n cancels the tunnel round trip.
"""
import sys
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp

H, W = 2160, 3840
N = 32

ARGS = dict(cs=2, scale=2, th_low=0.75, th_high=1.0, zb_cs=2, fc_cs=2,
            peak_th=3062, peak_rgba=(255, 0, 0, 255))


def csum(out):
    total = jnp.int32(0)
    for i, leaf in enumerate(out):
        if leaf is None:
            continue
        if i in (3, 4, 5):
            leaf = leaf[:, :64, :]
        total += jnp.sum(leaf.astype(jnp.int32))
    return total


def slope(name, fn, arg, is_u32=False):
    from _util import slope_ms

    def build(n):
        @jax.jit
        def run(x):
            def body(i, acc):
                xor = (i % 2).astype(jnp.uint32 if is_u32 else jnp.uint8)
                f = jnp.bitwise_xor(x, xor)
                return acc + csum(fn(f))

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run

    try:
        print(f"{name:40s} {slope_ms(build, (arg,), N):7.3f} ms/frame",
              flush=True)
    except Exception as e:
        print(f"{name:40s} FAIL {str(e)[:160]}", flush=True)


def main():
    from obs_color_monitor_tpu.ops.pallas_pipeline import frame_pipeline
    from mega_kernel import frame_pipeline_mega

    rng = np.random.default_rng(0)
    planar = jax.device_put(rng.integers(0, 256, (4, H, W), np.uint8))
    rgba = rng.integers(0, 256, (H, W, 4), np.uint8)
    x32 = jax.device_put(rgba.view(np.uint32).reshape(H, W))

    slope("two-kernel (planar)", lambda f: frame_pipeline(f, 0.5, **ARGS),
          planar)
    for p in (1, 2, 4):
        slope(f"mega planar P={p}",
              lambda f, p=p: frame_pipeline_mega(f, 0.5, p_stripes=p, **ARGS),
              planar)
    for p in (1, 2, 4):
        slope(f"mega packed P={p}",
              lambda f, p=p: frame_pipeline_mega(
                  f, 0.5, p_stripes=p, packed=True, **ARGS),
              x32, is_u32=True)


if __name__ == "__main__":
    main()
