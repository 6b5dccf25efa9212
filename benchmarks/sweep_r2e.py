"""Round-2 sweep, part E: where do the non-stats milliseconds go?"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


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
            xs = tuple(
                jnp.bitwise_xor(x, (i % 2).astype(x.dtype))
                if x.dtype == jnp.uint8
                else x + i.astype(x.dtype) * 0
                for x in a
            )
            return acc + cks(fn(*xs, i))

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    try:
        rep = jax.jit(rep_f)
        t0 = time.perf_counter()
        _ = np.asarray(rep(*args))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(rep(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"PASS {name:44s} {(best - RT) * 1e3 / n:9.3f} ms (compile {tc:.0f}s)", flush=True)
    except Exception as e:
        print(f"FAIL {name:44s} {str(e)[:160]}", flush=True)


def main():
    from obs_color_monitor_tpu.ops import render as render_ops
    from obs_color_monitor_tpu.ops import convert, fused
    from obs_color_monitor_tpu.ops.stats import histogram_hi_max, histogram_levels

    rng = np.random.default_rng(0)
    vs_counts = jax.device_put(rng.integers(0, 256, (256, 256), np.uint8))
    wv_counts = jax.device_put(rng.integers(0, 256, (3, 256, 1920), np.uint8))
    hi_counts = jax.device_put(rng.integers(0, 99999, (3, 256)).astype(np.int32))
    planes4k = jax.device_put(rng.integers(0, 256, (4, 2160, 3840), np.uint8))
    frame4k = jax.device_put(rng.integers(0, 256, (2160, 3840, 4), np.uint8))

    bench("render_vectorscope", lambda c, i: render_ops.render_vectorscope(c, 25, cs=2, white=False), (vs_counts,))
    bench("render_waveform overlay", lambda c, i: render_ops.render_waveform(c, 25, 0, 3, False), (wv_counts,))
    bench(
        "render_histogram",
        lambda c, i: render_ops.render_histogram(
            *histogram_levels(c, histogram_hi_max(c, (True,) * 3, 1920 * 1080, 0, 0), (True,) * 3, False),
            level_height=200, display=0, n_components=3, yuv_mode=False,
        ),
        (hi_counts,),
    )
    bench("downscale x2 only", lambda p, i: convert.downscale_planes(p, scale=2), (planes4k,))
    bench(
        "downscale+yuv+stripe-ingest",
        lambda p, i: jax.tree_util.tree_map(
            lambda x: x,
            (lambda sp: (convert.rgb_to_yuv_planes(sp, cs=2), sp))(
                convert.downscale_planes(p, scale=2)
            ),
        ),
        (planes4k,),
    )
    bench(
        "analyze full (stats only path)",
        lambda p, i: fused.analyze(
            p, cs=2, scale=2, need_vs=True, need_wv_rgb=True, need_hi_rgb=True,
            keep_rgba=False, is_planar=True, backend="pallas",
        ),
        (planes4k,),
        n=16,
    )
    # overlays all three, XLA-fused under one jit?
    from obs_color_monitor_tpu.ops import overlays as ov

    pc = jax.device_put(np.array([255, 84, 0, 255], np.uint8))

    def all_ov(p, i):
        z = ov.zebra_planes(p, 0.75, 1.0, i.astype(jnp.float32), cs=2)
        f = ov.falsecolor_planes(p, cs=2)
        k = ov.focus_peaking_planes(p, 3062, pc)
        return z, f, k

    bench("overlays all3 one jit", all_ov, (planes4k,), n=16)


if __name__ == "__main__":
    main()
