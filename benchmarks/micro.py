"""Per-op microbenchmarks (the source of doc/performance.md's table).

Run on hardware:  python benchmarks/micro.py [--n 30]

Methodology (see doc/performance.md): ops repeat inside one jitted
fori_loop with an anti-hoist dependency, the tunnel round trip is
subtracted, and checksums force full computation.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

def _round_trip_s():
    """Measure the host<->device round trip (tunnel latency) dynamically."""
    import jax
    import jax.numpy as jnp
    import numpy as _np
    import time as _t

    tiny = jax.jit(lambda x: x + 1)
    _ = _np.asarray(tiny(jnp.int32(0)))
    best = 1e9
    for _i in range(3):
        t0 = _t.perf_counter()
        _ = _np.asarray(tiny(jnp.int32(0)))
        best = min(best, _t.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rt = _round_trip_s()
    print(f"# round trip: {rt*1e3:.1f} ms")

    from obs_color_monitor_tpu.ops import convert, overlays, pallas_stats
    from obs_color_monitor_tpu.api import make_full_step
    from obs_color_monitor_tpu.dock_step import make_dock_step
    from obs_color_monitor_tpu.colorspace import Colorspace

    rng = np.random.default_rng(0)
    frame4k = jax.device_put(rng.integers(0, 256, (2160, 3840, 4), np.uint8))
    planes4k = jax.device_put(rng.integers(0, 256, (4, 2160, 3840), np.uint8))
    planes1080 = jax.device_put(rng.integers(0, 256, (4, 1080, 1920), np.uint8))
    yuv1080 = jax.device_put(rng.integers(0, 256, (3, 1080, 1920), np.uint8))
    mask1080 = jax.device_put(np.ones((1080, 1920), bool))
    pc = jax.device_put(np.array([255, 84, 0, 255], np.uint8))

    def cks(out):
        return sum(
            jnp.sum(l.astype(jnp.int32)) for l in jax.tree_util.tree_leaves(out)
        )

    def bench(name, arg, fn, n=args.n):
        def rep_f(a):
            def body(i, acc):
                x = jnp.bitwise_xor(a, (i % 2).astype(jnp.uint8))
                return acc + cks(fn(x, i))
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        rep = jax.jit(rep_f)
        _ = np.asarray(rep(arg))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(rep(arg))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:44s} {(best - rt) * 1e3 / n:9.3f} ms")

    bench("planarize 4K (u32 bitcast)", frame4k, lambda f, i: convert.planarize(f))
    bench("downscale x2 4K planar", planes4k, lambda p, i: convert.downscale_planes(p, scale=2))
    bench("rgb->yuv 1080p planar", planes1080, lambda p, i: convert.rgb_to_yuv_planes(p, cs=2))
    bench("zebra 4K planar", planes4k, lambda p, i: overlays.zebra_planes(p, 0.75, 1.0, i.astype(jnp.float32), cs=2))
    bench("falsecolor 4K planar", planes4k, lambda p, i: overlays.falsecolor_planes(p, cs=2))
    bench("focuspeaking 4K planar", planes4k, lambda p, i: overlays.focus_peaking_planes(p, 3062, pc))
    bench("vectorscope pallas 1080p", yuv1080, lambda y, i: pallas_stats.vectorscope_pallas_i32(y))
    bench("waveform pallas 1080p", planes1080, lambda p, i: pallas_stats.waveform_pallas_i32(p[:3], p[3] != 0))
    bench(
        "fused vs+wv pallas 1080p",
        planes1080,
        lambda p, i: pallas_stats.fused_vs_wv_pallas_i32(p[:3], yuv1080, p[3] != 0),
    )
    bench(
        "fused ingest+stats 4K->1080p",
        planes4k,
        lambda p, i: pallas_stats.fused_ingest_stats_scale2(p, cs=2),
        n=16,
    )
    from obs_color_monitor_tpu.ops.pallas_overlays import fused_overlays_planes

    bench(
        "fused overlays 4K (zb+fc+fp)",
        planes4k,
        lambda p, i: fused_overlays_planes(
            p, i.astype(jnp.float32), th_low=0.75, th_high=1.0, zb_cs=2, fc_cs=2,
            peak_th=3062, peak_rgba=(255, 84, 0, 255),
        ),
        n=16,
    )
    step = make_full_step(2160, 3840, cs=Colorspace.BT709, scale=2)
    bench("make_full_step 4K (all six)", frame4k, lambda f, i: step(f, i.astype(jnp.float32)), n=16)
    # pinned to the measured six-scope composition (no ROI band) — the
    # DockConfig DEFAULT is the reference's new-dock panel, a different program
    from obs_color_monitor_tpu.config import DockConfig
    dstep = make_dock_step(2160, 3840, scale=2,
                           dock=DockConfig(show_roi=False, show_focuspeaking=True))
    bench("make_dock_step 4K (six-scope panel)", frame4k, lambda f, i: dstep(f, i.astype(jnp.float32)), n=16)


if __name__ == "__main__":
    main()
