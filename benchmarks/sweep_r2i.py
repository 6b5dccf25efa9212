"""Round-2 sweep, part I: decompose make_full_step's non-kernel time."""

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


def bench(name, fn, args, n=16):
    global RT
    if RT is None:
        RT = _round_trip_s()
        print(f"# round trip {RT*1e3:.1f} ms", flush=True)

    def cks(out):
        return sum(jnp.sum(l.astype(jnp.int32)) for l in jax.tree_util.tree_leaves(out))

    def rep_f(*a):
        def body(i, acc):
            xs = tuple(jnp.bitwise_xor(x, (i % 2).astype(x.dtype)) for x in a)
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
        print(f"PASS {name:46s} {(best - RT) * 1e3 / n:9.3f} ms (compile {tc:.0f}s)", flush=True)
    except Exception as e:
        print(f"FAIL {name:46s} {str(e)[:160]}", flush=True)


def main():
    from obs_color_monitor_tpu.api import make_full_step
    from obs_color_monitor_tpu.colorspace import Colorspace
    from obs_color_monitor_tpu.ops import overlays as ov
    from obs_color_monitor_tpu.ops import render as render_ops
    from obs_color_monitor_tpu.ops import convert
    from obs_color_monitor_tpu.ops.fused import analyze
    from obs_color_monitor_tpu.ops.stats import (
        apply_channel_select, histogram_hi_max, histogram_levels,
    )

    rng = np.random.default_rng(0)
    frame4k = jax.device_put(rng.integers(0, 256, (2160, 3840, 4), np.uint8))

    step = make_full_step(2160, 3840, cs=Colorspace.BT709, scale=2)
    bench("make_full_step (all)", lambda f, i: step(f, i.astype(jnp.float32)), (frame4k,))

    def stats_and_renders(f, i):
        planes = convert.planarize(f)
        res = analyze(planes, cs=2, scale=2, need_vs=True, need_wv_rgb=True,
                      need_hi_rgb=True, keep_rgba=False, is_planar=True)
        vs_img = render_ops.render_vectorscope(res.vs_counts, 25, cs=2, white=False)
        wv = apply_channel_select(res.wv_rgb, (True,) * 3)
        wv_img = render_ops.render_waveform(wv, 25, 0, 3, False)
        hic = apply_channel_select(res.hi_rgb.astype(jnp.int32), (True,) * 3)
        hi = histogram_hi_max(hic, (True,) * 3, 1920 * 1080, 0, 0)
        lv, he = histogram_levels(hic, hi, (True,) * 3, False)
        hi_img = render_ops.render_histogram(lv, he, 200, 0, 3, False)
        return vs_img, wv_img, hi_img, res.vs_counts, wv, hic

    bench("planarize+stats+renders", stats_and_renders, (frame4k,))

    def stats_only(f, i):
        planes = convert.planarize(f)
        res = analyze(planes, cs=2, scale=2, need_vs=True, need_wv_rgb=True,
                      need_hi_rgb=True, keep_rgba=False, is_planar=True)
        return res.vs_counts, res.wv_rgb, res.hi_rgb

    bench("planarize+stats only", stats_only, (frame4k,))

    pc = jax.device_put(np.array([255, 84, 0, 255], np.uint8))

    def overlays_only(f, i):
        planes = convert.planarize(f)
        z = ov.zebra_planes(planes, 0.75, 1.0, i.astype(jnp.float32), cs=2)
        fc = ov.falsecolor_planes(planes, cs=2)
        fp = ov.focus_peaking_planes(planes, 3062, pc)
        return z, fc, fp

    bench("planarize+overlays only", overlays_only, (frame4k,))


if __name__ == "__main__":
    main()


def extra():
    from obs_color_monitor_tpu.ops import convert
    from obs_color_monitor_tpu.ops import pallas_stats as ps
    rng = np.random.default_rng(0)
    frame4k = jax.device_put(rng.integers(0, 256, (2160, 3840, 4), np.uint8))

    def chain(f, mode):
        planes = convert.planarize(f)
        sp = convert.downscale_planes(planes, scale=2)
        yuv = convert.rgb_to_yuv_planes(sp, cs=2)
        mask = sp[3] != 0
        c, h, w = 3, sp.shape[-2], sp.shape[-1]
        vals = jnp.where(mask[None], sp[:3], 0)
        striped = jax.vmap(ps._stripe4)(vals)
        u_s = ps._stripe4(yuv[1])
        v_s = ps._stripe4(yuv[2])
        s, rf = u_s.shape[0], u_s.shape[1]
        import functools as ft
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        vs, wv = pl.pallas_call(
            ft.partial(ps._fused_kernel, c),
            grid=(s, rf),
            in_specs=[ps._in4(), ps._in4(), ps._in4(c),
                      pl.BlockSpec((ps._LANES, ps._COLS), lambda s, r: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((256, 256), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((c, 256, ps._COLS), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((256, 256), jnp.int32),
                       jax.ShapeDtypeStruct((c, 256, s * ps._COLS), jnp.int32)),
        )(u_s, v_s, striped, ps._sel_matrix())
        if mode == "raw":
            return vs, wv
        n_pad = s * 128 * rf * 64 - h * w
        vs = vs.at[0, 0].add(jnp.int32(-n_pad))
        wv = wv[:, :, :w]
        wv = wv.at[:, 0, :].add(-ps._wv_corrections(mask, h, w, rf)[None, :])
        if mode == "corr":
            return vs, wv
        return (jnp.minimum(vs, 255).astype(jnp.uint8),
                jnp.minimum(wv, 255).astype(jnp.uint8),
                wv.sum(-1).astype(jnp.uint32))

    bench("chain raw (no corr/sat)", lambda f, i: chain(f, "raw"), (frame4k,))
    bench("chain +corrections", lambda f, i: chain(f, "corr"), (frame4k,))
    bench("chain +sat+hist (full)", lambda f, i: chain(f, "full"), (frame4k,))


if "extra" in sys.argv:
    extra()
else:
    pass
