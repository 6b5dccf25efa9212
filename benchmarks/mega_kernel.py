"""MEASURED-REJECTED experiment: the entire frame pipeline as ONE
pallas_call with a per-stripe grid (benchmarks/sweep_r3f.py, sweep_r3g.py).

Result: bit-exact (same values as ops.pallas_pipeline.frame_pipeline) but
0.45-0.55 ms/4K-frame SLOWER than the two-kernel pipeline — the fused body
itself is slower (xprof op time 2.12 vs 1.57 ms; register pressure /
scheduling), NOT launch overhead (a trivial pallas launch measures ~0 us).
Kept out of the package; imported by the sweeps that document the result.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from obs_color_monitor_tpu.ops import pallas_stats as ps
from obs_color_monitor_tpu.ops.pallas_overlays import _overlay_band_math
from obs_color_monitor_tpu.ops.pallas_pipeline import (
    _BAND, _COLS, _cdiv, _downscale2_block, _extract_channels,
)


# ---------------------------------------------------------------------------
# Mega kernel: the ENTIRE frame pipeline in ONE pallas_call.
#
# Grid (stripe_groups, bands), bands innermost: the waveform accumulator
# block (3, 256, P*128) stays VMEM-resident for a whole stripe-group sweep
# (this is what made "SWAR inside the band kernel" slow before — the band
# grid forced a full-width accumulator RMW per band), the vectorscope
# (256, 256) i32 accumulator is resident for the whole kernel, and the
# U/V/data tiles never round-trip through HBM.  Input can be the PACKED
# u32 view of the interleaved RGBA frame (bitcast, no planarize pass) or
# planar (4, H, W) u8.  The focus-peaking column halo comes from 128-lane
# neighbor blocks; row halo from 8-row neighbor blocks as before.
# ---------------------------------------------------------------------------


def _mega_kernel(params, cur_ref, prv_ref, nxt_ref, lft_ref, rgt_ref,
                 p2_ref, q2_ref, tm_ref, *out_refs):
    (h4, w4, h, w, pwf, scale, packed, yuv_data, kcoef, ov_params,
     with_ov) = params
    sg = pl.program_id(0)
    b = pl.program_id(1)
    oh = _BAND // scale
    pw = pwf // scale
    tm = tm_ref[0, 0]

    cur = _extract_channels(cur_ref, packed)

    refs = list(out_refs)
    if with_ov:
        zb_ref, fc_ref, fp_ref = refs[:3]
        refs = refs[3:]
    vs_ref, wv_ref, ds_ref = refs

    if with_ov:
        ri4 = b * _BAND + jax.lax.broadcasted_iota(jnp.int32, (_BAND, pwf), 0)
        ci4 = sg * pwf + jax.lax.broadcasted_iota(jnp.int32, (_BAND, pwf), 1)
        prv = _extract_channels(prv_ref, packed, 3)
        nxt = _extract_channels(nxt_ref, packed, 3)
        prev_row = [p[7:8] for p in prv]
        next_row = [nx[0:1] for nx in nxt]
        lft = _extract_channels(lft_ref, packed, 3)
        rgt = _extract_channels(rgt_ref, packed, 3)
        left_col = [c[:, _COLS - 1 : _COLS] for c in lft]
        right_col = [c[:, 0:1] for c in rgt]
        zb_ref[:], fc_ref[:], fp_ref[:] = _overlay_band_math(
            ov_params, cur, prev_row, next_row, tm, ri4, ci4,
            left_col, right_col,
        )

    @pl.when((sg == 0) & (b == 0))
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    @pl.when(b == 0)
    def _():
        wv_ref[:] = jnp.zeros_like(wv_ref)

    if scale == 2:
        ds = [
            _downscale2_block(c.astype(jnp.float32), p2_ref[:], q2_ref[:])
            for c in cur
        ]
    else:
        ds = [c.astype(jnp.float32) for c in cur]
    rowi = b * oh + jax.lax.broadcasted_iota(jnp.int32, (oh, pw), 0)
    coli = sg * pw + jax.lax.broadcasted_iota(jnp.int32, (oh, pw), 1)
    valid = (rowi < h) & (coli < w)
    ds = [jnp.where(valid, x, 0.0) for x in ds]
    r8, g8, b8, a8 = ds

    def to_u8(x):
        return x.astype(jnp.int32).astype(jnp.uint8)

    ds_ref[:] = jnp.stack([to_u8(x) for x in ds], axis=0)

    half = np.float32(1 << 11)
    inv = np.float32(1.0 / (1 << 12))
    yuv = []
    for i in range(3):
        acc = (
            kcoef[i][0] * r8 + kcoef[i][1] * g8 + kcoef[i][2] * b8
            + np.float32(kcoef[i][3] + half)
        )
        q = jnp.clip(jnp.floor(acc * inv), 0.0, 255.0)
        yuv.append(jnp.where(valid, to_u8(q), jnp.uint8(0)))

    acc = None
    for r in range(oh):
        m = ps._nt_matmul(
            ps._one_hot_bins_first(yuv[2][r], lanes=pw),
            ps._one_hot_bins_first(yuv[1][r], lanes=pw),
        )
        acc = m if acc is None else acc + m
    vs_ref[:] += acc

    if yuv_data:
        data = yuv
    else:
        mask = a8 != 0.0
        zero = jnp.uint8(0)
        data = [jnp.where(mask, to_u8(x), zero) for x in (r8, g8, b8)]
    for ci in range(3):
        wv_ref[ci] = ps._swar_tile_counts(data[ci], wv_ref[ci])




@functools.partial(
    jax.jit,
    static_argnames=(
        "cs", "scale", "yuv_data", "with_overlays", "packed", "p_stripes",
        "th_low", "th_high", "zb_cs", "fc_cs", "peak_th", "peak_rgba",
        "interpret",
    ),
)
def frame_pipeline_mega(
    frame: jax.Array,
    tm: jax.Array | float = 0.0,
    *,
    cs: int,
    scale: int,
    yuv_data: bool = False,
    with_overlays: bool = True,
    packed: bool = False,
    p_stripes: int = 2,
    th_low: float = 0.75,
    th_high: float = 1.0,
    zb_cs: int = 2,
    fc_cs: int = 2,
    peak_th: int = 3062,
    peak_rgba: tuple[int, int, int, int] = (255, 0, 0, 255),
    interpret: bool = False,
):
    """One-kernel twin of frame_pipeline (same returns, same exact values).

    frame: (4, H4, W4) u8 planar, or with packed=True the (H4, W4) u32
    bitcast view of the interleaved RGBA frame (no planarize pass needed).
    p_stripes: scaled 128-column stripes per grid step (wider steps
    amortize the focus-peaking column-halo reads and deepen the MXU K).
    """
    from obs_color_monitor_tpu.colorspace import (
        Colorspace, FIXED_COEFFS, FIXED_SHIFT, LUMA_COEF,
    )
    from obs_color_monitor_tpu.golden.reference import luma_threshold_fixed

    if scale not in (1, 2):
        raise ValueError("frame_pipeline supports scale 1 and 2")
    h4, w4 = frame.shape[-2], frame.shape[-1]
    h, w = h4 // scale, w4 // scale
    if h < 1 or w < 1:
        raise ValueError(f"frame {w4}x{h4} too small for scale {scale}")
    oh = _BAND // scale
    pw = p_stripes * _COLS      # scaled lanes per grid step
    pwf = pw * scale            # full-res lanes per grid step
    sg_n = _cdiv(w, pw)
    nb = _cdiv(h4, _BAND)
    hp = nb * _BAND
    wps = sg_n * pw             # scaled padded width
    wpf = sg_n * pwf            # full-res padded width (overlay arrays)
    nrb = _cdiv(h4, 8)          # 8-row halo blocks in the UNPADDED frame
    ncb = _cdiv(w4, _COLS)      # 128-lane halo blocks
    cpb = pwf // _COLS          # lane blocks per grid step

    k = np.asarray(FIXED_COEFFS[Colorspace(cs)], np.float32)
    kcoef = tuple(tuple(float(v) for v in row) for row in k)
    kl = lambda c: tuple(
        float(int(round(v * (1 << FIXED_SHIFT)))) for v in LUMA_COEF[Colorspace(c)]
    )
    ov_params = (
        h4,
        w4,
        float(luma_threshold_fixed(th_low)),
        float(luma_threshold_fixed(th_high)),
        kl(zb_cs),
        kl(fc_cs),
        int(peak_th),
        tuple(int(v) for v in peak_rgba),
    )
    params = (h4, w4, h, w, pwf, scale, packed, yuv_data, kcoef, ov_params,
              with_overlays)

    if scale == 2:
        p2 = (
            jax.lax.broadcasted_iota(jnp.int32, (pwf, pw), 0) // 2
            == jax.lax.broadcasted_iota(jnp.int32, (pwf, pw), 1)
        ).astype(jnp.float32)
        q2 = (
            jax.lax.broadcasted_iota(jnp.int32, (oh, _BAND), 1) // 2
            == jax.lax.broadcasted_iota(jnp.int32, (oh, _BAND), 0)
        ).astype(jnp.float32)
    else:
        p2 = jnp.zeros((8, _COLS), jnp.float32)
        q2 = jnp.zeros((8, _COLS), jnp.float32)

    # block spec helpers; packed arrays are (H, W) u32, planar (4, H, W) u8
    def spec(rows, lanes, f):
        if packed:
            return pl.BlockSpec((rows, lanes), f, memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (4, rows, lanes), (lambda sg, b: (0, *f(sg, b))),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        spec(_BAND, pwf, lambda sg, b: (b, sg)),
        # 8-row halo blocks (prev row b*64-1 = row 7 of block b*8-1; next
        # row (b+1)*64 = row 0 of block (b+1)*8; edges clamp, masked out)
        spec(8, pwf, lambda sg, b: (jnp.maximum(b * (_BAND // 8) - 1, 0), sg)),
        spec(8, pwf,
             lambda sg, b: (jnp.minimum((b + 1) * (_BAND // 8), nrb - 1), sg)),
        # 128-lane column halos for the focus-peaking stencil
        spec(_BAND, _COLS, lambda sg, b: (b, jnp.maximum(sg * cpb - 1, 0))),
        spec(_BAND, _COLS,
             lambda sg, b: (b, jnp.minimum((sg + 1) * cpb, ncb - 1))),
        pl.BlockSpec(p2.shape, lambda sg, b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(q2.shape, lambda sg, b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda sg, b: (0, 0), memory_space=pltpu.SMEM),
    ]

    out_specs: list = []
    out_shape: list = []
    if with_overlays:
        ovspec = pl.BlockSpec(
            (4, _BAND, pwf), lambda sg, b: (0, b, sg), memory_space=pltpu.VMEM
        )
        ovshape = jax.ShapeDtypeStruct((4, hp, wpf), jnp.uint8)
        out_specs += [ovspec] * 3
        out_shape += [ovshape] * 3
    out_specs += [
        pl.BlockSpec((256, 256), lambda sg, b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (3, 256, pw), lambda sg, b: (0, 0, sg), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (4, oh, pw), lambda sg, b: (0, b, sg), memory_space=pltpu.VMEM
        ),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((256, 256), jnp.int32),
        jax.ShapeDtypeStruct((3, 256, wps), jnp.int32),
        jax.ShapeDtypeStruct((4, nb * oh, wps), jnp.uint8),
    ]

    outs = pl.pallas_call(
        functools.partial(_mega_kernel, params),
        grid=(sg_n, nb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(frame, frame, frame, frame, frame, p2, q2,
      jnp.reshape(jnp.asarray(tm, jnp.float32), (1, 1)))

    outs = list(outs)
    if with_overlays:
        zb, fc, fp = outs[:3]
        outs = outs[3:]
    else:
        zb = fc = fp = None
    vs, wv, dsp = outs

    n_pad = wps * nb * oh - h * w
    vs = vs.at[0, 0].add(jnp.int32(-n_pad))
    wv = wv[:, :, :w]
    if yuv_data:
        corr = jnp.full((w,), nb * oh - h, jnp.int32)
    else:
        corr = jnp.sum(dsp[3] == 0, axis=0, dtype=jnp.int32)[:w]
    wv = wv.at[:, 0, :].add(-corr[None, :])
    crop = lambda a: None if a is None else a[:, :h4, :w4]
    return vs, wv, dsp[:, :h, :w], crop(zb), crop(fc), crop(fp)


