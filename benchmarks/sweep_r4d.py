"""Round-4d: NV12 decode — Pallas band kernel vs the XLA formulations.

sweep_r4c left the best XLA decode (bitcast lane-double, 0.710 ms at 4K)
~4x above the ~0.16 ms roofline (read 12.4 MB + write 33 MB).  Two
hypotheses: (a) the u8->f32 conversions / lane expansions relayout, and
XLA won't fuse the whole chain into one HBM pass; (b) f32 itself is not
the problem.  Candidates:

  base   the r4c-era lane-repeat XLA decode (preserved verbatim in
         sweep_r4c.decode_base_lane_repeat — nv12_to_packed now
         dispatches to this sweep's winner on TPU).
  B      r4c winner: u16-bitcast lane-double chroma + broadcast rows.
  D      integer-only B: i32 products, arithmetic >>12 (floor division),
         no f32 conversions at all.
  P1     Pallas band kernel, y/uv read as u32 quarter-width views,
         4 packed quarter planes interleaved IN-KERNEL via a trailing
         (64, W/4, 4)->(64, W) merge reshape (probe: r4b saw a 3D
         interleave reshape rejected on chip; probe_toolchain says lane
         merges now compile — settle it here).
  P4     same kernel, 4 quarter-width outputs, ONE XLA stack+reshape
         interleave after (always compiles; measures the interleave tax).

All candidates are bit-exactness-checked against the golden-pinned
XLA twin `_nv12_to_packed_xla` before timing (P* in interpret mode on
CPU; on TPU the check covers a band-overhang height).

Usage: python benchmarks/sweep_r4d.py [check|measure|prof]
On CPU (OCM_PLATFORM=cpu) runs check only, at a small shape.
"""
import functools
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import jax
import jax.numpy as jnp

if os.environ.get("OCM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["OCM_PLATFORM"])

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _util import op_profile_rows, slope_ms
from sweep_r4c import decode_b, decode_base_lane_repeat

from obs_color_monitor_tpu.ops.convert import (
    _NV12_COEF,
    _NV12_KY,
    _nv12_to_packed_xla,
    nv12_to_packed,
)

ON_CPU = jax.default_backend() == "cpu"
H, W = (256, 512) if ON_CPU else (2160, 3840)
INTERPRET = ON_CPU


def decode_d(y, uv, cs=2):
    """Candidate D: all-integer B (i32 products, arithmetic >>12)."""
    kr_cr, kg_cb, kg_cr, kb_cb = _NV12_COEF[int(cs)]
    h, w = y.shape
    yp = (y.astype(jnp.int32) - 16) * _NV12_KY
    uv16 = jax.lax.bitcast_convert_type(
        uv.reshape(h // 2, w // 2, 2), jnp.uint16
    ).astype(jnp.int32)
    cb, cr = (uv16 & 0xFF) - 128, (uv16 >> 8) - 128

    def lane2(x):
        xu = (x + 128).astype(jnp.uint32)
        pair = xu | (xu << 16)
        return (
            jax.lax.bitcast_convert_type(pair, jnp.uint16)
            .reshape(h // 2, w)
            .astype(jnp.int32)
            - 128
        )

    def row2(x):
        return jnp.broadcast_to(x[:, None, :], (h // 2, 2, w)).reshape(h, w)

    cbf, crf = row2(lane2(cb)), row2(lane2(cr))

    def q(acc):
        return jnp.clip(acc >> 12, 0, 255).astype(jnp.uint32)

    r = q(yp + kr_cr * crf + 2048)
    g = q(yp + kg_cb * cbf + kg_cr * crf + 2048)
    b = q(yp + kb_cb * cbf + 2048)
    return r | (g << 8) | (b << 16) | jnp.uint32(0xFF000000)


# ---------------------------------------------------------------- Pallas

_BAND = 64


def _decode_band(y_ref, uv_ref, *out_refs, cs, fuse):
    """One 64-row band: y (64, W/4) u32, uv (32, W/4) u32 -> packed RGBA.

    Byte j of a y word is pixel 4i+j; uv words hold Cb(2i) Cr(2i)
    Cb(2i+1) Cr(2i+1) — bytes 0/1 serve pixels 4i,4i+1 and bytes 2/3
    serve 4i+2,4i+3.  Same f32 fixed-point identity as ops.convert
    (products < 2^23, so f32 is exact).
    """
    kr_cr, kg_cb, kg_cr, kb_cb = _NV12_COEF[int(cs)]
    # Mosaic has no u32<->f32 casts: bitcast the u32 words to i32 and keep
    # ALL integer work in i32 (arithmetic shifts + masks still extract
    # bytes exactly; the 0xFF000000 alpha is i32 -16777216).
    y32 = jax.lax.bitcast_convert_type(y_ref[...], jnp.int32)
    uv32 = jax.lax.bitcast_convert_type(uv_ref[...], jnp.int32)
    h2, w4 = uv32.shape
    uvd = jnp.broadcast_to(uv32[:, None, :], (h2, 2, w4)).reshape(2 * h2, w4)
    chroma = []
    for k in range(4):  # cb0, cr0, cb1, cr1
        chroma.append(
            (((uvd >> (8 * k)) & 0xFF) - 128).astype(jnp.float32)
        )
    half = np.float32(2048.0)
    inv = np.float32(1.0 / 4096.0)
    alpha = jnp.int32(-16777216)  # 0xFF000000

    def q(acc):
        return jnp.clip(jnp.floor(acc * inv), 0.0, 255.0).astype(jnp.int32)

    planes = []
    for j in range(4):
        yj = ((y32 >> (8 * j)) & 0xFF).astype(jnp.float32)
        yp = (yj - 16.0) * np.float32(_NV12_KY)
        cbf, crf = chroma[2 * (j // 2)], chroma[2 * (j // 2) + 1]
        r = q(yp + np.float32(kr_cr) * crf + half)
        g = q(yp + np.float32(kg_cb) * cbf + np.float32(kg_cr) * crf + half)
        b = q(yp + np.float32(kb_cb) * cbf + half)
        planes.append(r | (g << 8) | (b << 16) | alpha)
    if fuse:
        rows = planes[0].shape[0]
        out_refs[0][...] = jnp.stack(planes, axis=-1).reshape(rows, 4 * w4)
    else:
        for o, p in zip(out_refs, planes):
            o[...] = p


def _pallas_decode(y32, uv32, cs, fuse):
    h, w4 = y32.shape
    grid = (-(-h // _BAND),)  # ceil: a floor grid dropped the 48-row 4K
    # overhang (caught in the r4 self-review; the shipping kernel in
    # ops/pallas_convert.py always used ceil)
    in_specs = [
        pl.BlockSpec((_BAND, w4), lambda i: (i, 0)),
        pl.BlockSpec((_BAND // 2, w4), lambda i: (i, 0)),
    ]
    if fuse:
        out_shape = jax.ShapeDtypeStruct((h, 4 * w4), jnp.int32)
        out_specs = pl.BlockSpec((_BAND, 4 * w4), lambda i: (i, 0))
    else:
        out_shape = [jax.ShapeDtypeStruct((h, w4), jnp.int32)] * 4
        out_specs = [pl.BlockSpec((_BAND, w4), lambda i: (i, 0))] * 4
    return pl.pallas_call(
        functools.partial(_decode_band, cs=cs, fuse=fuse),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=INTERPRET,
    )(y32, uv32)


def _u32_view(a):
    h, w = a.shape
    return jax.lax.bitcast_convert_type(a.reshape(h, w // 4, 4), jnp.uint32)


def decode_p1(y, uv, cs=2):
    out = _pallas_decode(_u32_view(y), _u32_view(uv), cs, fuse=True)
    return jax.lax.bitcast_convert_type(out, jnp.uint32)


def decode_p4(y, uv, cs=2):
    h, w = y.shape
    planes = _pallas_decode(_u32_view(y), _u32_view(uv), cs, fuse=False)
    out = jnp.stack(planes, axis=-1).reshape(h, w)
    return jax.lax.bitcast_convert_type(out, jnp.uint32)


DECODES = {
    # the r4c-era XLA lane-repeat baseline (NOT nv12_to_packed, which now
    # dispatches to the shipping Pallas kernel on TPU — the winner of THIS
    # sweep; keep the baseline pinned so the recorded 2.2x reproduces)
    "base": lambda y, uv: decode_base_lane_repeat(y, uv, cs=2),
    "B_bitcast_lane2": decode_b,
    "D_integer": decode_d,
    "P1_pallas_fused": decode_p1,
    "P4_pallas_4plane": decode_p4,
    "ship_nv12_to_packed": lambda y, uv: nv12_to_packed(y, uv, cs=2),
}


def check():
    rng = np.random.default_rng(0)
    # H with a 64-row band overhang (like 4K's 2160 % 64 == 48): the
    # first cut of this sweep used a floor grid and silently dropped the
    # overhang rows — never check at band-aligned shapes only
    h, w = (240, 512) if ON_CPU else (H, W)
    y = rng.integers(0, 256, (h, w), np.uint8)
    uv = rng.integers(0, 256, (h // 2, w), np.uint8)
    # reference: the golden/native-pinned XLA twin (nv12_to_packed itself
    # dispatches to the Pallas kernel on TPU — one of the candidates)
    ref = np.asarray(
        _nv12_to_packed_xla(jnp.asarray(y), jnp.asarray(uv), cs=2)
    )
    for name, fn in DECODES.items():
        try:
            got = np.asarray(jax.jit(fn)(jnp.asarray(y), jnp.asarray(uv)))
        except Exception as e:  # compile probes: report, keep sweeping
            print(f"check {name}: FAILED TO COMPILE: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            continue
        np.testing.assert_array_equal(got, ref, err_msg=name)
        print(f"check {name}: bit-exact")


def _harness(fn):
    def build(n):
        @jax.jit
        def run(y, uv):
            def body(i, acc):
                yi = y ^ (i % 2).astype(jnp.uint8)
                out = fn(yi, uv)
                return acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run

    return build


def measure():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    uv = jnp.asarray(rng.integers(0, 256, (H // 2, W), np.uint8))
    for name, fn in DECODES.items():
        try:
            ms = slope_ms(_harness(fn), (y, uv), n=24)
        except Exception as e:
            print(f"{name:20s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            continue
        print(f"{name:20s} {ms:8.3f} ms/frame")


def prof(name="B_bitcast_lane2"):
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    uv = jnp.asarray(rng.integers(0, 256, (H // 2, W), np.uint8))
    run = _harness(DECODES[name])(8)
    rows = op_profile_rows(run, (y, uv), 8, "/tmp/r4d_trace")
    print(f"xprof op profile, {name} (ms/frame):")
    for ms, op in rows[:14]:
        print(f"  {ms:7.4f}  {op}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("check", "both"):
        check()
    if mode in ("measure", "both") and not ON_CPU:
        measure()
    if mode == "prof" and not ON_CPU:
        prof(sys.argv[2] if len(sys.argv) > 2 else "B_bitcast_lane2")
