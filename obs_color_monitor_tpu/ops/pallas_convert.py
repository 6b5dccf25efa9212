"""Pallas NV12 decode — the TPU fast path behind ``ops.nv12_to_packed``.

The XLA decode formulations are HBM-fusion-bound, not math-bound: the
best of them (u16-bitcast lane-double chroma + broadcast row-double)
still measures 0.69-0.75 ms per 4K frame against a ~0.16 ms roofline
(read 12.4 MB + write 33 MB) — XLA does not fuse the u8→f32 widenings
and lane expansions into one HBM pass (benchmarks/sweep_r4c, sweep_r4d).

This band kernel reads the y and uv planes as their (H, W/4) u32
bitcast views (4 bytes per lane word — the same packed-view trick the
band kernel A uses for RGBA frames, doc/performance.md) and decodes one
64-row band per grid step entirely in VMEM:

  * byte j of a y word is pixel 4i+j; a uv word holds Cb(2i) Cr(2i)
    Cb(2i+1) Cr(2i+1), so bytes 0/1 serve pixels 4i, 4i+1 and bytes 2/3
    serve 4i+2, 4i+3 — the 4:2:0 chroma upsample costs a sublane
    broadcast (rows) and nothing at all on lanes;
  * the fixed-point identity is the same one as the XLA/native decoders
    (clip((4769·(Y−16) + K·C + 2048) >> 12), csrc/ocm_runtime.cpp
    ocm_nv12_to_rgba): all products are integers < 2^23, so f32 math is
    exact and the result is bit-identical on every path;
  * Mosaic has no u32↔f32 casts — the words are bitcast to i32 and all
    integer work stays in i32 (arithmetic shifts + masks still extract
    bytes exactly; the alpha byte is i32 −16777216 = 0xFF000000).

The kernel emits FOUR quarter-width packed planes (plane j = pixels
4i+j) and ONE XLA stack+reshape interleaves them to (H, W): writing the
interleave in-kernel — a trailing (64, W/4, 4)→(64, W) merge reshape —
is rejected by Mosaic on hardware (sweep_r4b saw the same class of
reshape fail; re-confirmed in sweep_r4d's P1 probe; re-test on toolchain
bumps).  Measured 0.37 ms per 4K frame vs 0.80 for the r4c-era XLA
decode — 2.2x slope, 0.211 ms xprof device op time at the ~0.16 ms
roofline (benchmarks/sweep_r4d.py, full-frame coverage incl. the 48-row
band overhang).

Reference parity: the reference converts capture sources to its RGBA
canvas before the scopes read pixels (obs handles NV12 upstream of
/root/reference/src/common.c:223-333); this kernel is where that
conversion lives when a capture stack hands us wire-format planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .convert import _NV12_COEF, _NV12_KY

_BAND = 64  # y rows per grid step


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _decode_band(y_ref, uv_ref, o0_ref, o1_ref, o2_ref, o3_ref, *, cs):
    kr_cr, kg_cb, kg_cr, kb_cb = _NV12_COEF[int(cs)]
    y32 = jax.lax.bitcast_convert_type(y_ref[...], jnp.int32)
    uv32 = jax.lax.bitcast_convert_type(uv_ref[...], jnp.int32)
    h2, w4 = uv32.shape
    # 4:2:0 row upsample: each chroma row serves two y rows
    uvd = jnp.broadcast_to(uv32[:, None, :], (h2, 2, w4)).reshape(2 * h2, w4)
    chroma = [  # cb even, cr even, cb odd, cr odd — f32-exact (< 2^23)
        (((uvd >> (8 * k)) & 0xFF) - 128).astype(jnp.float32) for k in range(4)
    ]
    half = np.float32(2048.0)
    inv = np.float32(1.0 / 4096.0)
    alpha = jnp.int32(-16777216)  # 0xFF000000

    def q(acc):
        return jnp.clip(jnp.floor(acc * inv), 0.0, 255.0).astype(jnp.int32)

    outs = (o0_ref, o1_ref, o2_ref, o3_ref)
    for j in range(4):
        yj = ((y32 >> (8 * j)) & 0xFF).astype(jnp.float32)
        yp = (yj - 16.0) * np.float32(_NV12_KY)
        cbf, crf = chroma[2 * (j // 2)], chroma[2 * (j // 2) + 1]
        r = q(yp + np.float32(kr_cr) * crf + half)
        g = q(yp + np.float32(kg_cb) * cbf + np.float32(kg_cr) * crf + half)
        b = q(yp + np.float32(kb_cb) * cbf + half)
        outs[j][...] = r | (g << 8) | (b << 16) | alpha


def _decode16_band(y_ref, uv_ref, o0_ref, o1_ref, *, cs, shift):
    """16-bit-LE NV12 layout (P010-family) band: each u32 word holds TWO
    u16 samples, so a y word is pixel pair (2i, 2i+1) and a uv word is
    exactly one (Cb, Cr) chroma pair — which serves that same pixel pair,
    so chroma needs NO lane work at all (simpler than the 8-bit kernel).
    The in-kernel round-shift to the 8-bit monitoring domain is the
    device twin of the ingest host policy (min((v + half) >> shift, 255),
    pipeline/ingest.py NV12Source._to8)."""
    kr_cr, kg_cb, kg_cr, kb_cb = _NV12_COEF[int(cs)]
    y32 = jax.lax.bitcast_convert_type(y_ref[...], jnp.int32)
    uv32 = jax.lax.bitcast_convert_type(uv_ref[...], jnp.int32)
    h2, w2 = uv32.shape
    uvd = jnp.broadcast_to(uv32[:, None, :], (h2, 2, w2)).reshape(2 * h2, w2)
    half_s = (1 << (shift - 1)) if shift else 0

    def s8(v):  # 16-bit sample (i32, masked) -> u8 domain, round half up
        return jnp.minimum((v + half_s) >> shift, 255) if shift else v

    cbf = (s8(uvd & 0xFFFF) - 128).astype(jnp.float32)
    crf = (s8((uvd >> 16) & 0xFFFF) - 128).astype(jnp.float32)
    half = np.float32(2048.0)
    inv = np.float32(1.0 / 4096.0)
    alpha = jnp.int32(-16777216)  # 0xFF000000

    def q(acc):
        return jnp.clip(jnp.floor(acc * inv), 0.0, 255.0).astype(jnp.int32)

    for o, ys in ((o0_ref, y32 & 0xFFFF), (o1_ref, (y32 >> 16) & 0xFFFF)):
        yp = (s8(ys).astype(jnp.float32) - 16.0) * np.float32(_NV12_KY)
        r = q(yp + np.float32(kr_cr) * crf + half)
        g = q(yp + np.float32(kg_cb) * cbf + np.float32(kg_cr) * crf + half)
        b = q(yp + np.float32(kb_cb) * cbf + half)
        o[...] = r | (g << 8) | (b << 16) | alpha


def _u32_view(a):
    h, w = a.shape
    return jax.lax.bitcast_convert_type(a.reshape(h, w // 4, 4), jnp.uint32)


def _u32_view16(a):
    h, w = a.shape
    return jax.lax.bitcast_convert_type(a.reshape(h, w // 2, 2), jnp.uint32)


@functools.partial(jax.jit, static_argnames=("cs", "interpret"))
def nv12_decode_pallas(
    y: jax.Array, uv: jax.Array, cs: int = 2, interpret: bool = False
) -> jax.Array:
    """NV12 (y (H,W) u8, uv (H/2,W) u8 CbCr) -> packed (H,W) u32 RGBA.

    Requires W % 4 == 0 and H % 2 == 0 (every real NV12 geometry);
    ``ops.nv12_to_packed`` dispatches here on TPU and keeps the XLA
    formulation otherwise.  H need not divide the 64-row band: the last
    band's out-of-range rows are dropped by Pallas (the OUT block always
    STARTS in range because the grid is exactly ceil(H/64)), and the
    matching partially-out-of-range input reads only feed those dropped
    rows.
    """
    h, w = y.shape
    if w % 4 or h % 2 or uv.shape != (h // 2, w):
        raise ValueError(f"bad NV12 geometry: y {y.shape}, uv {uv.shape}")
    y32, uv32 = _u32_view(y), _u32_view(uv)
    w4 = w // 4
    plane = jax.ShapeDtypeStruct((h, w4), jnp.int32)
    planes = pl.pallas_call(
        functools.partial(_decode_band, cs=cs),
        grid=(_cdiv(h, _BAND),),
        in_specs=[
            pl.BlockSpec((_BAND, w4), lambda i: (i, 0)),
            pl.BlockSpec((_BAND // 2, w4), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((_BAND, w4), lambda i: (i, 0))] * 4,
        out_shape=[plane] * 4,
        interpret=interpret,
    )(y32, uv32)
    out = jnp.stack(planes, axis=-1).reshape(h, w)
    return jax.lax.bitcast_convert_type(out, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("cs", "shift", "interpret"))
def nv12_16_decode_pallas(
    y16: jax.Array,
    uv16: jax.Array,
    cs: int = 2,
    shift: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """16-bit-LE NV12 layout (y (H,W) u16, uv (H/2,W) u16 CbCr) -> packed
    (H,W) u32 RGBA, round-shifted to the 8-bit monitoring domain ON
    DEVICE (``shift`` = bits-8, or 8 for MSB-aligned P010 — see
    ``ops.convert.nv12_shift``).  The wire planes upload untouched (zero
    host per-pixel work; 3 B/px) and the shift fuses into the decode
    band kernel.  Bit-exact vs the host round-shift + 8-bit decode."""
    h, w = y16.shape
    if w % 2 or h % 2 or uv16.shape != (h // 2, w):
        raise ValueError(f"bad NV12 geometry: y {y16.shape}, uv {uv16.shape}")
    if not 1 <= int(shift) <= 8:
        raise ValueError(f"shift must be in 1..8, got {shift}")
    w2 = w // 2
    plane = jax.ShapeDtypeStruct((h, w2), jnp.int32)
    planes = pl.pallas_call(
        functools.partial(_decode16_band, cs=cs, shift=int(shift)),
        grid=(_cdiv(h, _BAND),),
        in_specs=[
            pl.BlockSpec((_BAND, w2), lambda i: (i, 0)),
            pl.BlockSpec((_BAND // 2, w2), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((_BAND, w2), lambda i: (i, 0))] * 2,
        out_shape=[plane] * 2,
        interpret=interpret,
    )(_u32_view16(y16), _u32_view16(uv16))
    out = jnp.stack(planes, axis=-1).reshape(h, w)
    return jax.lax.bitcast_convert_type(out, jnp.uint32)
