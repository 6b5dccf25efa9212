"""Round-4c: NV12 on-device decode formulation sweep.

The 4K NV12 wire-format step costs 2.59 ms vs 1.60 for packed input —
the decode's ~0.99 ms is far above its roofline (read 12.4 MB + write
33 MB = ~0.06 ms HBM; ~230 M f32 VPU ops = ~0.1 ms).  The suspect is
layout, not math: `_nv12_rgb_u8` upsamples chroma with
`jnp.repeat(..., 2, axis=-1)` — a LANE-axis expansion XLA lowers as a
relayout/gather — materializing two full-res f32 chroma planes.

Candidates (all bit-exact vs the shipping decode before timing):

  base  the (then-)shipping lane-repeat decode, preserved verbatim as
        decode_base_lane_repeat (ops.nv12_to_packed has since been
        rewritten and dispatches to a Pallas kernel on TPU).
  B     bitcast lane-double: duplicate each chroma value into both u16
        halves of a u32, then bitcast+reshape to (H/2, W) — the
        lane-axis trick this repo uses instead of strides (CLAUDE.md);
        rows double on the sublane axis via broadcast-reshape.
  C     pair-domain: do ALL math at (H, W/2) on the u16-bitcast byte
        pairs (even/odd pixel share one chroma sample), pack two
        (H, W/2) u32 outputs, interleave ONCE at the end via the same
        u16-level trick applied at u32 width (stack+reshape fallback).

Usage: python benchmarks/sweep_r4c.py [check|measure] (default: both)
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

from _util import slope_ms

from obs_color_monitor_tpu.ops.convert import _NV12_COEF, _NV12_KY

ON_CPU = jax.default_backend() == "cpu"
H, W = (256, 512) if ON_CPU else (2160, 3840)


@functools.partial(jax.jit, static_argnames=("cs",))
def decode_base_lane_repeat(y, uv, cs=2):
    """The r4c-era SHIPPING decode, preserved verbatim: f32 fixed point
    with ``jnp.repeat`` chroma upsampling on BOTH axes.  After this sweep
    landed, ops.nv12_to_packed was rewritten (integer lane2/row2 XLA body
    + a Pallas kernel on TPU), so the measured baselines here must not
    call it — they'd time the winner against itself."""
    kr_cr, kg_cb, kg_cr, kb_cb = _NV12_COEF[int(cs)]
    w = y.shape[-1]
    yp = (y.astype(jnp.float32) - 16.0) * np.float32(_NV12_KY)
    uv16 = jax.lax.bitcast_convert_type(
        uv.reshape(uv.shape[:-1] + (w // 2, 2)), jnp.uint16
    ).astype(jnp.int32)
    cb = (uv16 & 0xFF) - 128
    cr = (uv16 >> 8) - 128
    cb = jnp.repeat(jnp.repeat(cb, 2, axis=-2), 2, axis=-1).astype(jnp.float32)
    cr = jnp.repeat(jnp.repeat(cr, 2, axis=-2), 2, axis=-1).astype(jnp.float32)
    half = np.float32(2048.0)
    inv = np.float32(1.0 / 4096.0)

    def q(acc):
        return jnp.clip(jnp.floor(acc * inv), 0.0, 255.0).astype(jnp.uint32)

    r = q(yp + np.float32(kr_cr) * cr + half)
    g = q(yp + np.float32(kg_cb) * cb + np.float32(kg_cr) * cr + half)
    b = q(yp + np.float32(kb_cb) * cb + half)
    return r | (g << 8) | (b << 16) | jnp.uint32(0xFF000000)


def _chroma16(uv):
    """(H/2, W) interleaved CbCr -> (cb, cr) (H/2, W/2) i32, lane-aligned."""
    h2, w = uv.shape
    uv16 = jax.lax.bitcast_convert_type(
        uv.reshape(h2, w // 2, 2), jnp.uint16
    ).astype(jnp.int32)
    return (uv16 & 0xFF) - 128, (uv16 >> 8) - 128


def _lane2(x, h2, w):
    """(H/2, W/2) i32 in [-128,127] -> (H/2, W) with each value duplicated
    into adjacent lanes, via the u16-pair bitcast (no lane repeat)."""
    xu = (x + 128).astype(jnp.uint32)
    pair = xu | (xu << 16)
    return (
        jax.lax.bitcast_convert_type(pair, jnp.uint16)
        .reshape(h2, w)
        .astype(jnp.int32)
        - 128
    )


def _row2(x, h, w):
    """(H/2, W) -> (H, W) by doubling rows (sublane axis: broadcast+reshape)."""
    return jnp.broadcast_to(x[:, None, :], (h // 2, 2, w)).reshape(h, w)


def _q(acc):
    return jnp.clip(jnp.floor(acc * np.float32(1 / 4096.0)), 0.0, 255.0).astype(
        jnp.uint32
    )


def decode_b(y, uv, cs=2):
    """Candidate B: bitcast lane-double chroma, broadcast row-double."""
    kr_cr, kg_cb, kg_cr, kb_cb = _NV12_COEF[int(cs)]
    h, w = y.shape
    yp = (y.astype(jnp.float32) - 16.0) * np.float32(_NV12_KY)
    cb, cr = _chroma16(uv)
    cbf = _row2(_lane2(cb, h // 2, w), h, w).astype(jnp.float32)
    crf = _row2(_lane2(cr, h // 2, w), h, w).astype(jnp.float32)
    half = np.float32(2048.0)
    r = _q(yp + np.float32(kr_cr) * crf + half)
    g = _q(yp + np.float32(kg_cb) * cbf + np.float32(kg_cr) * crf + half)
    b = _q(yp + np.float32(kb_cb) * cbf + half)
    return r | (g << 8) | (b << 16) | jnp.uint32(0xFF000000)


def decode_c(y, uv, cs=2):
    """Candidate C: all math in the (H, W/2) pair domain, one final
    u32 interleave."""
    kr_cr, kg_cb, kg_cr, kb_cb = _NV12_COEF[int(cs)]
    h, w = y.shape
    y16 = jax.lax.bitcast_convert_type(
        y.reshape(h, w // 2, 2), jnp.uint16
    ).astype(jnp.int32)
    cb, cr = _chroma16(uv)  # (H/2, W/2)
    cbf = _row2(cb, h, w // 2).astype(jnp.float32)
    crf = _row2(cr, h, w // 2).astype(jnp.float32)
    half = np.float32(2048.0)

    def chans(yb):
        yp = (yb.astype(jnp.float32) - 16.0) * np.float32(_NV12_KY)
        r = _q(yp + np.float32(kr_cr) * crf + half)
        g = _q(yp + np.float32(kg_cb) * cbf + np.float32(kg_cr) * crf + half)
        b = _q(yp + np.float32(kb_cb) * cbf + half)
        return r | (g << 8) | (b << 16) | jnp.uint32(0xFF000000)

    pk_even = chans(y16 & 0xFF)  # (H, W/2) u32
    pk_odd = chans(y16 >> 8)
    return jnp.stack([pk_even, pk_odd], axis=-1).reshape(h, w)


DECODES = {
    "base": lambda y, uv: decode_base_lane_repeat(y, uv, cs=2),
    "B_bitcast_lane2": decode_b,
    "C_pair_domain": decode_c,
}


def check():
    from obs_color_monitor_tpu.ops.convert import _nv12_to_packed_xla

    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (H, W), np.uint8)
    uv = rng.integers(0, 256, (H // 2, W), np.uint8)
    # reference: the golden/native-pinned XLA twin (NOT nv12_to_packed,
    # which dispatches to the Pallas kernel on TPU)
    ref = np.asarray(
        _nv12_to_packed_xla(jnp.asarray(y), jnp.asarray(uv), cs=2)
    )
    for name, fn in DECODES.items():
        got = np.asarray(jax.jit(fn)(jnp.asarray(y), jnp.asarray(uv)))
        np.testing.assert_array_equal(got, ref, err_msg=name)
        print(f"check {name}: bit-exact")


def measure():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    uv = jnp.asarray(rng.integers(0, 256, (H // 2, W), np.uint8))

    for name, fn in DECODES.items():

        def build(n, fn=fn):
            @jax.jit
            def run(y, uv):
                def body(i, acc):
                    # loop-variant input: XOR fuses into the decode chain
                    yi = y ^ (i % 2).astype(jnp.uint8)
                    out = fn(yi, uv)
                    return acc + jnp.sum(out.astype(jnp.int32))

                return jax.lax.fori_loop(0, n, body, jnp.int32(0))

            return run

        ms = slope_ms(build, (y, uv), n=24)
        print(f"{name:20s} {ms:8.3f} ms/frame")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("check", "both"):
        check()
    if mode in ("measure", "both") and not ON_CPU:
        measure()
