"""Round-3 sweep A: SWAR waveform accumulation (kill the SEL matmul).

The round-2 waveform kernel reduces one-hots to per-column counts with an
int8 MXU matmul against SEL[p,c]=[p%128==c] — that matmul is 256*8192*128
MACs per flat row per channel = 204 G MACs per 1080p frame across 3
channels, MORE MXU work than the vectorscope matmul itself (136 G).

This sweep tests a VPU formulation on natural (64,128) tiles (rows on
sublanes, columns on lanes — so the per-column reduction is a sublane sum,
no lane reshape):

  * SWAR packing: bin b = 4g+j packs into field j (8 bits) of an int32 at
    group row g.  Per pixel: field = 1 << 8*(v & 3), group = v >> 2.
    64 group-compares per pixel (vs 256 for the direct one-hot), and the
    per-(group,column) row sums stay < 256 because a tile has 64 rows —
    fields cannot carry.  Unpack (shift/mask) once per tile.

Variants measured:
  A1  SWAR waveform, per-group jnp.sum row reduction
  A2  SWAR waveform, roll-rotation accumulation (uniform full-width ops)
  A3  fused VS (NT matmul, flat rows) + SWAR WV in one kernel
Each is checked bit-exact vs the round-2 kernels first.
"""

import sys
import time
from pathlib import Path
import functools

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from obs_color_monitor_tpu.ops import pallas_stats as ps

N_BINS = 256
_COLS = 128
_ROWS = 64


def _cdiv(a, b):
    return -(-a // b)


def _stripe_tiles(plane):
    """(H, W) u8 -> (S, Rf, 64, 128) natural tiles (rows on sublanes)."""
    h, w = plane.shape
    s = _cdiv(w, _COLS)
    rf = _cdiv(h, _ROWS)
    p = jnp.pad(plane, ((0, rf * _ROWS - h), (0, s * _COLS - w)))
    return p.reshape(rf * _ROWS, s, _COLS).swapaxes(0, 1).reshape(s, rf, _ROWS, _COLS)


def _swar_unpack_add(packed, out_row):
    """(64,128) packed i32 -> add the 256x128 unpacked counts to out_row."""
    shift = (jax.lax.broadcasted_iota(jnp.int32, (N_BINS, _COLS), 0) % 4) * 8
    un = jnp.broadcast_to(packed[:, None, :], (_ROWS, 4, _COLS)).reshape(
        N_BINS, _COLS
    )
    return out_row + ((un >> shift) & 255)


def _wv_swar_kernel_a1(c, data_ref, out_ref):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for ci in range(c):
        vals = data_ref[ci, 0, 0].astype(jnp.int32)  # (64,128)
        grp = vals >> 2
        fld = jnp.int32(1) << ((vals & 3) * 8)
        rows = []
        for g in range(64):
            contrib = jnp.where(grp == g, fld, 0)
            rows.append(jnp.sum(contrib, axis=0, keepdims=True))
        packed = jnp.concatenate(rows, axis=0)
        out_ref[ci] = _swar_unpack_add(packed, out_ref[ci])


def _wv_swar_kernel_a2(c, data_ref, out_ref):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    gi = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _COLS), 0)
    for ci in range(c):
        vals = data_ref[ci, 0, 0].astype(jnp.int32)
        grp = vals >> 2
        fld = jnp.int32(1) << ((vals & 3) * 8)
        packed = jnp.zeros((_ROWS, _COLS), jnp.int32)
        for k in range(64):
            gr = pltpu.roll(grp, -k, 0)
            fr = pltpu.roll(fld, -k, 0)
            packed += jnp.where(gr == gi, fr, 0)
        out_ref[ci] = _swar_unpack_add(packed, out_ref[ci])


def _tile_spec(c=None):
    if c is None:
        return pl.BlockSpec(
            (1, 1, _ROWS, _COLS), lambda s, r: (s, r, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.BlockSpec(
        (c, 1, 1, _ROWS, _COLS),
        lambda s, r: (0, s, r, 0, 0),
        memory_space=pltpu.VMEM,
    )


@functools.partial(jax.jit, static_argnames=("variant",))
def waveform_swar_i32(planes_in, mask, variant="a1"):
    c, h, w = planes_in.shape
    vals = jnp.where(mask[None], planes_in, 0)
    tiles = jax.vmap(_stripe_tiles)(vals)  # (C,S,Rf,64,128)
    s, rf = tiles.shape[1], tiles.shape[2]
    kern = _wv_swar_kernel_a1 if variant == "a1" else _wv_swar_kernel_a2
    wv = pl.pallas_call(
        functools.partial(kern, c),
        grid=(s, rf),
        in_specs=[_tile_spec(c)],
        out_specs=pl.BlockSpec(
            (c, N_BINS, _COLS), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, N_BINS, s * _COLS), jnp.int32),
        interpret=False,
    )(tiles)
    wv = wv[:, :, :w]
    skipped = jnp.sum(~mask, axis=0, dtype=jnp.int32) + jnp.int32(rf * _ROWS - h)
    return wv.at[:, 0, :].add(-skipped[None, :])


# ---- fused: VS NT matmul (flat rows) + SWAR WV (tiles), one kernel ----

def _fused_kernel_a3(c, u_ref, v_ref, data_ref, vs_ref, wv_ref):
    s = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when((s == 0) & (r == 0))
    def _():
        vs_ref[:] = jnp.zeros_like(vs_ref)

    @pl.when(r == 0)
    def _():
        wv_ref[:] = jnp.zeros_like(wv_ref)

    ohu = ps._one_hot_bins_first(u_ref[0, 0])
    ohv = ps._one_hot_bins_first(v_ref[0, 0])
    vs_ref[:] += ps._nt_matmul(ohv, ohu)
    for ci in range(c):
        vals = data_ref[ci, 0, 0].astype(jnp.int32)
        grp = vals >> 2
        fld = jnp.int32(1) << ((vals & 3) * 8)
        rows = []
        for g in range(64):
            contrib = jnp.where(grp == g, fld, 0)
            rows.append(jnp.sum(contrib, axis=0, keepdims=True))
        packed = jnp.concatenate(rows, axis=0)
        wv_ref[ci] = _swar_unpack_add(packed, wv_ref[ci])


@jax.jit
def fused_vs_wv_swar_i32(planes_in, yuv_planes, mask):
    c, h, w = planes_in.shape
    vals = jnp.where(mask[None], planes_in, 0)
    tiles = jax.vmap(_stripe_tiles)(vals)
    u_s = ps._stripe4(yuv_planes[1])
    v_s = ps._stripe4(yuv_planes[2])
    s, rf = u_s.shape[0], u_s.shape[1]
    vs, wv = pl.pallas_call(
        functools.partial(_fused_kernel_a3, c),
        grid=(s, rf),
        in_specs=[ps._in4(), ps._in4(), _tile_spec(c)],
        out_specs=(
            pl.BlockSpec(
                (N_BINS, N_BINS), lambda s, r: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (c, N_BINS, _COLS), lambda s, r: (0, 0, s), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
            jax.ShapeDtypeStruct((c, N_BINS, s * _COLS), jnp.int32),
        ),
    )(u_s, v_s, tiles)
    n_pad = s * _COLS * rf * _ROWS - h * w
    vs = vs.at[0, 0].add(jnp.int32(-n_pad))
    wv = wv[:, :, :w]
    skipped = jnp.sum(~mask, axis=0, dtype=jnp.int32) + jnp.int32(rf * _ROWS - h)
    return vs, wv.at[:, 0, :].add(-skipped[None, :])


def main():
    rng = np.random.default_rng(0)
    planes = jax.device_put(rng.integers(0, 256, (4, 1080, 1920), np.uint8))
    yuv = jax.device_put(rng.integers(0, 256, (3, 1080, 1920), np.uint8))
    mask = planes[3] != 0

    # ---- exactness ----
    ref = np.asarray(ps.waveform_pallas_i32(planes[:3], mask))
    for v in ("a1", "a2"):
        try:
            got = np.asarray(waveform_swar_i32(planes[:3], mask, variant=v))
        except Exception as e:
            print(f"{v}: FAIL compile: {str(e)[:200]}")
            continue
        ok = np.array_equal(ref, got)
        print(f"{v}: exact={ok}")
        if not ok:
            print("  diff:", np.abs(ref.astype(np.int64) - got).max())

    ref_vs = np.asarray(ps.vectorscope_pallas_i32(yuv))
    try:
        gvs, gwv = fused_vs_wv_swar_i32(planes[:3], yuv, mask)
        print(
            "a3: exact_vs=", np.array_equal(ref_vs, np.asarray(gvs)),
            " exact_wv=", np.array_equal(ref, np.asarray(gwv)),
        )
    except Exception as e:
        print(f"a3: FAIL compile: {str(e)[:300]}")

    # ---- timing ----
    def rt():
        tiny = jax.jit(lambda x: x + 1)
        _ = np.asarray(tiny(jnp.int32(0)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(tiny(jnp.int32(0)))
            best = min(best, time.perf_counter() - t0)
        return best

    r = rt()
    print(f"# round trip {r*1e3:.1f} ms")

    def bench(name, fn, arg, n=30):
        def rep(a):
            def body(i, acc):
                x = jnp.bitwise_xor(a, (i % 2).astype(jnp.uint8))
                out = fn(x)
                return acc + sum(
                    jnp.sum(l.astype(jnp.int32))
                    for l in jax.tree_util.tree_leaves(out)
                )
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        repj = jax.jit(rep)
        try:
            _ = np.asarray(repj(arg))
        except Exception as e:
            print(f"{name:40s} FAIL {str(e)[:160]}")
            return
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(repj(arg))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:40s} {(best - r)*1e3/n:8.3f} ms")

    bench("wv r2 (SEL matmul)", lambda p: ps.waveform_pallas_i32(p[:3], p[3] != 0), planes)
    bench("wv swar a1", lambda p: waveform_swar_i32(p[:3], p[3] != 0, variant="a1"), planes)
    bench("wv swar a2", lambda p: waveform_swar_i32(p[:3], p[3] != 0, variant="a2"), planes)
    bench(
        "fused r2 (NT + SEL)",
        lambda p: ps.fused_vs_wv_pallas_i32(p[:3], yuv, p[3] != 0),
        planes,
    )
    bench(
        "fused a3 (NT + SWAR)",
        lambda p: fused_vs_wv_swar_i32(p[:3], yuv, p[3] != 0),
        planes,
    )


if __name__ == "__main__":
    main()
