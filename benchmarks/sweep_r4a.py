"""Round-4 reopened 4K scale-1 vectorscope formulation search (VERDICT r3
next-4): two new candidates vs the shipping int8 one-hot NT matmul.

The shipping formulation's cost is bins x pixels MACs (65536 * 8.3M = 544 G
MACs per 4K frame) on the int8 MXU path (394 TOPS on v5e => 2.77 ms
theoretical).  The candidates probe the only two levers a dense-MXU scheme
has — narrower one-hots and packing several bins per MAC:

  A. coarse-fine V split: 16 matmuls of (16, K) x (256, K) — one per
     coarse V group (one-hot build per group is a single compare, so the
     BUILD work totals the same 256 compares/px; the MAC total is
     invariant at bins x K because every narrow matmul still contracts
     the full K).  Expectation: >= baseline (measures build/issue
     overheads of 16 small matmuls).
  B. bf16 two-bin pack: B[j,k] = [u==2j] + 4096*[u==2j+1] (bf16-exact
     values), A = one_hot(v) bf16; the f32 accumulator carries
     f0 + 4096*f1 exactly while each per-bin count stays <= 4095
     (4095*4097 = 2^24 - 1, the f32 integer-exact limit), so the flat row
     lane-splits into (4, 2048) unpack windows.  Halves the MACs — but bf16 MXU
     throughput is HALF of int8 (197 vs 394 T on v5e), a mathematical
     break-even before the per-window mod/div unpack is paid.
     Expectation: >= baseline + unpack.

Both candidates are verified bit-exact against the baseline counts before
timing.  Shapes: 4K scale-1 (2160 x 3840).  See doc/performance.md
"4K scale-1" for the resulting floor argument.

Usage: python benchmarks/sweep_r4a.py [check|measure] (default: both)
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

from obs_color_monitor_tpu.ops.pallas_stats import (
    N_BINS,
    _in4,
    _nt_matmul,
    _one_hot_bins_first,
    _stripe4,
    _vs_kernel,
)

_LANES = 8192
INTERPRET = jax.default_backend() == "cpu"
H, W = (2160, 3840) if not INTERPRET else (256, 512)


# --------------------------------------------------------------------------
# baseline: the shipping flat-row int8 NT matmul (K=8192 per grid step)
# --------------------------------------------------------------------------

def vs_baseline(u_s, v_s):
    s, rf = u_s.shape[0], u_s.shape[1]
    return pl.pallas_call(
        _vs_kernel,
        grid=(s, rf),
        in_specs=[_in4(), _in4()],
        out_specs=pl.BlockSpec(
            (N_BINS, N_BINS), lambda s, r: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
        interpret=INTERPRET,
    )(u_s, v_s)


# --------------------------------------------------------------------------
# candidate A: coarse-fine V split (16 narrow matmuls per grid step)
# --------------------------------------------------------------------------

def _vs_cf_kernel(u_ref, v_ref, out_ref):
    s = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when((s == 0) & (r == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ohu = _one_hot_bins_first(u_ref[0, 0])
    v = v_ref[0, 0].astype(jnp.int32)
    for vh in range(16):
        iota = jax.lax.broadcasted_iota(jnp.int32, (16, _LANES), 0)
        a_vh = (iota + 16 * vh == v).astype(jnp.int8)  # (16, K) narrow one-hot
        out_ref[16 * vh : 16 * (vh + 1)] += _nt_matmul(a_vh, ohu)


def vs_coarse_fine(u_s, v_s):
    s, rf = u_s.shape[0], u_s.shape[1]
    return pl.pallas_call(
        _vs_cf_kernel,
        grid=(s, rf),
        in_specs=[_in4(), _in4()],
        out_specs=pl.BlockSpec(
            (N_BINS, N_BINS), lambda s, r: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
        interpret=INTERPRET,
    )(u_s, v_s)


# --------------------------------------------------------------------------
# candidate B: bf16 two-bin pack (half the MACs at half the throughput)
# --------------------------------------------------------------------------

_SEP = 4096          # field separation: 4095 * (4096 + 1) == 2^24 - 1
_WIN = 2048          # unpack window: counts per bin <= 2048 <= 4095
# (A lane-axis SLICE of the 8192-lane flat row — even 128-aligned — hands
# the sublane-broadcast an offset {0,128} layout Mosaic rejects on real
# hardware; a lane-SPLIT reshape to (4, 2048) windows compiles.  Interpret
# mode accepted the slice form; always probe candidates on the chip.)


def _vs_pack2_kernel(u_ref, v_ref, out_ref):
    s = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when((s == 0) & (r == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    u = u_ref[0, 0].astype(jnp.int32).reshape(_LANES // _WIN, _WIN)
    v = v_ref[0, 0].astype(jnp.int32).reshape(_LANES // _WIN, _WIN)
    for wi in range(_LANES // _WIN):
        uw = u[wi : wi + 1]  # (1, WIN): sublane slice, lane axis intact
        vw = v[wi : wi + 1]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, _WIN), 0)
        a = (iota_v == vw).astype(jnp.bfloat16)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (N_BINS // 2, _WIN), 0)
        b = (
            (iota_j * 2 == uw).astype(jnp.bfloat16)
            + (iota_j * 2 + 1 == uw).astype(jnp.bfloat16) * jnp.bfloat16(_SEP)
        )
        packed = jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (256, 128): f0 + 4096*f1, integer-exact (< 2^24)
        pi = packed.astype(jnp.int32)
        f1 = pi // _SEP
        f0 = pi - f1 * _SEP
        # field-split accumulator: cols [0,128) hold even u bins, [128,256)
        # odd ones — both register-aligned lane halves.  (The natural
        # (256,128,2)->(256,256) interleave reshape is an unsupported
        # Mosaic shape cast on real hardware — interpret mode accepts it.)
        out_ref[:, : N_BINS // 2] += f0
        out_ref[:, N_BINS // 2 :] += f1


def vs_pack2(u_s, v_s):
    s, rf = u_s.shape[0], u_s.shape[1]
    split = pl.pallas_call(
        _vs_pack2_kernel,
        grid=(s, rf),
        in_specs=[_in4(), _in4()],
        out_specs=pl.BlockSpec(
            (N_BINS, N_BINS), lambda s, r: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N_BINS, N_BINS), jnp.int32),
        interpret=INTERPRET,
    )(u_s, v_s)
    # de-interleave the field-split halves once per frame (256 KB, XLA)
    return jnp.stack(
        [split[:, : N_BINS // 2], split[:, N_BINS // 2 :]], axis=-1
    ).reshape(N_BINS, N_BINS)


# --------------------------------------------------------------------------


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    rng = np.random.default_rng(0)
    u = rng.integers(0, 256, (H, W), np.uint8)
    v = rng.integers(0, 256, (H, W), np.uint8)
    # adversarial block: a uniform region drives per-bin counts high (the
    # pack2 window bound must hold under it)
    u[: H // 4, : W // 4] = 77
    v[: H // 4, : W // 4] = 99
    u_s = jax.device_put(np.asarray(_stripe4(jnp.asarray(u))))
    v_s = jax.device_put(np.asarray(_stripe4(jnp.asarray(v))))

    cands = [
        ("baseline int8 flat-row NT", vs_baseline),
        ("A: coarse-fine 16x narrow", vs_coarse_fine),
        ("B: bf16 two-bin pack", vs_pack2),
    ]

    if which in ("check", "both"):
        ref = None
        for name, fn in cands:
            got = np.asarray(jax.jit(fn)(u_s, v_s))
            if ref is None:
                ref = got
                # independent oracle on the raw planes
                idx = v.astype(np.int64) * 256 + u.astype(np.int64)
                want = np.bincount(idx.ravel(), minlength=65536).reshape(
                    256, 256
                )
                pad = u_s.size - H * W
                want[0, 0] += pad  # stripe padding counts at (0, 0)
                np.testing.assert_array_equal(ref, want)
            else:
                np.testing.assert_array_equal(got, ref, err_msg=name)
            print(f"check ok: {name}", flush=True)

    def build_loop(fn, k):
        @jax.jit
        def run(us, vs):
            def body(i, acc):
                us2 = jnp.bitwise_xor(us, (i % 2).astype(jnp.uint8))
                return acc + fn(us2, vs)[0, 0]

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    if which in ("measure", "both") and not INTERPRET:
        from _util import slope_ms

        for name, fn in cands:
            ms = slope_ms(lambda k, fn=fn: build_loop(fn, k), (u_s, v_s), 16)
            print(f"{name:32s} {ms:7.3f} ms/frame", flush=True)

    if which == "profile" and not INTERPRET:
        from _util import op_profile_rows

        for name, fn in cands:
            rows = op_profile_rows(
                lambda us, vs: build_loop(fn, 16)(us, vs), (u_s, v_s), 16,
                f"/tmp/tr_r4a_{name[:1]}",
            )
            print(f"-- {name} (op-sum {sum(t for t, _ in rows):.3f} ms) --")
            for t, op in rows:
                if t > 0.02:
                    print(f"  {t:8.4f} ms  {op[:100]}", flush=True)


if __name__ == "__main__":
    main()
