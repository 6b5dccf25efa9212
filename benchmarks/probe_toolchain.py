"""Probe the Mosaic limitations that gate the next speedups (CLAUDE.md
list).  Run after every jax/libtpu bump: each PASS unlocks a measured
design — int4 matmul operands halve the vectorscope matmul (−0.35 ms),
int16 bins-first compares halve the one-hot build width.

Prints PASS/FAIL per probe; failures are expected on jax 0.9.
"""
import sys
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        fn()
        print(f"PASS  {name}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:110]
        print(f"FAIL  {name}: {msg}", flush=True)


def int4_matmul():
    def k(a_ref, b_ref, o_ref):
        a = a_ref[:].astype(jnp.int4)
        b = b_ref[:].astype(jnp.int4)
        o_ref[:] = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    a = jnp.ones((256, 128), jnp.int8)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32)
    )(a, a)
    np.asarray(out)


def int16_bins_first_compare():
    def k(x_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int16, (256, 128), 0)
        o_ref[:] = (iota == x_ref[:].astype(jnp.int16)).astype(jnp.int8)

    x = jnp.ones((1, 128), jnp.uint8)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int8)
    )(x)
    np.asarray(out)


def int8_vector_add():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + x_ref[:]

    x = jnp.ones((8, 128), jnp.int8)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int8)
    )(x)
    np.asarray(out)


def lane_merge_reshape():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(8, 1024).reshape(8, 8, 128)

    x = jnp.ones((8, 8, 128), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.int32)
    )(x)
    np.asarray(out)


def int4_onehot_direct():
    """The REAL int4 lever: a compare-built one-hot cast to int4 WITHOUT
    a scratch round trip (Mosaic folds the select into the cast -> illegal
    int4 compare on jax 0.9; the scratch workaround compiles but loses 2x,
    sweep_r3j).  The plain int4_matmul probe above passes because its
    operand is a ref LOAD, not a select — this one probes the shipping
    one-hot shape.  If it starts passing, re-run sweep_r3j with a direct
    variant: int4 at 2x int8 MXU rate would cut the VS matmul ~0.35 ms."""
    def k(x_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
        oh = (iota == x_ref[:].astype(jnp.int32)).astype(jnp.int4)
        o_ref[:] = jax.lax.dot_general(
            oh, oh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    x = jnp.ones((1, 128), jnp.uint8)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32)
    )(x)
    np.asarray(out)


def lane_interleave_reshape():
    """Trailing-axis interleave (64, W/4, 4) -> (64, W): rejected on the
    chip on jax 0.9 (sweep_r4b, sweep_r4d P1) — if this starts passing,
    fold the NV12 decode interleave into ops/pallas_convert.py's kernels
    (saves the one XLA stack+reshape, ~0.05 ms/4K frame)."""
    def k(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = jnp.stack([x, x + 1, x + 2, x + 3], axis=-1).reshape(
            8, 512
        )

    x = jnp.ones((8, 128), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 512), jnp.int32)
    )(x)
    np.asarray(out)


def mxu_vpu_overlap_hint():
    """Not a compile probe: reminds where to re-measure overlap."""
    print("      (MXU/VPU overlap: re-measure via benchmarks/sweep_r3c.py"
          " main_f fused variants)", flush=True)


def interpret_mode_on_tpu_correct():
    """r5 platform artifact (CLAUDE.md): pallas INTERPRET mode executed on
    the axon backend miscounts the reference ingest+stats composition at a
    mostly-padded (17, 33) tile — the REAL kernels are exact at the same
    shape.  PASS here = the artifact is fixed and the hardware suite's
    INTERP split (tests/test_pipeline_kernel.py) can be retired."""
    from obs_color_monitor_tpu.ops import pallas_stats as ps
    from obs_color_monitor_tpu import golden
    from obs_color_monitor_tpu.colorspace import Colorspace

    rng = np.random.default_rng(42)
    p_np = rng.integers(0, 256, (4, 17, 33), np.uint8)
    yuv_g = golden.rgb_to_yuv_u8(np.moveaxis(p_np, 0, -1), Colorspace(2))
    vs_g = golden.vectorscope_counts(yuv_g)
    vs, _ = ps.fused_ingest_stats_scale1(
        jnp.asarray(p_np), cs=2, yuv_data=False, interpret=True
    )
    assert np.array_equal(np.asarray(vs), vs_g), (
        f"interpret-on-TPU still miscounts (diff "
        f"{int(np.abs(np.asarray(vs).astype(int) - vs_g.astype(int)).sum())})"
    )


if __name__ == "__main__":
    print(f"jax {jax.__version__}, device {jax.devices()[0]}")
    probe("int4 matmul operands", int4_matmul)
    probe("int16 bins-first compare", int16_bins_first_compare)
    probe("int8 vector elementwise add", int8_vector_add)
    probe("in-kernel lane merge+split reshape", lane_merge_reshape)
    probe("int4 one-hot DIRECT cast (the real VS lever)", int4_onehot_direct)
    probe("in-kernel lane interleave reshape", lane_interleave_reshape)
    probe("interpret mode on TPU bit-correct (r5 artifact)",
          interpret_mode_on_tpu_correct)
    mxu_vpu_overlap_hint()
