"""MXU rate probe: int8 vs bf16 NT contractions at the vectorscope shape.

Decides whether the bf16 two-bin pack (sweep_r4a candidate B, which
HALVES the MAC count) can beat the shipping int8 per-row form: if bf16
ops/s is half of int8 (the v5e spec sheet ratio, 197 vs 394 T), pack2 is
mathematically break-even; if the ACHIEVED rates are closer, pack2 wins
by up to 2x.  Bare XLA dot_generals (no one-hot builds, no pallas), both
dtypes at identical (256, K) NT shape, slope-timed.

Usage: python benchmarks/sweep_r4b.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import jax
import jax.numpy as jnp

from _util import slope_ms

K = 8192 * 8  # big enough that one iteration is MXU-bound


def probe(name, dtype, acc):
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(0, 2, (256, K), np.int8).astype(dtype))
    b = jax.device_put(rng.integers(0, 2, (256, K), np.int8).astype(dtype))

    def build(k):
        @jax.jit
        def run(a, b):
            def body(i, out):
                a2 = (a + i.astype(dtype)).astype(dtype)  # anti-hoist
                return out + jax.lax.dot_general(
                    a2, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=acc,
                ).astype(jnp.float32)

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros((256, 256), jnp.float32)
            ).sum()

        return run

    ms = slope_ms(build, (a, b), 32)
    tops = 2 * 256 * 256 * K / (ms * 1e-3) / 1e12
    print(f"{name:28s} {ms:7.4f} ms/iter = {tops:6.1f} Tops", flush=True)


if __name__ == "__main__":
    probe("int8 x int8 -> int32", jnp.int8, jnp.int32)
    probe("bf16 x bf16 -> f32", jnp.bfloat16, jnp.float32)
