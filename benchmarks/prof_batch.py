"""Where does batched serving (make_batched_step, B=2) lose ~10% per
frame vs two B=1 steps?  (VERDICT r3 weak-2: 559 vs 624 fps/chip.)

xprof op_profile of the vmap'd step vs the single-stream step, normalized
per FRAME (the B=2 loop runs n iterations = 2n frames), so rows compare
1:1 — whatever grew is the regression.

Usage: python benchmarks/prof_batch.py [n_iters]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import jax
import jax.numpy as jnp

from _util import op_profile_rows


def checksum(out, fullres=("zebra", "falsecolor", "focuspeaking")):
    total = jnp.int32(0)
    for name, leaf in zip(out._fields, out):
        if name in fullres:
            leaf = leaf[..., :, :64, :]  # opaque-kernel image: row sample
        total += jnp.sum(leaf.astype(jnp.int32))
    return total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from obs_color_monitor_tpu.api import make_batched_step, make_full_step
    from obs_color_monitor_tpu.colorspace import Colorspace

    H, W = 2160, 3840
    rng = np.random.default_rng(0)

    # --- single-stream reference ------------------------------------------
    step1 = make_full_step(H, W, cs=Colorspace.BT709, scale=2,
                           input_format="packed")
    assert step1.pipeline_static_ok
    f1 = jax.device_put(
        rng.integers(0, 256, (H, W, 4), np.uint8).view(np.uint32).reshape(H, W)
    )

    @jax.jit
    def run1(frame):
        def body(i, acc):
            out = step1(frame, i.astype(jnp.float32) * 0.0667)
            return acc + checksum(out)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    rows1 = op_profile_rows(run1, (f1,), n, "/tmp/tr_b1")

    # --- batched B=2, matched conditions (packed frames, tm anti-hoist:
    # the vmap'd step's per-frame tm feeds each Mosaic kernel instance) ---
    bstep = make_batched_step(H, W, cs=Colorspace.BT709, scale=2,
                              input_format="packed")
    fb = jax.device_put(
        rng.integers(0, 256, (2, H, W, 4), np.uint8)
        .view(np.uint32).reshape(2, H, W)
    )

    @jax.jit
    def run2(frames):
        def body(i, acc):
            out = bstep(frames, jnp.full((2,), i, jnp.float32) * 0.0667)
            return acc + checksum(out)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    rows2 = op_profile_rows(run2, (fb,), 2 * n, "/tmp/tr_b2")  # per FRAME

    t1 = sum(t for t, _ in rows1)
    t2 = sum(t for t, _ in rows2)
    print(f"op-sum per frame: B=1 {t1:.4f} ms | B=2 {t2:.4f} ms "
          f"(delta {t2 - t1:+.4f})")
    print("\n-- B=1 --")
    for t, name in rows1:
        if t > 0.004:
            print(f"  {t:8.4f} ms  {name[:110]}")
    print("\n-- B=2 (per frame) --")
    for t, name in rows2:
        if t > 0.004:
            print(f"  {t:8.4f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
