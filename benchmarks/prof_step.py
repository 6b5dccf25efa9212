"""Profile the exact bench.py program with xprof: where does every
microsecond of make_full_step go (kernels, copies, fusions, gaps)?

Usage: python benchmarks/prof_step.py [n_iters]
"""
import sys
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from _util import op_profile_rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from obs_color_monitor_tpu.api import make_full_step
    from obs_color_monitor_tpu.colorspace import Colorspace

    H, W = 2160, 3840
    step = make_full_step(H, W, cs=Colorspace.BT709, scale=2)
    FULLRES = ("zebra", "falsecolor", "focuspeaking")

    def checksum(out):
        total = jnp.int32(0)
        for name, leaf in zip(out._fields, out):
            if name in FULLRES:
                leaf = leaf[:, :64, :]
            total += jnp.sum(leaf.astype(jnp.int32))
        return total

    @jax.jit
    def run(frame):
        def body(i, acc):
            out = step(frame, i.astype(jnp.float32) * 0.0667)
            return acc + checksum(out)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    assert getattr(step, "pipeline_static_ok", False), (
        "step off the pipeline path: add an input XOR before profiling"
    )
    rng = np.random.default_rng(0)
    frame = jax.device_put(rng.integers(0, 256, (H, W, 4), np.uint8))
    frame.block_until_ready()

    rows = op_profile_rows(run, (frame,), n, "/tmp/tr_step")
    tot = sum(t for t, _ in rows)
    print(f"op-sum total = {tot:.4f} ms/frame over {n} iters")
    for t, name in rows:
        if t > 0.002:
            print(f"  {t:8.4f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
