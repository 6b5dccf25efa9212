"""xprof op breakdown of make_dock_step (the six-scope panel pinned in
panel_slope.py / doc/performance.md — NOT the new-dock DockConfig default,
which swaps focus peaking for the ROI preview band)."""
import sys
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from _util import op_profile_rows


def main():
    n = 16
    from obs_color_monitor_tpu.dock_step import make_dock_step

    from obs_color_monitor_tpu.config import DockConfig

    H, W = 2160, 3840
    step = make_dock_step(H, W, scale=2,
                          dock=DockConfig(show_roi=False, show_focuspeaking=True))

    def csum(out):
        total = jnp.int32(0)
        for leaf in out:
            if leaf.ndim >= 2 and leaf.shape[-2] >= 256 and leaf.shape[-1] >= 512:
                leaf = leaf[:64]
            total += jnp.sum(leaf.astype(jnp.int32))
        return total

    use_tm = getattr(step, "pipeline_static_ok", False)

    @jax.jit
    def run(frame):
        def body(i, acc):
            f = frame
            if not use_tm:
                # XOR anti-hoist fallback (tm not threaded into the kernel)
                f = jnp.bitwise_xor(frame, (i % 2).astype(jnp.uint8))
            return acc + csum(step(f, i.astype(jnp.float32) * 0.0667))

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    rng = np.random.default_rng(0)
    # packed u32 view: the zero-copy HBM-resident form (see bench.py)
    rgba = rng.integers(0, 256, (H, W, 4), np.uint8)
    frame = jax.device_put(rgba.view(np.uint32).reshape(H, W))
    frame.block_until_ready()

    rows = op_profile_rows(run, (frame,), n, "/tmp/tr_dock")
    tot = sum(t for t, _ in rows)
    print(f"op-sum total = {tot:.4f} ms/frame")
    for t, name in rows:
        if t > 0.004:
            print(f"  {t:8.4f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
