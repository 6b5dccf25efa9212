"""Benchmark: all six scopes, fused, on 4K frames, one chip.

Target (BASELINE.json): >600 fps of 4K frames per TPU v5e chip with the
reference's default settings (statistics at target_scale=2, overlays at
full resolution).  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Measurement design: the dev setup reaches the TPU through a tunnel with
~30 ms per host<->device round trip, so per-call timing measures the tunnel,
not the chip.  The benchmark therefore scans the full six-scope step over a
batch of HBM-resident frames inside ONE XLA program and returns only tiny
per-frame checksums (which force every output to be computed); sustained
device time per frame = total / batch.  Frames are HBM-resident, matching
the reference whose capture is GPU-resident (its GPU->CPU staging copy is
the hop this design removes, reference src/common.c:316-320).
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from obs_color_monitor_tpu.api import make_full_step
    from obs_color_monitor_tpu.colorspace import Colorspace

    H, W = 2160, 3840  # 4K
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N_REPS = 3

    step = make_full_step(H, W, cs=Colorspace.BT709, scale=2)

    def checksum(out):
        return sum(
            jnp.sum(leaf.astype(jnp.int32) if leaf.dtype == jnp.uint8 else leaf.astype(jnp.int32))
            for leaf in jax.tree_util.tree_leaves(out)
        )

    @jax.jit
    def run_batch(frame):
        def body(i, acc):
            # xor with the loop index: frames differ per iteration and
            # nothing can be hoisted out of the loop, without paying a
            # dynamic-slice copy of a 33 MB frame per step
            f = jnp.bitwise_xor(frame, (i % 2).astype(jnp.uint8))
            out = step(f, i.astype(jnp.float32) * 0.0667)
            return acc + checksum(out)

        return jax.lax.fori_loop(0, B, body, jnp.int32(0))

    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 256, size=(H, W, 4), dtype=np.uint8))
    frames.block_until_ready()

    # compile + warmup (one full pass)
    _ = np.asarray(run_batch(frames))

    best = float("inf")
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        _ = np.asarray(run_batch(frames))
        best = min(best, time.perf_counter() - t0)

    # subtract one bare round trip so the tunnel latency (a dev-setup
    # artifact, not device time) doesn't count against the chip
    tiny = jax.jit(lambda x: x + 1)
    _ = np.asarray(tiny(jnp.int32(0)))
    t0 = time.perf_counter()
    _ = np.asarray(tiny(jnp.int32(0)))
    rt = time.perf_counter() - t0

    per_frame = max(best - rt, 1e-9) / B
    fps = 1.0 / per_frame

    baseline_fps = 600.0  # BASELINE.json: >10x real-time 4K60 per chip
    print(
        json.dumps(
            {
                "metric": "4K_frames_per_sec_all6_scopes_1chip",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )
    print(
        f"# {fps:.1f} fps sustained ({per_frame*1e3:.3f} ms/frame, batch={B}, "
        f"roundtrip={rt*1e3:.1f} ms), device={jax.devices()[0]}",
        file=sys.stderr,
    )
    print(
        "# (make_full_step: overlays at full 4K, stats at target_scale=2 —"
        " the reference's default settings; the reference-dock-parity panel"
        " `make_dock_step` measures ~3.3 ms/frame — see doc/performance.md)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
