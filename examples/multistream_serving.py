"""Multi-stream serving example: batch-DP scope analysis over a device mesh.

The reference analyzes one OBS program feed; a production TPU deployment
serves MANY streams by sharding the frame batch across chips
(obs_color_monitor_tpu/parallel/mesh.py).  This example runs N synthetic
streams through the batched fused analysis and prints per-stream summaries.

Run (any host, uses CPU mesh when no multi-chip TPU is present):
    python examples/multistream_serving.py --streams 8 --size 640x360
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--size", default="640x360")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax

    if len(jax.devices()) < args.streams:
        try:
            jax.config.update("jax_num_cpu_devices", args.streams)
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from obs_color_monitor_tpu.parallel import batch_analyze, make_mesh
    from obs_color_monitor_tpu.runtime import native

    w, h = (int(x) for x in args.size.split("x"))
    n_dev = min(len(jax.devices()), args.streams)
    mesh = make_mesh(n_dev)
    print(f"mesh: {n_dev} devices; {args.streams} streams {w}x{h}")

    kinds = ["bars", "ramp", "zoneplate"]
    for it in range(args.frames):
        frames = np.stack(
            [
                native.pattern(kinds[s % 3], w, h, it)
                for s in range(args.streams)
            ]
        )
        t0 = time.perf_counter()
        vs, hi, wv = batch_analyze(frames, mesh, cs=2)
        jax.block_until_ready((vs, hi, wv))
        dt = time.perf_counter() - t0
        if it == args.frames - 1:
            for s in range(args.streams):
                h_r = np.asarray(hi[s][0])
                peak = int(h_r.argmax())
                occ = int((np.asarray(vs[s]) > 0).sum())
                print(
                    f"stream {s} ({kinds[s % 3]:9s}): R-peak={peak:3d} "
                    f"vectorscope-occupancy={occ}"
                )
        print(f"frame {it}: {args.streams} streams analyzed in {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
