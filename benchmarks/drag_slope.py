"""Dynamic-rect (mid-drag) dock program: wall slope + xprof device time.

The interactive-drag route (`Dock._consume_dynamic`) serves every mid-drag
frame from ONE cached program — `make_dock_step(dynamic_roi=True)` — whose
(4,) i32 rect is a runtime input (the reference's drag is a crop realloc
plus a per-tick push to every consumer, src/roi.c:343-521, and runs at
video rate by construction).  This measures that program the honest way
(doc/performance.md Methodology): a jitted fori_loop whose rect CHANGES
EVERY ITERATION (exactly a live drag: right/bottom edges sweep), slope
over two batch sizes, plus the xprof op-profile device time of the same
loop program — and, in the SAME sitting, the static full-rect build of
the SAME composition (the program serving the panel when the user is NOT
dragging) so the drag tax is a same-harness delta.

Composition: the reference's new-dock default (ROI preview band + 5
scopes, focus peaking hidden — DockConfig()), i.e. the panel a user
actually drags in.

Usage: python benchmarks/drag_slope.py [4k] [1080p] [noprof]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp

from _util import op_profile_rows, slope_ms


def csum_tree(out):
    total = jnp.int32(0)
    for leaf in jax.tree_util.tree_leaves(out):
        if leaf.ndim >= 2 and leaf.shape[-1] >= 1024 and leaf.shape[-2] >= 256:
            leaf = leaf[..., :64, :]  # opaque-kernel big image: sample rows
        total += jnp.sum(leaf.astype(jnp.int32))
    return total


def measure(H: int, W: int, n: int, profile: bool) -> None:
    from obs_color_monitor_tpu.config import DockConfig
    from obs_color_monitor_tpu.dock_step import make_dock_step

    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 256, (H, W, 4), np.uint8).view(np.uint32).reshape(H, W)
    )
    frame.block_until_ready()
    scale = 2
    sw, sh = W // scale, H // scale
    dk = DockConfig()  # reference new-dock default: ROI band + 5 scopes

    dstep = make_dock_step(H, W, scale=scale, dock=dk, dynamic_roi=True)

    def build(k):
        @jax.jit
        def run(f0):
            def body(i, acc):
                # a DIFFERENT rect every iteration, like a live drag: the
                # right/bottom edges sweep a quarter-capture range (tm is
                # the usual anti-hoist; the rect makes the SMEM scalars
                # loop-variant too)
                x1 = jnp.int32(sw // 2) + (i % jnp.int32(max(sw // 4, 1)))
                y1 = jnp.int32(sh // 2) + ((i * 3) % jnp.int32(max(sh // 4, 1)))
                rect = jnp.stack(
                    [jnp.int32(16), jnp.int32(16), x1, y1]
                )
                out = dstep(f0, i.astype(jnp.float32) * 0.0667, rect)
                return acc + csum_tree(out)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    ms = slope_ms(build, (frame,), n)
    print(
        f"{f'dynamic-rect drag step {W}x{H}':44s} {ms:7.3f} ms/frame "
        f"= {1e3/ms:6.1f} fps",
        flush=True,
    )

    if profile:
        rows = op_profile_rows(build(n), (frame,), n, "/tmp/tr_drag")
        tot = sum(t for t, _ in rows)
        print(f"{'  xprof device op time':44s} {tot:7.3f} ms/frame")
        for t, name in rows:
            if t > 0.02:
                print(f"    {t:8.4f} ms  {name[:90]}")

    # static full-rect build of the SAME composition, same sitting — the
    # program serving the panel when no drag is active
    sstep = make_dock_step(H, W, scale=scale, dock=dk)

    def sbuild(k):
        @jax.jit
        def run(f0):
            def body(i, acc):
                out = sstep(f0, i.astype(jnp.float32) * 0.0667)
                return acc + csum_tree(out)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    ms_s = slope_ms(sbuild, (frame,), n)
    print(
        f"{f'static full-rect step (same comp.)':44s} {ms_s:7.3f} ms/frame "
        f"= {1e3/ms_s:6.1f} fps   (drag tax {ms - ms_s:+.3f} ms)",
        flush=True,
    )


def main() -> None:
    which = [a for a in sys.argv[1:] if a != "noprof"] or ["4k", "1080p"]
    profile = "noprof" not in sys.argv[1:]
    if "4k" in which:
        measure(2160, 3840, n=16, profile=profile)
    if "1080p" in which:
        measure(1080, 1920, n=32, profile=profile)


if __name__ == "__main__":
    main()
