"""Wall-slope measurement of the reference-parity dock panel
(make_dock_step) and secondary make_full_step shapes.  Slope
(t(2n)-t(n))/n cancels the tunnel round trip (see doc/performance.md).

Usage: python benchmarks/panel_slope.py [which ...]
  which in {dock, 1080p2, 4k4, 4k8, 4k1, 4knv12, 1080p1, batch2}; default: dock
"""
import sys
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp

N = 32


def csum_tree(out):
    import jax as _j

    total = jnp.int32(0)
    for leaf in _j.tree_util.tree_leaves(out):
        if leaf.ndim >= 2 and leaf.shape[-1] >= 1024 and leaf.shape[-2] >= 256:
            leaf = leaf[..., :64, :]  # opaque-kernel big image: sample rows
        total += jnp.sum(leaf.astype(jnp.int32))
    return total


def slope(name, step, frame, tm_scale=0.0667, n=N):
    from _util import slope_ms

    # when every output is downstream of the tm-fed frame-reading kernel
    # (pipeline_static_ok), the per-iteration tm alone is a sufficient
    # anti-hoist and the input-XOR copy (a full-frame materialization the
    # real step never pays) can be dropped
    tm_anti_hoist = (
        getattr(step, "pipeline_static_ok", False)
        and jax.default_backend() != "cpu"
    )

    def build(k):
        @jax.jit
        def run(f0):
            def body(i, acc):
                f = f0
                if not tm_anti_hoist:
                    f = jax.tree.map(
                        lambda x: jnp.bitwise_xor(
                            x, (i % 2).astype(x.dtype)
                        ),
                        f0,
                    )
                out = step(f, i.astype(jnp.float32) * tm_scale)
                return acc + csum_tree(out)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    ms = slope_ms(build, (frame,), n)
    print(f"{name:44s} {ms:7.3f} ms/frame = {1e3/ms:6.1f} fps", flush=True)


def main():
    which = sys.argv[1:] or ["dock"]
    from obs_color_monitor_tpu.api import make_full_step, make_batched_step
    from obs_color_monitor_tpu.dock_step import make_dock_step
    from obs_color_monitor_tpu.colorspace import Colorspace

    rng = np.random.default_rng(0)

    # frames are HBM-resident as the packed (H, W) u32 view — identical
    # bytes to (H, W, 4) u8; the u8-typed form pays a ~0.19 ms/4K relayout
    # into the band kernel's operand (xprof r3, see bench.py)
    def packed(h, w):
        a = rng.integers(0, 256, (h, w, 4), np.uint8)
        return jax.device_put(a.view(np.uint32).reshape(h, w))

    if "dock" in which:
        # the measured composition is pinned explicitly: all six scopes, no
        # ROI preview band (doc/performance.md's 4K dock panel row) — the
        # DockConfig DEFAULT now mirrors the reference's new-dock defaults
        # (ROI band shown, focus peaking hidden), a different program
        from obs_color_monitor_tpu.config import DockConfig
        dk = DockConfig(show_roi=False, show_focuspeaking=True)
        dstep = make_dock_step(2160, 3840, scale=2, dock=dk)
        slope("make_dock_step 4K (six-scope panel)", dstep, packed(2160, 3840))
    if "1080p2" in which:
        step = make_full_step(1080, 1920, cs=Colorspace.BT709, scale=2,
                              input_format="packed")
        slope("full step 1080p scale2", step, packed(1080, 1920))
    if "4k4" in which:
        step = make_full_step(2160, 3840, cs=Colorspace.BT709, scale=4,
                              input_format="packed")
        slope("full step 4K scale4", step, packed(2160, 3840))
    if "4k8" in which:
        step = make_full_step(2160, 3840, cs=Colorspace.BT709, scale=8,
                              input_format="packed")
        slope("full step 4K scale8", step, packed(2160, 3840))
    if "4k3" in which:
        # odd scale: single-center-texel downscale (r5 MXU select-matmul;
        # the strided pick it replaced cost 11.5 ms alone) + scale-1 stats
        # at 720x1280
        step = make_full_step(2160, 3840, cs=Colorspace.BT709, scale=3,
                              input_format="packed")
        slope("full step 4K scale3 (odd, fallback)", step,
              packed(2160, 3840))
    if "4k16" in which:
        # scale 16 forfeits the fused band kernel (Mosaic-gated: <8 output
        # rows per band) and runs the separate-downscale fallback — this
        # arm measures what the gate actually costs at the only shape
        # where scale 16 is plausible (4K -> 135x240 stats)
        step = make_full_step(2160, 3840, cs=Colorspace.BT709, scale=16,
                              input_format="packed")
        slope("full step 4K scale16 (fallback path)", step,
              packed(2160, 3840))
    if "4k1" in which:
        step = make_full_step(2160, 3840, cs=Colorspace.BT709, scale=1,
                              input_format="packed")
        slope("full step 4K scale1", step, packed(2160, 3840), n=16)
    if "4knv12" in which:
        # wire-format ingest: raw NV12 planes in HBM, decode in-program
        # (the stream route's one-program NV12 path, r4)
        y = jax.device_put(rng.integers(0, 256, (2160, 3840), np.uint8))
        uv = jax.device_put(rng.integers(0, 256, (1080, 3840), np.uint8))
        step = make_full_step(2160, 3840, cs=Colorspace.BT709, scale=2,
                              input_format="nv12")
        slope("full step 4K NV12-in (device planes)", step, (y, uv))
    if "1080p1" in which:
        step = make_full_step(1080, 1920, cs=Colorspace.BT709, scale=1,
                              input_format="packed")
        slope("full step 1080p scale1", step, packed(1080, 1920))
    if "batch2" in which or "batch2u8" in which:
        from _util import slope_ms

        # two variants: the r3 measurement fed (2,H,W,4) u8 frames (each
        # pays the ~0.19 ms relayout into the band kernel) and used an
        # input-XOR anti-hoist (a 2x33 MB copy per iteration — XLA cannot
        # inline the XOR into the custom-call operand).  The packed+tm
        # variant matches bench.py's B=1 conditions exactly: the vmap'd
        # step's per-frame tm still feeds the Mosaic kernel, so tm alone
        # is a sufficient anti-hoist.
        def run_batch2(label, input_format, frames, xor):
            bstep = make_batched_step(
                2160, 3840, cs=Colorspace.BT709, scale=2,
                input_format=input_format,
            )

            def build(k):
                @jax.jit
                def run(f0):
                    def body(i, acc):
                        ff = f0
                        if xor:
                            ff = jnp.bitwise_xor(
                                f0, (i % 2).astype(f0.dtype)
                            )
                        out = bstep(
                            ff, jnp.full((2,), i, jnp.float32) * 0.0667
                        )
                        return acc + csum_tree(out)

                    return jax.lax.fori_loop(0, k, body, jnp.int32(0))

                return run

            ms = slope_ms(build, (frames,), 16) / 2
            print(f"{label:44s} {ms:7.3f} ms/frame = {1e3/ms:6.1f} fps/chip",
                  flush=True)

        if "batch2u8" in which:
            f8 = jax.device_put(
                rng.integers(0, 256, (2, 2160, 3840, 4), np.uint8)
            )
            run_batch2("batched B=2, u8 frames + XOR (r3 cond.)",
                       "rgba", f8, xor=True)
        if "batch2" in which:
            fp32 = jax.device_put(
                rng.integers(0, 256, (2, 2160, 3840, 4), np.uint8)
                .view(np.uint32).reshape(2, 2160, 3840)
            )
            run_batch2("batched B=2, packed frames + tm (B=1 cond.)",
                       "packed", fp32, xor=False)
    if "batch4" in which:
        # serving depth: FOUR streams per chip in one vmap'd program —
        # does per-stream throughput hold past B=2? (B=2 measured at
        # parity with B=1: 625 fps/chip, r4)
        from _util import slope_ms

        bstep4 = make_batched_step(
            2160, 3840, cs=Colorspace.BT709, scale=2, input_format="packed",
        )  # batch size comes from the input shape (vmap)
        fp4 = jax.device_put(
            rng.integers(0, 256, (4, 2160, 3840, 4), np.uint8)
            .view(np.uint32).reshape(4, 2160, 3840)
        )

        def build4(k):
            @jax.jit
            def run(f0):
                def body(i, acc):
                    out = bstep4(
                        f0, jnp.full((4,), i, jnp.float32) * 0.0667
                    )
                    return acc + csum_tree(out)

                return jax.lax.fori_loop(0, k, body, jnp.int32(0))

            return run

        ms = slope_ms(build4, (fp4,), 8) / 4
        print(f"{'batched B=4, packed frames + tm':44s} {ms:7.3f} "
              f"ms/frame = {1e3/ms:6.1f} fps/chip", flush=True)
    if "batch2nv12" in which:
        # multi-stream WIRE-FORMAT serving: two NV12 streams per chip,
        # the vmap'd Pallas decode + full step in one program (r4)
        from _util import slope_ms

        ys = jax.device_put(
            rng.integers(0, 256, (2, 2160, 3840), np.uint8))
        uvs = jax.device_put(
            rng.integers(0, 256, (2, 1080, 3840), np.uint8))
        bstep = make_batched_step(
            2160, 3840, cs=Colorspace.BT709, scale=2, input_format="nv12")

        def build(k):
            @jax.jit
            def run(y, uv):
                def body(i, acc):
                    out = bstep(
                        (y, uv), jnp.full((2,), i, jnp.float32) * 0.0667
                    )
                    return acc + csum_tree(out)

                return jax.lax.fori_loop(0, k, body, jnp.int32(0))

            return run

        ms = slope_ms(build, (ys, uvs), 16) / 2
        print(f"{'batched B=2, NV12 wire planes + tm':44s} {ms:7.3f} "
              f"ms/frame = {1e3/ms:6.1f} fps/chip", flush=True)


if __name__ == "__main__":
    main()
