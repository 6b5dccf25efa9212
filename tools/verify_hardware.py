"""Hardware verification: the Mosaic fast paths vs golden, on a real TPU.

The pytest suite runs on a forced-CPU mesh (tests/conftest.py), where the
TPU-only branches (fused ingest, fused overlays, Mosaic stats) are either
interpreted or skipped.  This script drives them on real hardware:

    python tools/verify_hardware.py

Checks:
  1. ops.fused.analyze (fused ingest + all-MXU stats) bit-exact vs golden.
  2. The one-program dock panel is bit-identical between the TPU path
     (Mosaic kernels) and the CPU/XLA path — full-pipeline determinism.
  3. The fused overlay kernel vs the golden overlay models.

Also run `OCM_TEST_TPU=1 python -m pytest tests/ -q` for the kernel suite
with interpret=False.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    # survive an ambient-client outage (late r3: 'axon' refusing init while
    # plain 'tpu' reaches the chip) — same fallback as bench.py
    from bench import _apply_forced_platform, _wait_for_backend

    _wait_for_backend(attempts=2, delay_s=30.0)
    import jax

    _apply_forced_platform(jax)
    assert jax.default_backend() != "cpu", "run this on a TPU host"

    from obs_color_monitor_tpu import golden
    from obs_color_monitor_tpu.colorspace import Colorspace
    from obs_color_monitor_tpu.config import Components
    from obs_color_monitor_tpu.dock_step import make_dock_step
    from obs_color_monitor_tpu.ops.fused import analyze

    rng = np.random.default_rng(3)
    f = rng.integers(0, 256, (360, 640, 4), np.uint8)
    f[..., 3] = np.where(rng.random((360, 640)) < 0.1, 0, 255)

    # 1. fused ingest + stats vs golden
    res = analyze(
        f, cs=2, scale=2, need_vs=True, need_wv_rgb=True, need_hi_rgb=True,
        keep_rgba=True,
    )
    scaled = golden.downscale(f, 2)
    yuv = golden.rgb_to_yuv_u8(scaled, Colorspace.BT709)
    np.testing.assert_array_equal(
        np.asarray(res.vs_counts), golden.vectorscope_counts(yuv)
    )
    np.testing.assert_array_equal(
        np.asarray(res.wv_rgb), golden.waveform_counts(scaled, None, Components.RGB)
    )
    np.testing.assert_array_equal(
        np.asarray(res.hi_rgb), golden.histogram_counts(scaled, None, Components.RGB)
    )
    np.testing.assert_array_equal(np.asarray(res.planes), np.moveaxis(scaled, -1, 0))
    print("1. analyze (fused ingest + MXU stats): bit-exact vs golden")

    # 2. dock panel: TPU vs CPU backends bit-identical
    frame = rng.integers(0, 256, (180, 320, 4), dtype=np.uint8)
    frame[..., 3] = 255
    # pinned six-scope composition: keeps focus peaking INSIDE the panel
    # program (the DockConfig default swaps it for the ROI preview band, and
    # this check must exercise the peaking resize/composite integration)
    from obs_color_monitor_tpu.config import DockConfig

    dk = DockConfig(show_roi=False, show_focuspeaking=True)
    step = make_dock_step(180, 320, scale=2, out_width=200, out_height=1100,
                          dock=dk)
    out = step(frame, np.float32(3.5))
    tpu_panel = np.asarray(out.panel)
    np.save("/tmp/_ocm_vh_frame.npy", frame)
    np.save("/tmp/_ocm_vh_panel.npy", tpu_panel)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np\n"
        "from obs_color_monitor_tpu.dock_step import make_dock_step\n"
        "from obs_color_monitor_tpu.config import DockConfig\n"
        "f = np.load('/tmp/_ocm_vh_frame.npy')\n"
        "dk = DockConfig(show_roi=False, show_focuspeaking=True)\n"
        "s = make_dock_step(180, 320, scale=2, out_width=200, out_height=1100,\n"
        "                   dock=dk)\n"
        "p = np.asarray(s(f, np.float32(3.5)).panel)\n"
        "assert (p == np.load('/tmp/_ocm_vh_panel.npy')).all()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    print("2. dock panel: TPU (Mosaic) == CPU (XLA), bit-identical")

    # 3. fused overlay kernel vs golden
    from obs_color_monitor_tpu.ops.pallas_overlays import fused_overlays_planes

    planes = np.moveaxis(frame, -1, 0)
    zb, fc, fp = fused_overlays_planes(
        planes, 7.0, th_low=0.75, th_high=1.0, zb_cs=1, fc_cs=2,
        peak_th=3062, peak_rgba=(0, 84, 255, 255),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(zb), 0, -1),
        golden.zebra(frame, 0.75, 1.0, 7.0, Colorspace.BT601),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(fc), 0, -1),
        golden.falsecolor(frame, Colorspace.BT709),
    )
    print("3. fused overlay kernel: bit-exact vs golden (mixed colorspaces)")

    # 4. whole-frame pipeline kernel vs golden (stats + all three overlays)
    from obs_color_monitor_tpu.ops.pallas_pipeline import frame_pipeline

    fpl = np.moveaxis(f, -1, 0)
    pk_th_f = 0.06
    pk_color_f = (1.0, 84 / 255.0, 0.0, 1.0)
    pk_color_u8 = golden.reference.quantize_unorm8(
        np.asarray(pk_color_f, np.float32)
    )
    vs, wv, ds, zb, fc, fp = frame_pipeline(
        fpl, 2.5, cs=2, scale=2, th_low=0.75, th_high=1.0, zb_cs=2, fc_cs=1,
        peak_th=golden.reference.peaking_threshold_fixed(pk_th_f),
        peak_rgba=tuple(int(v) for v in pk_color_u8),
    )
    np.testing.assert_array_equal(
        np.asarray(vs).clip(0, 255).astype(np.uint8), golden.vectorscope_counts(yuv)
    )
    np.testing.assert_array_equal(
        np.asarray(wv).clip(0, 255).astype(np.uint8),
        golden.waveform_counts(scaled, None, Components.RGB),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(zb), 0, -1),
        golden.zebra(f, 0.75, 1.0, 2.5, Colorspace.BT709),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(fc), 0, -1),
        golden.falsecolor(f, Colorspace.BT601),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(fp), 0, -1),
        golden.focus_peaking(f, pk_th_f, pk_color_f),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(ds), 0, -1), scaled
    )
    print("4. frame-pipeline kernel: bit-exact vs golden")

    # 5. NV12 decode band kernels (8-bit + P010-family) vs their XLA twins
    # (the twins are golden/native-pinned in the CPU suite)
    from obs_color_monitor_tpu.ops import convert as conv

    y = rng.integers(0, 256, (130, 256), np.uint8)
    uv = rng.integers(0, 256, (65, 256), np.uint8)
    assert conv._nv12_pallas_ok(y, uv), "expected the Pallas decode path"
    np.testing.assert_array_equal(
        np.asarray(conv.nv12_to_packed(y, uv, cs=1)),
        np.asarray(conv._nv12_to_packed_xla(y, uv, cs=1)),
    )
    y16 = (rng.integers(0, 1 << 10, (130, 256)) << 6).astype(np.uint16)
    uv16 = (rng.integers(0, 1 << 10, (65, 256)) << 6).astype(np.uint16)
    sh = conv.nv12_shift(10, msb_aligned=True)
    np.testing.assert_array_equal(
        np.asarray(conv.nv12_to_packed(y16, uv16, cs=2, shift=sh)),
        np.asarray(conv._nv12_16_to_packed_xla(y16, uv16, cs=2, shift=sh)),
    )
    print("5. NV12/P010 decode kernels: bit-exact vs XLA twins")

    # 6. fused even-scale downscale (4/8 ride the band kernel since r4) vs
    # the golden-pinned separate path, packed input (the production form)
    from obs_color_monitor_tpu.ops.convert import downscale_planes
    from obs_color_monitor_tpu.ops.pallas_pipeline import frame_pipeline
    from obs_color_monitor_tpu.ops.pallas_stats import (
        fused_ingest_stats_scale1,
    )

    a = rng.integers(0, 256, (140, 300, 4), np.uint8)
    pk = a.view(np.uint32).reshape(140, 300)
    pe = np.moveaxis(a, -1, 0).copy()
    for sc in (4, 8):
        vs, wv, ds, *_ = frame_pipeline(
            pk, np.float32(1.5), cs=2, scale=sc, packed=True,
            th_low=0.75, th_high=1.0, zb_cs=2, fc_cs=1,
            peak_th=3062, peak_rgba=(255, 84, 0, 255),
        )
        rds = downscale_planes(pe, scale=sc)
        rvs, rwv = fused_ingest_stats_scale1(rds, cs=2)
        np.testing.assert_array_equal(np.asarray(ds), np.asarray(rds))
        np.testing.assert_array_equal(np.asarray(vs), np.asarray(rvs))
        np.testing.assert_array_equal(np.asarray(wv), np.asarray(rwv))
    print("6. fused scale-4/8 downscale (packed): bit-exact vs separate ops")
    print("hardware verification OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
