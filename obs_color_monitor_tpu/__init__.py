"""obs_color_monitor_tpu — a TPU-native video-scope framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
obs-color-monitor OBS Studio plugin (reference: norihiro/obs-color-monitor):
six video-analysis scopes — vectorscope, waveform, histogram, zebra,
false color, focus peaking — plus a shared ROI/scale-down capture hub and a
composite "dock" view.

Where the reference renders on GPU, reads pixels back to the CPU and
accumulates counts in scalar C loops (reference src/common.c:335-454,
src/vectorscope.c:217-238), this framework keeps batched RGBA frames resident
in HBM and computes every statistic on device:

  * the 256-bin histograms decompose into 16x16 outer products of nibble
    one-hots ridden on the MXU,
  * the 256x256 CbCr vectorscope occupancy is ``one_hot(U)^T @ one_hot(V)``
    (an MXU-shaped matmul, not a scatter),
  * the per-column waveform is a masked one-hot row-reduction,
  * overlay scopes (zebra / false color / focus peaking) are fused
    elementwise/stencil ops,

all of it bit-exact against the NumPy golden model in
:mod:`obs_color_monitor_tpu.golden` (the test oracle the reference lacks).

Layout:
  golden/    NumPy golden model — exact integer semantics, the test oracle
  ops/       device kernels: convert, stats (XLA + Pallas), overlays, render
  models/    the scopes themselves (property model mirrors the reference)
  parallel/  device mesh, batch-DP sharding, cross-chip bin merges
  pipeline/  frame queue, drop/interleave policy, double-buffering, driver
  runtime/   native (C++) host runtime: bounded frame queue, NV12 unpack
"""

from .colorspace import Colorspace, calc_colorspace
from .config import (
    VectorscopeConfig,
    WaveformConfig,
    HistogramConfig,
    ZebraConfig,
    FalseColorConfig,
    FocusPeakingConfig,
    ROIConfig,
    DockConfig,
    Components,
    DisplayMode,
    LevelMode,
)

__version__ = "0.1.0"


def make_full_step(*args, **kwargs):
    """All six scopes, one jitted program (see api.make_full_step)."""
    from .api import make_full_step as f

    return f(*args, **kwargs)


def make_dock_step(*args, **kwargs):
    """The composited dock panel as one jitted program
    (see dock_step.make_dock_step)."""
    from .dock_step import make_dock_step as f

    return f(*args, **kwargs)

__all__ = [
    "Colorspace",
    "calc_colorspace",
    "VectorscopeConfig",
    "WaveformConfig",
    "HistogramConfig",
    "ZebraConfig",
    "FalseColorConfig",
    "FocusPeakingConfig",
    "ROIConfig",
    "DockConfig",
    "Components",
    "DisplayMode",
    "LevelMode",
]
