"""Device kernels: conversion, statistics, overlays, rendering.

Hot-path functions are PLANAR ((C, H, W) u8); *_planes variants are the
canonical forms, interleaved names are boundary wrappers.
"""

from .convert import (
    downscale,
    downscale_planes,
    interleave,
    luma_fixed,
    luma_planes,
    nv12_shift,
    nv12_to_packed,
    nv12_to_planes,
    planarize,
    rgb_to_yuv_planes,
    rgb_to_yuv_u8,
    roi_crop,
    roi_crop_planes,
)
from .stats import (
    apply_channel_select,
    histogram_counts,
    histogram_hi_max,
    histogram_levels,
    select_planes,
    vectorscope_counts,
    waveform_counts,
)

__all__ = [
    "planarize",
    "interleave",
    "rgb_to_yuv_u8",
    "rgb_to_yuv_planes",
    "luma_fixed",
    "luma_planes",
    "downscale",
    "downscale_planes",
    "roi_crop",
    "roi_crop_planes",
    "nv12_shift",
    "nv12_to_planes",
    "nv12_to_packed",
    "histogram_counts",
    "histogram_hi_max",
    "histogram_levels",
    "vectorscope_counts",
    "waveform_counts",
    "select_planes",
    "apply_channel_select",
]
