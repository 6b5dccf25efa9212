"""Device kernels: conversion, statistics, overlays, rendering."""

from .convert import rgb_to_yuv_u8, luma_fixed, downscale, roi_crop
from .stats import (
    histogram_counts,
    histogram_hi_max,
    histogram_levels,
    vectorscope_counts,
    waveform_counts,
    select_planes,
    apply_channel_select,
)

__all__ = [
    "rgb_to_yuv_u8",
    "luma_fixed",
    "downscale",
    "roi_crop",
    "histogram_counts",
    "histogram_hi_max",
    "histogram_levels",
    "vectorscope_counts",
    "waveform_counts",
    "select_planes",
    "apply_channel_select",
]
