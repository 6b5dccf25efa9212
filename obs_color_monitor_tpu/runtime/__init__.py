"""Native (C++) host runtime: frame queue, NV12 unpack, pattern sources."""

from .native import (
    NativeFrameQueue,
    available,
    deinterleave_rgba,
    nv12_to_rgba,
    pattern,
)

__all__ = [
    "NativeFrameQueue",
    "available",
    "deinterleave_rgba",
    "nv12_to_rgba",
    "pattern",
]
