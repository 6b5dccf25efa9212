"""The scopes (the framework's "model" layer)."""

from .base import CaptureHub, Needs, Scope, SurfaceData
from .vectorscope import Vectorscope
from .waveform import Waveform
from .histogram import Histogram
from .overlays import FalseColor, FocusPeaking, Zebra
from .dock import Dock, SCOPE_ORDER

__all__ = [
    "CaptureHub",
    "Needs",
    "Scope",
    "SurfaceData",
    "Vectorscope",
    "Waveform",
    "Histogram",
    "Zebra",
    "FalseColor",
    "FocusPeaking",
    "Dock",
    "SCOPE_ORDER",
]
