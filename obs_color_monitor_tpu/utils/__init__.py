"""Utilities: host-side rasterization for graticules and legends."""

from .draw import OverlayCanvas, alpha_blend_u8, text_mask

__all__ = ["OverlayCanvas", "alpha_blend_u8", "text_mask"]
