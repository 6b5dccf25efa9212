"""Vectorscope scope (reference src/vectorscope.c).

256x256 CbCr occupancy with u8 saturating counters, intensity-scaled draw
with white/chroma tint, graticule (target boxes + labels + IQ/skin-tone
lines), mouse-wheel zoom.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import VectorscopeConfig, VectorscopeColorType
from ..ops import render as render_ops
from ..ops.graticule import vectorscope_graticule
from .base import (
    FLAG_CONVERT_YUV,
    Needs,
    Scope,
    StandaloneScopeMixin,
    SurfaceData,
)

VS_SIZE = 256


class Vectorscope(Scope, StandaloneScopeMixin):
    def __init__(self, config: Optional[VectorscopeConfig] = None):
        config = config or VectorscopeConfig()
        super().__init__(config)
        self.flags = FLAG_CONVERT_YUV  # reference src/vectorscope.c:77
        self._buf_cs = [None, None]  # tex_cs double buffer (vectorscope.c:45)
        self.attach_private_hub(config)

    def needs(self) -> Needs:
        return Needs(vs=True, rgba=self.config.bypass)

    def surface_cb(self, surface: SurfaceData) -> None:
        self._store_bypass(surface)
        if surface.result.vs_counts is None:
            return
        self._buf_cs[self._w_buf] = surface.colorspace
        self._publish(surface.result.vs_counts)

    def zoom_by(self, wheel_delta: float) -> None:
        """Mouse-wheel zoom (reference src/vectorscope.c:473-482)."""
        self.config.zoom = max(1.0, self.config.zoom * float(np.exp(wheel_delta * 5e-4)))

    def render_leaves(self):
        if self.config.bypass:
            return None  # bypass renders the capture, not the counts
        counts = self._read()
        return None if counts is None else (counts,)

    def render_trace_key(self):
        from ..config import config_key

        return (config_key(self.config), self._buf_cs[self._w_buf ^ 1])

    def render_traced(self, counts):
        cs = self._buf_cs[self._w_buf ^ 1]
        img = render_ops.render_vectorscope(
            counts,
            intensity=self.config.intensity,
            cs=int(cs),
            white=self.config.color_type == VectorscopeColorType.WHITE,
        )
        key = (int(self.config.graticule), self.config.graticule_skintone_color, int(cs))
        overlay = self._device_const(
            key,
            lambda: vectorscope_graticule(key[0], key[1], key[2]),
        )
        if overlay is not None:
            img = render_ops.blend_overlay(img, overlay)
        return render_ops.zoom_center(img, zoom=round(self.config.zoom, 3))

    def render_image(self):
        if self.config.bypass:
            return self.render_bypass()
        return super().render_image()

    @property
    def width(self) -> int:
        return VS_SIZE

    @property
    def height(self) -> int:
        return VS_SIZE
