"""Waveform scope (reference src/waveform.c).

Per-column 256-level intensity map with RGB/Luma/Chroma/YUV component
select, overlay/stack/parade display, horizontal graticule lines.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import Components, DisplayMode, WaveformConfig
from ..ops import render as render_ops
from ..ops.graticule import waveform_graticule
from ..ops.stats import apply_channel_select
from .base import (
    FLAG_CONVERT_RGB,
    FLAG_CONVERT_YUV,
    Needs,
    Scope,
    StandaloneScopeMixin,
    SurfaceData,
)

WV_SIZE = 256


class Waveform(Scope, StandaloneScopeMixin):
    def __init__(self, config: Optional[WaveformConfig] = None):
        config = config or WaveformConfig()
        super().__init__(config)
        self._r_buf = 0  # published on tick (reference wvs_tick, waveform.c:394-400)
        self._buf_width = [0, 0]
        self._update_flags()
        self.attach_private_hub(config)

    def _update_flags(self) -> None:
        c = self.config.components
        # reference src/waveform.c:100-102
        self.flags = (FLAG_CONVERT_RGB if (c & Components.RGB) else 0) | (
            FLAG_CONVERT_YUV if c.is_yuv else 0
        )

    def update(self, **settings) -> None:
        super().update(**settings)
        self._update_flags()

    def needs(self) -> Needs:
        yuv = self.config.components.is_yuv
        return Needs(wv_rgb=not yuv, wv_yuv=yuv, rgba=self.config.bypass)

    def surface_cb(self, surface: SurfaceData) -> None:
        self._store_bypass(surface)
        res = surface.result
        counts = res.wv_yuv if self.config.components.is_yuv else res.wv_rgb
        if counts is None:
            return
        counts = apply_channel_select(counts, self.config.components.channel_select())
        self._buf_width[self._w_buf] = surface.width
        self._publish(counts)

    def tick(self, seconds: float = 1.0 / 60.0) -> None:
        # the read buffer only advances on tick (reference waveform.c:394-400)
        self._r_buf = self._w_buf ^ 1

    def render_leaves(self):
        if self.config.bypass:
            return None
        counts = self._buf[self._r_buf]  # tick-gated read buffer
        return None if counts is None else (counts,)

    def render_trace_key(self):
        return (repr(self.config), self._buf_width[self._r_buf])

    def render_traced(self, counts):
        n = self.config.components.n_components
        img = render_ops.render_waveform(
            counts,
            intensity=self.config.intensity,
            display=int(self.config.display),
            n_components=n,
            yuv_mode=self.config.components.is_yuv,
        )
        key = (
            self.config.graticule_lines,
            self._buf_width[self._r_buf],
            int(self.config.display),
            n,
        )
        overlay = self._device_const(key, lambda: waveform_graticule(*key))
        if overlay is not None:
            img = render_ops.blend_overlay(img, overlay)
        return img

    def render_image(self):
        if self.config.bypass:
            return self.render_bypass()
        return super().render_image()

    @property
    def width(self) -> int:
        w = self._buf_width[self._r_buf]
        if self.config.display == DisplayMode.PARADE:
            return w * self.config.components.n_components
        return w

    @property
    def height(self) -> int:
        if self.config.display == DisplayMode.STACK:
            return WV_SIZE * self.config.components.n_components
        return WV_SIZE
