"""Overlay scopes: Zebra, FalseColor, FocusPeaking (reference src/zebra.c,
src/focuspeaking.c).

Each exists in two flavors like the reference:
  * a *source* that captures through a hub (scaled frame, raw texture path,
    reference zbs_render src/zebra.c:599-628), and
  * a *filter* applied directly to a caller-supplied frame at full
    resolution (reference zbf_render src/zebra.c:630-658) — the
    ``apply(frame)`` API here.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..colorspace import calc_colorspace
from ..config import FalseColorConfig, FocusPeakingConfig, ShowKey, ZebraConfig
from ..golden.reference import (
    peaking_threshold_fixed,
    quantize_unorm8,
    zebra_tm_advance,
)
from ..ops import overlays as overlay_ops
from ..ops import render as render_ops
from ..ops.graticule import falsecolor_key_overlay, key_canvas_size
from .base import FLAG_RAW_TEXTURE, Needs, Scope, StandaloneScopeMixin, SurfaceData


class _OverlayScope(Scope, StandaloneScopeMixin):
    """Shared source-flavor plumbing: capture raw frame, overlay at render."""

    def __init__(self, config):
        super().__init__(config)
        self.flags = FLAG_RAW_TEXTURE
        self._size = (0, 0)
        self.attach_private_hub(config)

    def needs(self) -> Needs:
        return Needs(rgba=True)

    def surface_cb(self, surface: SurfaceData) -> None:
        if surface.result.planes is None:
            return
        self._size = (surface.width, surface.height)
        self._publish((surface.result.planes, surface.colorspace))

    def apply(self, frame, cs=None):
        """Filter flavor: transform an interleaved (H,W,4) frame directly."""
        raise NotImplementedError

    def apply_planes(self, planes, cs=None):
        """Planar fast path: (4,H,W) in, (4,H,W) out."""
        raise NotImplementedError

    def render(self) -> Optional[np.ndarray]:
        v = self._read()
        if v is None:
            return None
        planes, cs = v
        out = np.asarray(self.apply_planes(planes, cs=cs))
        return np.moveaxis(out, 0, -1)

    @property
    def width(self) -> int:
        return self._size[0]

    @property
    def height(self) -> int:
        return self._size[1]


class Zebra(_OverlayScope):
    """Luma-threshold stripe overlay with an animated clock
    (reference src/zebra.c:660-666)."""

    def __init__(self, config: Optional[ZebraConfig] = None):
        super().__init__(config or ZebraConfig())
        self.tm = 0.0

    def tick(self, seconds: float = 1.0 / 60.0) -> None:
        self.tm = zebra_tm_advance(self.tm, seconds)

    def apply(self, frame, cs=None):
        cs = calc_colorspace(self.config.colorspace if cs is None else cs)
        return overlay_ops.zebra(
            frame,
            th_low=self.config.th_low,
            th_high=self.config.th_high,
            tm=self.tm,
            cs=int(cs),
        )

    def apply_planes(self, planes, cs=None):
        cs = calc_colorspace(self.config.colorspace if cs is None else cs)
        return overlay_ops.zebra_planes(
            planes,
            th_low=self.config.th_low,
            th_high=self.config.th_high,
            tm=self.tm,
            cs=int(cs),
        )


class FalseColor(_OverlayScope):
    """12-band or LUT luma mapping + optional key legend
    (reference src/zebra.c with is_falsecolor, key at src/zebra.c:385-597)."""

    def __init__(self, config: Optional[FalseColorConfig] = None):
        super().__init__(config or FalseColorConfig())

    def apply(self, frame, cs=None):
        cs = calc_colorspace(self.config.colorspace if cs is None else cs)
        cfg = self.config
        if cfg.use_lut and cfg.lut is not None:
            out = overlay_ops.falsecolor_lut(
                frame, jax.numpy.asarray(cfg.lut), cs=int(cs), lut_n=cfg.lut.shape[0]
            )
        else:
            out = overlay_ops.falsecolor(frame, cs=int(cs))
        if cfg.show_key != ShowKey.NONE:
            h, w = frame.shape[-3], frame.shape[-2]
            out = self._composite_key(np.asarray(out), w, h, cs)
        return out

    def apply_planes(self, planes, cs=None):
        cs = calc_colorspace(self.config.colorspace if cs is None else cs)
        cfg = self.config
        if cfg.use_lut and cfg.lut is not None:
            out = overlay_ops.falsecolor_lut_planes(
                planes, jax.numpy.asarray(cfg.lut), cs=int(cs), lut_n=cfg.lut.shape[0]
            )
        else:
            out = overlay_ops.falsecolor_planes(planes, cs=int(cs))
        if cfg.show_key != ShowKey.NONE:
            h, w = planes.shape[-2], planes.shape[-1]
            inter = self._composite_key(
                np.moveaxis(np.asarray(out), 0, -1), w, h, cs
            )
            return jax.numpy.moveaxis(jax.numpy.asarray(inter), -1, 0)
        return out

    def _composite_key(self, out_hw4: np.ndarray, w: int, h: int, cs):
        """Extend the canvas if needed and blend the key legend
        (reference src/zebra.c:385-597)."""
        cfg = self.config
        ow, oh = key_canvas_size(cfg.show_key, w, h)
        if (oh, ow) != (h, w):
            canvas = np.zeros((oh, ow, 4), dtype=np.uint8)
            canvas[..., 3] = 255
            canvas[:h, :w] = out_hw4
            out_hw4 = canvas
        key = falsecolor_key_overlay(
            cfg.show_key, w, h, cs, lut=cfg.lut if cfg.use_lut else None
        )
        return np.asarray(
            render_ops.blend_overlay(jax.numpy.asarray(out_hw4), key)
        )

    @property
    def width(self) -> int:
        w, h = self._size
        return key_canvas_size(self.config.show_key, w, h)[0]

    @property
    def height(self) -> int:
        w, h = self._size
        return key_canvas_size(self.config.show_key, w, h)[1]


class FocusPeaking(_OverlayScope):
    """4-neighbor edge highlight (reference src/focuspeaking.c)."""

    def __init__(self, config: Optional[FocusPeakingConfig] = None):
        super().__init__(config or FocusPeakingConfig())

    def apply(self, frame, cs=None):
        cfg = self.config
        color_u8 = quantize_unorm8(np.asarray(cfg.peaking_rgba, np.float32))
        return overlay_ops.focus_peaking(
            frame,
            peaking_threshold_fixed(cfg.peaking_threshold),
            jax.numpy.asarray(color_u8),
        )

    def apply_planes(self, planes, cs=None):
        cfg = self.config
        color_u8 = quantize_unorm8(np.asarray(cfg.peaking_rgba, np.float32))
        return overlay_ops.focus_peaking_planes(
            planes,
            peaking_threshold_fixed(cfg.peaking_threshold),
            jax.numpy.asarray(color_u8),
        )
