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

import zlib
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

    def render_leaves(self):
        v = self._read()
        return None if v is None else (v[0],)  # published planes

    def render_traced(self, planes):
        # The raw-texture pixels come from the hub, but the overlay's draw
        # technique is selected by the SCOPE's own colorspace property even
        # when ROI-fed (reference zbs_render uses src->cm.colorspace,
        # src/zebra.c:620; only the stats scopes inherit the surface's
        # colorspace, src/vectorscope.c:262).
        from ..ops.convert import planes_to_rgba

        return planes_to_rgba(self.apply_planes(planes, cs=None))

    def render_image(self):
        lv = self.render_leaves()
        return None if lv is None else self.render_traced(*lv)

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

    def render_leaves(self):
        v = self._read()
        if v is None:
            return None
        # the stripe clock is a LEAF (changes every tick): a closure capture
        # would retrace the dock's fused render program per frame
        return (v[0], np.float32(self.tm))

    def render_traced(self, planes, tm):
        from ..ops.convert import planes_to_rgba

        cs = calc_colorspace(self.config.colorspace)
        return planes_to_rgba(
            overlay_ops.zebra_planes(
                planes,
                th_low=self.config.th_low,
                th_high=self.config.th_high,
                tm=tm,
                cs=int(cs),
            )
        )

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

    _rtk_cache = None  # (config generation, key): crc'ing the LUT per
    # streamed frame is host work the 1-core box can't spare

    def render_trace_key(self):
        from ..config import config_key

        gen = self.config.__dict__.get("_gen")
        c = self._rtk_cache
        if c is not None and gen is not None and c[0] == gen:
            return c[1]
        lut = self.config.lut
        fp = None if lut is None else self._lut_fingerprint(lut)
        key = (config_key(self.config, skip=("lut",)), fp)
        if gen is not None:
            self._rtk_cache = (gen, key)
        return key

    def apply(self, frame, cs=None):
        cs = calc_colorspace(self.config.colorspace if cs is None else cs)
        cfg = self.config
        if cfg.use_lut and cfg.lut is not None:
            out = overlay_ops.falsecolor_lut(
                frame, self._device_lut(), cs=int(cs), lut_n=cfg.lut.shape[0]
            )
        else:
            out = overlay_ops.falsecolor(frame, cs=int(cs))
        if cfg.show_key != ShowKey.NONE:
            h, w = frame.shape[-3], frame.shape[-2]
            key, (oh, ow) = self._key_const(w, h, cs, planar=False)
            if (oh, ow) != (h, w):
                canvas = jax.numpy.zeros((oh, ow, 4), jax.numpy.uint8)
                canvas = canvas.at[..., 3].set(255)
                out = canvas.at[:h, :w].set(out)
            out = render_ops.blend_overlay(out, key)
        return out

    def apply_planes(self, planes, cs=None):
        cs = calc_colorspace(self.config.colorspace if cs is None else cs)
        cfg = self.config
        if cfg.use_lut and cfg.lut is not None:
            out = overlay_ops.falsecolor_lut_planes(
                planes, self._device_lut(), cs=int(cs), lut_n=cfg.lut.shape[0]
            )
        else:
            out = overlay_ops.falsecolor_planes(planes, cs=int(cs))
        if cfg.show_key != ShowKey.NONE:
            h, w = planes.shape[-2], planes.shape[-1]
            key, (oh, ow) = self._key_const(w, h, cs, planar=True)
            if (oh, ow) != (h, w):
                canvas = jax.numpy.zeros((4, oh, ow), jax.numpy.uint8)
                canvas = canvas.at[3].set(255)
                out = canvas.at[:, :h, :w].set(out)
            out = render_ops.blend_overlay_planes(out, key)
        return out

    # key overlays and the LUT are constant per (placement, size, cs, lut
    # CONTENT): precomputed once on the host and cached as device constants
    # so streamed frames never pay a host round trip (the legend drawing is
    # the golden rasterizer port of reference src/zebra.c:385-597).  Cache
    # keys use a content fingerprint of the LUT, not id() — an in-place
    # mutation or an id-reused replacement array must invalidate — and the
    # key cache is bounded (one frame-sized constant per size seen).
    _key_cache: dict | None = None
    _KEY_CACHE_MAX = 8
    _lut_cache: tuple | None = None  # (fingerprint, device array)

    @staticmethod
    def _lut_fingerprint(lut) -> tuple:
        a = np.asarray(lut)
        return (a.shape, a.dtype.str, zlib.crc32(a.tobytes()))

    def _device_lut(self):
        fp = self._lut_fingerprint(self.config.lut)
        if self._lut_cache is None or self._lut_cache[0] != fp:
            self._lut_cache = (fp, jax.device_put(np.asarray(self.config.lut)))
        return self._lut_cache[1]

    def _key_const(self, w: int, h: int, cs, planar: bool):
        cfg = self.config
        lut = cfg.lut if cfg.use_lut else None
        lut_fp = None if lut is None else self._lut_fingerprint(lut)
        key_id = (int(cfg.show_key), w, h, int(cs), planar, lut_fp)
        if self._key_cache is None:
            self._key_cache = {}
        hit = self._key_cache.get(key_id)
        if hit is None:
            overlay = falsecolor_key_overlay(cfg.show_key, w, h, cs, lut=lut)
            if planar:
                overlay = np.moveaxis(overlay, -1, 0)
            hit = (
                jax.device_put(np.ascontiguousarray(overlay)),
                key_canvas_size(cfg.show_key, w, h)[::-1],
            )
            while len(self._key_cache) >= self._KEY_CACHE_MAX:
                self._key_cache.pop(next(iter(self._key_cache)))
            self._key_cache[key_id] = hit
        return hit

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

    def _peaking_color(self):
        cfg = self.config
        return self._device_const(
            ("peak_color", tuple(cfg.peaking_rgba)),
            lambda: quantize_unorm8(np.asarray(cfg.peaking_rgba, np.float32)),
        )

    def apply(self, frame, cs=None):
        return overlay_ops.focus_peaking(
            frame,
            peaking_threshold_fixed(self.config.peaking_threshold),
            self._peaking_color(),
        )

    def apply_planes(self, planes, cs=None):
        return overlay_ops.focus_peaking_planes(
            planes,
            peaking_threshold_fixed(self.config.peaking_threshold),
            self._peaking_color(),
        )
