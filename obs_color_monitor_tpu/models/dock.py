"""Composite "dock" view: all scopes off one shared capture
(reference src/scope-widget.cpp).

The reference dock creates an ROI source plus six scopes all targeting it,
so one capture feeds everything (src/scope-widget.cpp:19-25,542-561); the
draw callback stacks the shown scopes vertically with per-scope aspect
rules (src/scope-widget.cpp:99-175).  Here the Dock owns a CaptureHub with
the six scopes registered, and ``render`` composites their images with the
same layout rules.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import (
    DockConfig,
    FalseColorConfig,
    FocusPeakingConfig,
    HistogramConfig,
    ROIConfig,
    VectorscopeConfig,
    WaveformConfig,
    ZebraConfig,
)
from .base import CaptureHub, Scope
from .histogram import Histogram
from .overlays import FalseColor, FocusPeaking, Zebra
from .vectorscope import Vectorscope
from .waveform import Waveform

# Dock scope order (reference src/scope-widget.cpp:19-25): ROI preview,
# vectorscope, waveform, histogram, zebra, false color, focus peaking.
SCOPE_ORDER = (
    "roi",
    "vectorscope",
    "waveform",
    "histogram",
    "zebra",
    "falsecolor",
    "focuspeaking",
)


class _RoiPreview(Scope):
    """The dock's row 0: the captured frame itself (the ROI source's own
    render, reference src/roi.c:279-315)."""

    def __init__(self, hub: CaptureHub):
        super().__init__(hub.config)
        self._hub = hub

    def needs(self):
        from .base import Needs

        return Needs(rgba=True)

    def surface_cb(self, surface) -> None:
        if surface.result.planes is not None:
            self._size = (surface.width, surface.height)
            self._publish(surface.result.planes)

    def render(self) -> Optional[np.ndarray]:
        v = self._read()
        if v is None:
            return None
        img = np.moveaxis(np.asarray(v), 0, -1).copy()
        # selection shading: 50% black outside the ROI + green rect border
        # (reference draw_roi_range / draw_roi_rect, src/roi.c:207-265)
        h, w = img.shape[:2]
        x0, y0, x1, y1 = self._hub.config.resolve_rect(w, h)
        if (x0, y0, x1, y1) != (0, 0, w, h):
            mask = np.ones((h, w), bool)
            mask[y0:y1, x0:x1] = False
            img[mask, :3] = (img[mask, :3].astype(np.uint16) * 128 // 255).astype(
                np.uint8
            )
            green = (0, 255, 0, 255)
            img[y0 : max(y0 + 1, 1), x0:x1] = green
            img[max(y1 - 1, 0) : y1, x0:x1] = green
            img[y0:y1, x0 : max(x0 + 1, 1)] = green
            img[y0:y1, max(x1 - 1, 0) : x1] = green
        return img

    @property
    def width(self) -> int:
        return getattr(self, "_size", (0, 0))[0]

    @property
    def height(self) -> int:
        return getattr(self, "_size", (0, 0))[1]


class Dock:
    """All six scopes + shared capture + vertical-stack compositor."""

    def __init__(
        self,
        config: Optional[DockConfig] = None,
        roi: Optional[ROIConfig] = None,
        vectorscope: Optional[VectorscopeConfig] = None,
        waveform: Optional[WaveformConfig] = None,
        histogram: Optional[HistogramConfig] = None,
        zebra: Optional[ZebraConfig] = None,
        falsecolor: Optional[FalseColorConfig] = None,
        focuspeaking: Optional[FocusPeakingConfig] = None,
    ):
        self.config = config or DockConfig()
        self.hub = CaptureHub(roi or ROIConfig())
        # scopes share the hub: detach their private hubs and register
        self.vectorscope = Vectorscope(vectorscope)
        self.waveform = Waveform(waveform)
        self.histogram = Histogram(histogram)
        self.zebra = Zebra(zebra)
        self.falsecolor = FalseColor(falsecolor)
        self.focuspeaking = FocusPeaking(focuspeaking)
        self.roi_preview = _RoiPreview(self.hub)
        self.scopes: dict[str, Scope] = {
            "roi": self.roi_preview,
            "vectorscope": self.vectorscope,
            "waveform": self.waveform,
            "histogram": self.histogram,
            "zebra": self.zebra,
            "falsecolor": self.falsecolor,
            "focuspeaking": self.focuspeaking,
        }
        self.hub.consumers = [self.scopes[k] for k in SCOPE_ORDER]
        # per-scope display rects from the last render, for mouse routing
        # (reference src/scope-widget.cpp:146-153,241-428)
        self._rects: dict[str, tuple[int, int, int, int]] = {}
        self.roi_interact = None  # created when the ROI preview is shown

    def shown(self, name: str) -> bool:
        return bool(getattr(self.config, f"show_{name}"))

    def push_frame(self, frame) -> None:
        """One video frame in: tick + shared analyze + fan-out."""
        self.hub.tick()
        self.hub.process(frame)

    def render(
        self, width: Optional[int] = None, height: Optional[int] = None
    ) -> np.ndarray:
        """Composite all shown scopes (reference draw,
        src/scope-widget.cpp:99-175): vertical stack, each scope centered;
        vectorscope forced square; ROI/zebra/falsecolor/focuspeaking keep
        their aspect; waveform/histogram stretch."""
        cx = width or self.config.width
        cy = height or self.config.height
        canvas = np.zeros((cy, cx, 4), dtype=np.uint8)
        canvas[..., 3] = 255

        shown = [n for n in SCOPE_ORDER if self.shown(n)]
        n_src = len(shown)
        self._rects = {}
        y0 = 0
        for k, name in enumerate(shown):
            scope = self.scopes[name]
            img = scope.render()
            h_slot = (cy - y0) // (n_src - k)
            if img is None:
                y0 += h_slot
                continue
            h_src, w_src = img.shape[0], img.shape[1]
            w, h = cx, h_slot
            keep_aspect = name in ("roi", "zebra", "falsecolor") or (
                name == "focuspeaking" and not self.focuspeaking.config.actual_size
            )
            if name == "vectorscope":
                w = h = min(w, h)
            elif keep_aspect and w_src > 0 and h_src > 0:
                if w * h_src > h * w_src:
                    w = h * w_src // h_src
                elif h * w_src > w * h_src:
                    h = w * h_src // w_src
            if (
                name == "focuspeaking"
                and self.focuspeaking.config.actual_size
                and w_src > 0
            ):
                # 1:1 pixel mapping, centered, cropped to the slot
                # (reference set_actual_size_matrix, focuspeaking.c:203-220)
                w, h = min(w, w_src), min(h, h_src)
                cx0 = (w_src - w) // 2
                cy0 = (h_src - h) // 2
                patch = img[cy0 : cy0 + h, cx0 : cx0 + w]
                x0 = (cx - w) // 2
                canvas[y0 : y0 + h, x0 : x0 + w] = patch
                self._rects[name] = (x0, y0, w, h, w_src, h_src)
            elif w > 0 and h > 0:
                sy = (np.arange(h) * h_src) // h
                sx = (np.arange(w) * w_src) // w
                patch = img[sy][:, sx]
                x0 = (cx - w) // 2
                canvas[y0 : y0 + h, x0 : x0 + w] = patch
                # rect + source dims for mouse routing
                self._rects[name] = (x0, y0, w, h, w_src, h_src)
            y0 += h_slot
        return canvas

    def render_device(
        self,
        frame,
        tm: float = 0.0,
        width: Optional[int] = None,
        height: Optional[int] = None,
    ) -> np.ndarray:
        """One-program panel render: the whole dock as a single XLA program
        (dock_step.make_dock_step), rebuilt when configs/shape change.

        Unlike push_frame+render (which fetches each scope separately —
        fine locally, many round trips on remote TPU), this is one device
        call per frame.
        """
        from ..dock_step import make_dock_step
        from ..utils.persistence import dock_save_data

        cx = width or self.config.width
        cy = height or self.config.height
        h, w = frame.shape[-3], frame.shape[-2]
        key = (h, w, cx, cy, repr(sorted(dock_save_data(self).items())))
        if getattr(self, "_device_step_key", None) != key:
            self._device_step = make_dock_step(
                h,
                w,
                cs=self.hub.colorspace,
                scale=self.hub.config.target_scale,
                out_width=cx,
                out_height=cy,
                dock=self.config,
                vectorscope=self.vectorscope.config,
                waveform=self.waveform.config,
                histogram=self.histogram.config,
                zebra=self.zebra.config,
                falsecolor=self.falsecolor.config,
                focuspeaking=self.focuspeaking.config,
            )
            self._device_step_key = key
        out = self._device_step(frame, np.float32(tm))
        return np.asarray(out.panel)

    # -- mouse routing (reference src/scope-widget.cpp:241-428) --------------
    def _hit(self, x: int, y: int):
        """(name, scope-local x, scope-local y) for a canvas position."""
        for name, (x0, y0, w, h, w_src, h_src) in self._rects.items():
            if x0 <= x < x0 + w and y0 <= y < y0 + h:
                sx = (x - x0) * w_src // max(w, 1)
                sy = (y - y0) * h_src // max(h, 1)
                return name, sx, sy
        return None, 0, 0

    def mouse_wheel(self, x: int, y: int, delta_y: int) -> None:
        """Wheel over the vectorscope zooms it (reference routes
        obs_source_send_mouse_wheel; vectorscope.c:473-482)."""
        name, _, _ = self._hit(x, y)
        if name == "vectorscope":
            self.vectorscope.zoom_by(delta_y)

    def _ensure_roi_interact(self):
        if self.roi_interact is None:
            from .roi_interact import InteractiveROI

            w = self.roi_preview.width or 1
            h = self.roi_preview.height or 1
            self.roi_interact = InteractiveROI(width=w, height=h)
        return self.roi_interact

    def mouse_move(self, x: int, y: int) -> None:
        name, sx, sy = self._hit(x, y)
        if name == "roi":
            self._ensure_roi_interact().mouse_move(sx, sy)

    def mouse_down(self, x: int, y: int) -> None:
        name, sx, sy = self._hit(x, y)
        if name == "roi":
            self._ensure_roi_interact().mouse_down(sx, sy)

    def mouse_up(self, x: int, y: int) -> None:
        name, sx, sy = self._hit(x, y)
        if name == "roi":
            r = self._ensure_roi_interact()
            r.mouse_up(sx, sy)
            r.apply_to(self.hub)
