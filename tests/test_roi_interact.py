"""Interactive ROI state machine (reference src/roi.c:343-521 semantics)."""

import numpy as np

from obs_color_monitor_tpu.models.roi_interact import (
    DRAG_FIRST,
    DRAG_MOVE,
    DRAG_RESIZE,
    DRAW_ROI_RECT,
    HANDLE_LI,
    HANDLE_LO,
    InteractiveROI,
)


def test_first_drag_creates_rect():
    roi = InteractiveROI(width=192, height=108)
    assert roi.rect() == (0, 0, 192, 108)  # unset -> full frame
    roi.mouse_move(20, 10)
    roi.mouse_down(20, 10)
    assert roi.flags & DRAG_FIRST
    roi.mouse_move(80, 60)
    assert roi.sizing_rect() == (20, 10, 80, 60)
    roi.mouse_up(80, 60)
    assert roi.rect() == (20, 10, 80, 60)


def test_degenerate_drag_resets():
    """Zero-area drag clears the ROI (reference roi_mouse_drag_wo_roi_end,
    roi.c:423-431)."""
    roi = InteractiveROI(width=192, height=108)
    roi.mouse_move(20, 10)
    roi.mouse_down(20, 10)
    roi.mouse_up(20, 50)  # same x -> not ok
    assert (roi.x0in, roi.y0in, roi.x1in, roi.y1in) == (-1, -1, -1, -1)
    assert roi.rect() == (0, 0, 192, 108)


def test_move_drag():
    roi = InteractiveROI(width=192, height=108, x0in=50, y0in=40, x1in=150, y1in=100)
    # interior, away from handles: large rect -> inside handles at edges
    roi.mouse_move(100, 70)
    assert roi.flags & DRAW_ROI_RECT
    assert not roi.flags & (HANDLE_LO | HANDLE_LI)
    roi.mouse_down(100, 70)
    assert roi.flags & DRAG_MOVE
    roi.mouse_move(110, 75)  # move applies incrementally
    assert (roi.x0in, roi.x1in) == (60, 160)
    roi.mouse_up(110, 75)
    assert roi.rect() == (60, 45, 160, 105)


def test_resize_left_edge():
    roi = InteractiveROI(width=192, height=108, x0in=50, y0in=20, x1in=150, y1in=100)
    # big rect -> inner handles; handle size = 108//12 = 9
    roi.mouse_move(52, 60)  # within x0..x0+9, inside y range
    assert roi.flags & HANDLE_LI
    roi.mouse_down(52, 60)
    assert roi.flags & DRAG_RESIZE
    roi.mouse_move(30, 60)
    assert roi.sizing_rect() == (28, 20, 150, 100)
    roi.mouse_up(30, 60)
    assert roi.rect() == (28, 20, 150, 100)


def test_resize_crossing_swaps():
    """Dragging an edge past the opposite one swaps (roi.c:444-448)."""
    roi = InteractiveROI(width=192, height=108, x0in=50, y0in=20, x1in=150, y1in=100)
    roi.mouse_move(52, 60)
    roi.mouse_down(52, 60)
    roi.mouse_up(170, 60)  # left edge dragged past right
    x0, _, x1, _ = roi.rect()
    assert x0 < x1 and (x0, x1) == (150, 168)


def test_small_rect_uses_outside_handles():
    roi = InteractiveROI(width=192, height=108, x0in=60, y0in=50, x1in=80, y1in=70)
    # 20px rect <= min(192,108)//3 -> outside handles
    roi.mouse_move(55, 60)  # just left of x0, within x0-hh
    assert roi.flags & HANDLE_LO


def test_mouse_leave_clears():
    roi = InteractiveROI(width=192, height=108, x0in=50, y0in=20, x1in=150, y1in=100)
    roi.mouse_move(100, 60)
    assert roi.flags
    roi.mouse_move(0, 0, leave=True)
    assert roi.flags == 0


def test_apply_to_hub():
    from obs_color_monitor_tpu.config import ROIConfig
    from obs_color_monitor_tpu.models import CaptureHub

    hub = CaptureHub(ROIConfig(target_scale=1))
    roi = InteractiveROI(width=128, height=96)
    roi.mouse_move(10, 10)
    roi.mouse_down(10, 10)
    roi.mouse_up(70, 50)
    roi.apply_to(hub)
    assert hub.config.resolve_rect(128, 96) == (10, 10, 70, 50)
