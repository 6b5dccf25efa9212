"""Capture-target directory semantics (reference src/common.c:456-543)."""

import numpy as np

from obs_color_monitor_tpu.config import HistogramConfig, ROIConfig
from obs_color_monitor_tpu.models import CaptureHub, Histogram
from obs_color_monitor_tpu.pipeline.targets import (
    PROGRAM,
    TargetDirectory,
    TargetedPipeline,
)


def _mk(rng):
    f = rng.integers(0, 256, (24, 32, 4), dtype=np.uint8)
    f[..., 3] = 255
    return f


def test_program_channel_always_exists():
    d = TargetDirectory()
    assert d.get(PROGRAM) is not None
    assert d.names()[0] == PROGRAM


def test_targeted_pipeline_by_name(rng):
    d = TargetDirectory()
    cam = d.create("camera 1")
    his = Histogram(HistogramConfig(target_scale=1))
    hub = CaptureHub(ROIConfig(target_scale=1, interleave=0))
    hub.register(his)
    tp = TargetedPipeline(hub, d, "camera 1")

    assert tp.tick() is False  # no frame yet
    cam.push(_mk(rng))
    assert tp.tick() is True
    assert tp.tick() is False  # same frame not reprocessed
    cam.push(_mk(rng))
    assert tp.tick() is True


def test_dangling_target_idles_then_recovers(rng):
    """Removed source -> no error, no frames; reappearing -> resumes
    (reference weak-ref recheck, src/common.c:498-526)."""
    d = TargetDirectory()
    cam = d.create("cam")
    hub = CaptureHub(ROIConfig(target_scale=1, interleave=0))
    his = Histogram(HistogramConfig(target_scale=1))
    hub.register(his)
    tp = TargetedPipeline(hub, d, "cam")
    cam.push(_mk(rng))
    assert tp.tick() is True

    d.remove("cam")
    assert tp.tick() is False  # dangling: idle
    cam2 = d.create("cam")  # same name reappears
    cam2.push(_mk(rng))
    assert tp.tick() is True


def test_retarget(rng):
    d = TargetDirectory()
    a, b = d.create("a"), d.create("b")
    hub = CaptureHub(ROIConfig(target_scale=1, interleave=0))
    hub.register(Histogram(HistogramConfig(target_scale=1)))
    tp = TargetedPipeline(hub, d, "a")
    a.push(_mk(rng))
    b.push(_mk(rng))
    assert tp.tick() is True
    tp.set_target("b")
    assert tp.tick() is True  # picks up b's frame

    assert d.names() == ["", "a", "b"]


def test_program_push(rng):
    d = TargetDirectory()
    hub = CaptureHub(ROIConfig(target_scale=1, interleave=0))
    hub.register(Histogram(HistogramConfig(target_scale=1)))
    tp = TargetedPipeline(hub, d)  # default: program
    d.program.push(_mk(rng))
    assert tp.tick() is True
