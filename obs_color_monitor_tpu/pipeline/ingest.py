"""Frame sources: synthetic patterns, raw RGBA files, NV12 streams.

The reference captures frames from the OBS render graph (reference
src/common.c:141-168); a standalone framework needs its own ingest.  Frame
sources produce (H, W, 4) uint8 RGBA host frames; decoding/unpacking runs
in the native C++ runtime when available.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from ..runtime import native


class FrameSource:
    """Iterable of (H, W, 4) uint8 frames."""

    width: int
    height: int

    def frames(self, n: Optional[int] = None) -> Iterator[np.ndarray]:
        raise NotImplementedError


class PatternSource(FrameSource):
    """Synthetic generator: 'bars' | 'ramp' | 'zoneplate' (native C++)."""

    def __init__(self, width: int, height: int, kind: str = "bars"):
        self.width, self.height, self.kind = width, height, kind

    def frames(self, n: Optional[int] = None) -> Iterator[np.ndarray]:
        i = 0
        while n is None or i < n:
            yield native.pattern(self.kind, self.width, self.height, i)
            i += 1


class RawRGBASource(FrameSource):
    """Raw .rgba file: concatenated H*W*4 frames."""

    def __init__(self, path: str, width: int, height: int):
        self.path, self.width, self.height = path, width, height
        self.frame_bytes = width * height * 4
        self.n_frames = os.path.getsize(path) // self.frame_bytes

    def frames(self, n: Optional[int] = None) -> Iterator[np.ndarray]:
        count = self.n_frames if n is None else min(n, self.n_frames)
        with open(self.path, "rb") as f:
            for _ in range(count):
                buf = f.read(self.frame_bytes)
                if len(buf) < self.frame_bytes:
                    return
                yield np.frombuffer(buf, np.uint8).reshape(
                    self.height, self.width, 4
                )


class Y4MSource(FrameSource):
    """YUV4MPEG2 (.y4m) reader, C420 subsampling.

    The standard raw-video interchange format (ffmpeg: ``-f yuv4mpegpipe``).
    I420 planes are interleaved to NV12 and converted through the same
    limited-range fixed-point kernel.
    """

    def __init__(self, path: str, cs: int = 2):
        self.path, self.cs = path, cs
        with open(path, "rb") as f:
            header = f.readline().decode("ascii", "replace")
        if not header.startswith("YUV4MPEG2"):
            raise ValueError(f"{path}: not a YUV4MPEG2 stream")
        self.width = self.height = 0
        for tok in header.split()[1:]:
            if tok.startswith("W"):
                self.width = int(tok[1:])
            elif tok.startswith("H"):
                self.height = int(tok[1:])
            elif tok.startswith("C") and not tok.startswith("C420"):
                raise ValueError(f"{path}: only C420 supported, got {tok}")
        if not self.width or not self.height:
            raise ValueError(f"{path}: missing W/H in header")
        self._header_len = len(header.encode())

    def frames(self, n: Optional[int] = None) -> Iterator[np.ndarray]:
        w, h = self.width, self.height
        ysz, csz = w * h, (w // 2) * (h // 2)
        count = 0
        with open(self.path, "rb") as f:
            f.seek(self._header_len)
            while n is None or count < n:
                marker = f.readline()
                if not marker.startswith(b"FRAME"):
                    return
                buf = f.read(ysz + 2 * csz)
                if len(buf) < ysz + 2 * csz:
                    return
                y = np.frombuffer(buf[:ysz], np.uint8).reshape(h, w)
                u = np.frombuffer(buf[ysz : ysz + csz], np.uint8).reshape(
                    h // 2, w // 2
                )
                v = np.frombuffer(buf[ysz + csz :], np.uint8).reshape(
                    h // 2, w // 2
                )
                uv = np.empty((h // 2, w), np.uint8)
                uv[:, 0::2] = u
                uv[:, 1::2] = v
                yield native.nv12_to_rgba(y, uv, cs=self.cs)
                count += 1


class NV12Source(FrameSource):
    """Raw NV12 stream (Y plane + interleaved CbCr at half vertical res).

    Converted to RGBA through the native runtime's limited-range
    BT.601/709 fixed-point kernel (csrc/ocm_runtime.cpp).
    """

    def __init__(self, path: str, width: int, height: int, cs: int = 2):
        self.path, self.width, self.height, self.cs = path, width, height, cs
        self.frame_bytes = width * height * 3 // 2
        self.n_frames = os.path.getsize(path) // self.frame_bytes

    def frames(self, n: Optional[int] = None) -> Iterator[np.ndarray]:
        count = self.n_frames if n is None else min(n, self.n_frames)
        ysz = self.width * self.height
        with open(self.path, "rb") as f:
            for _ in range(count):
                buf = f.read(self.frame_bytes)
                if len(buf) < self.frame_bytes:
                    return
                y = np.frombuffer(buf[:ysz], np.uint8).reshape(
                    self.height, self.width
                )
                uv = np.frombuffer(buf[ysz:], np.uint8).reshape(
                    self.height // 2, self.width
                )
                yield native.nv12_to_rgba(y, uv, cs=self.cs)
