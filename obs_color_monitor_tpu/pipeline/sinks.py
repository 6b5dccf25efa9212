"""Video output sinks: record rendered scope panels to a video stream.

The reference's output surface is the live Qt dock inside OBS — and OBS
itself records/streams whatever it displays.  The standalone analogs here
are (a) the MJPEG live server (`pipeline.live`) and (b) these file sinks,
which close the ingest loop: `pipeline.ingest` reads y4m/raw/ffmpeg
streams in, these write the composited panel (or any RGBA frame sequence)
back out.

`Y4MSink` is self-contained (no external binaries): YUV4MPEG2 C444 with
the standard limited-range BT.601/709 forward matrices in the same 12-bit
fixed point as the native decoder (csrc/ocm_runtime.cpp
`ocm_nv12_to_rgba`), so a write→read round trip through `Y4MSource`
reproduces the input to within quantization.  C444 keeps the sink
spatially lossless.  `FFmpegSink` encodes to any container the system
ffmpeg supports (gated on the binary, mirroring `ingest.FFmpegSource`).
"""

from __future__ import annotations

from fractions import Fraction
from typing import Optional, TextIO

import numpy as np

# Forward limited-range RGB -> Y'CbCr, round(c * 4096) of the standard
# matrices (Y rows scaled by 219/255, chroma rows by 224/255).  Each
# chroma row sums to exactly 0, so gray maps to Cb=Cr=128 exactly; the Y
# row sums to 3518 = round(219/255 * 4096), the inverse of the decoder's
# ky=4769 (csrc/ocm_runtime.cpp:147).
_FWD = {
    # cs=1: BT.601 (Kr=0.299, Kb=0.114)
    1: (
        (1052, 2065, 401),  # Y  (+16)
        (-607, -1192, 1799),  # Cb (+128)
        (1799, -1506, -293),  # Cr (+128)
    ),
    # cs=2: BT.709 (Kr=0.2126, Kb=0.0722)
    2: (
        (748, 2516, 254),
        (-412, -1387, 1799),
        (1799, -1634, -165),
    ),
}


def rgb_to_yuv_limited(rgba: np.ndarray, cs: int = 2):
    """(H, W, 3|4) uint8 -> (Y, U, V) uint8 planes, limited range.

    12-bit fixed point with round-half-up (`+2048 >> 12`), matching the
    native decoder's arithmetic style; output is clipped to the studio
    ranges [16, 235] / [16, 240] so any encoder downstream sees legal
    levels.
    """
    if cs not in _FWD:
        raise ValueError(f"cs must be 1 (BT.601) or 2 (BT.709), got {cs}")
    ky, kcb, kcr = _FWD[cs]
    rgb = rgba[..., :3].astype(np.int32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]

    def mix(k, bias, lo, hi):
        v = ((k[0] * r + k[1] * g + k[2] * b + 2048) >> 12) + bias
        return np.clip(v, lo, hi).astype(np.uint8)

    return (
        mix(ky, 16, 16, 235),
        mix(kcb, 128, 16, 240),
        mix(kcr, 128, 16, 240),
    )


class VideoSink:
    """Writable sequence of (H, W, 3|4) uint8 RGBA frames."""

    width: int
    height: int
    n_written: int = 0

    def write(self, frame: np.ndarray) -> None:
        raise NotImplementedError

    def close(self) -> None:
        raise NotImplementedError

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def _check(self, frame: np.ndarray) -> np.ndarray:
        frame = np.asarray(frame)
        if frame.dtype != np.uint8 or frame.ndim != 3 or frame.shape[2] not in (3, 4):
            raise ValueError(
                f"expected (H, W, 3|4) uint8 frame, got {frame.dtype} {frame.shape}"
            )
        if frame.shape[:2] != (self.height, self.width):
            raise ValueError(
                f"frame is {frame.shape[1]}x{frame.shape[0]}, sink is "
                f"{self.width}x{self.height}"
            )
        return frame


class Y4MSink(VideoSink):
    """YUV4MPEG2 writer, C444 limited-range (no external dependencies).

    The written stream reads back through `ingest.Y4MSource` (which
    accepts C444) and plays in ffmpeg/mpv/VLC directly.
    """

    def __init__(self, path: str, width: int, height: int,
                 fps: float = 30.0, cs: int = 2):
        if width <= 0 or height <= 0:
            raise ValueError(f"bad geometry {width}x{height}")
        if cs not in _FWD:
            raise ValueError(f"cs must be 1 (BT.601) or 2 (BT.709), got {cs}")
        self.path, self.width, self.height, self.cs = path, width, height, cs
        frac = Fraction(fps).limit_denominator(65536)
        if frac <= 0:
            raise ValueError(f"bad fps {fps}")
        self._f = open(path, "wb")
        self._f.write(
            f"YUV4MPEG2 W{width} H{height} F{frac.numerator}:"
            f"{frac.denominator} Ip A1:1 C444\n".encode("ascii")
        )
        self.n_written = 0

    def write(self, frame: np.ndarray) -> None:
        frame = self._check(frame)
        y, u, v = rgb_to_yuv_limited(frame, cs=self.cs)
        self._f.write(b"FRAME\n")
        self._f.write(y.tobytes())
        self._f.write(u.tobytes())
        self._f.write(v.tobytes())
        self.n_written += 1

    def close(self) -> None:
        if not self._f.closed:
            self._f.close()


class FFmpegSink(VideoSink):
    """Encode to any container/codec via the system ffmpeg (mp4, mkv,
    webm, ...), raw RGBA piped over stdin.

    GATED on the binary being present — nothing is vendored or linked
    (same policy as `ingest.FFmpegSource`).  Extra encoder args (codec,
    crf, ...) pass through `extra_args`.
    """

    def __init__(self, path: str, width: int, height: int,
                 fps: float = 30.0, ffmpeg: str = "ffmpeg",
                 extra_args: Optional[list] = None):
        import shutil
        import subprocess

        if shutil.which(ffmpeg) is None:
            raise RuntimeError(
                f"{ffmpeg!r} not found on PATH — FFmpegSink needs a system "
                f"ffmpeg (write .y4m via Y4MSink instead)"
            )
        if width <= 0 or height <= 0:
            raise ValueError(f"bad geometry {width}x{height}")
        self.path, self.width, self.height = path, width, height
        cmd = [
            ffmpeg, "-v", "error", "-y",
            "-f", "rawvideo", "-pix_fmt", "rgba",
            "-s", f"{width}x{height}", "-r", f"{fps:g}",
            "-i", "pipe:0",
        ] + (extra_args or []) + [path]
        self._proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)
        self.n_written = 0

    def write(self, frame: np.ndarray) -> None:
        frame = self._check(frame)
        if frame.shape[2] == 3:  # encoder pipe expects rgba
            frame = np.dstack(
                [frame, np.full(frame.shape[:2], 255, np.uint8)]
            )
        self._proc.stdin.write(frame.tobytes())
        self.n_written += 1

    def close(self) -> None:
        if self._proc.stdin and not self._proc.stdin.closed:
            self._proc.stdin.close()
        rc = self._proc.wait()
        if rc != 0:
            raise RuntimeError(f"ffmpeg exited with status {rc}")


def open_video_sink(path: str, width: int, height: int,
                    fps: float = 30.0, cs: int = 2) -> VideoSink:
    """Dispatch on extension: ``.y4m`` is written natively, anything else
    encodes through the system ffmpeg."""
    if path.endswith(".y4m"):
        return Y4MSink(path, width, height, fps=fps, cs=cs)
    return FFmpegSink(path, width, height, fps=fps)
