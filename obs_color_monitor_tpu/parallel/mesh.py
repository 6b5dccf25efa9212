"""Multi-chip scaling: batch-DP over frames + spatial sharding of one stream.

The reference is a single-process single-GPU pipeline; its only concurrency
is the staging-thread handoff (SURVEY.md §2 parallelism table).  The
TPU-native scaling story is:

  * **Batch data-parallel** — independent frames sharded on the batch axis
    over a Mesh; zero collectives (per-frame results are tiny and land
    where the frame lives).  This is how multi-stream / offline analysis
    scales over ICI.
  * **Spatial sharding (one giant stream)** — a single frame's rows sharded
    over devices via shard_map; each device computes *partial* integer bin
    counts on its row block and a single ``psum`` over ICI merges them.
    Saturation is applied after the merge, so results are bit-exact vs the
    single-device path (sums commute; u8 clamp does not).

No other collectives are needed: there is no TP/PP to speak of when the
whole per-frame state is <=256x256 bins (SURVEY.md §5 'distributed
communication backend').
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.convert import planarize, rgb_to_yuv_planes
from ..ops.stats import (
    histogram_counts,
    vectorscope_counts_i32,
    waveform_counts_i32,
)

BATCH_AXIS = "batch"
SPATIAL_AXIS = "rows"


def make_mesh(n_devices: Optional[int] = None, axis: str = BATCH_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(frames: jax.Array, mesh: Mesh) -> jax.Array:
    """Place (B, H, W, 4) frames with the batch axis sharded over the mesh."""
    return jax.device_put(frames, NamedSharding(mesh, P(BATCH_AXIS)))


def batch_analyze(frames: jax.Array, mesh: Mesh, cs: int):
    """Pure batch-DP: vmap the fused stats over sharded frames.

    Returns (vs_counts (B,256,256) u8, hist (B,3,256) u32,
    waveform (B,3,256,W) u8) with outputs sharded like the inputs.
    """
    from ..ops.stats import vectorscope_counts, waveform_counts

    @functools.partial(jax.jit, static_argnames=("cs_",))
    def run(f, cs_):
        def one(frame):
            planes = planarize(frame)
            yuv = rgb_to_yuv_planes(planes, cs=cs_)
            mask = planes[3] != 0
            return (
                vectorscope_counts(yuv),
                histogram_counts(planes[:3], mask),
                waveform_counts(planes[:3], mask),
            )

        return jax.vmap(one)(f)

    with jax.set_mesh(mesh):
        return run(shard_batch(frames, mesh), cs_=cs)


def spatial_analyze(frame: jax.Array, mesh: Mesh, cs: int):
    """One frame, rows sharded over the mesh; partial bins psum-merged.

    frame: (H, W, 4) u8 with H divisible by the mesh size.  Returns
    (vs u8 (256,256), hist u32 (3,256), waveform u8 (3,256,W)) replicated.
    """
    (axis,) = mesh.axis_names
    n = mesh.devices.size
    h = frame.shape[0]
    if h % n:
        raise ValueError(f"height {h} not divisible by mesh size {n}")

    def shard_fn(f):
        # f: (H/n, W, 4) — this device's row block
        planes = planarize(f)
        yuv = rgb_to_yuv_planes(planes, cs=cs)
        mask = planes[3] != 0
        vs = vectorscope_counts_i32(yuv)
        hi = histogram_counts(planes[:3], mask).astype(jnp.int32)
        wv = waveform_counts_i32(planes[:3], mask)
        # merge partial integer counts over ICI, THEN saturate
        vs = jax.lax.psum(vs, axis)
        hi = jax.lax.psum(hi, axis)
        wv = jax.lax.psum(wv, axis)
        return (
            jnp.minimum(vs, 255).astype(jnp.uint8),
            hi.astype(jnp.uint32),
            jnp.minimum(wv, 255).astype(jnp.uint8),
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(), P(), P()),
        # the scan carries inside the stat kernels start as unvarying zeros;
        # skip the varying-manual-axes check rather than threading pvary
        # through backend-shared code
        check_vma=False,
    )
    return jax.jit(fn)(frame)
