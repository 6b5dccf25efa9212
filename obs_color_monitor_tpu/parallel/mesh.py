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

from ..ops import pallas_stats
from ..ops.convert import planarize, rgb_to_yuv_planes
from ..ops.fused import default_backend
from ..ops.stats import vectorscope_counts_i32, waveform_counts_i32

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


def batch_analyze(frames: jax.Array, mesh: Mesh, cs: int, backend: str | None = None):
    """Pure batch-DP: vmap the fused stats over sharded frames.

    Returns (vs_counts (B,256,256) u8, hist (B,3,256) u32,
    waveform (B,3,256,W) u8) with outputs sharded like the inputs.
    backend None = auto (Pallas kernels on TPU, XLA elsewhere).
    """

    @functools.partial(jax.jit, static_argnames=("cs_", "backend_"))
    def run(f, cs_, backend_):
        def one(frame):
            planes = planarize(frame)
            yuv = rgb_to_yuv_planes(planes, cs=cs_)
            mask = planes[3] != 0
            vs, wv = _stats_i32(planes, yuv, mask, backend_)
            return (
                jnp.minimum(vs, 255).astype(jnp.uint8),
                wv.sum(axis=-1).astype(jnp.uint32),
                jnp.minimum(wv, 255).astype(jnp.uint8),
            )

        return jax.vmap(one)(f)

    with jax.set_mesh(mesh):
        return run(shard_batch(frames, mesh), cs_=cs, backend_=backend or default_backend())


def _stats_i32(planes, yuv, mask, backend: str):
    """Unsaturated (vs (256,256), wv (3,256,W)) int32 via the selected
    backend — on real TPU the Mosaic kernels run inside shard_map/vmap too,
    so the sharded paths get the same speed-of-light formulation as the
    single-chip step."""
    if backend == "pallas":
        return pallas_stats.fused_vs_wv_pallas_i32(planes[:3], yuv, mask)
    return vectorscope_counts_i32(yuv), waveform_counts_i32(planes[:3], mask)


def spatial_analyze(frame: jax.Array, mesh: Mesh, cs: int, backend: str | None = None):
    """One frame, rows sharded over the mesh; partial bins psum-merged.

    frame: (H, W, 4) u8 with H divisible by the mesh size.  Returns
    (vs u8 (256,256), hist u32 (3,256), waveform u8 (3,256,W)) replicated.
    The histogram is the column sum of the merged waveform (identical
    counting semantics, reference src/histogram.c:357-395).
    """
    (axis,) = mesh.axis_names
    n = mesh.devices.size
    h = frame.shape[0]
    if h % n:
        raise ValueError(f"height {h} not divisible by mesh size {n}")
    backend = backend or default_backend()

    def shard_fn(f):
        # f: (H/n, W, 4) — this device's row block
        planes = planarize(f)
        yuv = rgb_to_yuv_planes(planes, cs=cs)
        mask = planes[3] != 0
        vs, wv = _stats_i32(planes, yuv, mask, backend)
        # merge partial integer counts over ICI, THEN saturate
        vs = jax.lax.psum(vs, axis)
        wv = jax.lax.psum(wv, axis)
        return (
            jnp.minimum(vs, 255).astype(jnp.uint8),
            wv.sum(axis=-1).astype(jnp.uint32),
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
