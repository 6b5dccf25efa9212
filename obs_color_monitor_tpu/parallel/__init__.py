"""Device-mesh scaling: batch DP + spatial sharding with psum bin merges."""

from .mesh import (
    BATCH_AXIS,
    SPATIAL_AXIS,
    batch_analyze,
    make_mesh,
    shard_batch,
    spatial_analyze,
    spatial_pipeline,
)

__all__ = [
    "BATCH_AXIS",
    "SPATIAL_AXIS",
    "batch_analyze",
    "make_mesh",
    "shard_batch",
    "spatial_analyze",
    "spatial_pipeline",
]
