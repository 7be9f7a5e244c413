from elvis_tpu.parallel.halo import spatial_tile_map, temporal_map_overlap
from elvis_tpu.parallel.mesh import (
    frame_sharding,
    make_mesh,
    resolve_devices,
    shard_frames,
)

__all__ = [
    "frame_sharding",
    "make_mesh",
    "resolve_devices",
    "shard_frames",
    "spatial_tile_map",
    "temporal_map_overlap",
]
