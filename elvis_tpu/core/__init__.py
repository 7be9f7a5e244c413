from elvis_tpu.core.blocks import (
    block_grid_shape,
    combine_blocks,
    split_into_blocks,
)
from elvis_tpu.core.types import FrameBatch, VideoMeta

__all__ = [
    "FrameBatch",
    "VideoMeta",
    "block_grid_shape",
    "combine_blocks",
    "split_into_blocks",
]
