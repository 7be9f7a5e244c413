from elvis_tpu.core.blocks import (
    block_grid_shape,
    combine_blocks,
    split_into_blocks,
)

__all__ = [
    "block_grid_shape",
    "combine_blocks",
    "split_into_blocks",
]
