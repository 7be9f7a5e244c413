"""Per-block Lanczos restore — the no-model benchmark restorer.

Parity: reference elvis.py:2773-2820 ``restore_downsample_opencv_lanczos``:
per degraded block, re-simulate the area downscale to ``b/2^level`` then
upscale back with Lanczos-4. One per-block matrix transform (gathered
``Up_lanczos @ Down_area`` operators), same fused formulation as the
degradation ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.kernels.block_transform import apply_block_matrix_fast, resample_matrix_table
from elvis_tpu.restore.registry import register_restorer

__all__ = ["restore_downsample_lanczos", "restore_downsample_scale_lanczos"]


@register_restorer("downsample", "lanczos")
def restore_downsample_lanczos(
    frames: jnp.ndarray, level_maps: jnp.ndarray, block_size: int
) -> jnp.ndarray:
    """frames ``(N,H,W,C)`` degraded, level_maps ``(N,By,Bx)`` int ->
    restored frames."""
    blocks = split_into_blocks(frames, block_size)
    table = resample_matrix_table(block_size, "lanczos4")
    out_blocks = apply_block_matrix_fast(blocks, table, level_maps)
    out = combine_blocks(out_blocks)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)


@register_restorer("downsample_scale", "lanczos")
def restore_downsample_scale_lanczos(
    frames: jnp.ndarray,
    scale_maps: jnp.ndarray,
    block_size: int,
    max_scale: int = 4,
) -> jnp.ndarray:
    """Scale-factor-variant counterpart (reference utils.py:1253-1314):
    per degraded block, re-simulate the area downscale to
    ``b/scale`` (arbitrary integer scale, not powers of 2) then
    Lanczos-upscale back. Mirrors ``degrade.adaptive_downsample_scale``'s
    operator-table indexing (0 and 1 = identity)."""
    import numpy as np

    from elvis_tpu.ops.resize import resize_matrix

    b = block_size
    ops = [np.eye(b), np.eye(b)]
    for s in range(2, max_scale + 1):
        small = max(1, b // s)
        ops.append(
            resize_matrix(b, small, "lanczos4") @ resize_matrix(small, b, "area")
        )
    table = np.stack(ops, axis=0)
    blocks = split_into_blocks(frames, b)
    out_blocks = apply_block_matrix_fast(blocks, table, scale_maps)
    out = combine_blocks(out_blocks)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)
