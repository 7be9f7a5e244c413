"""Per-block Lanczos restore — the no-model benchmark restorer.

Parity: reference elvis.py:2773-2820 ``restore_downsample_opencv_lanczos``:
per degraded block, re-simulate the area downscale to ``b/2^level`` then
upscale back with Lanczos-4. Same level-stack + one-hot select formulation
as the degradation ops: all levels computed batched, per-block gather.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.degrade.adaptive import _select_level
from elvis_tpu.ops.resize import resize
from elvis_tpu.restore.registry import register_restorer

__all__ = ["restore_downsample_lanczos"]


@register_restorer("downsample", "lanczos")
def restore_downsample_lanczos(
    frames: jnp.ndarray, level_maps: jnp.ndarray, block_size: int
) -> jnp.ndarray:
    """frames ``(N,H,W,C)`` degraded, level_maps ``(N,By,Bx)`` int ->
    restored frames."""
    blocks = split_into_blocks(frames, block_size)
    n, by, bx, b, _, c = blocks.shape
    flat = blocks.reshape(n * by * bx, b, b, c).astype(jnp.float32)

    max_level = int(math.log2(block_size))
    stack = [blocks.astype(jnp.float32)]
    for lvl in range(1, max_level + 1):
        small = max(1, b // (2**lvl))
        down = resize(flat, (small, small), method="area")
        up = resize(down, (b, b), method="lanczos4")
        stack.append(up.reshape(n, by, bx, b, b, c))

    out_blocks = _select_level(jnp.stack(stack, axis=0), level_maps)
    out = combine_blocks(out_blocks)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)
