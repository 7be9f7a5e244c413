"""Per-block adaptive unsharp-mask restore for the blur degradation.

Parity: reference elvis.py:2822-2867 ``restore_blur_opencv_unsharp_mask``:
for blur level L > 0, ``amount = 0.5*L``, ``radius = max(1, L)``, blurred
ref = GaussianBlur(block, ksize=auto, sigma=radius), output =
``(1+amount)*block - amount*blurred`` clipped to [0,255]. OpenCV's auto
kernel size for 8-bit images is ``round(sigma*6 + 1) | 1``.
"""

from __future__ import annotations

import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.degrade.adaptive import _select_level
from elvis_tpu.ops.filter import gaussian_blur
from elvis_tpu.restore.registry import register_restorer

__all__ = ["restore_blur_unsharp"]


def _auto_ksize(sigma: float) -> int:
    k = int(round(sigma * 6 + 1))
    return k | 1


@register_restorer("blur", "unsharp")
def restore_blur_unsharp(
    frames: jnp.ndarray,
    level_maps: jnp.ndarray,
    block_size: int,
    max_rounds: int = 10,
) -> jnp.ndarray:
    blocks = split_into_blocks(frames, block_size).astype(jnp.float32)

    stack = [blocks]
    for lvl in range(1, max_rounds + 1):
        sigma = float(max(1, lvl))
        blurred = gaussian_blur(blocks, _auto_ksize(sigma), sigma, h_axis=-3, w_axis=-2)
        amount = 0.5 * lvl
        sharp = jnp.clip((1.0 + amount) * blocks - amount * blurred, 0, 255)
        stack.append(sharp)

    out_blocks = _select_level(jnp.stack(stack, axis=0), level_maps)
    out = combine_blocks(out_blocks)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)
