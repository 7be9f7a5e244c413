"""Per-block adaptive unsharp-mask restore for the blur degradation.

Parity: reference elvis.py:2822-2867 ``restore_blur_opencv_unsharp_mask``:
for blur level L > 0, ``amount = 0.5*L``, ``radius = max(1, L)``, blurred
ref = GaussianBlur(block, ksize=auto, sigma=radius), output =
``(1+amount)*block - amount*blurred`` clipped to [0,255]. OpenCV's auto
kernel size for 8-bit images is ``round(sigma*6 + 1) | 1``.

Fused formulation: the per-level Gaussian is a gathered (b, b) matrix
``B_sigma(L)`` (elvis_tpu.kernels.block_transform), so the whole restore
is one batched matrix transform plus a per-block affine combine.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.kernels.block_transform import apply_block_matrix_fast, conv_matrix_reflect101
from elvis_tpu.restore.registry import register_restorer

__all__ = ["restore_blur_unsharp"]


def _auto_ksize(sigma: float) -> int:
    return int(round(sigma * 6 + 1)) | 1


@functools.lru_cache(maxsize=32)
def _unsharp_blur_table(b: int, max_rounds: int) -> np.ndarray:
    """(L+1, b, b): level L -> B with sigma = max(1, L); level 0 = identity."""
    out = [np.eye(b)]
    for lvl in range(1, max_rounds + 1):
        sigma = float(max(1, lvl))
        out.append(conv_matrix_reflect101(b, _auto_ksize(sigma), sigma))
    return np.stack(out, axis=0)


@register_restorer("blur", "unsharp")
def restore_blur_unsharp(
    frames: jnp.ndarray,
    level_maps: jnp.ndarray,
    block_size: int,
    max_rounds: int = 10,
) -> jnp.ndarray:
    blocks = split_into_blocks(frames, block_size).astype(jnp.float32)
    table = _unsharp_blur_table(block_size, max_rounds)
    blurred = apply_block_matrix_fast(blocks, table, level_maps)
    amount = (0.5 * level_maps.astype(jnp.float32))[..., None, None, None]
    sharp = jnp.clip((1.0 + amount) * blocks - amount * blurred, 0, 255)
    out = combine_blocks(jnp.where(amount > 0, sharp, blocks))
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)
