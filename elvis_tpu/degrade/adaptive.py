"""Adaptive per-block degradation: multi-level downsample and Gaussian blur.

Semantics parity (behaviour, not implementation):
  * downsample — reference elvis.py:2141-2169 ``filter_frame_downsample``:
    ``level = round(score * log2(b))``, per block INTER_AREA down to
    ``b / 2^level`` then INTER_LINEAR back up.
  * blur — reference elvis.py:2171-2196 ``filter_frame_gaussian``:
    ``rounds = round(score * 10)``, per block ``rounds`` iterations of a
    5x5 sigma=1 Gaussian **within the block** (reflect-101 at block edges).

The reference loops over blocks in Python calling tiny cv2 ops (its
hottest server-side loop, SURVEY.md §3.5). Here both ops are ONE batched
per-block matrix transform (elvis_tpu.kernels.block_transform): each
block's level gathers a precomputed (b, b) operator — ``R_l = Up*Down``
for downsample, ``B^r`` for r blur rounds — and the whole clip runs as two
MXU matmuls with a single HBM read+write.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.kernels.block_transform import (
    apply_block_matrix_fast,
    blur_matrix_table,
    resample_matrix_table,
)

__all__ = [
    "downsample_levels_from_scores",
    "blur_levels_from_scores",
    "adaptive_downsample",
    "adaptive_downsample_scale",
    "adaptive_blur",
]


def downsample_levels_from_scores(scores: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """``(..., By, Bx)`` scores in [0,1] -> integer levels in [0, log2(b)].

    Matches elvis.py:2146 (np.round half-to-even on .5 boundaries).
    """
    max_level = int(math.log2(block_size))
    return jnp.round(scores * max_level).astype(jnp.int32)


def blur_levels_from_scores(scores: jnp.ndarray, max_rounds: int = 10) -> jnp.ndarray:
    """``(..., By, Bx)`` scores in [0,1] -> blur rounds in [0, max_rounds]
    (elvis.py:2176)."""
    return jnp.round(scores * max_rounds).astype(jnp.int32)


def _finalize(frames_dtype, out):
    if jnp.issubdtype(frames_dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames_dtype)


def adaptive_downsample(frames: jnp.ndarray, scores: jnp.ndarray, block_size: int):
    """Degrade each block by its score-derived power-of-2 factor.

    frames ``(N, H, W, C)``, scores ``(N, By, Bx)`` in [0,1].
    Returns ``(degraded (N,H,W,C), level_map (N,By,Bx) int32)`` — the level
    map is the 1x/2x/4x/8x strength-map sidecar payload.
    """
    levels = downsample_levels_from_scores(scores, block_size)
    blocks = split_into_blocks(frames, block_size)
    table = resample_matrix_table(block_size, "linear")
    out_blocks = apply_block_matrix_fast(blocks, table, levels)
    return _finalize(frames.dtype, combine_blocks(out_blocks)), levels


def adaptive_downsample_scale(
    frames: jnp.ndarray, importance: jnp.ndarray, block_size: int, max_scale: int = 4
):
    """PRESLEY scale-factor variant (reference utils.py:1101-1168,
    presley.py:968-983): IMPORTANCE (not removability) binned into
    ``max_scale`` levels; scale factor 0 (untouched) or 2..max_scale —
    arbitrary integers, not powers of 2. Returns (degraded, scale_map).
    """
    inv = 1.0 - importance
    bins = jnp.clip(jnp.floor(inv * max_scale).astype(jnp.int32), 0, max_scale - 1)
    scale_map = jnp.where(bins == 0, 0, bins + 1)  # 0, 2, 3, ..., max_scale

    # operator table indexed by scale value (index 1 unused -> identity)
    import numpy as np

    from elvis_tpu.ops.resize import resize_matrix

    ops = [np.eye(block_size), np.eye(block_size)]
    for s in range(2, max_scale + 1):
        small = max(1, block_size // s)
        ops.append(
            resize_matrix(block_size, small, "linear")
            @ resize_matrix(small, block_size, "area")
        )
    table = np.stack(ops, axis=0)

    blocks = split_into_blocks(frames, block_size)
    out_blocks = apply_block_matrix_fast(blocks, table, scale_map)
    return _finalize(frames.dtype, combine_blocks(out_blocks)), scale_map


def adaptive_blur(
    frames: jnp.ndarray, scores: jnp.ndarray, block_size: int, max_rounds: int = 10
):
    """Blur each block ``round(score*max_rounds)`` times (within-block
    borders, like the reference's per-block cv2.GaussianBlur).

    Returns ``(degraded, rounds_map int32)``.
    """
    levels = blur_levels_from_scores(scores, max_rounds)
    blocks = split_into_blocks(frames, block_size)
    table = blur_matrix_table(block_size, max_rounds)
    out_blocks = apply_block_matrix_fast(blocks, table, levels)
    return _finalize(frames.dtype, combine_blocks(out_blocks)), levels
