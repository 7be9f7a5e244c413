"""Adaptive per-block degradation: multi-level downsample and Gaussian blur.

Semantics parity (behaviour, not implementation):
  * downsample — reference elvis.py:2141-2169 ``filter_frame_downsample``:
    ``level = round(score * log2(b))``, per block INTER_AREA down to
    ``b / 2^level`` then INTER_LINEAR back up.
  * blur — reference elvis.py:2171-2196 ``filter_frame_gaussian``:
    ``rounds = round(score * 10)``, per block ``rounds`` iterations of a
    5x5 sigma=1 Gaussian **within the block** (reflect-101 at block edges).

The reference loops over blocks in Python calling tiny cv2 ops (its
hottest server-side loop, SURVEY.md §3.5). TPU-first formulation: compute
the degraded frame at *every* level as one batched op over the whole block
tensor (levels are few and static: log2(b)+1, or max_rounds+1), then
gather each block's level with a one-hot select. Everything fuses under
one jit; no data-dependent shapes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.ops.filter import gaussian_blur
from elvis_tpu.ops.resize import resize

__all__ = [
    "downsample_levels_from_scores",
    "blur_levels_from_scores",
    "adaptive_downsample",
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


def _select_level(level_stack: jnp.ndarray, levels: jnp.ndarray) -> jnp.ndarray:
    """Gather per-block level: stack ``(L, ..., By, Bx, b, b, C)`` +
    levels ``(..., By, Bx)`` -> ``(..., By, Bx, b, b, C)``.

    One-hot weighted sum rather than gather: maps to a fused VPU select,
    no dynamic indexing.
    """
    num_levels = level_stack.shape[0]
    onehot = (
        jnp.arange(num_levels, dtype=jnp.int32).reshape(
            (num_levels,) + (1,) * levels.ndim
        )
        == levels[None]
    )
    w = onehot[..., None, None, None].astype(level_stack.dtype)
    return (level_stack * w).sum(axis=0)


def adaptive_downsample(
    frames: jnp.ndarray, scores: jnp.ndarray, block_size: int
):
    """Degrade each block by its score-derived power-of-2 factor.

    frames ``(N, H, W, C)``, scores ``(N, By, Bx)`` in [0,1].
    Returns ``(degraded (N,H,W,C), level_map (N,By,Bx) int32)`` — the level
    map is the 1x/2x/4x/8x strength-map sidecar payload.
    """
    levels = downsample_levels_from_scores(scores, block_size)
    blocks = split_into_blocks(frames, block_size)  # (N,By,Bx,b,b,C)
    n, by, bx, b, _, c = blocks.shape
    flat = blocks.reshape(n * by * bx, b, b, c)

    max_level = int(math.log2(block_size))
    stack = [blocks.astype(jnp.float32)]
    for lvl in range(1, max_level + 1):
        small = max(1, b // (2**lvl))
        down = resize(flat.astype(jnp.float32), (small, small), method="area")
        up = resize(down, (b, b), method="linear")
        stack.append(up.reshape(n, by, bx, b, b, c))
    level_stack = jnp.stack(stack, axis=0)

    out_blocks = _select_level(level_stack, levels)
    out = combine_blocks(out_blocks)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype), levels


def adaptive_blur(
    frames: jnp.ndarray,
    scores: jnp.ndarray,
    block_size: int,
    max_rounds: int = 10,
):
    """Blur each block ``round(score*max_rounds)`` times (within-block
    borders, like the reference's per-block cv2.GaussianBlur).

    Returns ``(degraded, rounds_map int32)``.
    """
    levels = blur_levels_from_scores(scores, max_rounds)
    blocks = split_into_blocks(frames, block_size).astype(jnp.float32)

    stack = [blocks]
    cur = blocks
    for _ in range(max_rounds):
        cur = gaussian_blur(cur, 5, 1.0, h_axis=-3, w_axis=-2)
        stack.append(cur)
    level_stack = jnp.stack(stack, axis=0)

    out_blocks = _select_level(level_stack, levels)
    out = combine_blocks(out_blocks)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype), levels
