"""ELVIS v1 selective block removal — batched, static-shape, on device.

Semantics parity with reference elvis.py:1387-1455:
  * per row, remove the ``k = int(shrink_amount * Bx)`` blocks with the
    HIGHEST removability (argsort descending, ties by lower index);
  * the shrunk frame is the kept blocks of each row packed left in their
    original order — width shrinks by ``k`` blocks uniformly;
  * ``stretch`` scatters kept blocks back to mask==0 positions on a black
    canvas.

The reference runs a Python loop per row per frame; here the whole clip is
one gather: k is static (same for every frame/row — the reference
guarantees this at elvis.py:1392-1396), so shapes stay static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks

__all__ = ["removal_blocks_per_row", "apply_selective_removal", "stretch_frames"]


def removal_blocks_per_row(num_blocks_x: int, shrink_amount: float) -> int:
    """Static per-row removal count (elvis.py:1392-1396)."""
    if shrink_amount < 1.0:
        k = int(shrink_amount * num_blocks_x)
    else:
        k = int(shrink_amount)
    return min(k, num_blocks_x)


def apply_selective_removal(
    frames: jnp.ndarray, scores: jnp.ndarray, block_size: int, shrink_amount: float
):
    """frames ``(N,H,W,C)``, scores ``(N,By,Bx)`` ->
    ``(shrunk (N,H,W-k*b,C), removal_mask (N,By,Bx) int8)``.
    """
    n, h, w, c = frames.shape
    blocks = split_into_blocks(frames, block_size)  # (N,By,Bx,b,b,C)
    by, bx = blocks.shape[1], blocks.shape[2]
    k = removal_blocks_per_row(bx, shrink_amount)
    if k == 0:
        mask = jnp.zeros((n, by, bx), dtype=jnp.int8)
        return frames, mask

    # Highest-removability first; jnp.argsort is stable, so negating scores
    # gives ties-to-lower-index like np.argsort(-row) with stable order.
    order = jnp.argsort(-scores, axis=-1, stable=True)  # (N,By,Bx)
    removed_idx = order[..., :k]

    mask = jnp.zeros((n, by, bx), dtype=jnp.int8).at[
        jnp.arange(n)[:, None, None],
        jnp.arange(by)[None, :, None],
        removed_idx,
    ].set(1)

    # Kept columns in original order: stable sort of indices with removed
    # ones pushed past the end, take first Bx-k.
    col = jnp.arange(bx, dtype=jnp.int32)
    sort_key = jnp.where(mask.astype(bool), col + bx, col)  # (N,By,Bx)
    kept_idx = jnp.sort(sort_key, axis=-1)[..., : bx - k]  # values < bx are kept cols

    gathered = jnp.take_along_axis(
        blocks, kept_idx[..., None, None, None], axis=2
    )  # (N,By,Bx-k,b,b,C)
    shrunk = combine_blocks(gathered)
    return shrunk, mask


def stretch_frames(
    shrunk: jnp.ndarray, removal_mask: jnp.ndarray, block_size: int
) -> jnp.ndarray:
    """Inverse scatter (reference ``stretch_frame`` elvis.py:1436-1455):
    kept blocks fill mask==0 positions in raster order per row; removed
    positions stay black.

    shrunk ``(N,H,W',C)``, removal_mask ``(N,By,Bx)`` -> ``(N,H,W,C)``.
    """
    blocks = split_into_blocks(shrunk, block_size)  # (N,By,Bx',b,b,C)
    n, by, bxs = blocks.shape[:3]
    bx = removal_mask.shape[-1]

    keep = (removal_mask == 0)
    # For original column j: source index in the shrunk row = number of kept
    # columns strictly before j (only valid where keep).
    src = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1  # (N,By,Bx)
    src = jnp.clip(src, 0, bxs - 1)
    scattered = jnp.take_along_axis(blocks, src[..., None, None, None], axis=2)
    scattered = scattered * keep[..., None, None, None].astype(scattered.dtype)
    return combine_blocks(scattered)
