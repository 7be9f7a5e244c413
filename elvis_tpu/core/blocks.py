"""Block algebra: the foundation every degradation/restoration op builds on.

Capability parity with the reference's pure-NumPy block layer
(reference elvis.py:1369-1455 ``split_image_into_blocks`` /
``combine_blocks_into_image`` / ``stretch_frame``), redesigned as
batched, jittable JAX transforms: every function takes a leading batch
axis and is shape-polymorphic only in Python (static after trace), so XLA
sees static shapes and can fuse the surrounding elementwise work.

Layout convention: images are channel-last ``(..., H, W, C)``; the block
view is ``(..., By, Bx, b, b, C)``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def block_grid_shape(height: int, width: int, block_size: int) -> Tuple[int, int]:
    """Number of (By, Bx) whole blocks covering an H x W frame."""
    if height % block_size or width % block_size:
        raise ValueError(
            f"Frame {height}x{width} not divisible by block_size={block_size}"
        )
    return height // block_size, width // block_size


def split_into_blocks(images: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """``(..., H, W, C) -> (..., By, Bx, b, b, C)``.

    Pure reshape/transpose; XLA compiles this to a layout change that fuses
    into neighbouring ops (no copy materialized in most pipelines).
    """
    *lead, h, w, c = images.shape
    by, bx = block_grid_shape(h, w, block_size)
    x = images.reshape(*lead, by, block_size, bx, block_size, c)
    # (..., by, b, bx, b, c) -> (..., by, bx, b, b, c)
    n = len(lead)
    perm = list(range(n)) + [n, n + 2, n + 1, n + 3, n + 4]
    return x.transpose(perm)


def combine_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """``(..., By, Bx, b, b, C) -> (..., H, W, C)``. Inverse of split_into_blocks."""
    *lead, by, bx, b, b2, c = blocks.shape
    assert b == b2, f"non-square blocks {b}x{b2}"
    n = len(lead)
    perm = list(range(n)) + [n, n + 2, n + 1, n + 3, n + 4]
    x = blocks.transpose(perm)  # (..., by, b, bx, b, c)
    return x.reshape(*lead, by * b, bx * b, c)


def upsample_map(block_map: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Expand a per-block map ``(..., By, Bx)`` to pixel resolution
    ``(..., By*b, Bx*b)`` by nearest-neighbour repetition.

    Used to turn removal/strength maps into pixel masks (the reference does
    this with ``np.kron``-style repeats when writing full-res mask PNGs,
    elvis.py:4563-4580).
    """
    x = jnp.repeat(block_map, block_size, axis=-1)
    return jnp.repeat(x, block_size, axis=-2)


def dilate_block_mask(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary dilation of a per-block boolean map ``(..., By, Bx)`` by
    ``radius`` blocks (Chebyshev / square structuring element).

    The block-resolution counterpart of the reference's pixel-space
    ``mask_dilation`` knobs (ProPainter/E2FGVI plumbing, elvis.py:1458/
    1693): inpainting a slightly larger region hides boundary artifacts.
    ``radius=0`` is the identity.
    """
    out = mask.astype(bool)
    for axis in (-2, -1):
        acc = out
        for d in range(1, radius + 1):
            lo = jnp.roll(out, d, axis=axis)
            hi = jnp.roll(out, -d, axis=axis)
            # zero the wrapped edge instead of letting roll carry it over
            idx_lo = [slice(None)] * out.ndim
            idx_lo[axis] = slice(0, d)
            idx_hi = [slice(None)] * out.ndim
            idx_hi[axis] = slice(out.shape[axis] - d, None)
            lo = lo.at[tuple(idx_lo)].set(False)
            hi = hi.at[tuple(idx_hi)].set(False)
            acc = acc | lo | hi
        out = acc
    return out


def downsample_mask(pixel_mask: jnp.ndarray, block_size: int, threshold: float = 0.5) -> jnp.ndarray:
    """Reduce a pixel mask ``(..., H, W)`` to a per-block boolean map by
    mean-pooling and thresholding."""
    *lead, h, w = pixel_mask.shape
    by, bx = block_grid_shape(h, w, block_size)
    x = pixel_mask.reshape(*lead, by, block_size, bx, block_size).astype(jnp.float32)
    pooled = x.mean(axis=(-3, -1))
    return pooled > threshold


def blockwise_reduce(images: jnp.ndarray, block_size: int, reducer, *, with_channels: bool = False) -> jnp.ndarray:
    """Apply ``reducer`` over each block's pixels.

    ``(..., H, W) -> (..., By, Bx)``; with ``with_channels=True`` the input
    is ``(..., H, W, C)`` and channels are reduced too. ``reducer`` must
    accept an ``axis`` tuple (e.g. ``jnp.mean``).
    """
    if with_channels:
        *lead, h, w, c = images.shape
        by, bx = block_grid_shape(h, w, block_size)
        x = images.reshape(*lead, by, block_size, bx, block_size, c)
        return reducer(x, axis=(-4, -2, -1))
    *lead, h, w = images.shape
    by, bx = block_grid_shape(h, w, block_size)
    x = images.reshape(*lead, by, block_size, bx, block_size)
    return reducer(x, axis=(-3, -1))
