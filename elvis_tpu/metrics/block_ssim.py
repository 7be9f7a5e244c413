"""Per-block SSIM map and foreground/background SSIM split.

Parity: reference utils.py:572-608 unfolds frames into b x b patches and
runs batched SSIM per patch (``pytorch_msssim.ssim(size_average=False)``),
yielding a ``(By, Bx)`` SSIM map; utils.py:611-656 then averages the map
over foreground/background block sets (block is foreground when its mask
fraction >= threshold), defaulting each region to the overall mean when
empty. Same shapes here, one jitted pass for the whole clip.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from elvis_tpu.core.blocks import blockwise_reduce, split_into_blocks
from elvis_tpu.metrics.pixel import ssim
from elvis_tpu.ops.color import rgb_to_gray

__all__ = ["block_ssim_map", "fg_bg_ssim"]


def block_ssim_map(
    ref: jnp.ndarray, dec: jnp.ndarray, block_size: int
) -> jnp.ndarray:
    """``(N,H,W,C)`` pairs -> ``(N,By,Bx)`` per-block SSIM (each block an
    independent patch, like the reference's unfold)."""
    ref_y = rgb_to_gray(ref.astype(jnp.float32))
    dec_y = rgb_to_gray(dec.astype(jnp.float32))
    rb = split_into_blocks(ref_y[..., None], block_size)[..., 0]  # (N,By,Bx,b,b)
    db = split_into_blocks(dec_y[..., None], block_size)[..., 0]
    n, by, bx, b, _ = rb.shape
    win = 7 if b >= 7 else (b if b % 2 == 1 else b - 1)
    vals = ssim(
        rb.reshape(n * by * bx, b, b), db.reshape(n * by * bx, b, b), win_size=win
    )
    return vals.reshape(n, by, bx)


def fg_bg_ssim(
    ref: jnp.ndarray,
    dec: jnp.ndarray,
    fg_mask: jnp.ndarray,
    block_size: int,
    fg_threshold: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (overall, fg, bg) scalars over the clip; empty regions default to
    the overall mean (utils.py:652-654)."""
    smap = block_ssim_map(ref, dec, block_size)  # (N,By,Bx)
    frac = blockwise_reduce(fg_mask.astype(jnp.float32), block_size, jnp.mean)
    is_fg = frac >= fg_threshold

    overall = smap.mean()

    def region_mean(sel):
        cnt = sel.astype(jnp.float32).sum()
        tot = (smap * sel.astype(jnp.float32)).sum()
        return jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1.0), overall)

    return overall, region_mean(is_fg), region_mean(~is_fg)
