"""Inpainting restorers for the removal degradation (ELVIS v1 client).

The reference offers three inpainting backends: OpenCV Telea
(elvis.py:4597-4606), ProPainter (elvis.py:1458) and E2FGVI (elvis.py:1693)
— the latter two are external CUDA models driven via subprocess. Here the
self-contained slots are:

  * ``diffusion`` — PDE (heat-equation) inpainting: masked Jacobi
    relaxation that propagates boundary colors inward. Same niche as
    Telea's fast-marching method (a smooth fill from the hole boundary),
    expressed as a ``lax.scan`` of 4-neighbour averages so the whole clip
    relaxes in one fused device loop.
  * ``temporal`` — zero-motion temporal propagation + diffusion fallback:
    each removed block is filled from the nearest frame where that block
    survives (the core move of flow-guided video inpainting, minus flow),
    then residual holes relax. Removed blocks rarely coincide across
    frames (scores are temporally smoothed but removal is per-frame
    argsort), which is exactly why the reference uses *video* inpainting.
  * a neural slot (elvis_tpu.models.inpaint_net) for the learned path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from elvis_tpu.core.blocks import upsample_map
from elvis_tpu.restore.registry import register_restorer

__all__ = ["restore_removal_diffusion", "restore_removal_temporal"]


def _masked_jacobi(frames: jnp.ndarray, hole: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Relax hole pixels toward the 4-neighbour mean; known pixels pinned.

    frames float32 ``(N,H,W,C)``, hole bool ``(N,H,W,1)``.
    """
    known = jnp.where(hole, 0.0, frames)

    def avg4(x):
        up = jnp.roll(x, 1, axis=1).at[:, 0].set(x[:, 0])
        dn = jnp.roll(x, -1, axis=1).at[:, -1].set(x[:, -1])
        lf = jnp.roll(x, 1, axis=2).at[:, :, 0].set(x[:, :, 0])
        rt = jnp.roll(x, -1, axis=2).at[:, :, -1].set(x[:, :, -1])
        return (up + dn + lf + rt) * 0.25

    def step(x, _):
        x = jnp.where(hole, avg4(x), known)
        return x, None

    # Start from the global mean of known pixels for faster convergence.
    denom = jnp.maximum((~hole).sum(axis=(1, 2), keepdims=True), 1)
    mean = known.sum(axis=(1, 2), keepdims=True) / denom
    x0 = jnp.where(hole, mean, known)
    out, _ = jax.lax.scan(step, x0, None, length=iters)
    return out


@register_restorer("removal", "diffusion")
def restore_removal_diffusion(
    frames: jnp.ndarray,
    removal_mask: jnp.ndarray,
    block_size: int,
    iters: int = 200,
) -> jnp.ndarray:
    """frames ``(N,H,W,C)`` stretched (holes black), removal_mask
    ``(N,By,Bx)`` nonzero = removed."""
    hole = upsample_map(removal_mask.astype(bool), block_size)[..., None]
    out = _masked_jacobi(frames.astype(jnp.float32), hole, iters)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)


@register_restorer("removal", "temporal")
def restore_removal_temporal(
    frames: jnp.ndarray,
    removal_mask: jnp.ndarray,
    block_size: int,
    iters: int = 60,
    window: int = 8,
) -> jnp.ndarray:
    """Fill each removed block from the temporally nearest frame (within
    +-``window``) where the co-located block is present, then diffuse
    residual holes.

    The search is windowed (O(N*window) rather than the O(N^2) all-pairs
    distance matrix): removal decisions are per-frame argsorts of
    temporally-smoothed scores, so a co-located survivor is almost always
    within a few frames; blocks unavailable in the whole window fall back
    to PDE diffusion like never-available ones.
    """
    n = frames.shape[0]
    removed = removal_mask.astype(bool)  # (N,By,Bx)

    # For each target frame t, scan offsets by increasing |delta| and keep
    # the first clean source (edge-clamped indices; a clamped duplicate
    # offset is either the same frame or already considered).
    t_idx = jnp.arange(n)
    best_src = jnp.full(removed.shape, -1, dtype=jnp.int32)
    for d in range(1, window + 1):
        for delta in (-d, d):
            s_idx = jnp.clip(t_idx + delta, 0, n - 1)  # (N,)
            clean = ~removed[s_idx]  # (N,By,Bx): source block available
            take = (best_src < 0) & clean & (s_idx != t_idx)[:, None, None]
            best_src = jnp.where(take, s_idx[:, None, None], best_src)
    never_avail = best_src < 0
    src = jnp.where(never_avail, t_idx[:, None, None], best_src)

    # Gather source pixels per block: expand maps to pixel resolution.
    src_pix = upsample_map(src, block_size)  # (N,H,W)
    filled = frames[src_pix, jnp.arange(frames.shape[1])[:, None], jnp.arange(frames.shape[2])[None, :], :]
    hole_blocks = removed & ~never_avail
    hole_pix = upsample_map(hole_blocks, block_size)[..., None]
    out = jnp.where(hole_pix, filled, frames)

    # Blocks removed in every frame have no temporal source: diffuse them.
    # (A no-op pass when the residual mask is empty.)
    residual = removed & never_avail
    res_pix = upsample_map(residual, block_size)[..., None]
    out = _masked_jacobi(out.astype(jnp.float32), res_pix, iters)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)
