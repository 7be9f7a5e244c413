"""Block-matching motion estimation.

Serves the FVMD-style motion metric (elvis_tpu.metrics.fvmd — the
reference's FVMD uses PIPs point tracking, elvis.py:3358) and future
motion-compensated codec prediction. TPU-first: the (2R+1)^2 candidate
offsets are a static loop of whole-frame shifts with per-block SAD
reductions — no per-block Python, one fused graph.
"""

from __future__ import annotations

import jax.numpy as jnp

from elvis_tpu.core.blocks import blockwise_reduce

__all__ = ["block_motion"]


def block_motion(
    prev: jnp.ndarray, cur: jnp.ndarray, block_size: int = 16, radius: int = 4
) -> jnp.ndarray:
    """Estimate per-block integer motion from ``prev`` to ``cur``.

    prev/cur ``(N, H, W)`` luma -> ``(N, By, Bx, 2)`` (dy, dx) such that
    cur[block] ~= prev[block shifted by (dy, dx)].
    """
    offsets = [(dy, dx) for dy in range(-radius, radius + 1) for dx in range(-radius, radius + 1)]
    sads = []
    p = prev.astype(jnp.float32)
    c = cur.astype(jnp.float32)
    for dy, dx in offsets:
        shifted = jnp.roll(jnp.roll(p, dy, axis=-2), dx, axis=-1)
        sad = blockwise_reduce(jnp.abs(c - shifted), block_size, jnp.mean)
        sads.append(sad)
    sads = jnp.stack(sads, axis=-1)  # (N,By,Bx,K)
    best = jnp.argmin(sads, axis=-1)
    table = jnp.asarray(offsets, dtype=jnp.int32)  # (K,2)
    return table[best]
