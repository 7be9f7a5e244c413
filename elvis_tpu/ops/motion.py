"""Block-matching motion estimation.

Serves the FVMD-style motion metric (elvis_tpu.metrics.fvmd — the
reference's FVMD uses PIPs point tracking, elvis.py:3358), the codec's
inter prediction, and motion-compensated temporal inpainting (the
flow-guidance move of ProPainter/E2FGVI, reference elvis.py:1458/1693).
TPU-first: the (2R+1)^2 candidate offsets are a static loop of
whole-frame shifts with per-block SAD reductions — no per-block Python,
one fused graph.
"""

from __future__ import annotations

import jax.numpy as jnp

from elvis_tpu.core.blocks import blockwise_reduce

__all__ = ["block_motion"]


def block_motion(
    prev: jnp.ndarray, cur: jnp.ndarray, block_size: int = 16, radius: int = 4
) -> jnp.ndarray:
    """Estimate per-block integer motion from ``prev`` to ``cur``.

    prev/cur ``(N, H, W)`` luma -> mv ``(N, By, Bx, 2)`` (dy, dx) such
    that content at cur position p came from prev position ``p - mv``
    (mv is the per-block displacement of the content, in pixels).

    Candidate shifts are edge-clamped (not wraparound) so border blocks
    are scored against the pixels a warp would actually read.
    """
    # Zero-motion-first candidate order: jnp.argmin keeps the FIRST minimum,
    # so ties (flat blocks) and near-ties resolve to the smallest motion
    # instead of an arbitrary corner offset.
    offsets = sorted(
        ((dy, dx) for dy in range(-radius, radius + 1) for dx in range(-radius, radius + 1)),
        key=lambda o: o[0] * o[0] + o[1] * o[1],
    )
    p = prev.astype(jnp.float32)
    c = cur.astype(jnp.float32)
    h, w = p.shape[-2], p.shape[-1]
    pad = [(0, 0)] * (p.ndim - 2) + [(radius, radius), (radius, radius)]
    padded = jnp.pad(p, pad, mode="edge")
    sads = []
    for dy, dx in offsets:
        # shifted[y, x] = prev[clamp(y - dy), clamp(x - dx)]
        shifted = padded[..., radius - dy : radius - dy + h, radius - dx : radius - dx + w]
        sad = blockwise_reduce(jnp.abs(c - shifted), block_size, jnp.mean)
        sads.append(sad)
    sads = jnp.stack(sads, axis=-1)  # (N,By,Bx,K)
    best = jnp.argmin(sads, axis=-1)
    table = jnp.asarray(offsets, dtype=jnp.int32)  # (K,2)
    return table[best]
