"""DCT-coefficient dampening — the "ELVIS v2" degradation.

The reference README (README.md:11-46) describes an ELVIS v2 that dampens
DCT coefficients of removable blocks and restores with a neural model, but
no such code ships in the reference tree (SURVEY.md §0). Here it is a
first-class degradation: fully fused on device (block DCT -> frequency
rolloff mask -> IDCT), with a per-block strength map sidecar like the
downsample/blur paths.

Model: for strength s in [0,1], coefficient (u, v) is scaled by
``1 / (1 + s * dampen_gain * f)`` where ``f = (u + v) / (2b - 2)`` is the
normalized frequency radius — DC is always preserved, high frequencies
attenuate progressively. Quantized to ``levels`` steps so the sidecar is a
small integer map (like the 0..10 blur rounds).
"""

from __future__ import annotations

import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.ops.dct import block_dct2, block_idct2

__all__ = ["dampen_levels_from_scores", "dct_dampen"]


def dampen_levels_from_scores(scores: jnp.ndarray, levels: int = 10) -> jnp.ndarray:
    return jnp.round(scores * levels).astype(jnp.int32)


def dct_dampen(
    frames: jnp.ndarray,
    scores: jnp.ndarray,
    block_size: int,
    levels: int = 10,
    dampen_gain: float = 8.0,
):
    """frames ``(N,H,W,C)``, scores ``(N,By,Bx)`` ->
    ``(degraded, level_map (N,By,Bx) int32)``."""
    lvl = dampen_levels_from_scores(scores, levels)
    blocks = split_into_blocks(frames, block_size)  # (N,By,Bx,b,b,C)
    b = blocks.shape[-2]

    # (..., b, b) frequency rolloff per block, from the quantized strength.
    u = jnp.arange(b, dtype=jnp.float32)
    f = (u[:, None] + u[None, :]) / (2.0 * (b - 1))  # (b,b) in [0,1]
    s = lvl.astype(jnp.float32) / levels  # (N,By,Bx)
    atten = 1.0 / (1.0 + s[..., None, None] * dampen_gain * f)  # (N,By,Bx,b,b)

    # DCT over trailing spatial axes: move channels out of the way.
    x = blocks.astype(jnp.float32).transpose(0, 1, 2, 5, 3, 4)  # (N,By,Bx,C,b,b)
    coeffs = block_dct2(x) * atten[..., None, :, :]
    rec = block_idct2(coeffs).transpose(0, 1, 2, 4, 5, 3)
    out = combine_blocks(rec)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype), lvl
