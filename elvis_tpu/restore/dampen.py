"""Restorer for the DCT-dampening degradation ("ELVIS v2" client side).

The reference README pairs DCT dampening with a LaplacianVCAR neural
restorer (README.md:11-46, never shipped in its code). Here the classical
slot is the regularized inverse filter: the server attenuated coefficient
(u, v) by a *known* factor a_s(u,v) (the strength map is shipped as a
sidecar), so the client multiplies by ``min(1/a, max_gain)`` — exact
inversion at moderate strengths, capped where quantization noise would be
amplified. The neural slot reuses DeblurUNet (dampening is spectrally a
blur).
"""

from __future__ import annotations

import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.degrade.dct_dampen import dct_dampen  # noqa: F401 (same atten model)
from elvis_tpu.ops.dct import block_dct2, block_idct2
from elvis_tpu.restore.registry import register_restorer

__all__ = ["restore_dct_dampen_inverse"]


@register_restorer("dct_dampen", "inverse_filter")
def restore_dct_dampen_inverse(
    frames: jnp.ndarray,
    level_maps: jnp.ndarray,
    block_size: int,
    levels: int = 10,
    dampen_gain: float = 8.0,
    max_gain: float = 4.0,
) -> jnp.ndarray:
    """Invert elvis_tpu.degrade.dct_dampen given its level map sidecar."""
    blocks = split_into_blocks(frames, block_size)
    b = blocks.shape[-2]
    u = jnp.arange(b, dtype=jnp.float32)
    f = (u[:, None] + u[None, :]) / (2.0 * (b - 1))
    s = level_maps.astype(jnp.float32) / levels
    atten = 1.0 / (1.0 + s[..., None, None] * dampen_gain * f)
    gain = jnp.minimum(1.0 / atten, max_gain)

    x = blocks.astype(jnp.float32).transpose(0, 1, 2, 5, 3, 4)
    coeffs = block_dct2(x) * gain[..., None, :, :]
    rec = block_idct2(coeffs).transpose(0, 1, 2, 4, 5, 3)
    out = combine_blocks(rec)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)
