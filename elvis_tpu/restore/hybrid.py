"""Hybrid classical+neural polish blend.

Parity: reference utils.py:1575-1601 ``blended_restoration`` — blend a
cheap classical restore with a neural restore, weighted per block by the
degradation strength: ``out = (1 - a*D)*classical + a*D*neural`` where
``D = level / max_level``. The reference's ablation found a=0.10 for
downsample (+5.71% SSIM) and a=0 for blur the best operating points
(DEGRADATION_ABLATION_REPORT.tex:315-340).
"""

from __future__ import annotations

import jax.numpy as jnp

from elvis_tpu.core.blocks import upsample_map

__all__ = ["blended_restoration"]


def blended_restoration(
    classical: jnp.ndarray,
    neural: jnp.ndarray,
    level_maps: jnp.ndarray,
    block_size: int,
    alpha: float = 0.1,
    max_level: int | None = None,
) -> jnp.ndarray:
    if max_level is None:
        max_level = max(int(level_maps.max()), 1)
    d = level_maps.astype(jnp.float32) / max_level
    w = (alpha * upsample_map(d, block_size))[..., None]
    out = (1.0 - w) * classical.astype(jnp.float32) + w * neural.astype(jnp.float32)
    if jnp.issubdtype(classical.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(classical.dtype)
