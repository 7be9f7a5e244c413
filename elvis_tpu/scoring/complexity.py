"""EVCA-equivalent spatial/temporal complexity, fused on device.

The reference shells out to the EVCA package (``python -m evca.main`` on a
raw YUV dump, reference elvis.py:988-1055) and harvests per-block CSVs of
spatial complexity (SC) and temporal complexity (TC). EVCA/VCA-family
analyzers define block texture as weighted high-frequency DCT energy and
temporal complexity as the difference of texture between co-located
blocks in consecutive frames.

Here both are one jitted pass over the clip's luma: block DCT (MXU
matmuls) -> frequency-weighted magnitude sum -> SC; first differences of
block luma -> texture of the diff -> TC. No subprocess, no YUV dump, no
CSV; a (N, By, Bx) pair comes back in device memory.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from elvis_tpu.core.blocks import split_into_blocks
from elvis_tpu.ops.color import rgb_to_gray
from elvis_tpu.ops.dct import block_dct2

__all__ = ["Complexity", "spatial_temporal_complexity", "texture_energy"]


class Complexity(NamedTuple):
    SC: jnp.ndarray  # (N, By, Bx) spatial complexity
    TC: jnp.ndarray  # (N, By, Bx) temporal complexity; TC[0] == 0


@functools.lru_cache(maxsize=16)
def _freq_weights(b: int) -> np.ndarray:
    """VCA-style low-frequency de-emphasis: w(u,v) grows with radius,
    DC weight 0 so flat brightness does not read as texture."""
    u = np.arange(b, dtype=np.float64)
    w = np.sqrt(u[:, None] ** 2 + u[None, :] ** 2)
    w[0, 0] = 0.0
    return (w / w.max()).astype(np.float64)


def texture_energy(gray: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """``(N, H, W)`` luma -> ``(N, By, Bx)`` frequency-weighted DCT energy."""
    blocks = split_into_blocks(gray[..., None], block_size)[..., 0]  # (N,By,Bx,b,b)
    coeffs = block_dct2(blocks.astype(jnp.float32))
    w = jnp.asarray(_freq_weights(block_size), dtype=jnp.float32)
    return (jnp.abs(coeffs) * w).sum(axis=(-2, -1)) / (block_size * block_size)


def spatial_temporal_complexity(
    frames: jnp.ndarray, block_size: int
) -> Complexity:
    """frames ``(N, H, W, C)`` RGB -> per-block SC/TC.

    SC[t] = texture energy of frame t.
    TC[t] = texture energy of (frame t - frame t-1) for t >= 1, 0 for t=0 —
    the motion-revealed detail measure EVCA reports (its TC column for the
    first frame is likewise empty/zero; the fusion consumes TC[1:] only,
    reference elvis.py:1180).
    """
    gray = rgb_to_gray(frames.astype(jnp.float32))
    sc = texture_energy(gray, block_size)
    diff = gray[1:] - gray[:-1]
    tc_tail = texture_energy(diff, block_size)
    tc = jnp.concatenate([jnp.zeros_like(sc[:1]), tc_tail], axis=0)
    return Complexity(SC=sc, TC=tc)
