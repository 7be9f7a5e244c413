"""Block DCT as matrix multiplies — the MXU-native transform core.

Serves two subsystems:
  * the NVC hermetic codec's transform/quantization stage
    (elvis_tpu.codec.nvc), replacing the reference's shell-out to
    libx265/kvazaar for experiments where no external encoder exists;
  * DCT-coefficient dampening, the "ELVIS v2" degradation described in the
    reference's README (README.md:11-46) that never shipped in its code —
    here it is a first-class degradation op (elvis_tpu.degrade.dct_dampen).

A 2-D DCT of an 8x8 (or any b x b) block is ``D @ X @ D.T`` with the
orthonormal DCT-II matrix D; over a block tensor this is two einsums that
XLA maps straight onto the MXU in one fused pass.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["dct_matrix", "block_dct2", "block_idct2"]

# Full f32 MXU precision: codec transforms must round-trip to sub-LSB error.
_PRECISION = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=16)
def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: D[k, i] = s_k * cos(pi/n * (i + 0.5) * k)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi / n * (i + 0.5) * k)
    d[0] *= 1.0 / np.sqrt(2.0)
    return (d * np.sqrt(2.0 / n)).astype(np.float64)


def block_dct2(blocks: jnp.ndarray) -> jnp.ndarray:
    """2-D DCT over the trailing two spatial axes of ``(..., b, b)``."""
    b = blocks.shape[-1]
    d = jnp.asarray(dct_matrix(b), dtype=jnp.float32)
    x = blocks.astype(jnp.float32)
    y = jnp.einsum("kb,...bc->...kc", d, x, precision=_PRECISION)
    return jnp.einsum("lc,...kc->...kl", d, y, precision=_PRECISION)


def block_idct2(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Inverse 2-D DCT (DCT-III with the orthonormal matrix transposed)."""
    b = coeffs.shape[-1]
    d = jnp.asarray(dct_matrix(b), dtype=jnp.float32)
    x = coeffs.astype(jnp.float32)
    y = jnp.einsum("kb,...kc->...bc", d, x, precision=_PRECISION)
    return jnp.einsum("cl,...bc->...bl", d, y, precision=_PRECISION)
