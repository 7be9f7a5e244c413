"""DeblurUNet — learned blur restoration (SwinTormer/InstantIR slot).

Fills the deblurring position the reference assigns to InstantIR
(elvis.py:3000, a diffusion model) and its README assigns to SwinTormer.
A compact strength-conditioned UNet: the per-block blur-rounds map (the
decoded strength sidecar) enters as an extra input plane, so one network
handles every blur level — the learned analog of the reference's
per-level unsharp parameters (elvis.py:2854-2855).

TPU-first: NHWC, bf16, stride-2 conv down / pixel-shuffle up, residual
output over the input (identity fallback when untrained).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from elvis_tpu.core.blocks import upsample_map

__all__ = ["DeblurUNet"]


def _pixel_shuffle(x, r=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * r, w * r, c // (r * r))


class DeblurUNet(nn.Module):
    features: int = 32
    levels: int = 3
    dtype: Any = jnp.bfloat16
    max_strength: float = 10.0

    @nn.compact
    def __call__(self, x, strength_map=None, block_size: int = 8):
        """x ``(N,H,W,3)`` [0,255]; strength_map ``(N,By,Bx)`` blur rounds."""
        inp = x.astype(jnp.float32)
        h = inp / 127.5 - 1.0
        if strength_map is not None:
            s = upsample_map(
                strength_map.astype(jnp.float32) / self.max_strength, block_size
            )[..., None]
        else:
            s = jnp.zeros(h.shape[:-1] + (1,), jnp.float32)
        h = jnp.concatenate([h, s], axis=-1).astype(self.dtype)

        skips = []
        f = self.features
        for i in range(self.levels):
            h = nn.Conv(f, (3, 3), dtype=self.dtype, name=f"enc{i}a")(h)
            h = nn.leaky_relu(h, 0.2)
            h = nn.Conv(f, (3, 3), dtype=self.dtype, name=f"enc{i}b")(h)
            h = nn.leaky_relu(h, 0.2)
            skips.append(h)
            h = nn.Conv(f * 2, (3, 3), strides=(2, 2), dtype=self.dtype, name=f"down{i}")(h)
            f *= 2
        h = nn.Conv(f, (3, 3), dtype=self.dtype, name="mid")(h)
        h = nn.leaky_relu(h, 0.2)
        for i in reversed(range(self.levels)):
            f //= 2
            h = nn.Conv(f * 4, (3, 3), dtype=self.dtype, name=f"up{i}")(h)
            h = _pixel_shuffle(h, 2)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = nn.Conv(f, (3, 3), dtype=self.dtype, name=f"dec{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        residual = nn.Conv(3, (3, 3), dtype=jnp.float32, kernel_init=nn.initializers.zeros, name="tail")(h.astype(jnp.float32))
        return jnp.clip(inp + 127.5 * residual, 0.0, 255.0)
