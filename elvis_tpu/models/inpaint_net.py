"""InpaintNet — learned video inpainting (ProPainter/E2FGVI slot).

Fills the flow-guided inpainting position (reference elvis.py:1458
ProPainter, elvis.py:1693 E2FGVI — external CUDA models behind
subprocesses). TPU-first compact design:

  * gated convolutions (mask-aware feature gating, the standard free-form
    inpainting mechanism) over NHWC bf16;
  * temporal context by channel-stacking a window of neighbour frames
    (the reference's models likewise consume ``neighbor_length`` frames,
    elvis.py:63) — the temporal axis maps onto the halo-exchange sharding
    (elvis_tpu.parallel.halo) rather than host-side chunk staging;
  * residual over the temporal-propagation baseline
    (elvis_tpu.restore.inpaint.restore_removal_temporal seeds holes first;
    the net refines), so untrained output degrades to the classical fill.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from elvis_tpu.core.blocks import upsample_map

__all__ = ["InpaintNet"]


class GatedConv(nn.Module):
    features: int
    strides: tuple = (1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features * 2, (3, 3), strides=self.strides, dtype=self.dtype)(x)
        feat, gate = jnp.split(h, 2, axis=-1)
        return nn.leaky_relu(feat, 0.2) * nn.sigmoid(gate)


def _pixel_shuffle(x, r=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * r, w * r, c // (r * r))


class InpaintNet(nn.Module):
    features: int = 32
    temporal_window: int = 2  # neighbour frames each side
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, frames, removal_mask, block_size: int = 8):
        """frames ``(N,H,W,3)`` [0,255] (holes pre-filled by the classical
        temporal restorer), removal_mask ``(N,By,Bx)`` -> refined frames."""
        n = frames.shape[0]
        inp = frames.astype(jnp.float32)
        x = inp / 127.5 - 1.0
        hole = upsample_map(removal_mask.astype(jnp.float32), block_size)[..., None]

        # Temporal context: stack +-window neighbours (edge-clamped shifts).
        ctx = [x]
        for d in range(1, self.temporal_window + 1):
            fwd = jnp.concatenate([x[d:], jnp.repeat(x[-1:], d, 0)], axis=0)
            bwd = jnp.concatenate([jnp.repeat(x[:1], d, 0), x[:-d]], axis=0)
            ctx.extend([fwd, bwd])
        h = jnp.concatenate(ctx + [hole], axis=-1).astype(self.dtype)

        h = GatedConv(self.features, dtype=self.dtype, name="enc0")(h)
        skip = h
        h = GatedConv(self.features * 2, strides=(2, 2), dtype=self.dtype, name="down")(h)
        for i in range(3):
            h = GatedConv(self.features * 2, dtype=self.dtype, name=f"mid{i}")(h)
        h = nn.Conv(self.features * 4, (3, 3), dtype=self.dtype, name="up")(h)
        h = _pixel_shuffle(h, 2)
        h = jnp.concatenate([h, skip], axis=-1)
        h = GatedConv(self.features, dtype=self.dtype, name="dec")(h)
        residual = nn.Conv(3, (3, 3), dtype=jnp.float32, kernel_init=nn.initializers.zeros, name="tail")(h.astype(jnp.float32))
        out = inp + 127.5 * residual * hole  # only holes are touched
        return jnp.clip(out, 0.0, 255.0)
