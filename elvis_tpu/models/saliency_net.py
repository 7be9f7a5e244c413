"""SaliencyNet — learned foreground segmentation (UFO slot).

Fills the UFO video co-segmentation position (reference elvis.py:1057-1157,
an external GPU model invoked on a staged temp dataset). A small UNet over
appearance + motion planes: input is RGB plus the temporal-difference
magnitude (motion is the strongest free saliency cue in this domain),
output a per-pixel foreground probability. Registered as the 'neural'
saliency backend; the heuristic backends (center_prior, motion_contrast)
remain the hermetic defaults.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

__all__ = ["SaliencyNet", "make_neural_saliency_fn"]


def _pixel_shuffle(x, r=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * r, w * r, c // (r * r))


class SaliencyNet(nn.Module):
    features: int = 24
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, frames):
        """frames ``(N,H,W,3)`` [0,255] -> saliency ``(N,H,W)`` in [0,1]."""
        x = frames.astype(jnp.float32) / 127.5 - 1.0
        d = jnp.diff(x, axis=0, prepend=x[:1])
        motion = jnp.sqrt((d**2).sum(-1, keepdims=True) + 1e-8)
        h = jnp.concatenate([x, motion], axis=-1).astype(self.dtype)

        f = self.features
        h = nn.Conv(f, (3, 3), dtype=self.dtype, name="enc0")(h)
        h = nn.leaky_relu(h, 0.2)
        s0 = h
        h = nn.Conv(f * 2, (3, 3), strides=(2, 2), dtype=self.dtype, name="down0")(h)
        h = nn.leaky_relu(h, 0.2)
        s1 = h
        h = nn.Conv(f * 4, (3, 3), strides=(2, 2), dtype=self.dtype, name="down1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(f * 4, (3, 3), dtype=self.dtype, name="mid")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(f * 2 * 4, (3, 3), dtype=self.dtype, name="up1")(h)
        h = _pixel_shuffle(h)
        h = jnp.concatenate([h, s1], axis=-1)
        h = nn.Conv(f * 4, (3, 3), dtype=self.dtype, name="up0")(
            nn.leaky_relu(h, 0.2)
        )
        h = _pixel_shuffle(h)
        h = jnp.concatenate([h, s0], axis=-1)
        logits = nn.Conv(1, (3, 3), dtype=jnp.float32, name="head")(h.astype(jnp.float32))
        return nn.sigmoid(logits[..., 0])


def make_neural_saliency_fn(model: SaliencyNet, params):
    """Wrap trained params as a registered-compatible saliency fn."""
    import jax

    @jax.jit
    def fn(frames):
        return model.apply(params, frames.astype(jnp.float32))

    return fn
