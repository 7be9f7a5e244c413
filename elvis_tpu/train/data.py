"""Synthetic training data: procedurally generated clips + degradations.

The reference trains nothing (all its models are external pretrained
forks); this framework ships trainable restorers, so it needs data. With
zero network egress, training pairs are manufactured on device: structured
procedural video (moving gradients, textured patches, edges — matched to
the block-compression artifacts being restored) degraded by the
framework's own degradation ops, which is exactly the distribution the
restorers see at inference time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["synthetic_frames", "synthetic_sr_batch", "synthetic_video_batch"]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def synthetic_frames(rng, batch: int, height: int, width: int) -> jnp.ndarray:
    """Procedural content with edges, texture, and smooth regions."""
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :, None]

    freq = jax.random.uniform(k1, (batch, 1, 1, 3), minval=0.02, maxval=0.4)
    phase = jax.random.uniform(k2, (batch, 1, 1, 3), minval=0.0, maxval=6.28)
    angle = jax.random.uniform(k3, (batch, 1, 1, 1), minval=0.0, maxval=3.14)
    waves = 90 * jnp.sin(freq * (xx * jnp.cos(angle) + yy * jnp.sin(angle)) + phase)

    # random rectangles (hard edges)
    cy = jax.random.uniform(k4, (batch, 1, 1, 1), minval=0.2, maxval=0.8) * height
    cx = jax.random.uniform(k5, (batch, 1, 1, 1), minval=0.2, maxval=0.8) * width
    rect = ((jnp.abs(yy - cy) < height / 6) & (jnp.abs(xx - cx) < width / 6)).astype(
        jnp.float32
    ) * 70.0

    noise = 6.0 * jax.random.normal(k1, (batch, height, width, 3))
    img = 128.0 + waves + rect + noise
    return jnp.clip(img, 0, 255)


@functools.partial(jax.jit, static_argnums=(1, 2))
def synthetic_sr_batch(rng, batch: int, patch: int = 64):
    """(low_res (B,p/2,p/2,3), high_res (B,p,p,3)) in [0,255] float32 —
    SR pairs via the framework's own area downsample."""
    from elvis_tpu.ops.resize import resize

    hi = synthetic_frames(rng, batch, patch, patch)
    lo = resize(hi, (patch // 2, patch // 2), method="area")
    return lo, hi


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def synthetic_video_batch(rng, frames: int, height: int, width: int):
    """A short clip with coherent motion (for temporal models)."""
    k1, k2 = jax.random.split(rng)
    base = synthetic_frames(k1, 1, height, width)[0]
    shifts = jnp.cumsum(
        jax.random.randint(k2, (frames, 2), minval=-3, maxval=4), axis=0
    )

    def shift_frame(s):
        return jnp.roll(jnp.roll(base, s[0], axis=0), s[1], axis=1)

    return jax.vmap(shift_frame)(shifts)
