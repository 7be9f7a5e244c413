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
    """Procedural content mixing oriented waves, hard-edged rectangles,
    smooth disks, multi-frequency texture, and varying noise — a broad
    family so restorers generalize past any single pattern."""
    keys = jax.random.split(rng, 10)
    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :, None]

    freq = jax.random.uniform(keys[0], (batch, 1, 1, 3), minval=0.02, maxval=0.5)
    phase = jax.random.uniform(keys[1], (batch, 1, 1, 3), minval=0.0, maxval=6.28)
    angle = jax.random.uniform(keys[2], (batch, 1, 1, 1), minval=0.0, maxval=3.14)
    amp = jax.random.uniform(keys[3], (batch, 1, 1, 1), minval=20.0, maxval=90.0)
    waves = amp * jnp.sin(freq * (xx * jnp.cos(angle) + yy * jnp.sin(angle)) + phase)

    # fine texture at a second frequency
    freq2 = jax.random.uniform(keys[4], (batch, 1, 1, 3), minval=0.3, maxval=1.2)
    tex = 25 * jnp.sin(freq2 * (xx + 2 * yy))

    # hard-edged rectangle
    cy = jax.random.uniform(keys[5], (batch, 1, 1, 1), minval=0.2, maxval=0.8) * height
    cx = jax.random.uniform(keys[6], (batch, 1, 1, 1), minval=0.2, maxval=0.8) * width
    rect = ((jnp.abs(yy - cy) < height / 6) & (jnp.abs(xx - cx) < width / 6)).astype(
        jnp.float32
    ) * jax.random.uniform(keys[5], (batch, 1, 1, 1), minval=-70, maxval=70)

    # smooth disk (round objects / soft shading)
    dy = jax.random.uniform(keys[7], (batch, 1, 1, 1), minval=0.2, maxval=0.8) * height
    dx = jax.random.uniform(keys[8], (batch, 1, 1, 1), minval=0.2, maxval=0.8) * width
    r = jax.random.uniform(keys[9], (batch, 1, 1, 1), minval=0.1, maxval=0.3) * min(height, width)
    disk = 60.0 * jnp.exp(-(((yy - dy) ** 2 + (xx - dx) ** 2) / (r**2 + 1e-6)))

    sigma = jax.random.uniform(keys[4], (batch, 1, 1, 1), minval=0.0, maxval=6.0)
    noise = sigma * jax.random.normal(keys[0], (batch, height, width, 3))
    img = 128.0 + waves + tex + rect + disk + noise
    return jnp.clip(img, 0, 255)


@functools.partial(jax.jit, static_argnums=(1, 2))
def synthetic_sr_batch(rng, batch: int, patch: int = 64):
    """(low_res (B,p/2,p/2,3), high_res (B,p,p,3)) in [0,255] float32 —
    SR pairs via the framework's own area downsample.

    A random third of the targets are themselves area-downsampled 2x
    (then used at patch res), matching the progressive loop's
    intermediate stages where the 2x upsampler runs on already-reduced
    frames (elvis_tpu.restore.progressive)."""
    from elvis_tpu.ops.resize import resize

    k1, k2 = jax.random.split(rng)
    hi = synthetic_frames(k1, batch, patch * 2, patch * 2)
    hi_native = resize(hi, (patch, patch), method="area")  # band-limited content
    hi_sharp = hi[:, :patch, :patch]  # full-bandwidth crop
    pick = jax.random.bernoulli(k2, 0.5, (batch, 1, 1, 1))
    hi = jnp.where(pick, hi_sharp, hi_native)
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
