"""DiffusionRestorer — conditional diffusion restoration (InstantIR/SinSR slot).

Fills the diffusion-restoration position: the reference drives InstantIR
(an SDXL-scale latent diffusion model) with an adaptive round loop that
re-injects finished blocks between denoising rounds (elvis.py:2869-3160);
its README names SinSR (single-step diffusion SR). Here:

  * a compact pixel-space conditional UNet predicts noise given the
    degraded frame as conditioning;
  * DDIM sampling runs as a ``lax.scan`` over a static timestep schedule
    — the whole sampler is one compiled graph on device (no per-step
    host round trips, unlike the reference's per-round subprocess
    batches);
  * ``restore_adaptive`` reproduces the reference's round-loop semantics:
    after each denoising round, blocks whose strength counter reaches
    zero are re-injected from the degraded input (masked scatter,
    elvis.py:2947-2981), so lightly-degraded blocks exit the diffusion
    early — which is exactly the block-wise acceleration the PAPERS.md
    literature (block caching / timestep-aware masking) prescribes.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from elvis_tpu.core.blocks import upsample_map

__all__ = ["DiffusionRestorer"]


class _CondUNet(nn.Module):
    features: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_noisy, cond, t_embed):
        """x_noisy/cond ``(N,H,W,3)`` in [-1,1]; t_embed ``(N, E)``."""
        h = jnp.concatenate([x_noisy, cond], axis=-1).astype(self.dtype)
        f = self.features
        te = nn.Dense(f * 2, dtype=self.dtype)(t_embed.astype(self.dtype))
        h = nn.Conv(f, (3, 3), dtype=self.dtype, name="in")(h)
        h = nn.leaky_relu(h, 0.2)
        s0 = h
        h = nn.Conv(f * 2, (3, 3), strides=(2, 2), dtype=self.dtype, name="d0")(h)
        h = nn.leaky_relu(h + te[:, None, None, :], 0.2)
        h = nn.Conv(f * 2, (3, 3), dtype=self.dtype, name="m0")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(f * 2, (3, 3), dtype=self.dtype, name="m1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(f * 4, (3, 3), dtype=self.dtype, name="u0")(h)
        n, hh, ww, c = h.shape
        h = h.reshape(n, hh, ww, 2, 2, c // 4).transpose(0, 1, 3, 2, 4, 5).reshape(
            n, hh * 2, ww * 2, c // 4
        )
        h = jnp.concatenate([h, s0], axis=-1)
        h = nn.Conv(f, (3, 3), dtype=self.dtype, name="out0")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(3, (3, 3), dtype=jnp.float32, kernel_init=nn.initializers.zeros, name="eps")(h.astype(jnp.float32))


def _time_embedding(t: jnp.ndarray, dim: int = 32) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class DiffusionRestorer:
    """Wraps the UNet with a cosine schedule, DDIM sampler, and the
    adaptive block-re-injection loop."""

    def __init__(self, features: int = 32, num_train_steps: int = 1000):
        self.unet = _CondUNet(features=features)
        self.num_train_steps = num_train_steps
        t = np.arange(num_train_steps + 1, dtype=np.float64) / num_train_steps
        alpha_bar = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        self.alpha_bar = jnp.asarray(alpha_bar / alpha_bar[0], dtype=jnp.float32)

    def init(self, rng, shape=(1, 32, 32, 3)):
        x = jnp.zeros(shape, jnp.float32)
        return self.unet.init(rng, x, x, _time_embedding(jnp.zeros((shape[0],))))

    # -- training ------------------------------------------------------------
    def loss(self, params, rng, clean, degraded):
        """Noise-prediction MSE, conditioning on the degraded frame."""
        n = clean.shape[0]
        x0 = clean.astype(jnp.float32) / 127.5 - 1.0
        cond = degraded.astype(jnp.float32) / 127.5 - 1.0
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (n,), 1, self.num_train_steps)
        ab = self.alpha_bar[t][:, None, None, None]
        noise = jax.random.normal(n_rng, x0.shape)
        x_noisy = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * noise
        eps = self.unet.apply(params, x_noisy, cond, _time_embedding(t))
        return jnp.mean((eps - noise) ** 2)

    # -- sampling ------------------------------------------------------------
    def sample(self, params, degraded, steps: int = 8, rng=None):
        """DDIM from pure noise, conditioned on the degraded frames —
        one lax.scan, fully on device."""
        cond = degraded.astype(jnp.float32) / 127.5 - 1.0
        n = cond.shape[0]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = jax.random.normal(rng, cond.shape)
        ts = jnp.linspace(self.num_train_steps - 1, 1, steps).astype(jnp.int32)

        def ddim_step(x, t):
            tb = jnp.full((n,), t)
            eps = self.unet.apply(params, x, cond, _time_embedding(tb))
            ab_t = self.alpha_bar[t]
            ab_prev = self.alpha_bar[jnp.maximum(t - (self.num_train_steps // steps), 0)]
            x0_pred = (x - jnp.sqrt(1 - ab_t) * eps) / jnp.sqrt(ab_t)
            x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
            x_next = jnp.sqrt(ab_prev) * x0_pred + jnp.sqrt(1 - ab_prev) * eps
            return x_next, None

        x, _ = jax.lax.scan(ddim_step, x, ts)
        return jnp.clip((x + 1.0) * 127.5, 0.0, 255.0)

    def restore_adaptive(
        self,
        params,
        degraded,
        strength_map,
        block_size: int = 8,
        max_rounds: int = 10,
        steps_per_round: int = 2,
        rng=None,
    ):
        """Reference elvis.py:2947-2981 semantics: run denoising rounds;
        after round r, blocks with strength <= r are re-injected from the
        degraded input (they need no further hallucination)."""
        out = degraded.astype(jnp.float32)
        counters = strength_map.astype(jnp.int32)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        for r in range(max_rounds):
            rng, step_rng = jax.random.split(rng)
            restored = self.sample(params, out, steps=steps_per_round, rng=step_rng)
            active = counters > r  # blocks still being restored
            pix = upsample_map(active, block_size)[..., None]
            out = jnp.where(pix, restored, out)
            if bool((np.asarray(counters) <= r + 1).all()):
                break
        return jnp.clip(out, 0.0, 255.0)
