"""LPIPS-class perceptual distance.

The reference computes LPIPS with a pretrained AlexNet backbone
(elvis.py:3163-3195, per-device model cache). Pretrained weights cannot
be fetched in this environment, so the backbone is TRAINED IN-FRAMEWORK
with the LPIPS 2AFC ranking recipe (elvis_tpu.train.cli
``train_perceptual``: d(clean, weak) < d(clean, strong) along distortion
paths) and auto-loaded from ``checkpoints/perceptual``. Without that
checkpoint the fallback is a *fixed random-feature CNN* (seeded, frozen)
— the LPIPS formula with random filters, a well-studied surrogate.
The metric name in reports stays 'lpips' for schema compatibility
(elvis.py:3890-3893).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["PerceptualNet", "lpips_distance", "lpips_pairwise"]


class PerceptualNet(nn.Module):
    """5-stage strided conv stack (AlexNet-shaped receptive-field ladder)."""

    features: tuple = (32, 64, 128, 128, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        h = x
        strides = (2, 2, 2, 1, 1)
        kernels = (7, 5, 3, 3, 3)
        for i, (f, s, k) in enumerate(zip(self.features, strides, kernels)):
            h = nn.Conv(f, (k, k), strides=(s, s), dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
            feats.append(h)
        return feats


_default_cache = None


def _default_params_and_model():
    """Backbone + params, built/loaded ONCE per process. Must be called
    (at least once) outside any jit trace — the checkpoint restore places
    concrete arrays, which cannot happen on tracers; callers embedding
    lpips_distance inside a jitted graph call ensure_loaded() first."""
    global _default_cache
    if _default_cache is not None:
        return _default_cache
    model = PerceptualNet()
    import os

    from elvis_tpu.models.io import default_checkpoint_dir

    ckpt = os.path.join(default_checkpoint_dir(), "perceptual")
    if os.path.isdir(ckpt):
        from elvis_tpu.models.io import load_params as _load_ckpt

        _default_cache = (model, _load_ckpt(model, ckpt, jnp.zeros((1, 64, 64, 3))))
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(1234), jnp.zeros((1, 64, 64, 3))
        )
        _default_cache = (model, params)
    return _default_cache


def ensure_loaded() -> None:
    """Materialize the default backbone outside jit (see above)."""
    _default_params_and_model()


def lpips_pairwise(model: PerceptualNet, params, ref: jnp.ndarray, dec: jnp.ndarray):
    """Differentiable LPIPS formula for a given backbone — the training
    objective surface (unit-normalized per-layer feature L2, layer mean)."""
    r = ref.astype(jnp.float32) / 127.5 - 1.0
    d = dec.astype(jnp.float32) / 127.5 - 1.0
    fr = model.apply(params, r)
    fd = model.apply(params, d)
    dists = []
    for a, b in zip(fr, fd):
        diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        dists.append(diff.mean(axis=(1, 2, 3)))
    return jnp.stack(dists, axis=0).mean(axis=0)


_loaded_params: Optional[Any] = None


def load_params(params) -> None:
    """Install trained backbone params (replaces the random features)."""
    global _loaded_params
    _loaded_params = params


def _unit_normalize(f):
    return f / jnp.sqrt((f**2).sum(-1, keepdims=True) + 1e-10)


@jax.jit
def _lpips_impl(params, ref, dec):
    model, _ = _default_params_and_model()
    return lpips_pairwise(model, params, ref, dec)


def lpips_distance(ref: jnp.ndarray, dec: jnp.ndarray) -> jnp.ndarray:
    """``(N,H,W,3)`` [0,255] pairs -> (N,) perceptual distances."""
    _, params = _default_params_and_model()
    if _loaded_params is not None:
        params = _loaded_params
    return _lpips_impl(params, ref, dec)
