"""Foreground saliency slot.

The reference runs the UFO video co-segmentation network (GPU, forked
weights) to mark foreground blocks (reference elvis.py:1057-1157). Weights
for such models are external; the framework therefore defines saliency as
a pluggable slot with self-contained defaults so the whole pipeline runs
hermetically (SURVEY.md §7.3 item 5), plus a neural backend
(elvis_tpu.models.saliency_net) that can load trained parameters.

A saliency function maps ``frames (N, H, W, C)`` -> ``mask (N, H, W)``
float in [0, 1] (>= 0.5 means foreground). Registered by name so configs
can select a backend the way the reference selects model forks.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from elvis_tpu.ops.color import rgb_to_gray
from elvis_tpu.ops.filter import gaussian_blur

__all__ = [
    "register_saliency",
    "get_saliency_fn",
    "center_prior_saliency",
    "motion_contrast_saliency",
]

SaliencyFn = Callable[[jnp.ndarray], jnp.ndarray]

_REGISTRY: Dict[str, SaliencyFn] = {}


def register_saliency(name: str):
    def deco(fn: SaliencyFn) -> SaliencyFn:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_saliency_fn(name: str) -> SaliencyFn:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown saliency backend {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


@register_saliency("center_prior")
def center_prior_saliency(frames: jnp.ndarray) -> jnp.ndarray:
    """Photographic center prior: isotropic Gaussian bump, sigma = 1/4 of
    the short side. The weakest but fully deterministic default."""
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    yy = (jnp.arange(h) - (h - 1) / 2.0) / (min(h, w) / 2.0)
    xx = (jnp.arange(w) - (w - 1) / 2.0) / (min(h, w) / 2.0)
    r2 = yy[:, None] ** 2 + xx[None, :] ** 2
    bump = jnp.exp(-r2 / (2 * 0.5**2))
    return jnp.broadcast_to(bump / bump.max(), (n, h, w))


@register_saliency("motion_contrast")
def motion_contrast_saliency(frames: jnp.ndarray) -> jnp.ndarray:
    """Self-contained heuristic: temporal motion energy x color contrast
    vs the frame's mean color, center-weighted. Gives a usable
    object-vs-background split on camera-static clips without any weights.
    """
    x = frames.astype(jnp.float32)
    n = x.shape[0]

    # Color contrast: distance from per-frame mean color.
    mean_color = x.mean(axis=(1, 2), keepdims=True)
    contrast = jnp.sqrt(((x - mean_color) ** 2).sum(axis=-1))  # (N,H,W)

    # Motion: luma temporal gradient (forward/backward average inside).
    gray = rgb_to_gray(x)
    d_fwd = jnp.abs(jnp.diff(gray, axis=0))
    motion = jnp.concatenate([d_fwd[:1], (d_fwd[:-1] + d_fwd[1:]) / 2.0, d_fwd[-1:]], axis=0) if n > 2 else (
        jnp.concatenate([d_fwd, d_fwd], axis=0) if n == 2 else jnp.zeros_like(gray)
    )

    def norm01(a):
        lo = a.min(axis=(1, 2), keepdims=True)
        hi = a.max(axis=(1, 2), keepdims=True)
        return (a - lo) / (hi - lo + 1e-8)

    sal = norm01(contrast) * (0.5 + 0.5 * norm01(motion))
    sal = sal * center_prior_saliency(frames) ** 0.5
    sal = gaussian_blur(sal[..., None], 5, 2.0)[..., 0]
    return norm01(sal)


_NEURAL_SALIENCY_FN = None


def _neural_saliency_prepare():
    """Load the shipped SaliencyNet checkpoint ONCE per process (module
    cache), falling back to the motion-contrast heuristic without weights
    (an untrained segmenter is not a usable mask source).

    Exposed as ``neural_saliency.prepare`` so callers that jit around the
    backend (the pipeline's chunked scoring) can resolve the restore —
    which includes a device_put — OUTSIDE any trace; once cached, the
    params are closure constants under tracing, never tracers."""
    import os

    global _NEURAL_SALIENCY_FN
    if _NEURAL_SALIENCY_FN is None:
        import numpy as np

        from elvis_tpu.models import SaliencyNet, make_neural_saliency_fn
        from elvis_tpu.models.io import default_checkpoint_dir, load_params

        path = os.path.join(default_checkpoint_dir(), "saliency")
        if not os.path.isdir(path):
            _NEURAL_SALIENCY_FN = motion_contrast_saliency
        else:
            model = SaliencyNet()
            params = load_params(model, path, np.zeros((2, 16, 16, 3), np.float32))
            _NEURAL_SALIENCY_FN = make_neural_saliency_fn(model, params)
    return _NEURAL_SALIENCY_FN


@register_saliency("neural")
def neural_saliency(frames: jnp.ndarray) -> jnp.ndarray:
    """SaliencyNet (the UFO slot, elvis_tpu.models.saliency_net); see
    :func:`_neural_saliency_prepare` for the load-once/fallback policy."""
    return _neural_saliency_prepare()(frames)


neural_saliency.prepare = _neural_saliency_prepare


def saliency_to_block_mask(saliency: jnp.ndarray, block_size: int, threshold: float = 0.5) -> jnp.ndarray:
    """Pixel saliency -> per-block foreground bool (nearest-equivalent of
    the reference's cv2 INTER_NEAREST mask downsize, elvis.py:1191)."""
    from elvis_tpu.core.blocks import blockwise_reduce

    pooled = blockwise_reduce(saliency.astype(jnp.float32), block_size, jnp.mean)
    return pooled >= threshold
