"""Score fusion: complexity + saliency -> removability / importance maps.

Exact formula parity:
  * removability — reference elvis.py:1160-1220:
      norm SC, TC to [0,1] over the clip;
      scores[:-1] = alpha*SC[:-1] + (1-alpha)*TC[1:]; scores[-1] = SC[-1];
      background blocks (saliency mask == 0) *= 10;
      beta smoothing: out[1:] = beta*scores[1:] + (1-beta)*scores[:-1];
      final min-max normalize over the clip.
  * importance — reference utils.py:665-688 / presley.py:129-152:
      same alpha fusion and beta smoothing, then multiply by -1 where the
      block foreground weight < 0.5 (by the weight itself elsewhere), and
      min-max normalize PER FRAME.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["normalize01", "removability_scores", "importance_scores"]


def normalize01(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    lo = x.min(axis=axis, keepdims=axis is not None)
    hi = x.max(axis=axis, keepdims=axis is not None)
    return (x - lo) / (hi - lo + 1e-8)


def _alpha_fuse(sc: jnp.ndarray, tc: jnp.ndarray, alpha: float) -> jnp.ndarray:
    fused_head = alpha * sc[:-1] + (1 - alpha) * tc[1:]
    return jnp.concatenate([fused_head, sc[-1:]], axis=0)


def _beta_smooth(scores: jnp.ndarray, beta: float) -> jnp.ndarray:
    if scores.shape[0] < 2 or beta >= 1:
        return scores
    tail = beta * scores[1:] + (1 - beta) * scores[:-1]
    return jnp.concatenate([scores[:1], tail], axis=0)


def removability_scores(
    sc: jnp.ndarray,
    tc: jnp.ndarray,
    block_fg_mask: jnp.ndarray,
    alpha: float = 0.5,
    smoothing_beta: float = 0.5,
    background_boost: float = 10.0,
) -> jnp.ndarray:
    """``(N,By,Bx)`` SC/TC + boolean fg mask -> removability in [0,1].

    High score = safe to degrade. Background blocks get a 10x boost
    (elvis.py:1195-1197) before smoothing and the final clip-wide
    normalization (elvis.py:1218).
    """
    sc_n = normalize01(sc)
    tc_n = normalize01(tc)
    scores = _alpha_fuse(sc_n, tc_n, alpha)
    scores = jnp.where(block_fg_mask, scores, scores * background_boost)
    scores = _beta_smooth(scores, smoothing_beta)
    return normalize01(scores)


def importance_scores(
    sc: jnp.ndarray,
    tc: jnp.ndarray,
    block_fg_weight: jnp.ndarray,
    alpha: float = 0.5,
    beta: float = 0.5,
) -> jnp.ndarray:
    """PRESLEY variant (utils.py:665-688): importance, inverted sense —
    high = keep quality. ``block_fg_weight`` is float in [0,1]; weights
    < 0.5 are replaced by -1 (pushing background importance negative
    before the per-frame normalize).
    """
    scores = _alpha_fuse(sc, tc, alpha)
    scores = _beta_smooth(scores, beta)
    fg = jnp.where(block_fg_weight < 0.5, -1.0, block_fg_weight)
    scores = scores * fg
    return normalize01(scores, axis=(1, 2))
