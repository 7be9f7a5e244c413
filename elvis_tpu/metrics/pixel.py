"""Masked pixel metrics: PSNR / MSE / SSIM, batched on device.

Parity targets (reference elvis.py:627-721):
  * ``_masked_psnr`` — MSE over mask pixels (all channels), PSNR capped at
    100 dB, empty mask -> 100.
  * ``_masked_mse`` — same, empty mask -> 0.
  * ``_masked_ssim`` — SSIM on the luma (YCrCb Y) channel of the mask's
    bounding-box crop with pixels outside the mask zeroed; the skimage
    call is ``structural_similarity(data_range=255, gaussian_weights=True,
    win_size=7)`` i.e. Gaussian window sigma=1.5 truncated to 7 taps,
    sample-covariance normalization (NP/(NP-1)), border crop of
    (win-1)//2, 'nearest' (edge-replicate) filter padding.

The reference computes these in a per-frame Python loop inside the
evaluation process pool (elvis.py:3840-3860, a CPU hot loop); here whole
clips evaluate as one jitted reduction. Masked SSIM keeps the *static*
full-frame shape and handles the bbox crop by masking the border-cropped
mean — the bbox is data-dependent, and a dynamic crop would force a
recompile per clip; instead the caller passes the (host-computed) bbox
and we slice outside jit.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from elvis_tpu.ops.color import rgb_to_ycbcr

__all__ = ["masked_psnr", "masked_mse", "masked_ssim", "ssim", "mask_union_bbox"]


def masked_mse(ref: jnp.ndarray, dec: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``(N,H,W,C)`` pairs (+ optional ``(N,H,W)`` bool mask) -> (N,) MSE."""
    diff = (ref.astype(jnp.float32) - dec.astype(jnp.float32)) ** 2
    if mask is None:
        return diff.mean(axis=(1, 2, 3))
    m = mask.astype(jnp.float32)[..., None]
    num = (diff * m).sum(axis=(1, 2, 3))
    den = m.sum(axis=(1, 2, 3)) * ref.shape[-1]
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def masked_psnr(ref: jnp.ndarray, dec: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(N,) PSNR in dB, capped at 100 (elvis.py:645-650 semantics)."""
    mse = masked_mse(ref, dec, mask)
    psnr = 20.0 * jnp.log10(255.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
    psnr = jnp.where(mse < 1e-10, 100.0, jnp.minimum(psnr, 100.0))
    if mask is not None:
        empty = mask.astype(jnp.float32).sum(axis=(1, 2)) == 0
        psnr = jnp.where(empty, 100.0, psnr)
    return psnr


@functools.lru_cache(maxsize=16)
def _ssim_window(win_size: int, sigma: float = 1.5) -> np.ndarray:
    """Gaussian taps matching scipy.ndimage.gaussian_filter1d truncated to
    win_size (skimage passes truncate=r/sigma for explicit win_size)."""
    r = (win_size - 1) // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _filter2d_nearest(img: jnp.ndarray, kern: np.ndarray) -> jnp.ndarray:
    """Separable correlation with edge-replicate padding ('nearest')."""
    k = jnp.asarray(kern, dtype=jnp.float32)
    r = (kern.shape[0] - 1) // 2
    x = jnp.pad(img, ((0, 0), (r, r), (r, r)), mode="edge")
    # rows
    out = jnp.zeros_like(img, dtype=jnp.float32)
    for i in range(kern.shape[0]):
        out = out + k[i] * x[:, i : i + img.shape[1], r : r + img.shape[2]]
    x2 = jnp.pad(out, ((0, 0), (0, 0), (r, r)), mode="edge")
    out2 = jnp.zeros_like(img, dtype=jnp.float32)
    for i in range(kern.shape[0]):
        out2 = out2 + k[i] * x2[:, :, i : i + img.shape[2]]
    return out2


def ssim(
    ref_y: jnp.ndarray,
    dec_y: jnp.ndarray,
    data_range: float = 255.0,
    win_size: int = 7,
    *,
    crop_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Gaussian-weighted SSIM over ``(N, H, W)`` luma pairs -> (N,).

    skimage ``structural_similarity(gaussian_weights=True, win_size=7)``
    semantics: sigma=1.5 window, sample covariance (NP/(NP-1)), borders of
    (win-1)//2 cropped from the mean. ``crop_mask`` (N,H,W bool) restricts
    the final mean (used for bbox-restricted evaluation with static
    shapes).
    """
    kern = _ssim_window(win_size)
    x = ref_y.astype(jnp.float32)
    y = dec_y.astype(jnp.float32)

    ux = _filter2d_nearest(x, kern)
    uy = _filter2d_nearest(y, kern)
    uxx = _filter2d_nearest(x * x, kern)
    uyy = _filter2d_nearest(y * y, kern)
    uxy = _filter2d_nearest(x * y, kern)

    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))

    pad = (win_size - 1) // 2
    h, w = s.shape[1], s.shape[2]
    valid = jnp.zeros((h, w), dtype=bool).at[pad : h - pad, pad : w - pad].set(True)
    if crop_mask is not None:
        valid = valid[None] & crop_mask
    else:
        valid = jnp.broadcast_to(valid[None], s.shape)
    vf = valid.astype(jnp.float32)
    return (s * vf).sum(axis=(1, 2)) / jnp.maximum(vf.sum(axis=(1, 2)), 1.0)


def mask_union_bbox(
    masks: np.ndarray, padding_ratio: float = 0.05
) -> Tuple[int, int, int, int]:
    """Padded bbox (x, y, w, h) over the union of ``(N,H,W)`` bool masks —
    host-side (static) geometry, elvis.py:578-612 semantics."""
    masks = np.asarray(masks)
    height, width = masks.shape[-2], masks.shape[-1]
    union = masks.any(axis=0) if masks.ndim == 3 else masks
    if not union.any():
        return (0, 0, width, height)
    ys, xs = np.where(union)
    min_y, max_y = int(ys.min()), int(ys.max())
    min_x, max_x = int(xs.min()), int(xs.max())
    bh, bw = max_y - min_y + 1, max_x - min_x + 1
    pad_y = max(1, int(bh * padding_ratio))
    pad_x = max(1, int(bw * padding_ratio))
    y = max(0, min_y - pad_y)
    x = max(0, min_x - pad_x)
    h = min(height - y, bh + 2 * pad_y)
    w = min(width - x, bw + 2 * pad_x)
    return (x, y, w, h)


def masked_ssim(
    ref: jnp.ndarray,
    dec: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    bbox: Optional[Tuple[int, int, int, int]] = None,
) -> jnp.ndarray:
    """Reference ``_masked_ssim`` (elvis.py:674-721): luma of the masked
    bbox crop, outside-mask pixels zeroed, win 7 (shrunk for tiny crops).

    ``bbox`` is the static (x, y, w, h) crop; compute it on host with
    ``mask_union_bbox`` per clip. Without a mask the SSIM runs full-frame.
    """
    ref_y = rgb_to_ycbcr(ref.astype(jnp.float32))[..., 0]
    dec_y = rgb_to_ycbcr(dec.astype(jnp.float32))[..., 0]
    if mask is None:
        return ssim(ref_y, dec_y)

    if bbox is None:
        bbox = mask_union_bbox(np.asarray(mask))
    x, y, w, h = bbox
    ref_c = ref_y[:, y : y + h, x : x + w]
    dec_c = dec_y[:, y : y + h, x : x + w]
    m = mask[:, y : y + h, x : x + w].astype(bool)
    ref_c = jnp.where(m, ref_c, 0.0)
    dec_c = jnp.where(m, dec_c, 0.0)

    smallest = min(h, w)
    if smallest < 3:
        return jnp.ones((ref.shape[0],), dtype=jnp.float32)
    win = 7 if smallest >= 7 else (smallest if smallest % 2 == 1 else max(3, smallest - 1))
    out = ssim(ref_c, dec_c, win_size=win)
    empty = mask.astype(jnp.float32).sum(axis=(1, 2)) == 0
    return jnp.where(empty, 1.0, out)
