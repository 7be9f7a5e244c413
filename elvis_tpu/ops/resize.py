"""Image resizing as separable sampling-matrix multiplies.

The reference leans on ``cv2.resize`` with INTER_AREA / INTER_LINEAR /
INTER_LANCZOS4 / INTER_NEAREST throughout its degradation and restoration
ops (e.g. reference elvis.py:2161-2163 per-block down/up sampling,
elvis.py:2773-2820 Lanczos restore, elvis.py:2069 score-map regridding).

On TPU a resize is two small matrix multiplies: ``out = A_h @ img @ A_w^T``
where ``A`` encodes the interpolation taps. That keeps the op on the MXU,
makes any filter (box/area, triangle/bilinear, Lanczos-4) a data choice
rather than a code path, and batches trivially over frames and channels.
Sampling conventions follow OpenCV: ``src = (dst + 0.5) * scale - 0.5``
for point-sampling filters, and exact box overlap for area downscale.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Resampling matmuls run at full float32 precision: on TPU the default MXU
# precision is bf16xbf16 which costs up to ~0.5/255 error per resize — too
# much for a metrics-grade pipeline (the north star is PSNR parity within
# 0.1 dB). These matmuls are a tiny fraction of total FLOPs.
_PRECISION = jax.lax.Precision.HIGHEST

__all__ = ["resize", "resize_matrix"]


def _area_matrix(dst: int, src: int) -> np.ndarray:
    """Exact box-filter (cv2 INTER_AREA) weights for downscaling: each dst
    sample averages the src interval it covers, with fractional edge
    overlap. For upscaling callers fall back to bilinear (as cv2 does)."""
    scale = src / dst
    mat = np.zeros((dst, src), dtype=np.float64)
    for d in range(dst):
        lo, hi = d * scale, (d + 1) * scale
        i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
        for s in range(i0, min(i1, src)):
            overlap = min(hi, s + 1) - max(lo, s)
            if overlap > 0:
                mat[d, s] = overlap / scale
    return mat


def _tap_matrix(dst: int, src: int, support: float, kernel_fn) -> np.ndarray:
    """Generic point-sampled separable filter with clamp-to-edge padding
    (cv2 BORDER_REPLICATE behaviour at the borders)."""
    scale = src / dst
    mat = np.zeros((dst, src), dtype=np.float64)
    centers = (np.arange(dst) + 0.5) * scale - 0.5
    for d, c in enumerate(centers):
        i0 = int(np.floor(c - support + 1))
        i1 = int(np.floor(c + support)) + 1
        taps = np.arange(i0, i1)
        w = kernel_fn(taps - c)
        wsum = w.sum()
        if wsum != 0:
            w = w / wsum
        idx = np.clip(taps, 0, src - 1)
        for t, ww in zip(idx, w):
            mat[d, t] += ww
    return mat


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


def _lanczos_kernel(a: int):
    def k(x: np.ndarray) -> np.ndarray:
        x = np.abs(x)
        out = np.where(x < 1e-9, 1.0, np.sinc(x) * np.sinc(x / a))
        return np.where(x >= a, 0.0, out)

    return k


def _nearest_matrix(dst: int, src: int) -> np.ndarray:
    scale = src / dst
    mat = np.zeros((dst, src), dtype=np.float64)
    # cv2 INTER_NEAREST: src index = floor(dst * scale)
    idx = np.minimum((np.arange(dst) * scale).astype(np.int64), src - 1)
    mat[np.arange(dst), idx] = 1.0
    return mat


@functools.lru_cache(maxsize=512)
def resize_matrix(dst: int, src: int, method: str) -> np.ndarray:
    """Build (and cache) the ``(dst, src)`` 1-D resampling matrix."""
    if dst == src:
        return np.eye(dst)
    if method == "nearest":
        return _nearest_matrix(dst, src)
    if method == "area":
        if dst < src:
            return _area_matrix(dst, src)
        method = "linear"  # cv2 INTER_AREA degenerates to bilinear on upscale
    if method == "linear":
        return _tap_matrix(dst, src, 1.0, _linear_kernel)
    if method == "lanczos4":
        return _tap_matrix(dst, src, 4.0, _lanczos_kernel(4))
    raise ValueError(f"unknown resize method {method!r}")


def resize(
    images: jnp.ndarray,
    out_hw: tuple,
    method: str = "linear",
    *,
    clip_uint8_range: bool = True,
    channels: "bool | None" = None,
) -> jnp.ndarray:
    """Resize ``(..., H, W)`` or ``(..., H, W, C)`` images to ``out_hw``.

    Compute runs in float32 on the MXU; the result is cast back to the
    input dtype (rounded + clipped for integer inputs, matching cv2's
    saturate_cast).

    ``channels`` states explicitly whether the trailing dim is a channel
    axis. Leave ``None`` for the heuristic (trailing dim in {1,3,4}), but
    pass ``channels=False`` for channel-less block/score maps, whose
    trailing dim can legitimately be 3 or 4 blocks wide.
    """
    out_h, out_w = out_hw
    if channels is None:
        # Heuristic: a trailing dim of 1/3/4 is a channel axis.
        has_c = images.ndim >= 3 and images.shape[-1] in (1, 3, 4)
    else:
        has_c = bool(channels) and images.ndim >= 3
    in_hw = images.shape[-3:-1] if has_c else images.shape[-2:]
    if tuple(in_hw) == (out_h, out_w) and not (
        clip_uint8_range
        and jnp.issubdtype(images.dtype, jnp.signedinteger)
        and jnp.iinfo(images.dtype).bits == 8
    ):
        # Identity resize: every method's matrix is exactly eye() at
        # dst==src (resize_matrix short-circuits before the method
        # dispatch) and the round/clip tail is a no-op on data already in
        # its own dtype — skip the two full-frame HIGHEST-precision
        # matmuls (the progressive loop's final stage resizes the
        # degraded input to its own resolution). Sole exception: int8
        # with clip_uint8_range, where the tail clips negatives to 0.
        return images
    x = images if has_c else images[..., None]
    *_, h, w, _ = x.shape

    ah = jnp.asarray(resize_matrix(out_h, h, method), dtype=jnp.float32)
    aw = jnp.asarray(resize_matrix(out_w, w, method), dtype=jnp.float32)

    orig_dtype = images.dtype
    xf = x.astype(jnp.float32)
    # (..., H, W, C): rows then cols
    y = jnp.einsum("oh,...hwc->...owc", ah, xf, precision=_PRECISION)
    y = jnp.einsum("pw,...hwc->...hpc", aw, y, precision=_PRECISION)

    if not has_c:
        y = y[..., 0]
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        lo, hi = (0, 255) if clip_uint8_range and info.bits == 8 else (info.min, info.max)
        y = jnp.clip(jnp.round(y), lo, hi)
    return y.astype(orig_dtype)
