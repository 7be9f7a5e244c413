"""Color space conversions (RGB <-> YCbCr/gray, planar YUV420 for the codec).

The reference converts with OpenCV (BGR2YCrCb for SSIM luma at
elvis.py:680-681, BGR2GRAY, and ffmpeg yuv420p at the codec boundary).
This framework is RGB end-to-end; conversions are fused elementwise math.

Full-range BT.601 coefficients (identical to OpenCV's YCrCb):
  Y  = 0.299 R + 0.587 G + 0.114 B
  Cb = (B - Y) * 0.564 + 128
  Cr = (R - Y) * 0.713 + 128
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rgb_to_gray", "rgb_to_ycbcr", "ycbcr_to_rgb", "rgb_to_yuv420", "yuv420_to_rgb"]


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """``(..., H, W, 3) -> (..., H, W)`` luma (BT.601, cv2.COLOR_RGB2GRAY)."""
    x = rgb.astype(jnp.float32)
    y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        return jnp.clip(jnp.round(y), 0, 255).astype(rgb.dtype)
    return y


def rgb_to_ycbcr(rgb: jnp.ndarray) -> jnp.ndarray:
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + 128.0
    cr = (r - y) * 0.713 + 128.0
    out = jnp.stack([y, cb, cr], axis=-1)
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(rgb.dtype)
    return out


def ycbcr_to_rgb(ycc: jnp.ndarray) -> jnp.ndarray:
    x = ycc.astype(jnp.float32)
    y, cb, cr = x[..., 0], x[..., 1] - 128.0, x[..., 2] - 128.0
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    out = jnp.stack([r, g, b], axis=-1)
    if jnp.issubdtype(ycc.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(ycc.dtype)
    return out


def rgb_to_yuv420(rgb: jnp.ndarray):
    """``(N, H, W, 3) -> (Y (N,H,W), Cb (N,H/2,W/2), Cr (N,H/2,W/2))``.

    Chroma is 2x2 box-subsampled (the standard yuv420p decimation the
    reference gets from ffmpeg's ``-pix_fmt yuv420p``).
    """
    ycc = rgb_to_ycbcr(rgb).astype(jnp.float32)
    y = ycc[..., 0]
    n, h, w = y.shape[0], y.shape[-2], y.shape[-1]
    cb = ycc[..., 1].reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr = ycc[..., 2].reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        rnd = lambda a: jnp.clip(jnp.round(a), 0, 255).astype(rgb.dtype)
        return rnd(y), rnd(cb), rnd(cr)
    return y, cb, cr


def yuv420_to_rgb(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rgb_to_yuv420 with nearest-neighbour chroma upsampling."""
    up = lambda c: jnp.repeat(jnp.repeat(c, 2, axis=-1), 2, axis=-2)
    ycc = jnp.stack([y.astype(jnp.float32), up(cb).astype(jnp.float32), up(cr).astype(jnp.float32)], axis=-1)
    out = ycbcr_to_rgb(ycc)
    if jnp.issubdtype(y.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(y.dtype)
    return out.astype(y.dtype) if out.dtype != y.dtype else out
