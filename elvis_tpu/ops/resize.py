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


@functools.lru_cache(maxsize=8)
def _phase_weights_2x(method: str):
    """Interior tap weights for an exact 2x upscale, one row per output
    phase: out[2i+p] = sum_k w[p][k] * in_padded[i + k + off[p]].

    Derived from the SAME kernel/normalization as ``_tap_matrix`` (so the
    fast path reproduces the dense matrix bit-near-exactly): output
    centers sit at src coordinates i - 0.25 (even) and i + 0.25 (odd),
    and ``_tap_matrix``'s index clamping is exactly edge-replicate
    padding of the input."""
    kernel = _linear_kernel if method == "linear" else _lanczos_kernel(4)
    support = 1.0 if method == "linear" else 4.0
    out = []
    for phase in (0, 1):
        c = 0.5 * phase - 0.25
        i0 = int(np.floor(c - support + 1))
        i1 = int(np.floor(c + support)) + 1
        taps = np.arange(i0, i1)
        w = kernel((taps - c).astype(np.float64))
        out.append((i0, (w / w.sum()).astype(np.float32)))
    return out


_UP2X_PAD = 4  # covers lanczos4's reach (support 4); linear uses 1 of it


def _upsample2x_axis(x: jnp.ndarray, axis: int, method: str) -> jnp.ndarray:
    """Exact 2x upscale along ``axis`` as 8 (lanczos4) or 2 (linear)
    shifted multiply-adds instead of a dense (2N, N) matmul — the dense
    matrix is >99% zeros, and at 4K the wasted MXU FLOPs dominated the
    progressive loop's final stage (VERDICT r3 #4). Pure elementwise
    ops: XLA fuses the taps into one HBM pass."""
    n = x.shape[axis]
    pw = _phase_weights_2x(method)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (_UP2X_PAD, _UP2X_PAD)
    xp = jnp.pad(x, pad, mode="edge")

    phases = []
    for i0, w in pw:
        acc = None
        for k, wk in enumerate(w):
            s = jax.lax.slice_in_dim(xp, _UP2X_PAD + i0 + k,
                                     _UP2X_PAD + i0 + k + n, axis=axis)
            acc = s * wk if acc is None else acc + s * wk
        phases.append(acc)
    # interleave even/odd along axis: (..., N, 2, ...) -> (..., 2N, ...)
    stacked = jnp.stack(phases, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return stacked.reshape(shape)


def upsample2x_phases(x: jnp.ndarray, method: str = "lanczos4") -> jnp.ndarray:
    """Exact 2x upscale in PHASE form: ``(..., H, W, C) -> (..., H, W, 2, 2, C)``
    where ``out[..., i, j, a, b, c]`` is the interleaved result's pixel
    ``(2i+a, 2j+b)``. Same taps/edge handling as the interleaved fast path
    (``_upsample2x_axis``), minus the final 2x-resolution transpose.

    This is the residual-at-input-resolution layout for the SR final
    stage (VERDICT r4 #3): everything downstream of the upsample — tail
    conv, residual add, clip, block re-injection — can run on the
    low-res-spatial phase tensor and the full-res frame is materialized
    exactly ONCE by ``interleave_phases``. Float32 in, float32 out.
    """
    *lead, h, w, c = x.shape
    pw = _phase_weights_2x(method)
    nd = x.ndim

    def taps(xp, axis, i0, wts):
        n = x.shape[axis]
        acc = None
        for k, wk in enumerate(wts):
            s = jax.lax.slice_in_dim(xp, _UP2X_PAD + i0 + k,
                                     _UP2X_PAD + i0 + k + n, axis=axis)
            acc = s * wk if acc is None else acc + s * wk
        return acc

    pad_h = [(0, 0)] * nd
    pad_h[nd - 3] = (_UP2X_PAD, _UP2X_PAD)
    xp = jnp.pad(x, pad_h, mode="edge")
    rows = [taps(xp, nd - 3, i0, wts) for i0, wts in pw]  # 2 x (..., H, W, C)

    out_ab = []
    for r in rows:
        pad_w = [(0, 0)] * nd
        pad_w[nd - 2] = (_UP2X_PAD, _UP2X_PAD)
        rp = jnp.pad(r, pad_w, mode="edge")
        out_ab.append(jnp.stack(
            [taps(rp, nd - 2, i0, wts) for i0, wts in pw], axis=-2
        ))  # (..., H, W, 2, C)
    return jnp.stack(out_ab, axis=-3)  # (..., H, W, 2, 2, C)


def interleave_phases(y: jnp.ndarray) -> jnp.ndarray:
    """``(..., H, W, 2, 2, C) -> (..., 2H, 2W, C)`` — the single full-res
    materialization of the phase-form pipeline."""
    *lead, h, w, a, b, c = y.shape
    perm = list(range(y.ndim - 5)) + [y.ndim - 5, y.ndim - 3, y.ndim - 4,
                                      y.ndim - 2, y.ndim - 1]
    return y.transpose(perm).reshape(*lead, 2 * h, 2 * w, c)


def deinterleave_phases(x: jnp.ndarray) -> jnp.ndarray:
    """``(..., 2H, 2W, C) -> (..., H, W, 2, 2, C)`` (inverse of
    ``interleave_phases``)."""
    *lead, h2, w2, c = x.shape
    y = x.reshape(*lead, h2 // 2, 2, w2 // 2, 2, c)
    perm = list(range(y.ndim - 5)) + [y.ndim - 5, y.ndim - 3, y.ndim - 4,
                                      y.ndim - 2, y.ndim - 1]
    return y.transpose(perm)


def _area_downsample_int(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Exact integer-factor box filter: reshape + mean (the area matrix
    at an integer factor is exactly 1/f over f consecutive samples).
    One HBM pass instead of two dense full-resolution matmuls."""
    *lead, h, w, c = x.shape
    fh, fw = h // out_h, w // out_w
    y = x.reshape(*lead, out_h, fh, out_w, fw, c)
    return y.mean(axis=(-4, -2))


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

    orig_dtype = images.dtype
    xf = x.astype(jnp.float32)
    # Fast paths (bit-near-exact vs the dense matrices — same weights,
    # same float32 accumulation, fewer terms per output):
    #  * exact 2x upscale as shifted taps (the progressive loop's
    #    upsample + every SR tier's Lanczos base);
    #  * integer-factor area downscale as reshape-mean (the loop's
    #    injection pyramid, adaptive_downsample's per-level reductions).
    if method in ("linear", "lanczos4") and (out_h, out_w) == (2 * h, 2 * w):
        y = _upsample2x_axis(xf, x.ndim - 3, method)
        y = _upsample2x_axis(y, x.ndim - 2, method)
    elif (method == "area" and out_h <= h and out_w <= w
          and h % out_h == 0 and w % out_w == 0):
        y = _area_downsample_int(xf, out_h, out_w)
    else:
        ah = jnp.asarray(resize_matrix(out_h, h, method), dtype=jnp.float32)
        aw = jnp.asarray(resize_matrix(out_w, w, method), dtype=jnp.float32)
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
