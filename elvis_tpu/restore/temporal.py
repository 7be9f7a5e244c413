"""Temporal blending and halo-tile helpers.

Parity targets:
  * temporal blend — the reference blends each restored frame with the
    previous restored frame, ``out[t] = (1-tb)*frame[t] + tb*out[t-1]``
    (DEGRADATION_ABLATION_REPORT.tex:244-260 measured tb=0.1 as +0.03..0.92%
    SSIM). A sequential recurrence -> ``lax.scan`` over the frame axis.
  * halo tiles — utils.py:1227-1250 clamp-extended tile extraction with a
    context halo, used to give per-block restorers neighbourhood context.
  * feathered spatial tiling — utils.py:176-326 ``resource_aware_restore``:
    process tiles with overlap and blend with linear feather ramps. Here a
    tile grid is only needed for models whose receptive field must be
    bounded; the feathered accumulate is one weighted scatter-add.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["temporal_blend", "extract_halo_tiles", "feathered_tile_apply"]


def temporal_blend(frames: jnp.ndarray, blend: float = 0.1) -> jnp.ndarray:
    """IIR blend along the frame axis (frame 0 unchanged)."""
    if blend <= 0:
        return frames
    x = frames.astype(jnp.float32)

    def step(prev, cur):
        out = (1.0 - blend) * cur + blend * prev
        return out, out

    _, blended = jax.lax.scan(step, x[0], x[1:])
    out = jnp.concatenate([x[:1], blended], axis=0)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)


def extract_halo_tiles(frames: jnp.ndarray, tile: int, halo: int) -> jnp.ndarray:
    """``(N,H,W,C)`` -> ``(N,Ty,Tx,tile+2*halo,tile+2*halo,C)`` with
    clamp-to-edge halos (utils.py:1227-1250 semantics). H, W must be
    multiples of ``tile``."""
    n, h, w, c = frames.shape
    ty, tx = h // tile, w // tile
    padded = jnp.pad(frames, ((0, 0), (halo, halo), (halo, halo), (0, 0)), mode="edge")
    size = tile + 2 * halo
    tiles = []
    for i in range(ty):
        row = []
        for j in range(tx):
            row.append(padded[:, i * tile : i * tile + size, j * tile : j * tile + size])
        tiles.append(jnp.stack(row, axis=1))
    return jnp.stack(tiles, axis=1)  # (N,Ty,Tx,size,size,C)


def feathered_tile_apply(
    frames: jnp.ndarray,
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    tile: int,
    halo: int,
) -> jnp.ndarray:
    """Apply ``fn`` per halo tile and re-assemble with linear feathering in
    the overlap (utils.py:282-294 semantics: float32 accumulate + weight
    normalize). ``fn`` maps ``(M,size,size,C) -> (M,size,size,C)``."""
    n, h, w, c = frames.shape
    ty, tx = h // tile, w // tile
    size = tile + 2 * halo
    tiles = extract_halo_tiles(frames, tile, halo)  # (N,Ty,Tx,s,s,C)
    flat = tiles.reshape(n * ty * tx, size, size, c)
    out_tiles = fn(flat.astype(jnp.float32)).reshape(n, ty, tx, size, size, c)

    # Linear feather ramp over the halo region.
    ramp = jnp.minimum(jnp.arange(size, dtype=jnp.float32) + 1, halo + 1) / (halo + 1)
    ramp = jnp.minimum(ramp, ramp[::-1])
    weight = ramp[:, None] * ramp[None, :]  # (s,s)

    acc = jnp.zeros((n, h + 2 * halo, w + 2 * halo, c), dtype=jnp.float32)
    wacc = jnp.zeros((n, h + 2 * halo, w + 2 * halo, 1), dtype=jnp.float32)
    for i in range(ty):
        for j in range(tx):
            ys, xs = i * tile, j * tile
            acc = acc.at[:, ys : ys + size, xs : xs + size].add(
                out_tiles[:, i, j] * weight[..., None]
            )
            wacc = wacc.at[:, ys : ys + size, xs : xs + size].add(weight[..., None, None].reshape(size, size, 1))
    out = acc[:, halo : halo + h, halo : halo + w] / jnp.maximum(
        wacc[:, halo : halo + h, halo : halo + w], 1e-8
    )
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)
