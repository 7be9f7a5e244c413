"""Progressive adaptive super-resolution — the north-star restoration loop.

Parity: reference elvis.py:2522-2600 ``upscale_realesrgan_adaptive``:
  1. downscale the degraded frame to 1/max_factor resolution (area);
  2. repeat: 2x upsample the whole frame with a pluggable ``upsample_fn``
     (Real-ESRGAN in the reference; any callable here — Lanczos default,
     elvis_tpu.models.srnet neural 2x for the learned path);
  3. after each stage, re-inject blocks whose original downsample factor
     <= the current stage factor from the (area-resized) degraded frame,
     so never-degraded content stays authentic and each block sees its
     neighbours during upscaling;
  4. until full resolution.

Per BASELINE.json's north star this loop must run entirely on device with
no host round-trips: here each stage is a resize (matmul) + upsample_fn +
one masked select, all under one jit. The stage count is static:
``log2(max factor in the clip's level maps)``, read on host once per clip
when the sidecar is decoded (level maps are host metadata anyway).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax.numpy as jnp

from elvis_tpu.core.blocks import upsample_map
from elvis_tpu.ops.resize import interleave_phases, resize
from elvis_tpu.restore.registry import register_restorer

__all__ = ["progressive_restore", "lanczos_upsample_2x", "StagedUpsampler"]

UpsampleFn = Callable[[jnp.ndarray], jnp.ndarray]


class StagedUpsampler(NamedTuple):
    """A stage-adaptive upsampler for the progressive loop: ``prefix``
    runs on every stage except the last, ``final`` on the last. The 4K
    serving tier uses this to spend a narrow finisher on the final 2x
    stage (which carries ~75% of the loop's FLOPs at 4K) while the full
    serving net handles the cheap early stages — stage count resolves
    at call time, so one object serves any max_level."""

    prefix: UpsampleFn
    final: UpsampleFn


def lanczos_upsample_2x(frames: jnp.ndarray) -> jnp.ndarray:
    h, w = frames.shape[-3], frames.shape[-2]
    return resize(frames, (2 * h, 2 * w), method="lanczos4")


def progressive_restore(
    frames: jnp.ndarray,
    level_maps: jnp.ndarray,
    block_size: int,
    upsample_fn: "UpsampleFn | tuple | list" = lanczos_upsample_2x,
    *,
    max_level: int | None = None,
) -> jnp.ndarray:
    """frames ``(N,H,W,C)`` degraded, level_maps ``(N,By,Bx)`` int levels
    (factor = 2^level) -> restored ``(N,H,W,C)``.

    ``max_level`` pins the stage count for jit; defaults to the concrete
    max of ``level_maps`` (requires concrete maps) or log2(block_size).

    ``upsample_fn`` may be a sequence of per-stage 2x upsamplers
    (coarsest stage first, ``max_level`` entries) — the stage-adaptive
    tiers (e.g. the 4K serving path, which spends a narrower net on the
    final, dominant-cost stage) plug in here.
    """
    if max_level is None:
        try:
            max_level = int(level_maps.max())
        except Exception:
            max_level = int(math.log2(block_size))
    if max_level == 0:
        return frames
    if isinstance(upsample_fn, StagedUpsampler):
        stage_fns = [upsample_fn.prefix] * (max_level - 1) + [upsample_fn.final]
    elif callable(upsample_fn):
        stage_fns = [upsample_fn] * max_level
    else:
        stage_fns = list(upsample_fn)
        assert len(stage_fns) == max_level, (
            f"need one upsample_fn per stage: got {len(stage_fns)}, "
            f"max_level={max_level}"
        )

    n, h, w, c = frames.shape
    orig_dtype = frames.dtype
    x = frames.astype(jnp.float32)
    max_factor = 2**max_level

    current = resize(x, (h // max_factor, w // max_factor), method="area")
    factors = jnp.power(2, level_maps.astype(jnp.int32))  # (N,By,Bx)

    current_factor = max_factor // 2
    while current_factor >= 1:
        cur_h, cur_w = h // current_factor, w // current_factor
        fn = stage_fns[0]
        phase_fn = getattr(fn, "phase_fn", None)
        if phase_fn is not None:
            # Phase-form stage (srnet.srnet_phase_fn): the net returns the
            # pre-interleave (N,h,w,2,2,C) tensor — its Lanczos base and
            # residual tail both computed at INPUT resolution — and the
            # full-res frame is materialized exactly once here, fusing
            # into the injection select below. Bit-equal to fn(current).
            current = interleave_phases(phase_fn(current))
        else:
            current = fn(current)
        stage_fns = stage_fns[1:]
        assert current.shape[-3:] == (cur_h, cur_w, c), (
            f"upsample_fn produced {current.shape}, expected (*,{cur_h},{cur_w},{c})"
        )
        degraded_at_res = resize(x, (cur_h, cur_w), method="area")
        # Blocks with factor <= current_factor are authentic at this res.
        current_block = block_size // current_factor
        inject = (factors <= current_factor)  # (N,By,Bx)
        pix = upsample_map(inject, current_block)[..., None]  # (N,cur_h,cur_w,1)
        current = jnp.where(pix, degraded_at_res, current.astype(jnp.float32))
        current_factor //= 2

    if jnp.issubdtype(orig_dtype, jnp.integer):
        current = jnp.clip(jnp.round(current), 0, 255)
    return current.astype(orig_dtype)


@register_restorer("downsample", "progressive_lanczos")
def _progressive_lanczos(frames, level_maps, block_size, **kw):
    return progressive_restore(
        frames, level_maps, block_size, upsample_fn=lanczos_upsample_2x, **kw
    )
