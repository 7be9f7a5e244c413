"""Level-sequential adaptive restore + naive whole-frame restorers.

Parity targets:
  * level-sequential restore — reference presley.py:1220-1275: run a
    restorer once per unique degradation level (passing
    ``degradation_level``), then per block gather the output of the
    matching level's pass. The generic adapter for restorers that take a
    scalar strength instead of a map.
  * naive whole-frame restorers — reference utils.py:1428-1572: apply a
    neural model to the whole frame ignoring the block maps (4x ESRGAN
    then resize back; whole-frame diffusion with OOM fallback-to-input).
    Benchmarks for how much the map-aware adaptive paths actually help.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.restore.registry import register_restorer, safe_restore

__all__ = ["level_sequential_restore", "naive_sr_restore", "naive_diffusion_restore"]


def level_sequential_restore(
    restore_fn: Callable[[jnp.ndarray, int], jnp.ndarray],
    frames: jnp.ndarray,
    level_maps: jnp.ndarray,
    block_size: int,
    max_level: int,
) -> jnp.ndarray:
    """``restore_fn(frames, level) -> frames`` applied once per level
    (static loop), per-block gather of the matching pass (presley.py:1220
    semantics). Level 0 blocks pass through untouched."""
    outputs = [frames.astype(jnp.float32)]
    for lvl in range(1, max_level + 1):
        outputs.append(restore_fn(frames, lvl).astype(jnp.float32))

    out_blocks = split_into_blocks(outputs[0], block_size)
    for lvl in range(1, max_level + 1):
        sel = (level_maps == lvl)[..., None, None, None]
        out_blocks = jnp.where(
            sel, split_into_blocks(outputs[lvl], block_size), out_blocks
        )
    out = combine_blocks(out_blocks)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)


@register_restorer("downsample", "naive_sr")
def naive_sr_restore(
    frames: jnp.ndarray,
    level_maps: jnp.ndarray,
    block_size: int,
    upsample_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Whole-frame 2x SR then area resize back (utils.py:1428 pattern,
    map-blind)."""
    from elvis_tpu.ops.resize import resize
    from elvis_tpu.restore.progressive import lanczos_upsample_2x

    up = upsample_fn or lanczos_upsample_2x
    h, w = frames.shape[-3], frames.shape[-2]
    big = up(frames.astype(jnp.float32))
    out = resize(big, (h, w), method="area")
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)


@register_restorer("blur", "naive_diffusion")
def naive_diffusion_restore(
    frames: jnp.ndarray,
    level_maps: jnp.ndarray,
    block_size: int,
    *,
    params=None,
    steps: int = 4,
) -> jnp.ndarray:
    """Whole-frame diffusion restore with fallback-to-input on failure
    (the utils.py:1565-1569 OOM policy via safe_restore)."""
    from elvis_tpu.models import DiffusionRestorer

    d = DiffusionRestorer(features=32)
    if params is None:
        import jax

        params = d.init(jax.random.PRNGKey(0), (1,) + tuple(frames.shape[1:]))

    def run(f):
        return d.sample(params, f.astype(jnp.float32), steps=steps)

    out, err = safe_restore(run, frames)
    if err is not None:
        return frames
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)
