"""PRESLEY shrink methods 1-3: greedy sequential block removal.

Behaviour parity with reference utils.py:692-1018 (``shrink_frame_row_only``
/ ``shrink_frame_position_map`` / ``shrink_frame_removal_indices`` and
their stretch inverses). These algorithms have loop-carried dependence
(every removal shifts subsequent indices), so they cannot be expressed as
one gather like ELVIS v1 removal. TPU-first split instead:

  * the *decision* replay (argmin/shift over the tiny ``(By, Bx)``
    importance grid) runs in NumPy on the host — O(passes * By * Bx)
    integer work on a few-KB array;
  * the *pixel* movement (the expensive part) is one vectorized gather /
    scatter over the block tensor on device, driven by the position map
    the replay produced.

All three methods therefore share one device primitive: gather blocks by a
``(By', Bx') -> flat original block index`` map (shrink) and its scatter
inverse (stretch). The reference's ablation shows the three methods are
quality-equivalent (SHRINKING_ABLATION_REPORT.tex:300-313, SSIM 0.792-0.793)
— the property tests assert the same equivalence here.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks

__all__ = [
    "plan_shrink",
    "shrink_frame",
    "stretch_frame",
    "shrink_video",
    "stretch_video",
]


class ShrinkPlan:
    """Host-side replay result for one frame.

    Attributes:
      removal_mask: (By, Bx) bool, True = removed.
      position_map: (By', Bx', 2) int32 — original (y, x) of each kept
        block in the shrunk grid (method-2 metadata, and the gather map
        for every method).
      removal_indices: list of int32 arrays (method-3 metadata).
      shrunk_grid: (By', Bx').
    """

    def __init__(self, removal_mask, position_map, removal_indices, shrunk_grid):
        self.removal_mask = removal_mask
        self.position_map = position_map
        self.removal_indices = removal_indices
        self.shrunk_grid = shrunk_grid


def plan_shrink(
    importance: np.ndarray, shrink_amount: float, method: str = "row_only"
) -> ShrinkPlan:
    """Replay the greedy removal on the (By, Bx) importance grid.

    method: 'row_only' (utils.py:692) or 'row_col' (utils.py:763/862 —
    position-map and removal-indices methods share the same removal
    schedule; they differ only in recorded metadata).
    """
    imp = np.asarray(importance, dtype=np.float64).copy()
    by0, bx0 = imp.shape
    pos = np.stack(np.meshgrid(np.arange(by0), np.arange(bx0), indexing="ij"), axis=-1)
    removal_mask = np.zeros((by0, bx0), dtype=bool)
    removal_indices: List[np.ndarray] = []
    target = int(by0 * bx0 * shrink_amount)
    removed = 0
    blocks_y, blocks_x = by0, bx0

    def row_pass():
        nonlocal removed, blocks_x
        idxs = []
        complete = True
        for by in range(blocks_y):
            if removed >= target:
                complete = False
                break
            least = int(np.argmin(imp[by, :blocks_x]))
            idxs.append(least)
            oy, ox = pos[by, least]
            removal_mask[oy, ox] = True
            imp[by, least : blocks_x - 1] = imp[by, least + 1 : blocks_x]
            pos[by, least : blocks_x - 1] = pos[by, least + 1 : blocks_x]
            removed += 1
        if idxs:
            removal_indices.append(np.asarray(idxs, dtype=np.int32))
        if complete:
            blocks_x -= 1

    def col_pass():
        nonlocal removed, blocks_y
        idxs = []
        complete = True
        for bx in range(blocks_x):
            if removed >= target:
                complete = False
                break
            least = int(np.argmin(imp[:blocks_y, bx]))
            idxs.append(least)
            oy, ox = pos[least, bx]
            removal_mask[oy, ox] = True
            imp[least : blocks_y - 1, bx] = imp[least + 1 : blocks_y, bx]
            pos[least : blocks_y - 1, bx] = pos[least + 1 : blocks_y, bx]
            removed += 1
        if idxs:
            removal_indices.append(np.asarray(idxs, dtype=np.int32))
        if complete:
            blocks_y -= 1

    if method == "row_only":
        while removed < target and blocks_x > 1:
            row_pass()
    elif method == "row_col":
        while removed < target:
            row_pass()
            if removed >= target:
                break
            col_pass()
    else:
        raise ValueError(f"unknown shrink method {method!r}")

    position_map = pos[:blocks_y, :blocks_x].astype(np.int32)
    return ShrinkPlan(removal_mask, position_map, removal_indices, (blocks_y, blocks_x))


def shrink_frame(frame: jnp.ndarray, plan: ShrinkPlan, block_size: int) -> jnp.ndarray:
    """Gather kept blocks by the plan's position map: one device gather."""
    blocks = split_into_blocks(frame, block_size)  # (By,Bx,b,b,C)
    bx = blocks.shape[1]
    flat = blocks.reshape((-1,) + blocks.shape[2:])
    pm = jnp.asarray(plan.position_map)
    flat_idx = pm[..., 0] * bx + pm[..., 1]  # (By',Bx')
    gathered = flat[flat_idx.reshape(-1)].reshape(
        plan.shrunk_grid + blocks.shape[2:]
    )
    return combine_blocks(gathered)


def stretch_frame(
    shrunk: jnp.ndarray, plan: ShrinkPlan, block_size: int
) -> jnp.ndarray:
    """Scatter shrunk blocks back to original positions; removed = black.

    Covers all three reference stretch variants: row_only (utils.py:739),
    position_map (utils.py:839) and removal_indices (utils.py:951) all
    reconstruct exactly this scatter (the removal-indices replay is how
    the reference *derives* the mapping client-side; here the plan is the
    mapping).
    """
    by0, bx0 = plan.removal_mask.shape
    blocks = split_into_blocks(shrunk, block_size)  # (By',Bx',b,b,C)
    flat_src = blocks.reshape((-1,) + blocks.shape[2:])
    pm = jnp.asarray(plan.position_map).reshape(-1, 2)
    canvas = jnp.zeros((by0 * bx0,) + blocks.shape[2:], dtype=shrunk.dtype)
    canvas = canvas.at[pm[:, 0] * bx0 + pm[:, 1]].set(flat_src)
    return combine_blocks(canvas.reshape((by0, bx0) + blocks.shape[2:]))


def shrink_video(
    frames: jnp.ndarray, importances: np.ndarray, block_size: int,
    shrink_amount: float, method: str = "row_only",
) -> Tuple[jnp.ndarray, List[ShrinkPlan]]:
    """Per-frame plans (host) + stacked device gathers.

    Note: unlike ELVIS v1 removal, per-frame shrunk shapes can differ only
    if importance grids differ in tie structure; the greedy schedule is
    shape-deterministic given (By,Bx,amount), so outputs stack.
    """
    plans = [plan_shrink(importances[i], shrink_amount, method) for i in range(frames.shape[0])]
    outs = [shrink_frame(frames[i], p, block_size) for i, p in enumerate(plans)]
    return jnp.stack(outs, axis=0), plans


def stretch_video(
    shrunk: jnp.ndarray, plans: List[ShrinkPlan], block_size: int
) -> jnp.ndarray:
    outs = [stretch_frame(shrunk[i], p, block_size) for i, p in enumerate(plans)]
    return jnp.stack(outs, axis=0)
