"""Halo exchange: temporal overlap and spatial tiling on the mesh.

The reference's sequence-length scaling story (SURVEY.md §5.7) is temporal
chunking with overlap: each GPU worker receives its frame chunk PLUS
``chunk_overlap`` neighbour frames staged through temp dirs, processes the
expanded chunk, and the merger trims the overlap (ProPainter
elvis.py:1506-1566, E2FGVI elvis.py:1864-1906, generic cross-fade
utils.py:224-309). Its spatial counterpart is feathered tile blending
(utils.py:176-326).

Here both are one ``shard_map`` + ``jax.lax.ppermute``: neighbouring
shards exchange boundary frames (or rows) over ICI instead of the
filesystem, windowed models see real context, and no frame is recomputed.
Global clip edges are padded by edge replication (the same context the
reference gives its first/last chunks).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["temporal_map_overlap", "spatial_tile_map", "spatial_tile_map_blocks"]


def _exchange_halo(local: jnp.ndarray, overlap: int, axis_name: str, dim: int):
    """Return (left_halo, right_halo) for this shard along array dim,
    fetched from ring neighbours; global edges get edge-replication."""
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(arr, sl):
        sls = [slice(None)] * arr.ndim
        sls[dim] = sl
        return arr[tuple(sls)]

    my_head = take(local, slice(0, overlap))
    my_tail = take(local, slice(local.shape[dim] - overlap, local.shape[dim]))

    # left halo: previous shard's tail (shift right around the ring)
    left = jax.lax.ppermute(my_tail, axis_name, [((i - 1) % n_dev, i) for i in range(n_dev)])
    # right halo: next shard's head
    right = jax.lax.ppermute(my_head, axis_name, [((i + 1) % n_dev, i) for i in range(n_dev)])

    # Edge shards: replicate own boundary instead of wrapping around.
    first = take(local, slice(0, 1))
    last = take(local, slice(local.shape[dim] - 1, local.shape[dim]))
    reps = [1] * local.ndim
    reps[dim] = overlap
    left = jnp.where(idx == 0, jnp.tile(first, reps), left)
    right = jnp.where(idx == n_dev - 1, jnp.tile(last, reps), right)
    return left, right


def temporal_map_overlap(
    fn: Callable,
    frames,
    mesh: Mesh,
    overlap: int,
    axis: str = "data",
) -> jnp.ndarray:
    """Apply a windowed temporal model per shard with halo context.

    ``frames`` is one array or a tuple of arrays sharing the leading
    (frame) axis — e.g. (frames, per-frame masks); every array gets the
    same halo exchange and ``fn`` receives the extended versions in order.
    ``fn`` maps ``(n_local + 2*overlap, ...) -> (n_local + 2*overlap, ...)``
    frames; output keeps only each shard's own n_local frames (overlap
    trimmed, like the reference's chunk merger at elvis.py:1650-1657).
    N must be divisible by the mesh axis size (use
    parallel.mesh.shard_frames to pad) and n_local must be >= overlap.
    """
    is_multi = isinstance(frames, (tuple, list))
    arrays = tuple(frames) if is_multi else (frames,)
    n = arrays[0].shape[0]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0, f"frames {n} not divisible by mesh axis {n_dev}"
    assert n // n_dev >= overlap, (
        f"local chunk {n // n_dev} smaller than overlap {overlap}"
    )

    def shard_fn(*locals_):
        extended = []
        for loc in locals_:
            left, right = _exchange_halo(loc, overlap, axis, dim=0)
            extended.append(jnp.concatenate([left, loc, right], axis=0))
        out = fn(*extended) if is_multi else fn(extended[0])
        return out[overlap : overlap + locals_[0].shape[0]]

    specs = tuple(P(axis, *([None] * (a.ndim - 1))) for a in arrays)
    out_spec = P(axis, *([None] * (arrays[0].ndim - 1)))
    return shard_map(shard_fn, mesh=mesh, in_specs=specs, out_specs=out_spec)(*arrays)


def spatial_tile_map(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    frames: jnp.ndarray,
    mesh: Mesh,
    halo: int,
    axis: str = "spatial",
) -> jnp.ndarray:
    """Shard the HEIGHT axis across ``axis`` with row-halo exchange —
    the mesh-native version of the reference's feathered spatial tiling
    (utils.py:176-326). ``fn`` maps ``(N, h_local + 2*halo, W, C)`` to the
    same shape; halo rows are trimmed on return."""
    h = frames.shape[1]
    n_dev = mesh.shape[axis]
    assert h % n_dev == 0, f"height {h} not divisible by mesh axis {n_dev}"

    def shard_fn(local):
        top, bottom = _exchange_halo(local, halo, axis, dim=1)
        extended = jnp.concatenate([top, local, bottom], axis=1)
        out = fn(extended)
        return out[:, halo : halo + local.shape[1]]

    spec = P(None, axis, *([None] * (frames.ndim - 2)))
    return shard_map(shard_fn, mesh=mesh, in_specs=(spec,), out_specs=spec)(frames)


def spatial_tile_map_blocks(
    fn: Callable,
    frames: jnp.ndarray,
    levels: jnp.ndarray,
    mesh: Mesh,
    halo: int,
    block_size: int,
    axis: str = "spatial",
    data_axis: str = None,
) -> jnp.ndarray:
    """Height-sharded RESTORE with a pixel halo plus the matching
    block-space degradation-map halo — the production spatial-tiling path
    for full-frame restorers on large frames (the mesh-native version of
    the reference's ``resource_aware_restore`` feathered tiles,
    utils.py:176-326, which its restore paths actually run at high res).

    ``frames`` ``(N, H, W, C)`` sharded on H; ``levels`` ``(N, By, Bx)``
    sharded on By (= H/block_size). ``fn(frames_ext, levels_ext)`` maps an
    extended tile to the restored tile (same shape); halo rows are trimmed
    on return. ``halo`` must be a multiple of ``block_size`` so the two
    grids stay aligned.

    Boundary handling: interior seams get a symmetric halo from both ring
    neighbours; the GLOBAL top/bottom tiles use a CLAMPED (slid) window —
    their extended tile starts/ends exactly at the global frame edge, with
    the full 2*halo context taken from the inward neighbour — so the
    restorer's own edge semantics (clamped resize taps etc.) match the
    unsharded computation bit-for-bit at the frame borders (edge
    REPLICATION there measured ~9/255 max error; the slid window measures
    exact). With a halo covering the receptive field the result matches
    unsharded everywhere (progressive SR at max_level 3: halo>=32, tests
    assert it). ``data_axis`` additionally shards the frame axis (2D
    DP x SP mesh).
    """
    assert halo % block_size == 0, (halo, block_size)
    h = frames.shape[1]
    n_dev = mesh.shape[axis]
    assert h % (n_dev * block_size) == 0, (h, n_dev, block_size)
    assert h // n_dev >= 2 * halo, (
        f"tile height {h // n_dev} smaller than 2*halo={2 * halo}"
    )
    bhalo = halo // block_size

    def _clamped_extend(loc, hl, dim):
        """Extended tile of size local+2*hl along ``dim``: symmetric halo
        for interior shards, slid window at the global edges."""
        n_sp = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)

        def take(arr, sl):
            sls = [slice(None)] * arr.ndim
            sls[dim] = sl
            return arr[tuple(sls)]

        size = loc.shape[dim]
        head2 = take(loc, slice(0, 2 * hl))
        tail2 = take(loc, slice(size - 2 * hl, size))
        perm_fwd = [((i - 1) % n_sp, i) for i in range(n_sp)]
        perm_bwd = [((i + 1) % n_sp, i) for i in range(n_sp)]
        from_prev = jax.lax.ppermute(tail2, axis, perm_fwd)  # prev's tail
        from_next = jax.lax.ppermute(head2, axis, perm_bwd)  # next's head
        # interior: [prev tail hl | local | next head hl]
        # idx 0:    [local | next head 2hl]        (starts at global edge)
        # idx n-1:  [prev tail 2hl | local]        (ends at global edge)
        interior = jnp.concatenate(
            [take(from_prev, slice(hl, 2 * hl)), loc,
             take(from_next, slice(0, hl))], axis=dim)
        first = jnp.concatenate([loc, from_next], axis=dim)
        last = jnp.concatenate([from_prev, loc], axis=dim)
        ext = jnp.where(idx == 0, first, jnp.where(idx == n_sp - 1, last, interior))
        # rows of EXT corresponding to the local tile start at:
        start = jnp.where(idx == 0, 0, jnp.where(idx == n_sp - 1, 2 * hl, hl))
        return ext, start

    def shard_fn(f_loc, l_loc):
        f_ext, f_start = _clamped_extend(f_loc, halo, dim=1)
        l_ext, _ = _clamped_extend(l_loc, bhalo, dim=1)
        out = fn(f_ext, l_ext)
        starts = [0] * out.ndim
        starts[1] = f_start
        sizes = list(out.shape)
        sizes[1] = f_loc.shape[1]
        return jax.lax.dynamic_slice(out, starts, sizes)

    fspec = P(data_axis, axis, *([None] * (frames.ndim - 2)))
    lspec = P(data_axis, axis, *([None] * (levels.ndim - 2)))
    return shard_map(
        shard_fn, mesh=mesh, in_specs=(fspec, lspec), out_specs=fspec
    )(frames, levels)
