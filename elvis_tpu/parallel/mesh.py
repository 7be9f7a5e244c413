"""Device mesh construction and frame-axis sharding.

The reference's device layer is ``_resolve_device_list`` (elvis.py:451-530:
parse ints/strings/torch.device, validate, dedupe, CPU fallback) plus
chunk-per-GPU threading (``chunk_for_devices``/``parallel_process_frames``
elvis.py:246-353). The TPU equivalent collapses all of it into a
``jax.sharding.Mesh`` + ``NamedSharding``: sharding the frame axis of one
batched array replaces chunking, worker threads, temp dirs and
reassembly (SURVEY.md §2.7 P1-P3, P8).

Axis conventions:
  * ``data``   — the frame axis (the reference's only parallel axis);
  * ``tensor`` — optional weight sharding for neural restorers (TP);
  * ``spatial``— optional 2D spatial tiling for full-frame models (SP).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["resolve_devices", "make_mesh", "frame_sharding", "shard_frames"]

DeviceLike = Union[int, str, "jax.Device"]


def resolve_devices(spec: Optional[Sequence[DeviceLike]] = None) -> list:
    """Normalize a user device list (ints / 'tpu:0' strings / Device
    objects) to unique jax devices, preserving order; None = all."""
    all_devices = jax.devices()
    if spec is None:
        return list(all_devices)
    by_id = {d.id: d for d in all_devices}
    out, seen = [], set()
    for item in spec:
        if isinstance(item, int):
            if item not in by_id:
                raise ValueError(f"device id {item} not present (have {sorted(by_id)})")
            dev = by_id[item]
        elif isinstance(item, str):
            s = item.rsplit(":", 1)
            idx = int(s[1]) if len(s) == 2 and s[1].isdigit() else 0
            if idx not in by_id:
                raise ValueError(f"device {item!r} not present")
            dev = by_id[idx]
        else:
            dev = item
        if dev.id not in seen:
            seen.add(dev.id)
            out.append(dev)
    return out


def make_mesh(
    axes: Sequence[tuple] = (("data", -1),),
    devices: Optional[Sequence[DeviceLike]] = None,
) -> Mesh:
    """Build a mesh from (name, size) axes; one size may be -1 (infer).

    ``make_mesh()`` -> 1D data mesh over all devices.
    ``make_mesh((("data", -1), ("tensor", 2)))`` -> 2D DP x TP mesh.
    """
    devs = resolve_devices(devices)
    names = [n for n, _ in axes]
    sizes = [s for _, s in axes]
    n = len(devs)
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis size may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1])) if len(sizes) > 1 else 1
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} != {n} devices")
    arr = np.asarray(devs).reshape(sizes)
    return Mesh(arr, tuple(names))


def frame_sharding(mesh: Mesh, axis: str = "data", ndim: int = 4) -> NamedSharding:
    """Sharding placing the leading (frame) axis across ``axis``."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def shard_frames(frames, mesh: Mesh, axis: str = "data"):
    """Place a per-frame array (``(N, ...)``: frames, level maps, masks)
    with N sharded across the mesh; pads N up to a multiple of the axis
    size with edge repeats when needed (callers trim by remembering the
    original N)."""
    import jax.numpy as jnp

    size = mesh.shape[axis]
    n = frames.shape[0]
    pad = (-n) % size
    if pad:
        frames = jnp.concatenate([frames, jnp.repeat(frames[-1:], pad, axis=0)], axis=0)
    return jax.device_put(frames, frame_sharding(mesh, axis, frames.ndim)), n
