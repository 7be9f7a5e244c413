"""Core pytree types.

The reference pipeline moves data between stages as PNG directories and
``.npz`` files on disk (see reference elvis.py:123-239, its universal
interchange format). Here the interchange format is a device-resident
batched tensor wrapped in a small pytree carrying video metadata, so a
whole clip flows through scoring -> degradation -> codec -> restoration ->
metrics without leaving HBM except at the entropy-coding boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VideoMeta:
    """Static (non-traced) metadata for a clip."""

    width: int
    height: int
    framerate: float = 30.0
    name: str = "video"

    @property
    def duration(self) -> float:
        return 0.0  # frame count lives on the array; duration is derived there


@jax.tree_util.register_pytree_node_class
class FrameBatch:
    """A batch of video frames resident on device.

    ``pixels`` is ``(N, H, W, C)``; uint8 in [0, 255] at I/O boundaries,
    float32 in [0, 255] inside compute stages. Channel order is RGB
    (the reference uses OpenCV BGR; this framework is RGB end-to-end and
    converts only in its I/O layer).
    """

    def __init__(self, pixels: jnp.ndarray, meta: Optional[VideoMeta] = None):
        self.pixels = pixels
        if meta is None:
            h, w = int(pixels.shape[1]), int(pixels.shape[2])
            meta = VideoMeta(width=w, height=h)
        self.meta = meta

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.pixels,), self.meta

    @classmethod
    def tree_unflatten(cls, meta, children):
        (pixels,) = children
        return cls(pixels, meta)

    # -- convenience -------------------------------------------------------
    @property
    def num_frames(self) -> int:
        return int(self.pixels.shape[0])

    @property
    def shape(self):
        return self.pixels.shape

    @property
    def dtype(self):
        return self.pixels.dtype

    @property
    def duration_seconds(self) -> float:
        return self.num_frames / self.meta.framerate

    def astype(self, dtype) -> "FrameBatch":
        return FrameBatch(self.pixels.astype(dtype), self.meta)

    def __repr__(self) -> str:
        return (
            f"FrameBatch(shape={tuple(self.pixels.shape)}, dtype={self.pixels.dtype},"
            f" fps={self.meta.framerate}, name={self.meta.name!r})"
        )
