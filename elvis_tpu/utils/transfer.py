"""Tunnel-aware device->host transfers.

Measured on this image's axon TPU link (image-like content, 190 MB f32
clip): one whole-buffer pull runs ~4 MB/s, while <=48 MB slices of the
same buffer run ~18-23 MB/s — large transfers degrade the link an order
of magnitude. At equal bytes float32 is also the slowest dtype (high-
entropy mantissas defeat the link's compression; the same bits bitcast
to uint32 pull ~2x faster, uint8 pixels carry 4x fewer bytes at ~60 MB/s
f32-equivalent in slices).

Two primitives encode that knowledge:

- :func:`pull` — np.asarray with the first axis sliced into ~32 MB
  pulls. Bit-exact, dtype-preserving; safe for every device array.
- :func:`as_pixels_u8` — wrap a jittable frame fn so its float pixel
  output rounds to uint8 ON DEVICE (fused into the graph). Callers opt
  in where the consumer is uint8-domain anyway (codec input, metrics vs
  a uint8 reference, PNG artifacts — the reference pipeline stages every
  one of these through PNG files, elvis.py's frames_to_video flows, so
  uint8 at the stage boundary is also parity behaviour).
"""

from __future__ import annotations

import numpy as np

__all__ = ["pull", "as_pixels_u8"]

_PULL_SLICE_BYTES = 32 << 20


def pull(x) -> np.ndarray:
    """Device->host ``np.asarray`` in link-friendly first-axis slices."""
    nbytes = int(np.dtype(x.dtype).itemsize) * int(np.prod(x.shape)) if x.shape else 0
    if (
        isinstance(x, np.ndarray)
        or nbytes <= _PULL_SLICE_BYTES
        or x.ndim == 0
        or int(x.shape[0]) <= 1
    ):
        return np.asarray(x)
    n = int(x.shape[0])
    rows = max(1, int(n * _PULL_SLICE_BYTES // nbytes))
    if rows >= n:
        return np.asarray(x)
    return np.concatenate(
        [np.asarray(x[s : s + rows]) for s in range(0, n, rows)], axis=0
    )


def as_pixels_u8(fn):
    """``fn(*args) -> frames`` wrapped so the frames leave the graph as
    uint8 (round + clip to [0, 255] on device). 4x fewer bytes over the
    link; the quantization is the same one the consumer (codec, metric
    vs uint8 reference, PNG) applies anyway."""
    import jax.numpy as jnp

    def wrapped(*args):
        out = fn(*args)
        if jnp.issubdtype(out.dtype, jnp.integer):
            return out.astype(jnp.uint8)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    # propagate the tiling/budget contracts the chunk drivers read
    for attr in ("spatial_halo_rows", "spatial_pixel_budget", "temporal_overlap"):
        if hasattr(fn, attr):
            setattr(wrapped, attr, getattr(fn, attr))
    return wrapped
