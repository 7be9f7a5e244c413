"""Strength-map sidecars: the compressed per-block degradation metadata.

Parity: reference elvis.py:2198-2272 — two encodings of the (N, By, Bx)
uint8 strength maps that accompany a degraded bitstream:
  * npz — ``np.savez_compressed`` (elvis.py:2247-2272);
  * video — normalize to 0-255 grayscale and encode as a tiny video
    (elvis.py:2198-2245; the reference uses gray x265 at 50 kbps; here the
    built-in range coder codes the raw map losslessly and typically far
    smaller — the decode rescale/round semantics are preserved).
Plus the ELVIS v1 removal-mask sidecar: packbits npz (elvis.py:4412-4418).
"""

from __future__ import annotations

import io
import struct
from typing import Tuple

import numpy as np

from elvis_tpu.codec.nvc import entropy

__all__ = [
    "save_strength_maps_npz",
    "load_strength_maps_npz",
    "encode_strength_maps",
    "decode_strength_maps",
    "save_removal_masks_npz",
    "load_removal_masks_npz",
]


def save_strength_maps_npz(maps: np.ndarray, path: str) -> int:
    maps = np.asarray(maps)
    if maps.dtype != np.uint8:
        maps = maps.astype(np.uint8)
    np.savez_compressed(path, strength_maps=maps)
    import os

    return os.path.getsize(path)


def load_strength_maps_npz(path: str) -> np.ndarray:
    return np.load(path)["strength_maps"]


_MAGIC = b"NVSM"


def encode_strength_maps(maps: np.ndarray) -> bytes:
    """Compressed in-memory sidecar (context-coded, lossless)."""
    maps = np.asarray(maps).astype(np.uint8)
    n, by, bx = maps.shape
    backend, payload = entropy.encode_bytes(maps)
    return _MAGIC + struct.pack("<HHHB", n, by, bx, backend) + payload


def decode_strength_maps(blob: bytes) -> np.ndarray:
    assert blob[:4] == _MAGIC
    n, by, bx, backend = struct.unpack_from("<HHHB", blob, 4)
    payload = blob[4 + struct.calcsize("<HHHB"):]
    return entropy.decode_bytes(backend, payload, n * by * bx).reshape(n, by, bx)


def save_removal_masks_npz(masks: np.ndarray, path: str) -> int:
    """ELVIS v1 removal masks: packbits like elvis.py:4412-4418."""
    masks = np.asarray(masks).astype(bool)
    packed = np.packbits(masks, axis=None)
    np.savez_compressed(path, masks=packed, shape=np.asarray(masks.shape))
    import os

    return os.path.getsize(path)


def load_removal_masks_npz(path: str) -> np.ndarray:
    data = np.load(path)
    shape = tuple(int(s) for s in data["shape"])
    total = int(np.prod(shape))
    return np.unpackbits(data["masks"], count=total).reshape(shape).astype(bool)
