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
from typing import Optional, Tuple

import numpy as np

from elvis_tpu.codec.nvc import entropy

__all__ = [
    "save_strength_maps_npz",
    "save_strength_maps_video",
    "load_strength_maps_video",
    "load_strength_maps_npz",
    "encode_strength_maps",
    "decode_strength_maps",
    "encode_strength_maps_video",
    "decode_strength_maps_video",
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


def encode_strength_maps_video(
    maps: np.ndarray, *, framerate: float = 30.0, qp: int = 30
) -> Tuple[bytes, float, float]:
    """Video-encoded sidecar (reference elvis.py:2198-2220 semantics:
    min-max normalize to 0-255 grayscale, encode as a tiny lossy video).
    Uses the built-in NVC codec on the block-resolution map treated as a
    grayscale frame. Returns (stream, min_val, max_val) — decode needs the
    range, which the reference hard-codes by map type (its bug #6); here
    it rides along."""
    from elvis_tpu.codec.nvc.codec import encode as nvc_encode

    maps = np.asarray(maps, dtype=np.float32)
    lo, hi = float(maps.min()), float(maps.max())
    norm = (maps - lo) / (hi - lo + 1e-12) * 255.0
    rgb = np.repeat(norm[..., None], 3, axis=-1).astype(np.uint8)
    stream = nvc_encode(rgb, qp=qp, framerate=framerate)
    return stream, lo, hi


def decode_strength_maps_video(
    stream: bytes, min_val: float, max_val: float
) -> np.ndarray:
    """Inverse: decode, rescale to [min, max], round to integer levels
    (elvis.py:2238-2241)."""
    from elvis_tpu.codec.nvc.codec import decode as nvc_decode

    frames, _ = nvc_decode(stream)
    gray = frames.astype(np.float32).mean(axis=-1)
    vals = gray / 255.0 * (max_val - min_val) + min_val
    return np.round(vals).astype(np.uint8)


_VMAGIC = b"NVSV"


def save_strength_maps_video(
    maps: np.ndarray, path: str, *, framerate: float = 30.0,
    target_bitrate: Optional[float] = None, qp: int = 30,
) -> int:
    """The reference's VIDEO strength-map sidecar as a file
    (elvis.py:2198-2245: gray video at ~strength_maps_target_bitrate;
    decode range rides in-band, fixing its bug #6). Returns file size."""
    if target_bitrate is not None:
        # map the bitrate budget to a QP through the codec's rate model
        from elvis_tpu.codec.nvc.codec import NvcCodec

        maps_f = np.asarray(maps, dtype=np.float32)
        lo, hi = float(maps_f.min()), float(maps_f.max())
        norm = (maps_f - lo) / (hi - lo + 1e-12) * 255.0
        rgb = np.repeat(norm[..., None], 3, axis=-1).astype(np.uint8)
        stream = NvcCodec().encode(
            rgb, target_bitrate=target_bitrate, framerate=framerate
        )
    else:
        stream, lo, hi = encode_strength_maps_video(
            maps, framerate=framerate, qp=qp
        )
    with open(path, "wb") as f:
        f.write(_VMAGIC + struct.pack("<ff", lo, hi) + stream)
    import os

    return os.path.getsize(path)


def load_strength_maps_video(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        blob = f.read()
    assert blob[:4] == _VMAGIC
    lo, hi = struct.unpack_from("<ff", blob, 4)
    return decode_strength_maps_video(blob[4 + struct.calcsize("<ff"):], lo, hi)


def save_removal_masks_npz(masks: np.ndarray, path: str,
                           motion_gmv: "np.ndarray | None" = None,
                           motion_dev: "np.ndarray | None" = None) -> int:
    """ELVIS v1 removal masks: packbits like elvis.py:4412-4418.

    ``motion_gmv``/``motion_dev`` (ops.motion.motion_hint) ride the same
    sidecar: per-pair global int16 vectors (~4 B/frame) + the coarse int8
    deviation field (all-zero on pure pans — zlib reduces it to noise
    floor). The sidecar's on-disk size is what bitrate accounting counts,
    so the hint's cost is charged to the ELVIS rows automatically."""
    masks = np.asarray(masks).astype(bool)
    packed = np.packbits(masks, axis=None)
    extra = {}
    if motion_gmv is not None:
        extra["motion_gmv"] = np.asarray(motion_gmv, np.int16)
    if motion_dev is not None:
        extra["motion_dev"] = np.asarray(motion_dev, np.int8)
    np.savez_compressed(path, masks=packed, shape=np.asarray(masks.shape),
                        **extra)
    import os

    return os.path.getsize(path)


def load_removal_masks_npz(path: str, with_motion: bool = False):
    data = np.load(path)
    shape = tuple(int(s) for s in data["shape"])
    total = int(np.prod(shape))
    masks = np.unpackbits(data["masks"], count=total).reshape(shape).astype(bool)
    if not with_motion:
        return masks
    gmv = data["motion_gmv"] if "motion_gmv" in data else None
    dev = data["motion_dev"] if "motion_dev" in data else None
    return masks, gmv, dev
