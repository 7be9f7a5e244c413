"""Clip I/O: many sources -> one device-resident (N,H,W,3) uint8 array.

The reference's IO layer is PNG directories + cv2/ffmpeg everywhere
(elvis.py:123-239); this environment has neither cv2 nor ffmpeg, so the
hermetic formats are Y4M (elvis_tpu.codec.y4m), npy/npz arrays, PNG dirs
via PIL, NVC bitstreams, and procedural synthetic clips
('synthetic://<kind>?frames=N'); mp4 decoding goes through the gated
ffmpeg wrapper when the binary exists.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "load_clip",
    "load_masks",
    "save_frames_png",
    "load_frames_png",
    "synthetic_clip",
]


def synthetic_clip(
    kind: str = "moving", frames: int = 24, height: int = 360, width: int = 640,
    seed: int = 0,
) -> np.ndarray:
    """Procedural clips with a moving foreground object over textured
    background — enough structure for saliency/ROI to be meaningful."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    tex = 24 * np.sin(2 * np.pi * xx / 37) * np.cos(2 * np.pi * yy / 29)
    out = np.empty((frames, height, width, 3), dtype=np.uint8)
    for t in range(frames):
        base = 110 + tex + 18 * np.sin(2 * np.pi * (xx + 3 * t) / 160)
        frame = np.stack([base, base * 0.95, base * 1.05], axis=-1)
        if kind in ("moving", "object"):
            cy = height // 2 + int(0.18 * height * np.sin(2 * np.pi * t / frames))
            cx = int(width * (0.25 + 0.5 * t / max(frames - 1, 1)))
            r = min(height, width) // 6
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            obj = np.stack([
                205 + 28 * np.sin(2 * np.pi * (xx + yy) / 23),
                90 + 20 * np.cos(2 * np.pi * xx / 17),
                70 + 15 * np.sin(2 * np.pi * yy / 19),
            ], axis=-1)
            frame = np.where(mask[..., None], obj, frame)
        frame += rng.normal(0, 2.0, frame.shape)
        out[t] = np.clip(frame, 0, 255).astype(np.uint8)
    return out


def save_frames_png(frames: np.ndarray, out_dir: str, start_number: int = 1) -> None:
    """%05d.png naming like the reference (elvis.py:123-239)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for i, frame in enumerate(np.asarray(frames)):
        Image.fromarray(frame.astype(np.uint8)).save(
            os.path.join(out_dir, f"{i + start_number:05d}.png")
        )


def load_frames_png(src_dir: str) -> np.ndarray:
    from PIL import Image

    files = sorted(
        f for f in os.listdir(src_dir) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    frames = [np.asarray(Image.open(os.path.join(src_dir, f)).convert("RGB")) for f in files]
    return np.stack(frames, axis=0)


def load_masks(
    masks_dir: str, width: int, height: int, expected_frames: int
) -> np.ndarray:
    """Load foreground masks (DAVIS-style grayscale PNGs) as ``(N, H, W)``
    bool, nearest-resized, ``> 128`` threshold, last-mask carry-forward
    for missing frames (reference _load_resized_masks elvis.py:536-575)."""
    import jax.numpy as jnp
    from PIL import Image

    from elvis_tpu.ops.resize import resize

    files = sorted(
        f for f in os.listdir(masks_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    ) if os.path.isdir(masks_dir) else []
    masks = []
    last = np.zeros((height, width), dtype=bool)
    for i in range(expected_frames):
        if i < len(files):
            img = np.asarray(Image.open(os.path.join(masks_dir, files[i])).convert("L"))
            if img.shape != (height, width):
                img = np.asarray(
                    resize(jnp.asarray(img.astype(np.float32)[None]), (height, width),
                           method="nearest")
                )[0]
            last = img > 128
        masks.append(last)
    return np.stack(masks, axis=0)


def load_clip(
    source: str,
    width: Optional[int] = None,
    height: Optional[int] = None,
    max_frames: Optional[int] = None,
) -> Tuple[np.ndarray, float]:
    """-> ((N,H,W,3) uint8 RGB, framerate). Resizes to width x height when
    given (area for shrink, lanczos for grow, like the reference's ffmpeg
    lanczos scale at elvis.py:1250)."""
    fps = 30.0
    if source.startswith("synthetic://"):
        m = re.match(r"synthetic://(\w+)\??(.*)", source)
        kind = m.group(1)
        params = dict(p.split("=") for p in m.group(2).split("&") if "=" in p)
        frames = synthetic_clip(
            kind,
            frames=int(params.get("frames", 24)),
            height=int(params.get("height", height or 360)),
            width=int(params.get("width", width or 640)),
            seed=int(params.get("seed", 0)),
        )
        fps = float(params.get("fps", 30.0))
    elif source.endswith(".y4m"):
        from elvis_tpu.codec.y4m import read_y4m

        frames, fps = read_y4m(source)
    elif source.endswith((".npy", ".npz")):
        data = np.load(source)
        if isinstance(data, np.lib.npyio.NpzFile):
            frames = data["frames"]
            fps = float(data["framerate"]) if "framerate" in data else 30.0
        else:
            frames = data
    elif source.endswith(".nvc"):
        from elvis_tpu.codec import nvc_decode

        with open(source, "rb") as f:
            frames, fps = nvc_decode(f.read())
    elif os.path.isdir(source):
        frames = load_frames_png(source)
    else:
        from elvis_tpu.codec.external import decode_video_ffmpeg, is_available

        if not is_available("ffmpeg"):
            raise FileNotFoundError(
                f"cannot read {source!r}: no ffmpeg in this environment; use "
                "y4m/npz/png-dir/nvc or synthetic:// sources"
            )
        assert width and height, "mp4 decode needs explicit width/height"
        frames = decode_video_ffmpeg(source, width, height)

    if max_frames is not None:
        frames = frames[:max_frames]
    if width and height and (frames.shape[1] != height or frames.shape[2] != width):
        import jax.numpy as jnp

        from elvis_tpu.ops.resize import resize

        method = "area" if frames.shape[1] > height else "lanczos4"
        frames = np.asarray(
            resize(jnp.asarray(frames), (height, width), method=method)
        )
    return np.ascontiguousarray(frames), fps
