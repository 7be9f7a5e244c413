"""VMAF host wrapper (gated) — the authoritative perceptual score.

Parity: reference elvis.py:3197-3356 — convert both clips to raw YUV via
ffmpeg, run the ``vmaf`` binary with ``--json``, parse per-frame and
pooled stats including harmonic mean. The binary stays authoritative
(SURVEY.md §7.3 item 6); when absent this returns NaNs and the evaluation
schema carries them, like the reference's FVMD NaN convention
(elvis.py:3882-3885).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile
from typing import Dict, Optional

import numpy as np

__all__ = ["vmaf_available", "compute_vmaf"]

_VMAF_CANDIDATES = ("/opt/local/bin/vmaf", "vmaf")


def _vmaf_binary() -> Optional[str]:
    for cand in _VMAF_CANDIDATES:
        if os.path.sep in cand and os.path.exists(cand):
            return cand
        found = shutil.which(cand)
        if found:
            return found
    return None


def vmaf_available() -> bool:
    return _vmaf_binary() is not None


def _write_yuv(frames: np.ndarray, path: str) -> None:
    import jax.numpy as jnp

    from elvis_tpu.ops.color import rgb_to_yuv420

    y, cb, cr = rgb_to_yuv420(jnp.asarray(frames.astype(np.float32)))
    y, cb, cr = (np.clip(np.round(np.asarray(p)), 0, 255).astype(np.uint8) for p in (y, cb, cr))
    with open(path, "wb") as f:
        for i in range(frames.shape[0]):
            f.write(y[i].tobytes())
            f.write(cb[i].tobytes())
            f.write(cr[i].tobytes())


def compute_vmaf(
    ref_frames: np.ndarray, dec_frames: np.ndarray, framerate: float = 30.0
) -> Dict[str, float]:
    """-> {'mean', 'min', 'harmonic_mean'} (NaN when binary missing)."""
    binary = _vmaf_binary()
    if binary is None:
        return {"mean": float("nan"), "min": float("nan"), "harmonic_mean": float("nan")}
    n, h, w = ref_frames.shape[0], ref_frames.shape[1], ref_frames.shape[2]
    with tempfile.TemporaryDirectory() as td:
        ref_yuv = os.path.join(td, "ref.yuv")
        dec_yuv = os.path.join(td, "dec.yuv")
        out_json = os.path.join(td, "vmaf.json")
        _write_yuv(np.asarray(ref_frames), ref_yuv)
        _write_yuv(np.asarray(dec_frames), dec_yuv)
        cmd = [
            binary,
            "--reference", ref_yuv,
            "--distorted", dec_yuv,
            "--width", str(w), "--height", str(h),
            "--pixel_format", "420", "--bitdepth", "8",
            "--json", "--output", out_json,
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0 or not os.path.exists(out_json):
            return {"mean": float("nan"), "min": float("nan"), "harmonic_mean": float("nan")}
        with open(out_json) as f:
            data = json.load(f)
    pooled = data.get("pooled_metrics", {}).get("vmaf", {})
    return {
        "mean": float(pooled.get("mean", float("nan"))),
        "min": float(pooled.get("min", float("nan"))),
        "harmonic_mean": float(pooled.get("harmonic_mean", float("nan"))),
    }
