"""Evaluation fan-out: every approach's decoded frames vs the reference.

Schema parity with ``analyze_encoding_performance`` /
``_evaluate_single_video_metrics`` (reference elvis.py:3599-4041,
3862-3893): per approach a dict with 'foreground'/'background' sections
(psnr/ssim/mse/lpips mean+std, fvmd), plus 'bitrate_mbps'. Foreground
metrics run on the masks' union-bbox ROI crop against the per-frame FG
mask; background metrics run full-frame against the inverted mask; lpips
on masked (zeroed-outside) frames; vmaf on masked crop videos when the
binary exists.

Where the reference fans out one spawn-process per video with per-GPU
semaphores (elvis.py:3728-3759), here each approach is a handful of
batched jitted reductions on device — the process pool, semaphores and
PNG staging all disappear.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from elvis_tpu.metrics.fvmd import fvmd_incremental
from elvis_tpu.metrics.perceptual import lpips_distance
from elvis_tpu.metrics.pixel import mask_union_bbox, masked_mse, masked_psnr, masked_ssim
from elvis_tpu.metrics.vmaf import compute_vmaf, vmaf_available

__all__ = ["evaluate_approach", "analyze_encoding_performance"]


def _stats(vals: np.ndarray) -> Dict[str, float]:
    vals = np.asarray(vals, dtype=np.float64)
    return {"mean": float(vals.mean()) if vals.size else 0.0,
            "std": float(vals.std()) if vals.size else 0.0}


def evaluate_approach(
    reference_frames: np.ndarray,
    decoded_frames: np.ndarray,
    fg_masks: np.ndarray,
    bitrate_bps: float,
    *,
    metric_stride: int = 1,
    enable_fvmd: bool = True,
    fvmd_stride: int = 1,
    fvmd_early_stop_delta: float = 0.002,
    fvmd_early_stop_window: int = 50,
    fvmd_max_frames: Optional[int] = None,
    enable_vmaf: bool = True,
    vmaf_stride: int = 1,
    framerate: float = 30.0,
) -> Dict:
    """One approach -> the reference's per-video result dict."""
    n = min(reference_frames.shape[0], decoded_frames.shape[0])
    ref = jnp.asarray(reference_frames[:n]).astype(jnp.float32)
    dec = jnp.asarray(decoded_frames[:n]).astype(jnp.float32)
    fg = np.asarray(fg_masks[:n]).astype(bool)
    bg = ~fg

    idx = np.arange(0, n, metric_stride)
    bbox = mask_union_bbox(fg)
    x, y, w, h = bbox

    ref_s, dec_s = ref[idx], dec[idx]
    fg_s, bg_s = jnp.asarray(fg[idx]), jnp.asarray(bg[idx])

    # FG: ROI crop (static bbox) + mask; BG: full frame + inverted mask.
    ref_roi = ref_s[:, y : y + h, x : x + w]
    dec_roi = dec_s[:, y : y + h, x : x + w]
    fg_roi = fg_s[:, y : y + h, x : x + w]

    fg_psnr = np.asarray(masked_psnr(ref_roi, dec_roi, fg_roi))
    fg_mse = np.asarray(masked_mse(ref_roi, dec_roi, fg_roi))
    fg_ssim = np.asarray(masked_ssim(ref_s, dec_s, fg_s, bbox=bbox))
    bg_psnr = np.asarray(masked_psnr(ref_s, dec_s, bg_s))
    bg_mse = np.asarray(masked_mse(ref_s, dec_s, bg_s))
    bg_ssim = np.asarray(masked_ssim(ref_s, dec_s, bg_s))

    # LPIPS on masked frames (outside-region zeroed), like elvis.py:3853-3860
    fg_pix = fg_s[..., None].astype(jnp.float32)
    fg_lpips = np.asarray(
        lpips_distance(ref_roi * fg_roi[..., None], dec_roi * fg_roi[..., None])
    )
    bg_lpips = np.asarray(
        lpips_distance(ref_s * (1 - fg_pix), dec_s * (1 - fg_pix))
    )

    result = {
        "foreground": {
            "psnr_mean": _stats(fg_psnr)["mean"], "psnr_std": _stats(fg_psnr)["std"],
            "ssim_mean": _stats(fg_ssim)["mean"], "ssim_std": _stats(fg_ssim)["std"],
            "mse_mean": _stats(fg_mse)["mean"], "mse_std": _stats(fg_mse)["std"],
            "lpips_mean": _stats(fg_lpips)["mean"], "lpips_std": _stats(fg_lpips)["std"],
            "fvmd": float("nan"), "fvmd_std": float("nan"),
        },
        "background": {
            "psnr_mean": _stats(bg_psnr)["mean"], "psnr_std": _stats(bg_psnr)["std"],
            "ssim_mean": _stats(bg_ssim)["mean"], "ssim_std": _stats(bg_ssim)["std"],
            "mse_mean": _stats(bg_mse)["mean"], "mse_std": _stats(bg_mse)["std"],
            "lpips_mean": _stats(bg_lpips)["mean"], "lpips_std": _stats(bg_lpips)["std"],
            "fvmd": float("nan"), "fvmd_std": float("nan"),
        },
        "bitrate_mbps": bitrate_bps / 1_000_000,
    }

    if enable_fvmd and n >= 4:
        # Incremental early-stop + sliding-window std, the reference's
        # elvis.py:3535-3583 machinery; fvmd_std is the stability measure.
        fvmd_kw = dict(
            stride=fvmd_stride,
            early_stop_delta=fvmd_early_stop_delta,
            window=fvmd_early_stop_window,
            max_frames=fvmd_max_frames,
        )
        masked_ref_fg = np.asarray(ref * fg_pix_full(fg))
        masked_dec_fg = np.asarray(dec * fg_pix_full(fg))
        fg_v, fg_std = fvmd_incremental(masked_ref_fg, masked_dec_fg, **fvmd_kw)
        result["foreground"]["fvmd"] = fg_v
        result["foreground"]["fvmd_std"] = fg_std
        masked_ref_bg = np.asarray(ref * (1 - fg_pix_full(fg)))
        masked_dec_bg = np.asarray(dec * (1 - fg_pix_full(fg)))
        bg_v, bg_std = fvmd_incremental(masked_ref_bg, masked_dec_bg, **fvmd_kw)
        result["background"]["fvmd"] = bg_v
        result["background"]["fvmd_std"] = bg_std

    if enable_vmaf and vmaf_available():
        # Per-region masked-crop VMAF (elvis.py:3895-3947): foreground on
        # the mask-zeroed bbox crop, background on the FG-zeroed frames —
        # plus the full-frame score. vmaf_stride subsamples frames.
        vs = np.arange(0, n, vmaf_stride)
        fgm = np.asarray(fg)[vs][..., None].astype(np.float32)
        ref_v, dec_v = np.asarray(ref)[vs], np.asarray(dec)[vs]
        fg_crop_r = (ref_v[:, y : y + h, x : x + w]
                     * fgm[:, y : y + h, x : x + w])
        fg_crop_d = (dec_v[:, y : y + h, x : x + w]
                     * fgm[:, y : y + h, x : x + w])
        result["foreground"]["vmaf"] = compute_vmaf(fg_crop_r, fg_crop_d, framerate)["mean"]
        result["background"]["vmaf"] = compute_vmaf(
            ref_v * (1 - fgm), dec_v * (1 - fgm), framerate
        )["mean"]
        result["vmaf"] = compute_vmaf(ref_v, dec_v, framerate)
    return result


def fg_pix_full(fg: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(fg.astype(np.float32))[..., None]


def analyze_encoding_performance(
    reference_frames: np.ndarray,
    decoded_videos: Dict[str, np.ndarray],
    fg_masks: np.ndarray,
    video_bitrates: Dict[str, float],
    *,
    framerate: float = 30.0,
    metric_stride: int = 1,
    enable_fvmd: bool = True,
    fvmd_stride: int = 1,
    fvmd_early_stop_delta: float = 0.002,
    fvmd_early_stop_window: int = 50,
    fvmd_max_frames: Optional[int] = None,
    enable_vmaf: bool = True,
    vmaf_stride: int = 1,
    analysis_sample_frames: Optional[int] = None,
) -> Dict:
    """All approaches -> {label: result dict} (the analysis_results.json
    body, elvis.py:3599 fan-out). ``analysis_sample_frames`` caps the
    number of frames entering the analysis (the search drivers' knob,
    SURVEY.md §2.9 bug #4)."""
    if analysis_sample_frames:
        reference_frames = reference_frames[:analysis_sample_frames]
    out: Dict[str, Dict] = {}
    for label, frames in decoded_videos.items():
        t0 = time.time()
        out[label] = evaluate_approach(
            reference_frames,
            frames if not analysis_sample_frames else frames[:analysis_sample_frames],
            fg_masks,
            video_bitrates.get(label, 0.0),
            metric_stride=metric_stride,
            enable_fvmd=enable_fvmd,
            fvmd_stride=fvmd_stride,
            fvmd_early_stop_delta=fvmd_early_stop_delta,
            fvmd_early_stop_window=fvmd_early_stop_window,
            fvmd_max_frames=fvmd_max_frames,
            enable_vmaf=enable_vmaf,
            vmaf_stride=vmaf_stride,
            framerate=framerate,
        )
        out[label]["evaluation_seconds"] = time.time() - t0
    return out
