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

import functools
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from elvis_tpu.metrics.fvmd import fvmd_from_features, region_motion_features
from elvis_tpu.metrics.perceptual import lpips_distance
from elvis_tpu.metrics.pixel import mask_union_bbox, masked_mse, masked_psnr, masked_ssim
from elvis_tpu.metrics.vmaf import compute_vmaf, vmaf_available

__all__ = ["evaluate_approach", "analyze_encoding_performance"]

# Frames per metric chunk are sized so the SSIM/LPIPS working set stays
# small: ~8M px/chunk = 4 frames @1080p. Long clips previously evaluated
# as ONE eager full-clip computation — at 128 frames @1080p that put
# 6.4 GB of ref+dec alone on device and OOMed in the eager SSIM chain;
# per-frame metrics are frame-independent, so chunking is exact.
_EVAL_CHUNK_PIXELS = 1 << 23


def _stats(vals: np.ndarray) -> Dict[str, float]:
    vals = np.asarray(vals, dtype=np.float64)
    return {"mean": float(vals.mean()) if vals.size else 0.0,
            "std": float(vals.std()) if vals.size else 0.0}


@functools.partial(jax.jit, static_argnames=("bbox", "bg_bbox"))
def _chunk_metrics(ref_c, dec_c, fg_c, bbox, bg_bbox):
    """All eight per-frame metric vectors for one frame chunk, one jitted
    graph (compiled once per clip shape — bboxes are static and shared
    across approaches). FG: ROI crop (static bbox) + mask; BG: full frame
    + inverted mask; LPIPS on outside-region-zeroed frames
    (elvis.py:3853-3860)."""
    x, y, w, h = bbox
    ref_c = ref_c.astype(jnp.float32)
    dec_c = dec_c.astype(jnp.float32)
    bg_c = ~fg_c
    ref_roi = ref_c[:, y : y + h, x : x + w]
    dec_roi = dec_c[:, y : y + h, x : x + w]
    fg_roi = fg_c[:, y : y + h, x : x + w]
    fgf = fg_roi[..., None].astype(jnp.float32)
    fg_pix = fg_c[..., None].astype(jnp.float32)
    return (
        masked_psnr(ref_roi, dec_roi, fg_roi),
        masked_mse(ref_roi, dec_roi, fg_roi),
        masked_ssim(ref_c, dec_c, fg_c, bbox=bbox),
        masked_psnr(ref_c, dec_c, bg_c),
        masked_mse(ref_c, dec_c, bg_c),
        masked_ssim(ref_c, dec_c, bg_c, bbox=bg_bbox),
        lpips_distance(ref_roi * fgf, dec_roi * fgf),
        lpips_distance(ref_c * (1 - fg_pix), dec_c * (1 - fg_pix)),
    )


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
    ref_feat_cache: Optional[dict] = None,
) -> Dict:
    """One approach -> the reference's per-video result dict.

    Frames stay HOST arrays; the device sees one jitted chunk at a time
    (both the pixel/LPIPS metrics here and the FVMD motion features),
    so evaluation memory is bounded regardless of clip length.

    ``ref_feat_cache``: optional dict reused across approaches; the
    reference clip's FVMD motion features (FG+BG) are stored per
    (frame_count, stride, max_frames) key so the fan-out extracts them
    once instead of per approach — at 128f/1080p the per-approach
    re-extraction dominated evaluation wall-clock (round-3 long run)."""
    n = min(reference_frames.shape[0], decoded_frames.shape[0])
    ref_np = np.asarray(reference_frames[:n])
    dec_np = np.asarray(decoded_frames[:n])
    fg = np.asarray(fg_masks[:n]).astype(bool)

    idx = np.arange(0, n, metric_stride)
    bbox = mask_union_bbox(fg)
    # the BG bbox matches the old inline computation: union of the
    # STRIDED inverted masks (masked_ssim's internal default)
    bg_bbox = mask_union_bbox(~fg[idx])

    from elvis_tpu.metrics.perceptual import ensure_loaded

    ensure_loaded()  # lpips checkpoint restore cannot happen inside jit

    frame_px = int(ref_np.shape[1]) * int(ref_np.shape[2])
    chunk = max(1, _EVAL_CHUNK_PIXELS // frame_px)
    cols = tuple([] for _ in range(8))
    for s in range(0, len(idx), chunk):
        sel = idx[s : s + chunk]
        k = len(sel)
        if k < chunk and len(idx) > chunk:
            # pad the tail to the steady chunk shape: one compile
            sel = np.concatenate([sel, np.repeat(sel[-1:], chunk - k)])
        outs = _chunk_metrics(
            jnp.asarray(ref_np[sel]),
            jnp.asarray(dec_np[sel]),
            jnp.asarray(fg[sel]),
            bbox,
            bg_bbox,
        )
        for c, o in zip(cols, outs):
            c.append(np.asarray(o)[:k])
    (fg_psnr, fg_mse, fg_ssim, bg_psnr, bg_mse, bg_ssim,
     fg_lpips, bg_lpips) = (np.concatenate(c) for c in cols)

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
        # Masking happens ON DEVICE inside the chunked feature extractor
        # (no clip-sized masked copies, uint8-rate pushes); FG and BG
        # features come from ONE push per clip, and the reference clip's
        # features are shared across approaches via ref_feat_cache.
        feat_kw = dict(stride=fvmd_stride, max_frames=fvmd_max_frames)
        es_kw = dict(early_stop_delta=fvmd_early_stop_delta,
                     window=fvmd_early_stop_window)
        key = (n, fvmd_stride, fvmd_max_frames)
        if ref_feat_cache is not None and key in ref_feat_cache:
            ref_fg_feats, ref_bg_feats = ref_feat_cache[key]
        else:
            ref_fg_feats, ref_bg_feats = region_motion_features(
                ref_np, fg, **feat_kw)
            if ref_feat_cache is not None:
                ref_feat_cache[key] = (ref_fg_feats, ref_bg_feats)
        dec_fg_feats, dec_bg_feats = region_motion_features(
            dec_np, fg, **feat_kw)
        fg_v, fg_std = fvmd_from_features(ref_fg_feats, dec_fg_feats, **es_kw)
        result["foreground"]["fvmd"] = fg_v
        result["foreground"]["fvmd_std"] = fg_std
        bg_v, bg_std = fvmd_from_features(ref_bg_feats, dec_bg_feats, **es_kw)
        result["background"]["fvmd"] = bg_v
        result["background"]["fvmd_std"] = bg_std

    if enable_vmaf and vmaf_available():
        # Per-region masked-crop VMAF (elvis.py:3895-3947): foreground on
        # the mask-zeroed bbox crop, background on the FG-zeroed frames —
        # plus the full-frame score. vmaf_stride subsamples frames.
        vs = np.arange(0, n, vmaf_stride)
        fgm = fg[vs][..., None].astype(np.float32)
        ref_v = ref_np[vs].astype(np.float32)
        dec_v = dec_np[vs].astype(np.float32)
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
    verbose: bool = False,
    consume: bool = False,
) -> Dict:
    """All approaches -> {label: result dict} (the analysis_results.json
    body, elvis.py:3599 fan-out). ``analysis_sample_frames`` caps the
    number of frames entering the analysis (the search drivers' knob,
    SURVEY.md §2.9 bug #4). ``verbose`` prints one line per finished
    approach — evaluation is the longest unlogged span at scale (a
    128f/1080p clip spends tens of minutes here with FVMD on).
    ``consume=True`` pops each decoded clip out of ``decoded_videos`` as
    it finishes (VERDICT r4 #7: by stage 13 the pipeline holds EVERY
    approach's full decoded clip at once — the single biggest host-RSS
    plateau at 128f/1080p; evaluation is each clip's last use)."""
    if analysis_sample_frames:
        reference_frames = reference_frames[:analysis_sample_frames]
    out: Dict[str, Dict] = {}
    ref_feat_cache: Dict = {}  # reference FVMD features, shared across approaches
    for label in list(decoded_videos.keys()):
        frames = decoded_videos.pop(label) if consume else decoded_videos[label]
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
            ref_feat_cache=ref_feat_cache,
        )
        out[label]["evaluation_seconds"] = time.time() - t0
        if verbose:
            print(f"[elvis_tpu]   evaluated {label}: "
                  f"{out[label]['evaluation_seconds']:.1f}s", flush=True)
    return out
