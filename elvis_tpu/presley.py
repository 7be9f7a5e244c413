"""PRESLEY experiment driver — the shrink/ROI/degradation ablation script.

Counterpart of the reference's ``presley.py`` (the Kvazaar/SVT-AV1-centric
experiment generation): same config surface (PresleyConfig field names,
presley.py:55-104; auto-argparse presley.py:106-126) and the same
experiment sweep — baseline encodes, the three shrink methods with
inpainting, ROI encodes, adaptive downsample/blur degradations with the
classical+neural restoration ladder, all timed through
``measure_performance`` into ``performance_metrics.json``
(presley.py:1426-1627).

Deliberate differences from the reference:
  * nothing runs at import time (the reference executes its whole
    pipeline on module import via decoration-time side effects,
    SURVEY.md §3.2 — a footgun this rebuild removes);
  * encoders: the hermetic NVC codec by default; kvazaar/SVT-AV1 via
    elvis_tpu.codec.external when the binaries exist;
  * restoration backends are registry slots, not hard-wired forks.

Knob liveness (mirrors pipeline.config's ABSORBED_FIELDS policy):
propainter_*/e2fgvi_* window/ref_stride/num_ref/mask_dilation and
neural_tile_size/realesrgan_fp32/instantir_seed/instantir_steps/
downsample_max_scale/metrics_to_exclude/save_intermediate all drive
their mechanisms below. ABSORBED (no counterpart): propainter_raft_iter
/ propainter_fp16 / realesrgan_denoise_strength / realesrgan_pre_pad /
instantir_cfg / instantir_creative_start / instantir_preview_start
(reasons in pipeline/config.py) and uav_* (the Upscale-A-Video slot's
naive-neural row is filled by the in-framework SR tiers; UAV's
noise/guidance/steps parameterize a model that has no counterpart) and
context_halo (the reference's per-block neural tiles carried a context
halo, utils.py:1227; restoration here is whole-frame — the analogous
height-tile halo is neural_tile_size's tile_pad, fixed at the
measured-exact 32 rows).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

__all__ = ["PresleyConfig", "parse_and_update_config", "run_presley", "main"]


@dataclass
class PresleyConfig:
    reference_video: str = "synthetic://moving?frames=20"
    width: int = 1280
    height: int = 720
    frame_stride: int = 1
    max_frames: int = 20
    framerate: Optional[float] = None
    quality: str = "medium"
    qp_range: Optional[int] = None
    block_size: int = 16
    alpha: float = 0.5
    beta: float = 0.5
    shrink_amount: float = 0.25
    propainter_ref_stride: int = 10
    propainter_neighbor_length: int = 4
    propainter_subvideo_length: int = 20
    propainter_mask_dilation: int = 4
    propainter_raft_iter: int = 20
    propainter_fp16: bool = True
    e2fgvi_ref_stride: int = 10
    e2fgvi_neighbor_stride: int = 5
    e2fgvi_num_ref: int = 4
    e2fgvi_mask_dilation: int = 4
    downsample_max_scale: int = 4
    blur_max_rounds: int = 4
    context_halo: int = 8
    temporal_blend: float = 0.1
    metrics_to_exclude: List[str] = field(default_factory=lambda: ["fvmd", "lpips"])
    neural_tile_size: int = 128
    realesrgan_denoise_strength: float = 0.3
    realesrgan_pre_pad: int = 0
    realesrgan_fp32: bool = False
    instantir_cfg: float = 2.0
    instantir_creative_start: float = 1.0
    instantir_preview_start: float = 0.0
    instantir_seed: int = 42
    instantir_steps: int = 10
    uav_noise_level: int = 50
    uav_guidance_scale: float = 2.0
    uav_inference_steps: int = 10
    save_intermediate: bool = True
    # framework extensions
    output_dir: str = "presley_results"
    shrink_methods: List[str] = field(default_factory=lambda: ["row_only", "row_col"])


def parse_and_update_config(config_obj: PresleyConfig, argv=None) -> PresleyConfig:
    """Auto-argparse over dataclass fields (presley.py:106-126 semantics)."""
    parser = argparse.ArgumentParser(description="PRESLEY ablation test (elvis-tpu)")
    for f in dataclasses.fields(PresleyConfig):
        default_val = getattr(config_obj, f.name)
        if isinstance(default_val, bool):
            parser.add_argument(
                f"--{f.name}",
                action="store_false" if default_val else "store_true",
                help=f"Toggle {f.name} (default: {default_val})",
            )
        elif isinstance(default_val, list):
            parser.add_argument(f"--{f.name}", type=str, default=None)
        else:
            ftype = type(default_val) if default_val is not None else str
            parser.add_argument(f"--{f.name}", type=ftype, default=default_val)
    args = parser.parse_args(argv)
    for f in dataclasses.fields(PresleyConfig):
        v = getattr(args, f.name, None)
        if v is None:
            continue
        if isinstance(getattr(config_obj, f.name), list) and isinstance(v, str):
            v = json.loads(v) if v.startswith("[") else v.split(",")
        setattr(config_obj, f.name, v)
    return config_obj


def run_presley(config: PresleyConfig) -> Dict:
    """Execute the ablation sweep; returns the performance_metrics dict."""
    import jax.numpy as jnp

    from elvis_tpu.codec import QUALITY_PRESETS, NvcCodec
    from elvis_tpu.core.blocks import blockwise_reduce
    from elvis_tpu.degrade import adaptive_blur, adaptive_downsample
    from elvis_tpu.degrade.adaptive import adaptive_downsample_scale
    from elvis_tpu.degrade.shrink import shrink_video, stretch_video
    from elvis_tpu.pipeline.config import ElvisConfig
    from elvis_tpu.pipeline.io import load_clip, save_frames_png
    from elvis_tpu.restore import (
        restore_blur_unsharp,
        restore_downsample_lanczos,
        restore_removal_diffusion,
        temporal_blend,
    )
    from elvis_tpu.restore.backends import (
        resolve_deblur_backend,
        resolve_inpaint_backend,
        resolve_sr_backend,
    )
    from elvis_tpu.restore.lanczos import restore_downsample_scale_lanczos
    from elvis_tpu.scoring import (
        get_saliency_fn,
        importance_scores,
        spatial_temporal_complexity,
    )
    from elvis_tpu.utils import measure_performance

    os.makedirs(config.output_dir, exist_ok=True)
    # Backend knobs route through the shared resolver (ElvisConfig field
    # names match the reference's shared plumbing), so presley's window/
    # ref/dilation/precision/seed knobs hit the same mechanisms run_elvis
    # uses.
    econf = ElvisConfig(
        propainter_neighbor_length=config.propainter_neighbor_length,
        propainter_subvideo_length=config.propainter_subvideo_length,
        propainter_ref_stride=config.propainter_ref_stride,
        propainter_mask_dilation=config.propainter_mask_dilation,
        e2fgvi_neighbor_stride=config.e2fgvi_neighbor_stride,
        e2fgvi_ref_stride=config.e2fgvi_ref_stride,
        e2fgvi_num_ref=config.e2fgvi_num_ref,
        e2fgvi_mask_dilation=config.e2fgvi_mask_dilation,
        realesrgan_fp32=config.realesrgan_fp32,
        realesrgan_tile=config.neural_tile_size,
        instantir_seed=config.instantir_seed,
        gaussian_max_rounds=config.blur_max_rounds,
    )
    econf.instantir_steps = config.instantir_steps  # presley-only knob
    preset = QUALITY_PRESETS[config.quality]
    qp = preset["nvc_qp"]
    qp_range = config.qp_range if config.qp_range is not None else preset["qp_range"]
    b = config.block_size

    frames_np, fps = load_clip(
        config.reference_video, config.width, config.height, None
    )
    frames_np = frames_np[:: config.frame_stride][: config.max_frames]
    fps = config.framerate or fps
    frames = jnp.asarray(frames_np)
    n = frames_np.shape[0]
    duration = n / fps

    # importance scores (presley.py:129-152 semantics)
    comp = spatial_temporal_complexity(frames.astype(jnp.float32), b)
    sal = get_saliency_fn("motion_contrast")(frames.astype(jnp.float32))
    fg_weight = blockwise_reduce((sal >= 0.5).astype(jnp.float32), b, jnp.mean)
    importance = importance_scores(
        comp.SC, comp.TC, (fg_weight > 0.1).astype(jnp.float32),
        alpha=config.alpha, beta=config.beta,
    )
    fg_masks = np.asarray(sal >= 0.5)

    codec = NvcCodec()
    results: Dict = {"config": dataclasses.asdict(config), "methods": {}}
    mx = dict(exclude=config.metrics_to_exclude)

    def record(name, rec, stream_bytes=None):
        entry = {k: v for k, v in rec.items() if k != "output"}
        if stream_bytes is not None:
            entry["size_bytes"] = len(stream_bytes)
            entry["bitrate_kbps"] = len(stream_bytes) * 8 / duration / 1000
        results["methods"][name] = entry
        out = rec.get("output")
        if config.save_intermediate and out is not None:
            # per-method restored frames, like the reference's staged
            # PNG artifacts (presley.py save_intermediate)
            arr = np.clip(np.round(np.asarray(out)), 0, 255).astype(np.uint8)
            save_frames_png(arr, os.path.join(config.output_dir, name))
        return out

    # --- baseline encode (presley.py:1433-1436) ---------------------------
    stream = codec.encode(frames_np, qp=qp, framerate=fps)
    decoded, _ = codec.decode(stream)
    record(
        "baseline",
        measure_performance(lambda f: decoded, frames_np, label="baseline",
                            reference_frames=frames_np, fg_masks=fg_masks, **mx),
        stream,
    )

    # --- shrink methods + inpainting (presley.py:1442-1466) ---------------
    imp_np = np.asarray(importance)
    for method in config.shrink_methods:
        shrunk, plans = shrink_video(frames, imp_np, b, config.shrink_amount, method)
        s_stream = codec.encode(np.asarray(shrunk), qp=qp, framerate=fps)
        s_dec, _ = codec.decode(s_stream)
        stretched = stretch_video(jnp.asarray(s_dec), plans, b)
        removal_mask = jnp.asarray(np.stack([p.removal_mask for p in plans]))
        for inp_name, backend in (
            ("telea", "diffusion"),
            ("propainter", "temporal"),
            ("e2fgvi", "neural"),
        ):
            inp_fn, _prov = resolve_inpaint_backend(backend, econf)
            rec = measure_performance(
                lambda f, fn=inp_fn: fn(stretched, removal_mask, b),
                frames_np, label=f"shrink_{method}_{inp_name}",
                reference_frames=frames_np, fg_masks=fg_masks, **mx,
            )
            record(f"shrink_{method}_{inp_name}", rec, s_stream)

    # --- ROI encodes (presley.py:1474-1478) --------------------------------
    dqp_f = (1.0 - imp_np) * 2 * qp_range - qp_range
    dqp_f = dqp_f - dqp_f.mean(axis=(1, 2), keepdims=True)
    dqp = np.clip(np.round(dqp_f), -14, 14).astype(np.int8)
    roi_stream = codec.encode(frames_np, qp=qp, framerate=fps, roi_delta_qp=dqp)
    roi_dec, _ = codec.decode(roi_stream)
    record(
        "roi_nvc",
        measure_performance(lambda f: roi_dec, frames_np, label="roi_nvc",
                            reference_frames=frames_np, fg_masks=fg_masks, **mx),
        roi_stream,
    )

    # --- degradation + restoration ladder (presley.py:1482-1550) -----------
    removability = 1.0 - importance  # degrade the unimportant
    down, down_levels = adaptive_downsample(frames, removability, b)
    down_stream = codec.encode(np.asarray(down), qp=qp, framerate=fps)
    down_dec, _ = codec.decode(down_stream)
    sr_naive, _ = resolve_sr_backend("naive_sr", econf)
    sr_adapt, _ = resolve_sr_backend("realesrgan", econf)
    for name, fn in (
        ("lanczos", lambda f: restore_downsample_lanczos(
            jnp.asarray(down_dec), down_levels, b)),
        ("lanczos_tb", lambda f: temporal_blend(
            restore_downsample_lanczos(jnp.asarray(down_dec), down_levels, b),
            config.temporal_blend)),
        # the reference's RealESRGAN naive/adaptive rows
        # (presley.py:1495-1550) — trained SR tiers via the registry
        ("realesrgan_naive", lambda f: sr_naive(
            jnp.asarray(down_dec).astype(jnp.float32), down_levels, b)),
        ("realesrgan_adaptive", lambda f: sr_adapt(
            jnp.asarray(down_dec).astype(jnp.float32), down_levels, b)),
    ):
        record(f"downsample_{name}",
               measure_performance(fn, frames_np, label=f"downsample_{name}",
                                   reference_frames=frames_np, fg_masks=fg_masks,
                                   **mx),
               down_stream)

    # scale-factor degradation variant (reference utils.py:1101-1168,
    # presley.py:968-983) at the configured downsample_max_scale
    down_s, scale_map = adaptive_downsample_scale(
        frames, importance, b, config.downsample_max_scale)
    ds_stream = codec.encode(np.asarray(down_s), qp=qp, framerate=fps)
    ds_dec, _ = codec.decode(ds_stream)
    record("downsample_scale_lanczos",
           measure_performance(
               lambda f: restore_downsample_scale_lanczos(
                   jnp.asarray(ds_dec), scale_map, b,
                   config.downsample_max_scale),
               frames_np, label="downsample_scale_lanczos",
               reference_frames=frames_np, fg_masks=fg_masks, **mx),
           ds_stream)

    blur, blur_levels = adaptive_blur(frames, removability, b, config.blur_max_rounds)
    blur_stream = codec.encode(np.asarray(blur), qp=qp, framerate=fps)
    blur_dec, _ = codec.decode(blur_stream)
    deblur_rows = [("blur_unsharp", lambda f: restore_blur_unsharp(
        jnp.asarray(blur_dec), blur_levels, b, config.blur_max_rounds))]
    # the reference's InstantIR naive/adaptive rows (presley.py:1279-1419):
    # the trained DeblurUNet holds the slot; the shipped diffusion
    # restorer adds the heavy-blur specialist (instantir_seed/steps live)
    for row, backend in (("blur_deblur_net", "deblur_net"),
                         ("blur_instantir_adaptive", "diffusion"),
                         ("blur_instantir_naive", "naive_diffusion")):
        fn, _prov = resolve_deblur_backend(backend, econf)
        deblur_rows.append(
            (row, lambda f, fn=fn: fn(
                jnp.asarray(blur_dec).astype(jnp.float32), blur_levels, b))
        )
    for row, fn in deblur_rows:
        record(row,
               measure_performance(fn, frames_np, label=row,
                                   reference_frames=frames_np,
                                   fg_masks=fg_masks, **mx),
               blur_stream)

    out_path = os.path.join(config.output_dir, "performance_metrics.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=4, default=float)
    print(f"performance metrics saved to {out_path}")
    return results


def main(argv=None) -> int:
    config = parse_and_update_config(PresleyConfig(), argv)
    run_presley(config)
    return 0


if __name__ == "__main__":
    main()
