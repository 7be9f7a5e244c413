"""run_elvis: the full pipeline orchestrator.

Stage-structure parity with the reference's ``run_elvis``
(elvis.py:4194-4937) — preprocessing, removability, baseline encode,
ELVIS shrink, ROI encode, downsample branch, blur branch, client stretch
+ inpainting, SR restore, deblur restore, bitrate accounting, classical
benchmarks, evaluation — with the reference's approach labels and
``analysis_results.json`` schema, so its search drivers and plots
notebook consume the output unchanged.

The execution model is the inversion the north star demands: where the
reference round-trips every stage through PNG directories and subprocess
boundaries (SURVEY.md §1 'data flows through the filesystem'), here the
clip is ONE device-resident tensor; the only host work is entropy coding
(NVC) and JSON. Approach slots are filled by this framework's backends:

  label (reference)      slot                       backend here
  ------------------------------------------------------------------
  Baseline               plain encode               NVC (or x265/...)
  PRESLEY QP             per-block delta-QP ROI     NVC native QP map
  ELVIS CV2              classical inpaint          PDE diffusion fill
  ELVIS ProPainter       video inpaint (flow)       temporal propagation
  ELVIS E2FGVI           video inpaint (neural)     InpaintNet
  PRESLEY RealESRGAN     neural progressive SR      SRNet / lanczos 2x
  PRESLEY InstantIR      neural deblur              DeblurUNet
  PRESLEY Lanczos        classical SR benchmark     per-block lanczos
  PRESLEY Unsharp        classical deblur benchmark unsharp mask
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from dataclasses import asdict
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from elvis_tpu.codec import (
    NvcCodec,
    calculate_target_bitrate,
    save_removal_masks_npz,
    save_strength_maps_npz,
)
from elvis_tpu.degrade import (
    adaptive_blur,
    adaptive_downsample,
    apply_selective_removal,
    stretch_frames,
)
from elvis_tpu.metrics.evaluate import analyze_encoding_performance
from elvis_tpu.metrics.report import format_summary_report
from elvis_tpu.pipeline.cache import StageCache
from elvis_tpu.pipeline.config import ElvisConfig
from elvis_tpu.pipeline.io import load_clip, save_frames_png
from elvis_tpu.restore import (
    get_restorer,
    progressive_restore,
    restore_blur_unsharp,
    restore_downsample_lanczos,
    restore_removal_diffusion,
    restore_removal_temporal,
    temporal_blend,
)
from elvis_tpu.scoring import (
    get_saliency_fn,
    removability_scores,
    spatial_temporal_complexity,
)
from elvis_tpu.scoring.saliency import saliency_to_block_mask

__all__ = ["run_elvis", "APPROACHES"]


class APPROACHES:
    BASELINE = "Baseline"
    ELVIS_V2_DAMPEN = "ELVIS v2 Dampen"  # README-era degradation, no reference label
    PRESLEY_QP = "PRESLEY QP"
    ELVIS = "ELVIS"
    ELVIS_CV2 = "ELVIS CV2"
    ELVIS_PROP = "ELVIS ProPainter"
    ELVIS_E2FGVI = "ELVIS E2FGVI"
    PRESLEY_REALESRGAN = "PRESLEY RealESRGAN"
    PRESLEY_INSTANTIR = "PRESLEY InstantIR"
    PRESLEY_LANCZOS = "PRESLEY Lanczos"
    PRESLEY_UNSHARP = "PRESLEY Unsharp"


def _load_srnet_upsampler(config: ElvisConfig):
    """SRNet 2x when params exist; Lanczos-4 2x otherwise (the hermetic
    default principle — the loop itself is the same either way)."""
    if config.srnet_params_path and os.path.exists(config.srnet_params_path):
        import orbax.checkpoint as ocp

        from elvis_tpu.models import SRNet, srnet_upsample_fn

        model = SRNet()
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(config.srnet_params_path), template
        )
        return srnet_upsample_fn(model, params)
    return None


def run_elvis(config: ElvisConfig) -> Dict:
    """Execute the pipeline; returns (and writes) analysis_results."""
    if config.profile_dir:
        # Device-level tracing (SURVEY.md §5.1: the reference only has
        # wall-clock pairs; this adds XLA op-level traces on top).
        import contextlib

        with jax.profiler.trace(config.profile_dir):
            return _run_elvis_impl(config)
    return _run_elvis_impl(config)


def _run_elvis_impl(config: ElvisConfig) -> Dict:
    t_pipeline = time.time()
    width, height, b = config.width, config.height, config.block_size

    video_name = Path(config.reference_video.replace("synthetic://", "synthetic_")).stem
    experiment_dir = config.experiment_dir or os.path.abspath(
        f"experiment_{video_name}_w{width}_h{height}_bs{b}_shrink{config.shrink_amount}"
    )
    os.makedirs(experiment_dir, exist_ok=True)
    maps_dir = os.path.join(experiment_dir, "maps")
    os.makedirs(maps_dir, exist_ok=True)

    execution_times: Dict[str, float] = {}
    approach_times = defaultdict(float)
    cache = StageCache(os.path.join(experiment_dir, "stage_cache"), config.stage_cache)

    # --- stage 0: preprocessing (elvis.py:4315-4345) ----------------------
    t0 = time.time()
    frames_np, framerate = load_clip(
        config.reference_video, width, height, config.max_frames
    )
    if config.framerate_override:
        framerate = config.framerate_override
    n = frames_np.shape[0]
    frames = jnp.asarray(frames_np)
    frames_f32 = frames.astype(jnp.float32)
    duration = n / framerate
    target_bitrate = config.target_bitrate_override or calculate_target_bitrate(
        width, height, framerate, config.quality_factor
    )
    execution_times["Preprocessing"] = time.time() - t0

    # Frame-axis data parallelism (SURVEY.md §2.7 P1-P3 -> one sharding):
    # per-frame restoration stages run sharded when the clip divides the
    # device count; ops with temporal coupling stay unsharded here and use
    # parallel.halo when scaled explicitly.
    shard = lambda x: x  # noqa: E731
    if config.data_parallel and len(jax.devices()) > 1 and n % len(jax.devices()) == 0:
        from jax.sharding import NamedSharding, PartitionSpec

        from elvis_tpu.parallel import make_mesh

        _mesh = make_mesh()

        def shard(x):  # noqa: F811 — leading (frame) axis split, rest replicated
            spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(_mesh, spec))

    codec = NvcCodec()
    # ~1-second keyframe interval like the reference's `-g framerate`
    # (elvis.py:1298) — bounds seek/error propagation.
    gop = max(int(round(framerate)), 1)
    if config.codec != "nvc":
        raise NotImplementedError(
            f"codec {config.codec!r}: external encoders are available through "
            "elvis_tpu.codec.external when their binaries exist; the pipeline "
            "driver currently runs the built-in nvc codec"
        )

    # --- stage 1: removability scoring (elvis.py:4347-4362) ---------------
    t0 = time.time()

    def _score():
        from elvis_tpu.core.blocks import blockwise_reduce
        from elvis_tpu.scoring import importance_scores

        comp = spatial_temporal_complexity(frames_f32, b)
        sal = get_saliency_fn(config.saliency_backend)(frames_f32)
        fg_block = saliency_to_block_mask(sal, b)
        scores = removability_scores(
            comp.SC, comp.TC, fg_block,
            alpha=config.removability_alpha,
            smoothing_beta=config.removability_smoothing_beta,
        )
        # PRESLEY importance variant (utils.py:665-688) for the ROI stage —
        # the formulation behind the reference's measured FG gains
        # (TECHNICAL_REPORT.md:160-174 uses the kvazaar/importance path).
        # A block counts as foreground if ANY meaningful part of it is —
        # object-boundary blocks dominate FG pixel error, and classing
        # them background inverts the intended trade.
        fg_frac = blockwise_reduce((sal >= 0.5).astype(jnp.float32), b, jnp.mean)
        fg_weight = (fg_frac > 0.1).astype(jnp.float32)
        importance = importance_scores(
            comp.SC, comp.TC, fg_weight,
            alpha=config.removability_alpha,
            beta=config.removability_smoothing_beta,
        )
        return {
            "scores": np.asarray(scores),
            "importance": np.asarray(importance),
            "saliency": np.asarray(sal),
            "fg_block": np.asarray(fg_block),
        }

    scored = cache.get_or_run("scoring", [config.to_dict(), frames_np], _score)
    scores = jnp.asarray(scored["scores"])
    importance = scored["importance"]
    if config.masks_dir:
        # External ground-truth masks (DAVIS-style) override the saliency
        # estimate for evaluation, like the reference's maps/ufo_masks.
        from elvis_tpu.pipeline.io import load_masks

        fg_masks_pixel = load_masks(config.masks_dir, width, height, n)
    else:
        fg_masks_pixel = scored["saliency"] >= 0.5  # (N,H,W) bool
    # persist masks like the reference's maps/ufo_masks (elvis.py:1186-1199)
    save_frames_png(
        (fg_masks_pixel * 255).astype(np.uint8)[..., None].repeat(3, -1),
        os.path.join(maps_dir, "saliency_masks"),
    )
    execution_times["Removability Scores"] = time.time() - t0

    streams: Dict[str, bytes] = {}
    decoded: Dict[str, np.ndarray] = {}
    sidecar_sizes: Dict[str, int] = {}

    # --- stage 2: baseline encode (elvis.py:4364-4381) ---------------------
    t0 = time.time()
    streams["baseline"] = codec.encode(
        frames_np, target_bitrate=target_bitrate, framerate=framerate, gop=gop
    )
    decoded[APPROACHES.BASELINE], _ = codec.decode(streams["baseline"])
    dt = time.time() - t0
    execution_times["Baseline Encoding"] = dt
    approach_times[APPROACHES.BASELINE] += dt

    # --- stage 3: ELVIS shrink (elvis.py:4389-4418) -------------------------
    t0 = time.time()
    shrunk, removal_mask = apply_selective_removal(
        frames, scores, b, config.shrink_amount
    )
    masks_npz = os.path.join(experiment_dir, f"shrink_masks_{b}.npz")
    save_removal_masks_npz(np.asarray(removal_mask), masks_npz)
    streams["shrunk"] = codec.encode(
        np.asarray(shrunk), target_bitrate=target_bitrate, framerate=framerate, gop=gop
    )
    shrunk_decoded, _ = codec.decode(streams["shrunk"])
    dt = time.time() - t0
    execution_times["ELVIS Shrinking"] = dt
    approach_times[APPROACHES.ELVIS] += dt

    # --- stage 4: ROI encode (elvis.py:4439-4450) ---------------------------
    t0 = time.time()
    # importance [0,1] -> delta-QP via the kvazaar ROI formula
    # (utils.py:1048: dqp = (1-imp)*2r - r; imp=1 foreground -> -r, better
    # quality), recentred to zero mean per frame so the map is a pure bit
    # *redistribution* under two-pass rate control.
    dqp_f = (1.0 - importance) * 2.0 * config.roi_qp_range - config.roi_qp_range
    dqp_f = dqp_f - dqp_f.mean(axis=(1, 2), keepdims=True)
    dqp = np.clip(np.round(dqp_f), -14, 14).astype(np.int8)
    streams["roi"] = codec.encode(
        frames_np, target_bitrate=target_bitrate, framerate=framerate,
        roi_delta_qp=dqp, gop=gop,
    )
    decoded[APPROACHES.PRESLEY_QP], _ = codec.decode(streams["roi"])
    dt = time.time() - t0
    execution_times["Adaptive QP Encoding"] = dt
    approach_times[APPROACHES.PRESLEY_QP] += dt

    # --- stage 5: downsample branch (elvis.py:4462-4486) --------------------
    t0 = time.time()
    down_frames, down_levels = adaptive_downsample(frames, scores, b)
    streams["downsampled"] = codec.encode(
        np.asarray(down_frames), target_bitrate=target_bitrate, framerate=framerate, gop=gop
    )
    down_maps_path = os.path.join(maps_dir, "downsample_maps.npz")
    sidecar_sizes["downsample"] = save_strength_maps_npz(
        np.asarray(down_levels), down_maps_path
    )
    down_decoded, _ = codec.decode(streams["downsampled"])
    dt = time.time() - t0
    execution_times["Downsampled Encoding"] = dt
    approach_times[APPROACHES.PRESLEY_REALESRGAN] += dt

    # --- stage 6: blur branch (elvis.py:4501-4525) ---------------------------
    t0 = time.time()
    blur_frames, blur_levels = adaptive_blur(
        frames, scores, b, config.gaussian_max_rounds
    )
    streams["gaussian"] = codec.encode(
        np.asarray(blur_frames), target_bitrate=target_bitrate, framerate=framerate, gop=gop
    )
    blur_maps_path = os.path.join(maps_dir, "gaussian_maps.npz")
    sidecar_sizes["gaussian"] = save_strength_maps_npz(
        np.asarray(blur_levels), blur_maps_path
    )
    blur_decoded, _ = codec.decode(streams["gaussian"])
    dt = time.time() - t0
    execution_times["Gaussian Encoding"] = dt
    approach_times[APPROACHES.PRESLEY_INSTANTIR] += dt

    # --- stage 6b (extension): DCT-dampen branch — the "ELVIS v2" of the
    # reference's README (README.md:11-46) that its code never shipped.
    if config.enable_dct_dampen:
        from elvis_tpu.degrade import dct_dampen
        from elvis_tpu.restore import restore_dct_dampen_inverse

        t0 = time.time()
        damp_frames, damp_levels = dct_dampen(frames, scores, b)
        streams["dampened"] = codec.encode(
            np.asarray(damp_frames), target_bitrate=target_bitrate,
            framerate=framerate, gop=gop,
        )
        damp_maps_path = os.path.join(maps_dir, "dampen_maps.npz")
        sidecar_sizes["dampen"] = save_strength_maps_npz(
            np.asarray(damp_levels), damp_maps_path
        )
        damp_decoded, _ = codec.decode(streams["dampened"])
        damp_levels_dec = jnp.asarray(
            np.load(damp_maps_path)["strength_maps"].astype(np.int32)
        )
        decoded[APPROACHES.ELVIS_V2_DAMPEN] = np.asarray(
            restore_dct_dampen_inverse(jnp.asarray(damp_decoded), damp_levels_dec, b)
        )
        dt = time.time() - t0
        execution_times["DCT Dampen Branch"] = dt
        approach_times[APPROACHES.ELVIS_V2_DAMPEN] += dt

    # --- stage 7: client stretch (elvis.py:4542-4580) ------------------------
    t0 = time.time()
    stretched = stretch_frames(jnp.asarray(shrunk_decoded), removal_mask, b)
    execution_times["ELVIS Stretching"] = time.time() - t0

    # --- stage 8: inpainting x3 (elvis.py:4601-4661) -------------------------
    t0 = time.time()
    decoded[APPROACHES.ELVIS_CV2] = np.asarray(
        restore_removal_diffusion(shard(stretched), shard(removal_mask), b)
    )
    dt = time.time() - t0
    execution_times["CV2 Inpainting"] = dt
    approach_times[APPROACHES.ELVIS_CV2] += dt

    t0 = time.time()
    decoded[APPROACHES.ELVIS_PROP] = np.asarray(
        restore_removal_temporal(stretched, removal_mask, b)
    )
    dt = time.time() - t0
    execution_times["ProPainter Inpainting"] = dt
    approach_times[APPROACHES.ELVIS_PROP] += dt

    t0 = time.time()
    seeded = jnp.asarray(decoded[APPROACHES.ELVIS_PROP]).astype(jnp.float32)
    if config.inpaint_params_path and os.path.exists(config.inpaint_params_path):
        import orbax.checkpoint as ocp

        from elvis_tpu.models import InpaintNet

        net = InpaintNet()
        template = jax.jit(lambda r, x, m: net.init(r, x, m, b))(
            jax.random.PRNGKey(0), seeded[:1], removal_mask[:1]
        )
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(config.inpaint_params_path), template
        )
        decoded[APPROACHES.ELVIS_E2FGVI] = np.asarray(
            net.apply(params, seeded, removal_mask, b)
        )
    else:
        # hermetic default: temporal propagation + PDE polish of residue
        decoded[APPROACHES.ELVIS_E2FGVI] = np.asarray(
            restore_removal_diffusion(
                jnp.asarray(decoded[APPROACHES.ELVIS_PROP]), removal_mask, b, iters=40
            )
        )
    dt = time.time() - t0
    execution_times["E2FGVI Inpainting"] = dt
    approach_times[APPROACHES.ELVIS_E2FGVI] += dt

    # --- stage 9: progressive SR restore (elvis.py:4695-4722) ----------------
    t0 = time.time()
    levels_dec = jnp.asarray(np.load(down_maps_path)["strength_maps"].astype(np.int32))
    neural_up = _load_srnet_upsampler(config)
    sr_out = progressive_restore(
        shard(jnp.asarray(down_decoded)), shard(levels_dec), b,
        **({"upsample_fn": neural_up} if neural_up else {}),
    )
    if config.temporal_blend > 0:
        sr_out = temporal_blend(sr_out, config.temporal_blend)
    decoded[APPROACHES.PRESLEY_REALESRGAN] = np.asarray(sr_out)
    dt = time.time() - t0
    execution_times["RealESRGAN Restoration"] = dt
    approach_times[APPROACHES.PRESLEY_REALESRGAN] += dt

    # --- stage 10: deblur restore (elvis.py:4755-4794) ------------------------
    t0 = time.time()
    blur_levels_dec = jnp.asarray(
        np.load(blur_maps_path)["strength_maps"].astype(np.int32)
    )
    if config.deblur_params_path and os.path.exists(config.deblur_params_path):
        import orbax.checkpoint as ocp

        from elvis_tpu.models import DeblurUNet

        net = DeblurUNet()
        template = jax.jit(lambda r, x, m: net.init(r, x, m, b))(
            jax.random.PRNGKey(0), jnp.zeros((1, height, width, 3)), blur_levels_dec[:1]
        )
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(config.deblur_params_path), template
        )
        deblurred = net.apply(
            params, jnp.asarray(blur_decoded).astype(jnp.float32), blur_levels_dec, b
        )
    else:
        deblurred = restore_blur_unsharp(
            shard(jnp.asarray(blur_decoded)), shard(blur_levels_dec), b,
            config.gaussian_max_rounds,
        )
    if config.temporal_blend > 0:
        deblurred = temporal_blend(deblurred, config.temporal_blend)
    decoded[APPROACHES.PRESLEY_INSTANTIR] = np.asarray(deblurred)
    dt = time.time() - t0
    execution_times["InstantIR Restoration"] = dt
    approach_times[APPROACHES.PRESLEY_INSTANTIR] += dt

    # --- stage 11: bitrate accounting (elvis.py:4844-4854) --------------------
    video_sizes = {
        APPROACHES.BASELINE: len(streams["baseline"]),
        APPROACHES.ELVIS: len(streams["shrunk"]) + os.path.getsize(masks_npz),
        APPROACHES.PRESLEY_QP: len(streams["roi"]),
        APPROACHES.PRESLEY_REALESRGAN: len(streams["downsampled"]) + sidecar_sizes["downsample"],
        APPROACHES.PRESLEY_INSTANTIR: len(streams["gaussian"]) + sidecar_sizes["gaussian"],
    }
    if config.enable_dct_dampen:
        video_sizes[APPROACHES.ELVIS_V2_DAMPEN] = (
            len(streams["dampened"]) + sidecar_sizes["dampen"]
        )
    bitrates = {k: size * 8 / duration for k, size in video_sizes.items()}
    for label in (APPROACHES.ELVIS_CV2, APPROACHES.ELVIS_PROP, APPROACHES.ELVIS_E2FGVI):
        bitrates[label] = bitrates[APPROACHES.ELVIS]

    # --- stage 12: classical benchmarks (elvis.py:4880 -> 870-965) ------------
    if config.generate_opencv_benchmarks:
        t0 = time.time()
        decoded[APPROACHES.PRESLEY_LANCZOS] = np.asarray(
            restore_downsample_lanczos(jnp.asarray(down_decoded), levels_dec, b)
        )
        bitrates[APPROACHES.PRESLEY_LANCZOS] = bitrates[APPROACHES.PRESLEY_REALESRGAN]
        decoded[APPROACHES.PRESLEY_UNSHARP] = np.asarray(
            restore_blur_unsharp(
                jnp.asarray(blur_decoded), blur_levels_dec, b, config.gaussian_max_rounds
            )
        )
        bitrates[APPROACHES.PRESLEY_UNSHARP] = bitrates[APPROACHES.PRESLEY_INSTANTIR]
        execution_times["OpenCV Benchmarks"] = time.time() - t0

    # --- stage 13: evaluation (elvis.py:4893 -> 3599) --------------------------
    t0 = time.time()
    analysis_results = analyze_encoding_performance(
        frames_np,
        decoded,
        fg_masks_pixel,
        bitrates,
        framerate=framerate,
        metric_stride=config.metric_stride,
        enable_fvmd=config.enable_fvmd,
        fvmd_stride=config.fvmd_stride,
        enable_vmaf=config.enable_vmaf,
    )
    execution_times["Performance Evaluation"] = time.time() - t0
    for approach, total in approach_times.items():
        execution_times[approach] = total

    # --- result assembly (elvis.py:4918-4933 schema) ---------------------------
    analysis_results["execution_times_seconds"] = execution_times
    analysis_results["video_name"] = config.reference_video
    analysis_results["video_length_seconds"] = duration
    analysis_results["video_framerate"] = framerate
    analysis_results["video_resolution"] = f"{width}x{height}"
    analysis_results["block_size"] = b
    analysis_results["target_bitrate_bps"] = target_bitrate
    analysis_results["parameters"] = {
        "config": asdict(config),
        "derived": {
            "framerate": framerate,
            "target_bitrate": target_bitrate,
            "experiment_dir": experiment_dir,
            "quality_factor": config.quality_factor,
        },
    }
    results_json_path = os.path.join(experiment_dir, "analysis_results.json")
    analysis_results["experiment_dir"] = experiment_dir
    analysis_results["analysis_results_path"] = results_json_path
    analysis_results["total_pipeline_seconds"] = time.time() - t_pipeline

    with open(results_json_path, "w") as f:
        json.dump(analysis_results, f, indent=4, default=float)

    print(format_summary_report(analysis_results))
    print(f"Analysis results saved to: {results_json_path}")
    return analysis_results
