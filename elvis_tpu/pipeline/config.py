"""ElvisConfig: the pipeline's single config dataclass.

Field-name parity with the reference's ``ElvisConfig`` (elvis.py:48-101)
so the grid/random search drivers and ``analysis_results.json`` consumers
work unchanged (BASELINE.json north star; §5.6). Every declared field is
either LIVE — it parameterizes this framework's equivalent mechanism —
or listed in ``ABSORBED_FIELDS`` with the reason it has no counterpart
(never silently inert; tests/test_config_audit.py enforces the split).
Live examples: ``*_devices`` select the mesh devices a stage shards
over; neighbor/window lengths feed the temporal halo;
``*_parallel_chunk_length`` bound the single-chip frame chunks;
``realesrgan_tile``/``tile_pad`` drive single-chip height tiling;
``propainter_mask_dilation`` dilates the hole mask in block units.

It also declares the fields the reference *reads but never declared* —
``strength_maps_use_npz`` (elvis.py:4837 reads it; bug #2 in SURVEY.md
§2.9) and the keys the search drivers inject (``experiment_dir``,
``strength_maps_target_bitrate``, ``analysis_sample_frames``,
``minimal_figures``; bug #4) — so the documented behaviour actually runs.

Merge order (elvis.py:4967-5002): dataclass defaults -> --config JSON ->
individual CLI flags.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

__all__ = [
    "ElvisConfig",
    "load_config_from_cli",
    "config_from_dict",
    "ABSORBED_FIELDS",
]

# Reference fields with NO mechanism to drive in this framework — each
# accepted for config/search parity, recorded in results, and documented
# here (the explicitly-absorbed pattern; tests/test_config_audit.py
# asserts every other field has a live call site, and that these don't).
ABSORBED_FIELDS = {
    # Sized the reference's per-GPU FVMD process pool (elvis.py:3999-4033);
    # FVMD here is batched jitted reductions with no process pool.
    "fvmd_processes",
    # RAFT's iterative flow refinement count (elvis.py:1458 plumbing).
    # Motion guidance here is single-shot block matching (ops.motion);
    # there is no inner refinement loop to iterate.
    "propainter_raft_iter",
    # Selected fp16 CUDA inference for ProPainter. The counterpart slot
    # (motion-compensated propagation, restore.inpaint) is gathers and
    # integer compares — there is no matmul precision to select. (Its SR
    # sibling realesrgan_fp32 IS live: it forces full-precision matmuls.)
    "propainter_fp16",
    # DNI denoise-strength interpolated between the paired
    # realesr-general-x4v3 / -wdn model WEIGHT SETS (elvis.py:2384-2493);
    # no such paired checkpoint exists to interpolate.
    "realesrgan_denoise_strength",
    # Border pre-pad cropped back after CUDA tiling; the height-tile
    # drivers use clamped (slid) windows, so borders keep their true
    # SAME-padding and there is nothing to pre-pad.
    "realesrgan_pre_pad",
    # Host worker threads per GPU (elvis.py:2496-2504); there are no host
    # worker threads — stages are single jitted graphs over shards.
    "realesrgan_per_device_workers",
    # SDXL classifier-free-guidance scale and the InstantIR
    # preview/creative stage boundaries (elvis.py:3000). The shipped
    # DiffusionRestorer is a conditioned x0-trajectory sampler with no
    # text guidance and no preview/creative phases; its knobs are
    # steps/t_start (instantir_seed IS live as the sampler's PRNG seed).
    "instantir_cfg",
    "instantir_creative_start",
    "instantir_preview_start",
}


@dataclass
class ElvisConfig:
    # --- reference fields (elvis.py:48-101), names preserved -------------
    reference_video: str = "davis_test/bear.mp4"
    width: int = 640
    height: int = 360
    block_size: int = 8
    shrink_amount: float = 0.25
    quality_factor: float = 1.2
    target_bitrate_override: Optional[int] = None
    removability_alpha: float = 0.5
    removability_smoothing_beta: float = 0.5
    encode_preset: str = "medium"
    encode_pix_fmt: str = "yuv420p"
    propainter_resize_ratio: float = 1.0
    propainter_ref_stride: int = 20
    propainter_neighbor_length: int = 4
    propainter_subvideo_length: int = 40
    propainter_mask_dilation: int = 4
    propainter_raft_iter: int = 20
    propainter_fp16: bool = True
    propainter_devices: Optional[List[Union[int, str]]] = None
    propainter_parallel_chunk_length: Optional[int] = None
    propainter_chunk_overlap: Optional[int] = None
    e2fgvi_ref_stride: int = 10
    e2fgvi_neighbor_stride: int = 5
    e2fgvi_num_ref: int = -1
    e2fgvi_mask_dilation: int = 4
    e2fgvi_devices: Optional[List[Union[int, str]]] = None
    e2fgvi_parallel_chunk_length: Optional[int] = None
    e2fgvi_chunk_overlap: Optional[int] = None
    realesrgan_denoise_strength: float = 1.0
    realesrgan_tile: int = 0
    realesrgan_tile_pad: int = 10
    realesrgan_pre_pad: int = 0
    realesrgan_fp32: bool = False
    realesrgan_devices: Optional[List[Union[int, str]]] = None
    realesrgan_parallel_chunk_length: Optional[int] = None
    realesrgan_per_device_workers: int = 1
    instantir_cfg: float = 7.0
    instantir_creative_start: float = 1.0
    instantir_preview_start: float = 0.0
    instantir_seed: Optional[int] = 42
    instantir_devices: Optional[List[Union[int, str]]] = None
    instantir_batch_size: int = 4
    instantir_parallel_chunk_length: Optional[int] = None
    generate_opencv_benchmarks: bool = True
    metric_stride: int = 1
    fvmd_stride: int = 1
    fvmd_max_frames: Optional[int] = None
    # fvmd_processes sized the reference's per-GPU FVMD process pool
    # (elvis.py:3999-4033); here FVMD is batched jitted reductions with no
    # process pool, so the field is accepted for config parity and has no
    # mechanism to drive (documented-absorbed, not silently ignored).
    fvmd_processes: Optional[int] = None
    fvmd_early_stop_delta: float = 0.002
    fvmd_early_stop_window: int = 50
    vmaf_stride: int = 1
    enable_fvmd: bool = True

    # --- fields the reference read/injected but never declared -----------
    strength_maps_use_npz: bool = True
    experiment_dir: Optional[str] = None
    strength_maps_target_bitrate: int = 50000
    analysis_sample_frames: Optional[int] = None
    minimal_figures: bool = False

    # --- framework extensions (TPU-native knobs) -------------------------
    codec: str = "nvc"                 # 'nvc' | 'x265' | 'kvazaar' | 'svtav1'
    quality_preset: str = "medium"     # QUALITY_PRESETS tier for kvazaar/svtav1
    compilation_cache: bool = True     # persistent XLA executable cache
    nvc_b_frames: bool = False         # NVC: bi-predicted odd frames (vmapped)
    nvc_me_radius: int = 4             # NVC: per-frame motion budget in pels
                                       # (>7 engages the hierarchical search)
    nvc_multi_ref: bool = False        # NVC: two-reference P prediction
    nvc_deblock: bool = True           # NVC: in-loop deblocking filter
                                       # (default ON since r4 — measured Pareto)
    nvc_intra_pred: bool = True        # NVC: spatial intra prediction on
                                       # keyframes (DC/vert/gradient, r4)
    saliency_backend: str = "motion_contrast"
    # Temporal dithering of the shrink selection: a removed block is
    # protected from removal for this many following frames, so every
    # hole's content is transmitted at most `cooldown` frames away and
    # the ProPainter-style temporal propagation has a real source to
    # warp (pure top-k removal tracks content: measured 79%/frame
    # persistence, only 24% of holes recoverable — VERDICT r4 #1).
    # 0 restores the reference's pure top-k (elvis.py:1387-1455).
    shrink_removal_cooldown: int = 1
    # Encoder-side motion hint for the client inpaint fill (r5): per-pair
    # global vectors + coarse deviations from the PRISTINE frames, shipped
    # in the removal-mask sidecar (~4 B/frame + zlib-killed zero field,
    # charged to the ELVIS rows' bitrate). Decoder-side estimation cannot
    # recover true motion at low bitrate — decoded content carries the
    # CODEC's reduced apparent motion (measured 1.6-1.9 px/pair bias,
    # scripts/probe_pair_motion*.py) — which is why every real codec
    # transmits its motion. False = the reference's pure client-side
    # path (ProPainter RAFT-on-decoded, elvis.py:1458), kept as ablation.
    inpaint_motion_hint: bool = True
    # Backend lists drive the restoration approach rows (restore.backends):
    # the first entry fills the reference's label for that slot, extra
    # entries add extra comparison rows. Neural names auto-load shipped
    # checkpoints and fall back to the slot's classical restorer.
    inpaint_backends: List[str] = field(
        default_factory=lambda: ["diffusion", "temporal", "neural"]
    )
    # 'realesrgan' = the generic slot: resolves to the MEASURED-BEST tier
    # (currently 'srnet_ensemble') like the reference's default quality
    # model; pin 'srnet_compact' for the real-time serving tier.
    sr_backends: List[str] = field(default_factory=lambda: ["realesrgan"])
    deblur_backends: List[str] = field(default_factory=lambda: ["deblur_net"])
    auto_load_checkpoints: bool = True
    max_frames: Optional[int] = None
    framerate_override: Optional[float] = None
    roi_qp_range: int = 15
    temporal_blend: float = 0.0
    gaussian_max_rounds: int = 10
    srnet_params_path: Optional[str] = None
    deblur_params_path: Optional[str] = None
    inpaint_params_path: Optional[str] = None
    enable_dct_dampen: bool = False
    # Stage-level resume (reference reuses existing artifacts by default,
    # elvis.py:3895-3906): scoring + every encode branch content-addressed
    # under <experiment_dir>/stage_cache.
    stage_cache: bool = True
    enable_vmaf: bool = True
    masks_dir: Optional[str] = None  # external FG masks (DAVIS-style PNG dir)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    data_parallel: bool = True  # shard frame axis across devices when possible
    # Stage-banner narration (the reference's _safe_print logging,
    # elvis.py:885-887, 397-411): each stage prints its wall-clock as it
    # completes — the long-run progress surface.
    verbose: bool = True
    # 2D data x spatial sharding (the reference's feathered spatial tiling,
    # utils.py:176-326, as a mesh axis): frames taller than the threshold
    # route full-frame restorers through height tiles with halo exchange.
    spatial_devices: int = 0      # spatial mesh axis size (0 = frame DP only)
    spatial_tile_threshold: int = 1440  # min height (px) to engage tiling
    spatial_halo: int = 64        # tile halo rows (multiple of block_size)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def config_from_dict(data: Dict[str, Any], strict: bool = False) -> ElvisConfig:
    """Build a config, tolerating unknown keys (the reference's search
    drivers inject keys its dataclass lacked — bug #4; here unknown keys
    warn instead of crashing unless strict)."""
    known = {f.name for f in dataclasses.fields(ElvisConfig)}
    unknown = {k: v for k, v in data.items() if k not in known}
    if unknown and strict:
        raise TypeError(f"unknown config keys: {sorted(unknown)}")
    if unknown:
        print(f"Warning: ignoring unknown config keys: {sorted(unknown)}")
    return ElvisConfig(**{k: v for k, v in data.items() if k in known})


def load_config_from_cli(argv: Optional[List[str]] = None) -> ElvisConfig:
    """defaults -> --config JSON -> individual flags (elvis.py:4940-5002);
    flags auto-generated from the dataclass like presley.py:106-126."""
    parser = argparse.ArgumentParser(description="elvis-tpu pipeline")
    parser.add_argument("--config", type=str, default=None, help="JSON config file")
    for f in dataclasses.fields(ElvisConfig):
        name = f"--{f.name}"
        ann = str(f.type)
        if isinstance(f.default, bool) or ann in ("bool", "Optional[bool]"):
            parser.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=None, metavar="BOOL")
        elif isinstance(f.default, bool) is False and (
            isinstance(f.default, int) or ann in ("int", "Optional[int]")
        ):
            parser.add_argument(name, type=int, default=None)
        elif isinstance(f.default, float) or ann in ("float", "Optional[float]"):
            parser.add_argument(name, type=float, default=None)
        else:
            parser.add_argument(name, type=str, default=None)
    args = parser.parse_args(argv)

    data: Dict[str, Any] = {}
    if args.config:
        with open(args.config) as fh:
            data.update(json.load(fh))
    for f in dataclasses.fields(ElvisConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            # parse JSON-ish strings for list/optional fields
            if isinstance(v, str) and (v.startswith("[") or v.startswith("{")):
                v = json.loads(v)
            data[f.name] = v
    return config_from_dict(data)
