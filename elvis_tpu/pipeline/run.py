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

  label (reference)      slot                       backend here (config-driven)
  --------------------------------------------------------------------------
  Baseline               plain encode               codec.dispatch (nvc/x265/...)
  PRESLEY QP             per-block delta-QP ROI     native QP map / qpfile / ROI file
  ELVIS CV2              classical inpaint          PDE diffusion fill
  ELVIS ProPainter       video inpaint (flow)       MOTION-COMPENSATED propagation
  ELVIS E2FGVI           video inpaint (neural)     trained InpaintNet over MC seed
  PRESLEY RealESRGAN     neural progressive SR      trained SRNetCompact (auto-load)
  PRESLEY InstantIR      neural deblur              trained DeblurUNet (auto-load)
  PRESLEY Lanczos        classical SR benchmark     per-block lanczos
  PRESLEY Unsharp        classical deblur benchmark unsharp mask
  (+ extra rows per sr_backends/deblur_backends/inpaint_backends entries)
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
    calculate_target_bitrate,
    save_removal_masks_npz,
    save_strength_maps_npz,
)
from elvis_tpu.codec.dispatch import make_pipeline_codec
from elvis_tpu.codec.sidecar import load_strength_maps_video, save_strength_maps_video
from elvis_tpu.degrade import (
    adaptive_blur,
    adaptive_downsample,
    stretch_frames,
)
from elvis_tpu.metrics.evaluate import analyze_encoding_performance
from elvis_tpu.metrics.report import format_summary_report
from elvis_tpu.pipeline.cache import StageCache
from elvis_tpu.pipeline.config import ElvisConfig
from elvis_tpu.pipeline.io import load_clip, save_frames_png
from elvis_tpu.utils.transfer import as_pixels_u8, pull
from elvis_tpu.restore import (
    restore_blur_unsharp,
    restore_downsample_lanczos,
    temporal_blend,
)
from elvis_tpu.restore.backends import (
    resolve_deblur_backend,
    resolve_inpaint_backend,
    resolve_sr_backend,
)
from elvis_tpu.scoring import get_saliency_fn, removability_scores

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


_FRAME_CHUNK_PIXEL_BUDGET = 1 << 24  # ~16M px/chunk: 8 frames @1080p
# Max frames*rows*cols per full-res NET invocation before height tiling
# kicks in. Sized from the measured InpaintNet HBM footprint at 1080p
# (~1.14 KB/px padded: 10f x 1080p = 23.7 GB > the 15.75 GB chip): 6M px
# keeps the padded working set near 7 GB. Backends override it via a
# `spatial_pixel_budget` attribute when their per-pixel cost differs.
_NET_PIXEL_BUDGET = 6 << 20


def _height_tile_plan(fn, shape, n_frames: int):
    """Return (halo_rows, window_rows) when `fn` asks for height tiling
    and the per-invocation pixel count would bust its budget, else None.

    A backend opts in by setting `spatial_halo_rows` — a bound on its
    spatial receptive-field radius in pixels — on the callable (the
    single-chip analog of the reference's feathered spatial tiles,
    utils.py:176-326)."""
    halo = int(getattr(fn, "spatial_halo_rows", 0) or 0)
    if not halo:
        return None
    budget = int(getattr(fn, "spatial_pixel_budget", _NET_PIXEL_BUDGET))
    h, w = int(shape[1]), int(shape[2])
    win_rows = budget // max(n_frames * w, 1)
    if h <= win_rows:
        return None
    return halo, win_rows


def _apply_height_tiled(fn, arrays, halo: int, win_rows: int) -> np.ndarray:
    """Run a same-resolution per-frame/windowed net over height tiles.

    Host loop OUTSIDE jit (each uniform window shape compiles once):
    windows of `tile + 2*halo` rows are clamped inward at the frame
    borders, so the true image edge keeps its real SAME-padding
    behaviour, and every kept interior row sits further than `halo`
    (the declared receptive-field bound) from any artificial tile
    boundary — tiled output equals the untiled net up to float
    reassociation. Per-array row granularity is inferred from the
    height ratio (frames tile by pixel rows, block maps by block rows)."""
    f = arrays[0]
    n, h = int(f.shape[0]), int(f.shape[1])
    ratios = []
    for a in arrays:
        r = h // int(a.shape[1])
        if r * int(a.shape[1]) != h:
            raise ValueError("height-tiled arrays must divide the frame height")
        ratios.append(r)
    align = max(ratios)  # the coarsest map's block size, in rows
    halo = -(-halo // align) * align
    tile = max(((win_rows - 2 * halo) // align) * align, align)
    win = tile + 2 * halo
    if win >= h:
        return pull(jax.jit(fn)(*[jnp.asarray(a) for a in arrays]))
    jfn = jax.jit(fn)
    out = None
    for r0 in range(0, h, tile):
        r1 = min(r0 + tile, h)
        start = min(max(r0 - halo, 0), h - win)
        parts = [
            jnp.asarray(a[:, start // r : (start + win) // r])
            for a, r in zip(arrays, ratios)
        ]
        o = pull(jfn(*parts))
        if o.shape[1] != win:
            raise ValueError("height-tiled ops must preserve frame height")
        if out is None:
            out = np.empty((n, h) + o.shape[2:], o.dtype)
        out[:, r0:r1] = o[:, r0 - start : r0 - start + (r1 - r0)]
    return out


def _scoring_features_chunked(frames_np, block_size, sal_fn, chunk):
    """Per-frame scoring features, jitted over 1-frame-haloed chunks.

    Scoring previously ran EAGERLY over the whole device-resident f32
    clip and pulled a float32 saliency plane per pixel — at 128 frames
    @1080p that is hundreds of per-op dispatches over a high-latency
    link plus a ~1 GB device->host pull (measured 669 s for the stage
    on this image). Here each chunk runs as ONE jitted graph and the
    pixel foreground mask crosses the link bit-packed 32-per-f32 word
    (~33 MB for the same clip); nothing clip-sized touches the device.

    The halo keeps chunking EXACT: every registered saliency backend is
    computable from a +-1-frame temporal window (neural/center are
    per-frame; motion_contrast uses forward/backward luma diffs with
    per-frame normalization), and the backends' clip-edge motion rules
    apply only where the window really is the clip edge (the left/right
    halo flags are static). TC matches the unchunked rule the same way:
    an interior chunk's first kept frame differences against its true
    predecessor (the halo frame), and the clip's first frame gets TC=0
    (the reference's empty first TC column, elvis.py:1180).

    Returns host arrays: SC, TC, saliency block-mean pool, foreground
    block fraction — each (N,By,Bx) f32 — and the (N,H,W) bool pixel
    foreground mask.
    """
    import functools

    from elvis_tpu.core.blocks import blockwise_reduce
    from elvis_tpu.ops.color import rgb_to_gray
    from elvis_tpu.scoring.complexity import texture_energy

    n, h, w = (int(s) for s in frames_np.shape[:3])
    wpad = (-w) % 32
    b = block_size

    # Resolve any lazy state BEFORE tracing: the neural backend's
    # checkpoint restore does a device_put, which must not get staged
    # into the jitted chunk graph below (backends advertise this via a
    # `prepare` attribute; a warmup *call* would either run the heuristic
    # backends eagerly op-by-op over the high-latency link or, jitted,
    # stage the load's device_put all the same).
    prepare = getattr(sal_fn, "prepare", None)
    if prepare is not None:
        prepare()

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def _features(win_u8, left, right):
        f32 = win_u8.astype(jnp.float32)
        gray = rgb_to_gray(f32)
        sc = texture_energy(gray, b)
        diff = jnp.concatenate(
            [jnp.zeros_like(gray[:1]), gray[1:] - gray[:-1]], axis=0
        )
        tc = texture_energy(diff, b)
        sal = sal_fn(f32)
        lo, hi = (1 if left else 0), sal.shape[0] - (1 if right else 0)
        sal, sc, tc = sal[lo:hi], sc[lo:hi], tc[lo:hi]
        fg_pool = blockwise_reduce(sal.astype(jnp.float32), b, jnp.mean)
        fg_bits = sal >= 0.5
        fg_frac = blockwise_reduce(fg_bits.astype(jnp.float32), b, jnp.mean)
        bits = jnp.pad(fg_bits, ((0, 0), (0, 0), (0, wpad)))
        words = (
            bits.reshape(bits.shape[0], h, -1, 32).astype(jnp.uint32)
            << jnp.arange(32, dtype=jnp.uint32)
        ).sum(axis=-1, dtype=jnp.uint32)
        return sc, tc, fg_pool, fg_frac, jax.lax.bitcast_convert_type(
            words, jnp.float32
        )

    outs = [[] for _ in range(5)]
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        w0, w1 = max(s - 1, 0), min(e + 1, n)
        res = _features(jnp.asarray(frames_np[w0:w1]), w0 < s, w1 > e)
        for acc, r in zip(outs, res):
            acc.append(np.asarray(r))
    sc, tc, fg_pool, fg_frac, packed = (np.concatenate(o) for o in outs)
    bits = np.unpackbits(
        np.ascontiguousarray(packed).view(np.uint32).view(np.uint8),
        bitorder="little",
    )
    fg_pixel = bits.reshape(n, h, w + wpad)[:, :, :w].astype(bool)
    return sc, tc, fg_pool, fg_frac, fg_pixel


class _DataParallel:
    """Frame-axis data parallelism (SURVEY.md §2.7 P1-P3, P6).

    ``apply`` pads N up to a device multiple (edge-frame repeats), shards
    the leading axis, runs a per-frame op, and trims — no silent no-op
    when N doesn't divide the device count. ``apply_temporal``
    additionally exchanges a temporal halo (parallel.halo, collective
    permute over ICI) so windowed ops see neighbour context, the mesh
    version of the reference's chunk-overlap staging (elvis.py:1506-1566);
    it falls back to unsharded only when a local chunk would be smaller
    than the window itself.

    SINGLE-CHIP long clips (no mesh): both entry points process the frame
    axis in bounded-memory host chunks instead — a clip-sized graph at
    128 frames @1080p exceeds HBM/compiler limits (measured). ``apply``
    chunks are exact (per-frame ops); ``apply_temporal`` chunks use the
    reference's own overlap-and-trim recipe (elvis.py:1506-1566), seeing
    ``overlap`` context frames past each boundary.
    """

    def __init__(self, enabled: bool, spatial: int = 0):
        self.mesh = None
        self.spatial_mesh = None
        self._submeshes = {}
        n_dev = len(jax.devices())
        if enabled and n_dev > 1:
            from elvis_tpu.parallel import make_mesh

            self.mesh = make_mesh()
            if spatial > 1 and n_dev % spatial == 0:
                # data x spatial mesh for height-tiled full-frame restores
                self.spatial_mesh = make_mesh(
                    (("data", n_dev // spatial), ("spatial", spatial))
                )

    def _mesh_for(self, devices):
        """Stage-specific device subsets — the reference's per-stage GPU
        lists (``propainter_devices``/``realesrgan_devices``/…,
        elvis.py:451-530): a stage shards over only the configured
        devices. None (the default) = the full mesh; ignored when data
        parallelism is off (single-device runs have nothing to subset)."""
        if devices is None or self.mesh is None:
            return self.mesh
        key = tuple(str(d) for d in devices)
        if key not in self._submeshes:
            from elvis_tpu.parallel import make_mesh
            from elvis_tpu.parallel.mesh import resolve_devices

            devs = resolve_devices(devices)
            self._submeshes[key] = (
                make_mesh(devices=devs) if len(devs) > 1 else None
            )
        return self._submeshes[key]

    @staticmethod
    def _chunk_frames(shape, fn=None) -> int:
        n, h, w = int(shape[0]), int(shape[1]), int(shape[2])
        chunk = max(2, _FRAME_CHUNK_PIXEL_BUDGET // (h * w))
        # The reference's *_parallel_chunk_length / instantir_batch_size
        # knobs bound a stage's chunk explicitly (elvis.py:2743-2764,
        # 3124-3158); backends carry them as a `frame_chunk` attribute.
        configured = int(getattr(fn, "frame_chunk", 0) or 0) if fn is not None else 0
        if configured > 0:
            chunk = min(chunk, configured)
        return chunk

    def apply(self, fn, *arrays, devices=None):
        mesh = self._mesh_for(devices)
        if mesh is None:
            n = int(arrays[0].shape[0])
            chunk = self._chunk_frames(arrays[0].shape, fn)
            if getattr(fn, "spatial_halo_rows", 0):
                # Per-frame nets: shrinking the frame chunk has no halo
                # redundancy, so spend the pixel budget there first and
                # only row-tile when even a single frame busts it (4K).
                budget = int(getattr(fn, "spatial_pixel_budget", _NET_PIXEL_BUDGET))
                hw = int(arrays[0].shape[1]) * int(arrays[0].shape[2])
                chunk = min(chunk, max(1, budget // hw))
            tiled = _height_tile_plan(fn, arrays[0].shape, min(n, chunk))
            if n <= chunk:
                if tiled:
                    return _apply_height_tiled(fn, list(arrays), *tiled)
                return fn(*[jnp.asarray(a) for a in arrays])
            # Chunked long-clip path: inputs may stay HOST arrays (only
            # one chunk is resident on device at a time) and each chunk
            # runs under jit — XLA buffer reuse bounds peak memory where
            # the same op run eagerly keeps every clip-sized temporary
            # live (measured OOM at 128 frames @1080p).
            jfn = None if tiled else jax.jit(fn)
            outs = []
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                part = [np.asarray(a[s:e]) for a in arrays]
                if e - s < chunk:
                    # pad the tail to the steady chunk shape: one compile
                    pad = chunk - (e - s)
                    part = [
                        np.concatenate([p, np.repeat(p[-1:], pad, axis=0)])
                        for p in part
                    ]
                if tiled:
                    out = _apply_height_tiled(fn, part, *tiled)[: e - s]
                else:
                    out = pull(jfn(*[jnp.asarray(p) for p in part])[: e - s])
                outs.append(out)
            return np.concatenate(outs, axis=0)
        arrays = [jnp.asarray(a) for a in arrays]
        from elvis_tpu.parallel.mesh import shard_frames

        n = arrays[0].shape[0]
        padded = [shard_frames(a, mesh)[0] for a in arrays]
        return fn(*padded)[:n]

    def apply_temporal(self, fn, arrays, overlap: int, devices=None):
        mesh = self._mesh_for(devices)
        if mesh is None:
            n = int(arrays[0].shape[0])
            chunk = self._chunk_frames(arrays[0].shape, fn)
            win_frames = min(n, chunk + 2 * overlap)
            tiled = _height_tile_plan(fn, arrays[0].shape, win_frames)
            if n <= chunk:
                if tiled:
                    return _apply_height_tiled(fn, list(arrays), *tiled)
                return fn(*[jnp.asarray(a) for a in arrays])
            jfn = None if tiled else jax.jit(fn)  # <=3 window shapes (first/steady/last)
            outs = []
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                lo, hi = max(0, s - overlap), min(n, e + overlap)
                if tiled:
                    out = _apply_height_tiled(fn, [a[lo:hi] for a in arrays], *tiled)
                else:
                    out = jfn(*[jnp.asarray(a[lo:hi]) for a in arrays])
                outs.append(pull(out[s - lo : s - lo + (e - s)]))
            return np.concatenate(outs, axis=0)
        arrays = [jnp.asarray(a) for a in arrays]
        n = arrays[0].shape[0]
        size = mesh.shape["data"]
        if (n + ((-n) % size)) // size < overlap:
            return fn(*arrays)  # chunk smaller than the temporal window
        from elvis_tpu.parallel.halo import temporal_map_overlap
        from elvis_tpu.parallel.mesh import shard_frames

        padded = tuple(shard_frames(a, mesh)[0] for a in arrays)
        out = temporal_map_overlap(fn, padded, mesh, overlap)
        return out[:n]

    def spatial_ok(self, height: int, block_size: int) -> bool:
        return (
            self.spatial_mesh is not None
            and height % (self.spatial_mesh.shape["spatial"] * block_size) == 0
        )

    def apply_spatial(self, fn, frames, levels, halo: int, block_size: int):
        """Frame DP x height tiling: per-frame restore on 2D shards with
        pixel+block halo exchange (parallel.halo.spatial_tile_map_blocks)."""
        from elvis_tpu.parallel.halo import spatial_tile_map_blocks
        from elvis_tpu.parallel.mesh import shard_frames

        frames = jnp.asarray(frames)
        levels = jnp.asarray(levels)
        n = frames.shape[0]
        mesh = self.spatial_mesh
        f_pad, _ = shard_frames(frames, mesh)
        l_pad, _ = shard_frames(levels, mesh)
        halo = max(block_size, halo - halo % block_size)
        out = spatial_tile_map_blocks(
            fn, f_pad, l_pad, mesh, halo, block_size, data_axis="data"
        )
        return out[:n]


def _rss_gb() -> float:
    """Current process RSS in GB (0.0 where /proc is unavailable)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
    except (OSError, ValueError, IndexError):
        return 0.0


class _StageTimes(dict):
    """execution_times dict that narrates each stage as it lands — the
    reference's banner logging (elvis.py:885-887) surfaced through the
    one place every stage already reports to. Prints survive closed
    stdout (elvis.py:397-411 `_safe_print` semantics).

    Also samples host RSS per stage into ``.rss_gb`` (VERDICT r4 #7: the
    128f long run peaked at 78 GB with no way to tell WHICH stage held
    the clip-sized copies — the axon plugin leaks ~25% of every
    host->device push, so per-stage RSS localizes the big pushers too)."""

    def __init__(self, verbose: bool):
        super().__init__()
        self._verbose = verbose
        self.rss_gb: Dict[str, float] = {}

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        rss = _rss_gb()
        self.rss_gb[key] = round(rss, 2)
        if self._verbose:
            try:
                print(f"[elvis_tpu] {key}: {value:.1f}s (rss {rss:.1f} GB)",
                      flush=True)
            except (ValueError, OSError):
                pass


def _carry_tiling(dst, src):
    """Copy height-tiling/chunking declarations from a backend onto its
    arg-binding wrapper so _height_tile_plan and the chunk drivers still
    see them."""
    for k in ("spatial_halo_rows", "spatial_pixel_budget", "frame_chunk"):
        v = getattr(src, k, None)
        if v:
            setattr(dst, k, v)
    return dst


def _apply_inpaint_backend(dp, name, fn, stretched, removal_mask, b,
                           devices=None, motion_field=None):
    """Stage-8 driver for one inpaint backend (elvis.py:4601-4661).

    'diffusion' is per-frame: plain frame sharding. Windowed temporal
    backends shard with halo context — the backend declares its own
    overlap (2x the propagation window, so sharded == unsharded exactly;
    the reference's *_chunk_overlap knobs override it). A backend with a
    ``split`` attribute runs two-phase: the propagation SEED and the
    polish net each go through the temporal machinery at their OWN
    declared overlap (e.g. 20 vs 2) — keeping the net's full-res feature
    maps off chunk+2*seed_overlap frames at once (measured over-HBM at
    1080p x 128 frames). seed+post is exactly equal to the fused backend.
    """
    if name == "diffusion":
        return dp.apply(lambda f, m: fn(f, m, b), stretched, removal_mask,
                        devices=devices)
    # The server-side motion hint rides as one more frame-axis array so
    # the temporal halo/chunk machinery slices it consistently with the
    # frames (a chunk's first per-pair entry is never consumed: the fill
    # only ever differences cumulative sums at in-chunk indices).
    if hasattr(fn, "split"):
        seed_fn = fn.split
        if motion_field is not None:
            seeded = dp.apply_temporal(
                _carry_tiling(lambda f, m, mv: seed_fn(f, m, b, mv=mv), seed_fn),
                (stretched, removal_mask, motion_field),
                overlap=getattr(seed_fn, "temporal_overlap", 16),
                devices=devices,
            )
        else:
            seeded = dp.apply_temporal(
                _carry_tiling(lambda f, m: seed_fn(f, m, b), seed_fn),
                (stretched, removal_mask),
                overlap=getattr(seed_fn, "temporal_overlap", 16),
                devices=devices,
            )
        return dp.apply_temporal(
            _carry_tiling(lambda f, m: seed_fn.post(f, m, b), seed_fn.post),
            (seeded, removal_mask),
            overlap=getattr(seed_fn.post, "temporal_overlap", 2),
            devices=devices,
        )
    if motion_field is not None:
        return dp.apply_temporal(
            _carry_tiling(lambda f, m, mv: fn(f, m, b, mv=mv), fn),
            (stretched, removal_mask, motion_field),
            overlap=getattr(fn, "temporal_overlap", 16),
            devices=devices,
        )
    return dp.apply_temporal(
        _carry_tiling(lambda f, m: fn(f, m, b), fn), (stretched, removal_mask),
        overlap=getattr(fn, "temporal_overlap", 16),
        devices=devices,
    )


def run_elvis(config: ElvisConfig) -> Dict:
    """Execute the pipeline; returns (and writes) analysis_results."""
    if config.compilation_cache:
        # Persistent XLA executable cache: cold-start wall-clock is
        # compile-dominated; rerunning any config in a fresh process
        # reuses every stage's compiled code.
        from elvis_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
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

    execution_times: Dict[str, float] = _StageTimes(config.verbose)
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
    duration = n / framerate
    target_bitrate = config.target_bitrate_override or calculate_target_bitrate(
        width, height, framerate, config.quality_factor
    )
    execution_times["Preprocessing"] = time.time() - t0

    # Frame-axis data parallelism (SURVEY.md §2.7 P1-P3 and the temporal
    # halo of P6): per-frame stages pad N to a device multiple and shard;
    # windowed temporal stages additionally exchange halo frames over ICI
    # so each shard sees its neighbours' context.
    dp = _DataParallel(config.data_parallel, spatial=config.spatial_devices)

    def _restore_framewise(fn, frames_in, maps_in, devices=None):
        """Per-frame restore: plain frame DP, or — for tall frames with a
        spatial mesh axis configured — 2D frame x height-tile sharding
        (VERDICT r2 #5; the reference runs feathered spatial tiles in its
        restore paths at high res, utils.py:176-326)."""
        if (
            height >= config.spatial_tile_threshold
            and dp.spatial_ok(height, b)
        ):
            return dp.apply_spatial(
                as_pixels_u8(lambda f, l: fn(f, l, b)), frames_in, maps_in,
                halo=config.spatial_halo, block_size=b,
            )
        return dp.apply(
            _carry_tiling(as_pixels_u8(lambda f, m: fn(f, m, b)), fn),
            frames_in, maps_in, devices=devices,
        )

    # Codec dispatch (elvis_tpu.codec.dispatch): the built-in NVC codec or
    # the external x265/kvazaar/SVT-AV1 wrappers, one interface.
    codec = make_pipeline_codec(
        config.codec, os.path.join(experiment_dir, "codec"), width, height,
        preset=config.encode_preset, pix_fmt=config.encode_pix_fmt,
        quality=config.quality_preset, nvc_b_frames=config.nvc_b_frames,
        nvc_me_radius=config.nvc_me_radius, nvc_multi_ref=config.nvc_multi_ref,
        nvc_deblock=config.nvc_deblock,
        nvc_intra_pred=config.nvc_intra_pred,
    )
    # ~1-second keyframe interval like the reference's `-g framerate`
    # (elvis.py:1298) — bounds seek/error propagation.
    gop = max(int(round(framerate)), 1)
    enc_kw = dict(target_bitrate=target_bitrate, framerate=framerate, gop=gop)

    # --- stage 1: removability scoring (elvis.py:4347-4362) ---------------
    t0 = time.time()

    def _score():
        from elvis_tpu.scoring import importance_scores

        # Features per haloed frame chunk (one jitted graph each, packed
        # mask pull) — see _scoring_features_chunked; the math is
        # spatial_temporal_complexity + the registered saliency backend,
        # chunk-exactly.
        chunk = max(1, _FRAME_CHUNK_PIXEL_BUDGET // (height * width))
        sc, tc, fg_pool, fg_frac, fg_pixel = _scoring_features_chunked(
            frames_np, b, get_saliency_fn(config.saliency_backend), chunk
        )

        @jax.jit
        def _fuse(sc, tc, fg_pool, fg_frac):
            scores = removability_scores(
                sc, tc, fg_pool >= 0.5,  # == saliency_to_block_mask(sal, b)
                alpha=config.removability_alpha,
                smoothing_beta=config.removability_smoothing_beta,
            )
            # PRESLEY importance variant (utils.py:665-688) for the ROI
            # stage — the formulation behind the reference's measured FG
            # gains (TECHNICAL_REPORT.md:160-174 uses kvazaar/importance).
            # A block counts as foreground if ANY meaningful part of it
            # is — object-boundary blocks dominate FG pixel error, and
            # classing them background inverts the intended trade.
            fg_weight = (fg_frac > 0.1).astype(jnp.float32)
            importance = importance_scores(
                sc, tc, fg_weight,
                alpha=config.removability_alpha,
                beta=config.removability_smoothing_beta,
            )
            return scores, importance

        scores, importance = _fuse(*(jnp.asarray(a)
                                     for a in (sc, tc, fg_pool, fg_frac)))
        return {
            "scores": np.asarray(scores),
            "importance": np.asarray(importance),
            "fg_pixel": fg_pixel,
        }

    # "v2": the cached schema replaced the float saliency plane with the
    # packed bool mask — keep old-format entries from being read back.
    scored = cache.get_or_run("scoring", ["v2", config.to_dict(), frames_np],
                              _score)
    scores = jnp.asarray(scored["scores"])
    importance = scored["importance"]
    if config.masks_dir:
        # External ground-truth masks (DAVIS-style) override the saliency
        # estimate for evaluation, like the reference's maps/ufo_masks.
        from elvis_tpu.pipeline.io import load_masks

        fg_masks_pixel = load_masks(config.masks_dir, width, height, n)
    else:
        fg_masks_pixel = scored["fg_pixel"].astype(bool)  # (N,H,W)
    # persist masks like the reference's maps/ufo_masks (elvis.py:1186-1199)
    save_frames_png(
        (fg_masks_pixel * 255).astype(np.uint8)[..., None].repeat(3, -1),
        os.path.join(maps_dir, "saliency_masks"),
    )
    execution_times["Removability Scores"] = time.time() - t0

    streams: Dict[str, bytes] = {}
    decoded: Dict[str, np.ndarray] = {}
    sidecar_sizes: Dict[str, int] = {}

    # Stage-level resume (SURVEY.md §5.4; the reference reuses existing
    # artifacts, elvis.py:3895-3906): every encode branch is content-
    # addressed on (config, input frames); re-running a config skips
    # completed encodes. Scoring is cached the same way above.
    _branch_key = [config.to_dict(), frames_np]

    # --- stage 2: baseline encode (elvis.py:4364-4381) ---------------------
    t0 = time.time()

    def _baseline():
        s = codec.encode(frames_np, **enc_kw)
        return {"stream": s, "decoded": codec.decode(s)}

    r = cache.get_or_run("baseline_encode", _branch_key, _baseline)
    streams["baseline"] = r["stream"]
    decoded[APPROACHES.BASELINE] = r["decoded"]
    dt = time.time() - t0
    execution_times["Baseline Encoding"] = dt
    approach_times[APPROACHES.BASELINE] += dt

    # --- stage 3: ELVIS shrink (elvis.py:4389-4418) -------------------------
    t0 = time.time()

    def _shrink():
        # The removal mask is computed over the WHOLE clip first (scores
        # are block-granular — tiny; the cooldown scan carries per-block
        # protection state across frames, so it cannot be chunked), then
        # the pixel gather runs in bounded-memory frame chunks (nothing
        # clip-sized stays on device).
        from elvis_tpu.degrade.removal import (
            apply_removal_mask, removal_blocks_per_row,
            removal_mask_from_scores,
        )

        bx = frames_np.shape[2] // b
        k = removal_blocks_per_row(bx, config.shrink_amount)
        mask_all = np.asarray(jax.jit(
            lambda sc_: removal_mask_from_scores(
                sc_, bx, config.shrink_amount,
                cooldown=config.shrink_removal_cooldown)
        )(scores))
        jrm = jax.jit(lambda f, m_: apply_removal_mask(f, m_, b, k))
        chunk = _DataParallel._chunk_frames(frames_np.shape)
        shrunk_l = []
        for s0 in range(0, n, chunk):
            e0 = min(s0 + chunk, n)
            f = jrm(jnp.asarray(frames_np[s0:e0]), jnp.asarray(mask_all[s0:e0]))
            shrunk_l.append(pull(f))
        s = codec.encode(np.concatenate(shrunk_l), **enc_kw)
        out = {"stream": s, "decoded": codec.decode(s),
               "removal_mask": mask_all}
        if config.inpaint_motion_hint and n > 1:
            # Encoder-side motion hint for the client inpaint fill
            # (ops.motion.motion_hint): computed on the PRISTINE frames
            # (decoded content carries the codec's reduced apparent
            # motion), shipped in the mask sidecar, charged to the ELVIS
            # rows' bitrate. Pairs are independent -> chunk with one
            # overlap frame.
            from elvis_tpu.ops.motion import motion_hint

            jmh = jax.jit(lambda f: motion_hint(f, b))
            g_l, d_l = [], []
            for s0 in range(0, n - 1, chunk):
                e0 = min(s0 + chunk + 1, n)
                g_, d_ = jmh(jnp.asarray(frames_np[s0:e0]))
                g_l.append(np.asarray(g_))
                d_l.append(np.asarray(d_))
            out["motion_gmv"] = np.concatenate(g_l)
            out["motion_dev"] = np.concatenate(d_l)
        return out

    r = cache.get_or_run("shrink_encode", _branch_key, _shrink)
    streams["shrunk"] = r["stream"]
    shrunk_decoded = r["decoded"]
    removal_mask = jnp.asarray(r["removal_mask"])
    motion_gmv, motion_dev = r.get("motion_gmv"), r.get("motion_dev")
    masks_npz = os.path.join(experiment_dir, f"shrink_masks_{b}.npz")
    save_removal_masks_npz(np.asarray(removal_mask), masks_npz,
                           motion_gmv=motion_gmv, motion_dev=motion_dev)
    dt = time.time() - t0
    execution_times["ELVIS Shrinking"] = dt
    approach_times[APPROACHES.ELVIS] += dt

    # --- stage 4: ROI encode (elvis.py:4439-4450) ---------------------------
    # Per codec: NVC maps importance to its native per-block delta-QP
    # (kvazaar formula, utils.py:1048); x265 writes a qpfile from the
    # removability scores (elvis.py:2013-2139); kvazaar/SVT-AV1 write
    # their binary/text ROI files from importance (utils.py:1026/1056).
    t0 = time.time()

    def _roi():
        s = codec.encode_roi(
            frames_np, removability=np.asarray(scores), importance=importance,
            block_size=b, roi_qp_range=config.roi_qp_range, **enc_kw,
        )
        return {"stream": s, "decoded": codec.decode(s)}

    r = cache.get_or_run("roi_encode", _branch_key, _roi)
    streams["roi"] = r["stream"]
    decoded[APPROACHES.PRESLEY_QP] = r["decoded"]
    dt = time.time() - t0
    execution_times["Adaptive QP Encoding"] = dt
    approach_times[APPROACHES.PRESLEY_QP] += dt

    # Strength-map sidecar format: npz (lossless) or the reference's video
    # sidecar at strength_maps_target_bitrate (elvis.py:2198-2245 / 4837).
    def _save_maps(levels, name):
        if config.strength_maps_use_npz:
            path = os.path.join(maps_dir, f"{name}_maps.npz")
            return path, save_strength_maps_npz(np.asarray(levels), path)
        path = os.path.join(maps_dir, f"{name}_maps.nvsv")
        return path, save_strength_maps_video(
            np.asarray(levels), path, framerate=framerate,
            target_bitrate=config.strength_maps_target_bitrate,
        )

    def _load_maps(path):
        if path.endswith(".npz"):
            return jnp.asarray(np.load(path)["strength_maps"].astype(np.int32))
        return jnp.asarray(load_strength_maps_video(path).astype(np.int32))

    def _degrade_chunked(op):
        """(frames', levels) from a per-frame degrade op, computed in
        bounded-memory frame chunks (a clip-sized degrade graph at 128
        frames @1080p exceeds the compiler/HBM limits — measured)."""
        def _op_u8(f, s_):
            # degraded frames leave the graph uint8: that is the domain
            # the encoder consumes (the reference stages them through
            # PNG, elvis.py:4462+), and u8 crosses the link 4x cheaper
            fr, lv = op(f, s_)
            if not jnp.issubdtype(fr.dtype, jnp.integer):
                fr = jnp.clip(jnp.round(fr), 0, 255)
            return fr.astype(jnp.uint8), lv

        jop = jax.jit(_op_u8)
        n_f = frames_np.shape[0]
        chunk = _DataParallel._chunk_frames(frames_np.shape)
        if n_f <= chunk:
            f, l = jop(jnp.asarray(frames_np), scores)
            return pull(f), pull(l)
        fs, ls = [], []
        for s in range(0, n_f, chunk):
            e = min(s + chunk, n_f)
            f, l = jop(jnp.asarray(frames_np[s:e]), scores[s:e])
            fs.append(pull(f))
            ls.append(pull(l))
        return np.concatenate(fs, axis=0), np.concatenate(ls, axis=0)

    # --- stage 5: downsample branch (elvis.py:4462-4486) --------------------
    t0 = time.time()

    def _downsample():
        down_frames, down_levels = _degrade_chunked(
            lambda f, sc: adaptive_downsample(f, sc, b)
        )
        s = codec.encode(down_frames, **enc_kw)
        return {"stream": s, "decoded": codec.decode(s),
                "levels": down_levels}

    r = cache.get_or_run("downsample_encode", _branch_key, _downsample)
    streams["downsampled"] = r["stream"]
    down_decoded = r["decoded"]
    down_maps_path, sidecar_sizes["downsample"] = _save_maps(r["levels"], "downsample")
    dt = time.time() - t0
    execution_times["Downsampled Encoding"] = dt
    approach_times[APPROACHES.PRESLEY_REALESRGAN] += dt

    # --- stage 6: blur branch (elvis.py:4501-4525) ---------------------------
    t0 = time.time()

    def _gaussian():
        blur_frames, blur_levels = _degrade_chunked(
            lambda f, sc: adaptive_blur(f, sc, b, config.gaussian_max_rounds)
        )
        s = codec.encode(blur_frames, **enc_kw)
        return {"stream": s, "decoded": codec.decode(s),
                "levels": blur_levels}

    r = cache.get_or_run("gaussian_encode", _branch_key, _gaussian)
    streams["gaussian"] = r["stream"]
    blur_decoded = r["decoded"]
    blur_maps_path, sidecar_sizes["gaussian"] = _save_maps(r["levels"], "gaussian")
    dt = time.time() - t0
    execution_times["Gaussian Encoding"] = dt
    approach_times[APPROACHES.PRESLEY_INSTANTIR] += dt

    # --- stage 6b (extension): DCT-dampen branch — the "ELVIS v2" of the
    # reference's README (README.md:11-46) that its code never shipped.
    if config.enable_dct_dampen:
        from elvis_tpu.degrade import dct_dampen
        from elvis_tpu.restore import restore_dct_dampen_inverse

        t0 = time.time()

        def _dampen():
            damp_frames, damp_levels = _degrade_chunked(
                lambda f, sc: dct_dampen(f, sc, b)
            )
            s = codec.encode(damp_frames, **enc_kw)
            return {"stream": s, "decoded": codec.decode(s),
                    "levels": damp_levels}

        r = cache.get_or_run("dampen_encode", _branch_key, _dampen)
        streams["dampened"] = r["stream"]
        damp_decoded = r["decoded"]
        damp_maps_path, sidecar_sizes["dampen"] = _save_maps(r["levels"], "dampen")
        damp_levels_dec = _load_maps(damp_maps_path)
        decoded[APPROACHES.ELVIS_V2_DAMPEN] = np.asarray(
            dp.apply(
                as_pixels_u8(lambda f, l: restore_dct_dampen_inverse(f, l, b)),
                damp_decoded, np.asarray(damp_levels_dec),
            )
        )
        dt = time.time() - t0
        execution_times["DCT Dampen Branch"] = dt
        approach_times[APPROACHES.ELVIS_V2_DAMPEN] += dt

    # --- stage 7: client stretch (elvis.py:4542-4580) ------------------------
    t0 = time.time()
    stretched = dp.apply(
        lambda f, m: stretch_frames(f, m, b), shrunk_decoded, removal_mask
    )
    execution_times["ELVIS Stretching"] = time.time() - t0

    # --- stages 8-10: restoration via the config-driven backend registry ----
    # (elvis.py:4601-4794; backend selection parity with the reference's
    # model-name config switches at elvis.py:2384-2493.) The first entry of
    # each *_backends list fills the reference's approach label for that
    # slot; extra entries add extra comparison rows. ``backend_provenance``
    # records what actually ran (trained checkpoint vs classical fallback).
    backend_provenance: Dict[str, str] = {}
    # label -> encoded branch whose bitrate the row inherits (stage 11)
    row_branch: Dict[str, str] = {}

    def _ckpt_stamp(prov: str) -> list:
        """Checkpoint-freshness component for restore-stage cache keys: the
        provenance string carries the checkpoint path; stamp its newest
        file mtime so a retrained model invalidates cached restores."""
        import re as _re

        m = _re.search(r":(\S+?)\[", prov)
        stamp = []
        if m and os.path.isdir(m.group(1)):
            for root_, _, files_ in os.walk(m.group(1)):
                stamp.extend(
                    os.path.getmtime(os.path.join(root_, f_)) for f_ in files_
                )
        return sorted(stamp)

    def _cached_restore(stage: str, prov: str, compute) -> np.ndarray:
        """Content-addressed resume for the restore stages (VERDICT r4 #6):
        the committed long run spent 70% of its resume pass re-running
        UNcached inpaint/SR/deblur (E2FGVI alone 1483 s) while only the
        encode branches were cached. The reference effectively checkpoints
        every stage via its filesystem staging (elvis.py:3895-3906).
        Output is determined by (config, input frames, backend provenance,
        checkpoint freshness) — _branch_key already digests the first two."""
        r = cache.get_or_run(
            stage, [_branch_key, prov, _ckpt_stamp(prov)],
            lambda: {"frames": np.asarray(compute())},
        )
        return r["frames"]

    # --- stage 8: inpainting (elvis.py:4601-4661) ----------------------------
    _inpaint_labels = {
        "diffusion": (APPROACHES.ELVIS_CV2, "CV2 Inpainting"),
        "temporal": (APPROACHES.ELVIS_PROP, "ProPainter Inpainting"),
        "neural": (APPROACHES.ELVIS_E2FGVI, "E2FGVI Inpainting"),
    }
    # Per-stage device subsets (the reference's per-model GPU lists,
    # elvis.py:451-530): each slot's stage shards over only its devices.
    _inpaint_devices = {
        "temporal": config.propainter_devices,
        "neural": config.e2fgvi_devices,
    }
    # Expand the transmitted motion hint (decoded from the mask sidecar —
    # the client reads it exactly like the masks) to the fill grid once;
    # shared by every motion-consuming backend below.
    inpaint_motion = None
    if motion_gmv is not None and config.inpaint_motion_hint:
        from elvis_tpu.ops.motion import motion_field_from_hint

        by_, bx_ = int(removal_mask.shape[1]), int(removal_mask.shape[2])
        inpaint_motion = np.asarray(jax.jit(
            lambda g, d: motion_field_from_hint(g, d, by_, bx_)
        )(jnp.asarray(motion_gmv), jnp.asarray(motion_dev)))
    for name in config.inpaint_backends:
        label, timer = _inpaint_labels.get(name, (f"ELVIS {name}", f"{name} Inpainting"))
        fn, prov = resolve_inpaint_backend(name, config)
        mv_arg = inpaint_motion if name != "diffusion" else None
        if mv_arg is not None:
            prov = f"{prov}+motion_hint"
        backend_provenance[label] = prov
        row_branch[label] = "shrunk"
        t0 = time.time()
        decoded[label] = _cached_restore(
            f"inpaint_{name}", prov,
            lambda: pull(_apply_inpaint_backend(
                dp, name, fn, stretched, removal_mask, b,
                devices=_inpaint_devices.get(name), motion_field=mv_arg)),
        )
        dt = time.time() - t0
        execution_times[timer] = dt
        approach_times[label] += dt

    # --- stage 9: progressive SR restore (elvis.py:4695-4722) ----------------
    levels_dec = _load_maps(down_maps_path)
    for i, name in enumerate(config.sr_backends):
        label = APPROACHES.PRESLEY_REALESRGAN if i == 0 else f"PRESLEY SR {name}"
        timer = "RealESRGAN Restoration" if i == 0 else f"SR {name} Restoration"
        fn, prov = resolve_sr_backend(name, config)
        backend_provenance[label] = prov
        row_branch[label] = "downsampled"
        t0 = time.time()

        def _run_sr(fn=fn):
            sr_out = _restore_framewise(fn, down_decoded, levels_dec,
                                        devices=config.realesrgan_devices)
            if config.temporal_blend > 0:
                sr_out = dp.apply_temporal(
                    as_pixels_u8(lambda f: temporal_blend(f, config.temporal_blend)),
                    (sr_out,), overlap=8,
                )
            return pull(sr_out)

        decoded[label] = _cached_restore(f"sr_{name}", prov, _run_sr)
        dt = time.time() - t0
        execution_times[timer] = dt
        approach_times[label] += dt

    # --- stage 10: deblur restore (elvis.py:4755-4794) ------------------------
    blur_levels_dec = _load_maps(blur_maps_path)
    for i, name in enumerate(config.deblur_backends):
        label = APPROACHES.PRESLEY_INSTANTIR if i == 0 else f"PRESLEY Deblur {name}"
        timer = "InstantIR Restoration" if i == 0 else f"Deblur {name} Restoration"
        fn, prov = resolve_deblur_backend(name, config)
        backend_provenance[label] = prov
        row_branch[label] = "gaussian"
        t0 = time.time()

        def _run_deblur(fn=fn):
            deblurred = _restore_framewise(fn, blur_decoded, blur_levels_dec,
                                           devices=config.instantir_devices)
            if config.temporal_blend > 0:
                deblurred = dp.apply_temporal(
                    as_pixels_u8(lambda f: temporal_blend(f, config.temporal_blend)),
                    (deblurred,), overlap=8,
                )
            return pull(deblurred)

        decoded[label] = _cached_restore(f"deblur_{name}", prov, _run_deblur)
        dt = time.time() - t0
        execution_times[timer] = dt
        approach_times[label] += dt

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
    _branch_sizes = {
        "shrunk": video_sizes[APPROACHES.ELVIS],
        "downsampled": video_sizes[APPROACHES.PRESLEY_REALESRGAN],
        "gaussian": video_sizes[APPROACHES.PRESLEY_INSTANTIR],
    }
    for label, branch in row_branch.items():
        bitrates[label] = _branch_sizes[branch] * 8 / duration

    # --- stage 12: classical benchmarks (elvis.py:4880 -> 870-965) ------------
    if config.generate_opencv_benchmarks:
        t0 = time.time()
        decoded[APPROACHES.PRESLEY_LANCZOS] = np.asarray(
            dp.apply(as_pixels_u8(lambda f, m: restore_downsample_lanczos(f, m, b)),
                     down_decoded, levels_dec)
        )
        bitrates[APPROACHES.PRESLEY_LANCZOS] = bitrates[APPROACHES.PRESLEY_REALESRGAN]
        decoded[APPROACHES.PRESLEY_UNSHARP] = np.asarray(
            dp.apply(
                as_pixels_u8(
                    lambda f, m: restore_blur_unsharp(f, m, b,
                                                      config.gaussian_max_rounds)
                ),
                blur_decoded, blur_levels_dec,
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
        fvmd_early_stop_delta=config.fvmd_early_stop_delta,
        fvmd_early_stop_window=config.fvmd_early_stop_window,
        fvmd_max_frames=config.fvmd_max_frames,
        enable_vmaf=config.enable_vmaf,
        vmaf_stride=config.vmaf_stride,
        analysis_sample_frames=config.analysis_sample_frames,
        verbose=config.verbose,
        consume=True,  # each decoded clip's last use: free as evaluated
    )
    execution_times["Performance Evaluation"] = time.time() - t0
    for approach, total in approach_times.items():
        execution_times[approach] = total

    # --- result assembly (elvis.py:4918-4933 schema) ---------------------------
    analysis_results["execution_times_seconds"] = execution_times
    # resume observability: which content-addressed stages were served
    # from disk (hits) vs computed (misses) on THIS run
    analysis_results["stage_cache"] = {
        "hits": list(cache.hits), "misses": list(cache.misses),
    }
    analysis_results["stage_rss_gb"] = dict(execution_times.rss_gb)
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
            "codec": codec.name,
            "backends": backend_provenance,
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
