"""Config-driven restoration backend resolution + checkpoint auto-load.

The reference selects restoration models via config (model-name switches
at elvis.py:2384-2493, backend picks throughout presley.py); this module
is that selector for the in-framework slots. ``run_elvis`` maps the
``sr_backends`` / ``deblur_backends`` / ``inpaint_backends`` config lists
through ``resolve_*`` so config alone switches implementations, and
shipped checkpoints under ``checkpoints/`` load by default (the reference
auto-downloads its pretrained forks; here auto-load is the zero-egress
counterpart).

Every resolved backend has the uniform restorer signature
``fn(frames, maps, block_size) -> frames`` and a graceful fallback: a
missing checkpoint degrades to the slot's classical restorer (never a
crash, never silent garbage).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "resolve_sr_backend",
    "resolve_deblur_backend",
    "resolve_inpaint_backend",
    "default_params_path",
]

BackendFn = Callable[[jnp.ndarray, jnp.ndarray, int], jnp.ndarray]


def _with_hole_dilation(fn, dilation_px: int):
    """Dilate the hole mask by ``dilation_px // block_size`` blocks before
    restoring — the reference's ProPainter/E2FGVI ``mask_dilation`` knobs
    (pixel units there; block granularity is the finest this framework's
    removal masks carry, so sub-block dilations round down to 0)."""
    if int(dilation_px) <= 0:
        return fn
    from elvis_tpu.core.blocks import dilate_block_mask

    def wrapped(f, m, b, *a, **kw):
        r = int(dilation_px) // int(b)
        if r > 0:
            m = dilate_block_mask(m, r).astype(m.dtype if hasattr(m, "dtype") else bool)
        return fn(f, m, b, *a, **kw)

    return wrapped


def _with_resize_ratio(fn, ratio: float):
    """Run an inpaint restorer at ``ratio`` of the input resolution, then
    upscale and re-inject the restored hole pixels — the reference's
    ``propainter_resize_ratio`` memory/speed trade (elvis.py:1458
    plumbing). Known (non-hole) pixels never round-trip the resize."""
    if not (0 < float(ratio) < 1.0):
        return fn

    def wrapped(f, m, b, mv=None, **kw):
        from elvis_tpu.core.blocks import upsample_map
        from elvis_tpu.ops.resize import resize

        b_small = max(int(round(int(b) * float(ratio))), 1)
        by, bx = m.shape[-2], m.shape[-1]
        h, w = f.shape[1], f.shape[2]
        small = resize(
            jnp.asarray(f).astype(jnp.float32), (by * b_small, bx * b_small),
            method="area",
        )
        if mv is not None:
            # pixel-unit motion scales with the working resolution
            mv = jnp.round(jnp.asarray(mv).astype(jnp.float32)
                           * (b_small / int(b))).astype(jnp.int32)
        out_small = fn(small, m, b_small, mv=mv, **kw)
        out = resize(jnp.asarray(out_small).astype(jnp.float32), (h, w),
                     method="linear")
        hole = upsample_map(jnp.asarray(m).astype(bool), int(b))[..., None]
        out = jnp.where(hole, out, jnp.asarray(f).astype(jnp.float32))
        if jnp.issubdtype(jnp.asarray(f).dtype, jnp.integer):
            out = jnp.clip(jnp.round(out), 0, 255)
        return out.astype(jnp.asarray(f).dtype)

    return wrapped


def default_params_path(name: str, configured: Optional[str], auto: bool) -> Optional[str]:
    """configured path wins; else the shipped ``checkpoints/<name>`` when
    auto-load is on and the checkpoint exists."""
    if configured:
        return configured if os.path.isdir(configured) else None
    if not auto:
        return None
    from elvis_tpu.models.io import default_checkpoint_dir

    path = os.path.join(default_checkpoint_dir(), name)
    return path if os.path.isdir(path) else None


def _srnet_upsampler(config, which: Optional[str] = None) -> Tuple[Optional[Callable], str]:
    """(2x upsample_fn or None, provenance string). None => use Lanczos
    (mathematically identical to a zero-init SRNet, without the FLOPs).

    ``which`` pins a tier: 'srnet' (RRDB), 'srnet_compact' (serving),
    'srnet_large' (scaled conv stack), 'srnet_student' (the round-4
    QUALITY tier: one conv stack distilled from the ensemble,
    train.cli.train_srnet_student — ensemble-class quality at one
    forward pass), or 'srnet_ensemble' (compact + RRDB + large
    averaged — three passes; the round-3 quality tier, still the
    fallback when the student checkpoint is absent). Generic slots
    (None) take the MEASURED-BEST tier on the multi-crop photo holdout
    (re-ordered whenever retraining changes the ranking), so the
    reference's RealESRGAN slot defaults to what actually wins."""
    from elvis_tpu.models import SRNet, SRNetCompact, SRNetLarge, srnet_upsample_fn
    from elvis_tpu.models.io import load_params

    auto = getattr(config, "auto_load_checkpoints", True)
    tiers = {"srnet": SRNet, "srnet_compact": SRNetCompact,
             "srnet_large": SRNetLarge, "srnet_student": None}

    def _student_model(path):
        """The student's width/depth live in its sibling meta file (the
        same conditioning-contract pattern as deblur.meta.json)."""
        feats, convs = 128, 10
        meta_path = path.rstrip("/") + ".meta.json"
        if os.path.isfile(meta_path):
            import json

            with open(meta_path) as fh:
                m = json.load(fh)
            feats = int(m.get("features", feats))
            convs = int(m.get("num_convs", convs))
        return SRNetCompact(features=feats, num_convs=convs)

    def finish(fn, prov):
        """realesrgan_fp32 (elvis.py:2384-2493): force full-precision
        matmuls for the SR net — TPU convs otherwise run at the MXU's
        bf16 rate (the reference's flag disables fp16 the same way)."""
        if fn is None or not getattr(config, "realesrgan_fp32", False):
            return fn, prov

        def wrap(g):
            def fp32(x):
                with jax.default_matmul_precision("float32"):
                    return g(x)

            pg = getattr(g, "phase_fn", None)
            if pg is not None:
                def fp32_phase(x):
                    with jax.default_matmul_precision("float32"):
                        return pg(x)

                fp32.phase_fn = fp32_phase
            return fp32

        from elvis_tpu.restore.progressive import StagedUpsampler

        if isinstance(fn, StagedUpsampler):
            return StagedUpsampler(wrap(fn.prefix), wrap(fn.final)), f"{prov}+fp32"
        return wrap(fn), f"{prov}+fp32"

    def load_4k():
        """The 4K serving tier: shipped serving net on the cheap early
        stages + a narrow trained finisher on the final (dominant-cost)
        stage. Returns a StagedUpsampler (stage count resolves at call
        time)."""
        fpath = default_params_path("srnet_4k", None, auto)
        if not fpath:
            return None, ""
        base_fn, base_path = load_tier("srnet_compact")
        if base_fn is None:
            return None, ""
        feats, convs = 64, 5
        meta_path = fpath.rstrip("/") + ".meta.json"
        if os.path.isfile(meta_path):
            import json

            with open(meta_path) as fh:
                m = json.load(fh)
            feats, convs = int(m.get("features", feats)), int(m.get("num_convs", convs))
        finisher = SRNetCompact(features=feats, num_convs=convs)
        params = load_params(finisher, fpath, jnp.zeros((1, 16, 16, 3)))
        from elvis_tpu.restore.progressive import StagedUpsampler

        return (StagedUpsampler(base_fn, srnet_upsample_fn(finisher, params)),
                f"srnet_4k[{base_path} + {fpath}]")

    def load_tier(name):
        path = default_params_path(name, config.srnet_params_path, auto)
        if not path:
            return None, ""
        model = _student_model(path) if name == "srnet_student" else tiers[name]()
        params = load_params(model, path, jnp.zeros((1, 16, 16, 3)))
        return srnet_upsample_fn(model, params), path

    def load_ensemble():
        # a single user-configured srnet_params_path names ONE checkpoint;
        # the ensemble needs the shipped tiers, so it only forms off the
        # default auto-load paths
        if config.srnet_params_path:
            return None, ""
        loaded = [(n,) + load_tier(n) for n in ("srnet_compact", "srnet",
                                                "srnet_large")]
        fns = [fn for _, fn, _ in loaded if fn is not None]
        if len(fns) < 2:
            return None, ""
        names = " + ".join(p for _, fn, p in loaded if fn is not None)
        k = float(len(fns))

        def ens(f):
            return sum(fn(f) for fn in fns) / k

        phase_fns = [getattr(fn, "phase_fn", None) for fn in fns]
        if all(p is not None for p in phase_fns):
            # averaging commutes with the final interleave, so the
            # ensemble composes in phase form too
            ens.phase_fn = lambda f: sum(p(f) for p in phase_fns) / k
        return ens, f"srnet_ensemble[{names}]"

    if which == "srnet_4k":
        fn, prov = load_4k()
        if fn is not None:
            return finish(fn, prov)
        return None, "lanczos (no 4k finisher checkpoint)"
    if which in tiers:
        fn, path = load_tier(which)
        if fn is not None:
            return finish(fn, f"{which}:{path}")
        return None, "lanczos (no SR checkpoint)"
    if which in ("srnet_ensemble", "ensemble"):
        fn, prov = load_ensemble()
        if fn is not None:
            return finish(fn, prov)
        # fall through to single tiers when one checkpoint is missing
    # measured-best first (bench.py re-measures every tier every round):
    # student > ensemble > large > compact > rrdb on the multi-crop photo
    # holdout (r4: the distilled student matches the ensemble at one
    # forward pass and wins on the independent holdouts)
    if not config.srnet_params_path:
        try:
            fn, path = load_tier("srnet_student")
            if fn is not None:
                return finish(fn, f"srnet_student:{path}")
        except Exception:
            pass
    fn, prov = load_ensemble()
    if fn is not None:
        return finish(fn, prov)
    for name in ("srnet_large", "srnet_compact", "srnet"):
        try:
            fn, path = load_tier(name)
        except Exception:
            # a user-configured srnet_params_path names one specific
            # architecture's checkpoint; other tiers' shapes won't match
            continue
        if fn is not None:
            return finish(fn, f"{name}:{path}")
    return None, "lanczos (no SR checkpoint)"


def resolve_sr_backend(name: str, config) -> Tuple[BackendFn, str]:
    """Downsample-restoration backends: 'srnet' (progressive neural,
    falls back to Lanczos without weights), 'srnet_compact',
    'srnet_large', 'srnet_ensemble' (quality tier: available tiers
    averaged), 'progressive_lanczos', 'lanczos' (per-block), 'hybrid'
    (classical + alpha*neural polish, utils.py:1575-1601), 'level_seq'
    (presley.py:1220-1275), 'naive_sr' (map-blind, utils.py:1428)."""
    from elvis_tpu.restore.hybrid import blended_restoration
    from elvis_tpu.restore.lanczos import restore_downsample_lanczos
    from elvis_tpu.restore.level_seq import level_sequential_restore, naive_sr_restore
    from elvis_tpu.restore.progressive import lanczos_upsample_2x, progressive_restore

    def _sr_knobs(fn, prov):
        """Attach the reference's RealESRGAN runtime knobs to a
        neural-SR closure: ``realesrgan_tile``/``tile_pad`` engage the
        single-chip height-tile driver at a tile*tile pixel budget with
        at least the measured-exact 32-row halo (elvis.py:2384-2493's
        CUDA tiling), and ``realesrgan_parallel_chunk_length`` bounds the
        frame chunks the stage driver feeds it (elvis.py:2743-2764)."""
        tile = int(getattr(config, "realesrgan_tile", 0) or 0)
        if tile > 0:
            pad = int(getattr(config, "realesrgan_tile_pad", 10) or 0)
            fn.spatial_halo_rows = max(32, pad)
            fn.spatial_pixel_budget = tile * tile
        chunk = getattr(config, "realesrgan_parallel_chunk_length", None)
        if chunk:
            fn.frame_chunk = int(chunk)
        return fn, prov

    if name in ("progressive_lanczos",):
        return (
            lambda f, m, b: progressive_restore(f, m, b, upsample_fn=lanczos_upsample_2x),
            "progressive_lanczos",
        )
    if name == "lanczos":
        return restore_downsample_lanczos, "lanczos"
    if name in ("srnet", "srnet_compact", "srnet_large", "srnet_student",
                "srnet_4k", "srnet_ensemble", "ensemble",
                "progressive_neural", "realesrgan"):
        up, prov = _srnet_upsampler(
            config,
            which=name
            if name in ("srnet", "srnet_compact", "srnet_large",
                        "srnet_student", "srnet_4k", "srnet_ensemble",
                        "ensemble")
            else None,
        )
        if up is None:
            return _sr_knobs(
                lambda f, m, b: progressive_restore(f, m, b, upsample_fn=lanczos_upsample_2x),
                prov,
            )
        return _sr_knobs(lambda f, m, b: progressive_restore(f, m, b, upsample_fn=up),
                         f"progressive_neural[{prov}]")
    if name == "hybrid":
        # reference optimum: classical + 10% strength-weighted neural polish
        # (+5.71% SSIM for downsample, DEGRADATION_ABLATION_REPORT.tex:315-340)
        up, prov = _srnet_upsampler(config)
        up = up or lanczos_upsample_2x

        def hybrid(f, m, b):
            classical = restore_downsample_lanczos(f, m, b)
            neural = progressive_restore(f, m, b, upsample_fn=up)
            return blended_restoration(classical, neural, m, b, alpha=0.1)

        return _sr_knobs(hybrid, f"hybrid[lanczos + 0.1*{prov}]")
    if name == "level_seq":
        up, prov = _srnet_upsampler(config)
        up = up or lanczos_upsample_2x

        def per_level(frames, lvl):
            from elvis_tpu.ops.resize import resize

            h, w = frames.shape[-3], frames.shape[-2]
            small = resize(frames.astype(jnp.float32), (h // 2**lvl, w // 2**lvl),
                           method="area")
            for _ in range(lvl):
                small = up(small)
            return small

        def level_seq(f, m, b):
            import numpy as np

            max_level = max(int(np.asarray(m).max()), 1)  # host metadata
            return level_sequential_restore(per_level, f, m, b, max_level)

        return _sr_knobs(level_seq, f"level_seq[{prov}]")
    if name == "naive_sr":
        up, prov = _srnet_upsampler(config)
        return _sr_knobs(lambda f, m, b: naive_sr_restore(f, m, b, upsample_fn=up),
                         f"naive_sr[{prov}]")
    raise ValueError(f"unknown SR backend {name!r}")


def resolve_deblur_backend(name: str, config) -> Tuple[BackendFn, str]:
    """Blur-restoration backends: 'deblur_net' (trained UNet; falls back
    to unsharp without weights), 'unsharp' (classical), 'diffusion'
    (adaptive round-loop DiffusionRestorer, elvis.py:2869-3160 semantics;
    requires a trained checkpoint), 'naive_diffusion'."""
    from elvis_tpu.restore.unsharp import restore_blur_unsharp

    max_rounds = config.gaussian_max_rounds
    auto = getattr(config, "auto_load_checkpoints", True)
    # Reference InstantIR slot plumbing: per-worker chunk length
    # (elvis.py:3124-3158) bounds this stage's frame chunks; batch_size
    # (elvis.py:3000) bounds frames per diffusion invocation.
    stage_chunk = getattr(config, "instantir_parallel_chunk_length", None)

    def _deblur_knobs(fn, prov):
        if stage_chunk:
            fn.frame_chunk = int(stage_chunk)
        return fn, prov

    def unsharp(f, m, b):
        return restore_blur_unsharp(f, m, b, max_rounds)

    if name == "unsharp":
        return _deblur_knobs(unsharp, "unsharp")
    if name in ("deblur_net", "neural", "instantir"):
        path = default_params_path("deblur", config.deblur_params_path, auto)
        if not path:
            return _deblur_knobs(unsharp, "unsharp (no deblur checkpoint)")
        from elvis_tpu.models import DeblurUNet
        from elvis_tpu.models.io import load_params

        # The conditioning contract (strength / max_strength) is set at
        # TRAINING time; a checkpoint records its normalization in a
        # sibling meta file. Using the runtime gaussian_max_rounds here
        # mis-conditioned the net whenever it differed from the trained
        # value (measured -9 dB at max_rounds=4 vs the trained 10).
        trained_ms = float(max_rounds)
        meta_path = path.rstrip("/") + ".meta.json"
        if os.path.isfile(meta_path):
            import json

            with open(meta_path) as fh:
                trained_ms = float(json.load(fh).get("max_strength", trained_ms))
        net = DeblurUNet(max_strength=trained_ms)
        params = load_params(
            net, path, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 2, 2), jnp.int32), 8
        )

        def deblur(f, m, b):
            return net.apply(params, f.astype(jnp.float32), m, b)

        # Three stride-2 UNet levels compound to a ~51-row receptive
        # field; 64 is the block-aligned bound for height tiling. The
        # deeper pyramid carries more live activations per pixel than
        # InpaintNet, so halve the per-invocation pixel budget.
        deblur.spatial_halo_rows = 64
        deblur.spatial_pixel_budget = 3 << 20
        return _deblur_knobs(deblur, f"deblur_net:{path}")
    if name == "diffusion":
        # The InstantIR slot's diffusion path, with SHIPPED weights
        # (checkpoints/diffusion, round 3): trajectory-consistent
        # x0-prediction + SDEdit init + single-trajectory adaptive
        # restore reproduce the reference's crossover — at blur rounds
        # >=5 unsharp HURTS (-0.9 dB vs the blurred input) while
        # diffusion GAINS (+0.4..0.6 dB); at light blur unsharp still
        # wins (docs/diffusion_crossover.json; reference claim
        # DEGRADATION_ABLATION_REPORT.tex:630-653). The slot's default
        # remains 'deblur_net' (stronger still on the mixed-strength
        # holdout); 'diffusion' is the heavy-blur specialist.
        path = default_params_path("diffusion", None, auto)
        if not path:
            # an untrained diffusion model hallucinates noise — never a
            # valid fallback; degrade to the classical restorer instead
            return _deblur_knobs(unsharp, "unsharp (no diffusion checkpoint)")
        import orbax.checkpoint as ocp

        from elvis_tpu.models import DiffusionRestorer

        d = DiffusionRestorer()
        abstract = jax.eval_shape(lambda: d.init(jax.random.PRNGKey(0)))
        from elvis_tpu.models.io import host_params

        params = host_params(
            ocp.StandardCheckpointer().restore(os.path.abspath(path), abstract)
        )
        seed = getattr(config, "instantir_seed", None)
        rng = jax.random.PRNGKey(0 if seed is None else int(seed))
        # presley's instantir_steps = denoising steps per strength round
        # (reference presley.py:71; 0/absent = the model default)
        spr = int(getattr(config, "instantir_steps", 0) or 0)
        spr_kw = {"steps_per_round": spr} if spr > 0 else {}

        def diffusion(f, m, b):
            return d.restore_adaptive(params, f.astype(jnp.float32), m, b,
                                      max_rounds=max_rounds, rng=rng, **spr_kw)

        # frames per diffusion invocation = the reference's batch_size
        # (elvis.py:3000); the stage chunk knob may bound it further
        batch = int(getattr(config, "instantir_batch_size", 0) or 0)
        if batch > 0:
            diffusion.frame_chunk = min(batch, int(stage_chunk)) if stage_chunk else batch
        elif stage_chunk:
            diffusion.frame_chunk = int(stage_chunk)
        return diffusion, f"diffusion:{path}[seed={0 if seed is None else int(seed)}]"
    if name == "naive_diffusion":
        from elvis_tpu.restore.level_seq import naive_diffusion_restore

        return _deblur_knobs(
            lambda f, m, b: naive_diffusion_restore(f, m, b), "naive_diffusion"
        )
    raise ValueError(f"unknown deblur backend {name!r}")


def _propainter_window(config) -> int:
    """Temporal propagation window from the reference's ProPainter knobs
    (elvis.py:1506-1566): ``neighbor_length`` local neighbours on each
    side of a frame (here the +-window block-propagation search spans
    2x that, matching the reference's neighbour+reference set), bounded
    by ``subvideo_length`` (a chunk never sees sources beyond its own
    sub-video: +-w spans 2w+1 <= subvideo_length frames)."""
    w = 2 * max(int(config.propainter_neighbor_length), 1)
    cap = max((int(config.propainter_subvideo_length) - 1) // 2, 1)
    return max(min(w, cap), 1)


def _e2fgvi_window(config) -> int:
    """InpaintNet-seed window from the reference's E2FGVI knobs: its
    chunk overlap is ``2 * neighbor_stride`` (elvis.py:1864-1906), i.e.
    the model reaches ``2*stride`` frames of context."""
    return max(2 * int(config.e2fgvi_neighbor_stride), 1)


def resolve_inpaint_backend(name: str, config) -> Tuple[BackendFn, str]:
    """Removal-restoration backends: 'diffusion' (PDE fill, the Telea
    counterpart), 'temporal' (motion propagation, the ProPainter
    counterpart), 'neural' (InpaintNet over a temporal seed, the E2FGVI
    counterpart; falls back to propagation + PDE polish without weights).

    Windowed backends carry a ``temporal_overlap`` attribute — the halo
    size ``run_elvis`` passes to the sharded temporal map (2x the window
    for exact sharded==unsharded equivalence, overridable via the
    reference's ``*_chunk_overlap`` fields)."""
    from elvis_tpu.restore.inpaint import (
        restore_removal_diffusion,
        restore_removal_temporal,
    )

    auto = getattr(config, "auto_load_checkpoints", True)
    if name == "diffusion":
        return restore_removal_diffusion, "pde_diffusion"
    if name == "temporal":
        w = _propainter_window(config)
        ov = int(config.propainter_chunk_overlap or 2 * w)
        refs = int(getattr(config, "propainter_ref_stride", 0) or 0)

        def temporal(f, m, b, mv=None):
            return restore_removal_temporal(f, m, b, window=w, ref_stride=refs,
                                            motion_field=mv)

        temporal = _with_hole_dilation(
            temporal, int(getattr(config, "propainter_mask_dilation", 0) or 0)
        )
        temporal = _with_resize_ratio(
            temporal, float(getattr(config, "propainter_resize_ratio", 1.0) or 1.0)
        )
        temporal.temporal_overlap = ov
        chunk = getattr(config, "propainter_parallel_chunk_length", None)
        if chunk:
            temporal.frame_chunk = int(chunk)
        return temporal, (
            f"temporal_propagation[window={w},overlap={ov},ref_stride={refs}]"
        )
    if name in ("neural", "inpaint_net", "e2fgvi"):
        w = _e2fgvi_window(config)
        ov = int(config.e2fgvi_chunk_overlap or 2 * w)
        # E2FGVI's non-local reference set (elvis.py:1693 plumbing):
        # every ref_stride-th frame, capped at num_ref (-1 = all)
        refs = int(getattr(config, "e2fgvi_ref_stride", 0) or 0)
        nref = int(getattr(config, "e2fgvi_num_ref", -1))
        dil = int(getattr(config, "e2fgvi_mask_dilation", 0) or 0)
        chunk = getattr(config, "e2fgvi_parallel_chunk_length", None)

        def _e2_knobs(fn):
            fn.temporal_overlap = ov
            if chunk:
                fn.frame_chunk = int(chunk)
            return fn

        path = default_params_path("inpaint", config.inpaint_params_path, auto)
        if not path:
            def fallback(f, m, b, mv=None):
                seeded = restore_removal_temporal(
                    f, m, b, window=w, ref_stride=refs, max_refs=nref,
                    motion_field=mv,
                )
                return restore_removal_diffusion(jnp.asarray(seeded), m, b, iters=40)

            fallback = _e2_knobs(_with_hole_dilation(fallback, dil))
            return fallback, f"temporal+pde (no inpaint checkpoint)[window={w}]"
        from elvis_tpu.models import InpaintNet
        from elvis_tpu.models.io import load_params

        net = InpaintNet()
        params = load_params(
            net, path, jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 2, 2), jnp.int8), 8
        )

        def neural(f, m, b, mv=None):
            seeded = jnp.asarray(
                restore_removal_temporal(f, m, b, window=w, ref_stride=refs,
                                         max_refs=nref, motion_field=mv)
            ).astype(jnp.float32)
            return net.apply(params, seeded, m, b)

        neural = _e2_knobs(_with_hole_dilation(neural, dil))
        # Two-phase split for the long-clip chunked driver: the
        # propagation SEED needs the full window of temporal context (ov,
        # default 2*w=20) but the polish net only its +-temporal_window=2
        # neighbour stack. Running the net inside the seed's wide
        # temporal graph puts its full-res feature maps on
        # chunk+2*ov frames at once (21 GB at 1080p — over HBM);
        # run_elvis applies `seed` and `post` through the temporal
        # halo/chunk machinery at their OWN overlaps (20 vs 2).
        # seed+post == neural exactly: the net's edge-clamped neighbour
        # shifts only affect the outermost `temporal_window` frames of a
        # window, which the overlap trims (global clip edges clamp
        # identically in both paths).
        def seed(f, m, b, mv=None):
            return jnp.asarray(
                restore_removal_temporal(f, m, b, window=w, ref_stride=refs,
                                         max_refs=nref, motion_field=mv)
            ).astype(jnp.float32)

        def post(f, m, b):
            return net.apply(params, f, m, b)

        seed = _with_hole_dilation(seed, dil)
        post = _with_hole_dilation(post, dil)
        seed.temporal_overlap = ov
        post.temporal_overlap = int(net.temporal_window)
        if chunk:
            seed.frame_chunk = post.frame_chunk = int(chunk)
        # Receptive-field bound for single-chip height tiling (pipeline
        # _apply_height_tiled): enc/dec 3x3 stack + one stride-2 level
        # reaches ~12 rows; 16 is the block-aligned bound. Without tiling
        # the polish net's full-res feature maps measure ~1.14 KB/px
        # padded — 23.7 GB for a 10-frame 1080p window, over HBM.
        post.spatial_halo_rows = 16
        seed.post = post
        neural.split = seed
        return neural, f"inpaint_net:{path}[window={w},overlap={ov}]"
    raise ValueError(f"unknown inpaint backend {name!r}")
