"""Held-out SR evaluation: does the trained upsampler beat Lanczos?

The reference's flagship quality claim is trained-ESRGAN > Lanczos on the
progressive restoration task (DEGRADATION_ABLATION_REPORT.tex:266-287:
SSIM 0.8550/0.8059 vs 0.8533/0.7753 at s=3/s=4). This harness makes the
same comparison for the in-framework SRNet/SRNetCompact on content the
training generator never produced:

  * ``photo`` — a real photograph (matplotlib's bundled grace_hopper.jpg,
    the only natural image in this zero-egress build environment);
  * ``leaves`` — dead-leaves content from a held-out seed;
  * ``legacy`` — the round-1 band-limited synthetic family (where Lanczos
    is near-optimal; the neural model must at least not LOSE here).

Each clip is degraded by the framework's own adaptive block downsampling
(+ optional codec round trip), restored through the progressive loop with
Lanczos vs the neural upsampler, and scored with the metrics-grade
PSNR/SSIM used by the pipeline.

CLI: ``python -m elvis_tpu.train.evaluate --ckpt checkpoints/srnet``
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, Dict, Optional

import numpy as np

__all__ = [
    "holdout_clips",
    "photo_image",
    "photo_clips_multi",
    "sr_holdout_eval",
    "sr_photo_eval_multi",
    "deblur_holdout_eval",
    "main",
]

_HOPPER = os.path.join(
    "matplotlib", "mpl-data", "sample_data", "grace_hopper.jpg"
)


def photo_image(source: str = "grace_hopper") -> Optional[np.ndarray]:
    """Load one of the real photographs bundled in this zero-egress image:
    matplotlib's ``grace_hopper`` (the default holdout), sklearn's
    ``china``/``flower`` (the training photos — used as EVAL targets only
    in the cross-validation rotation, where the trainer's pool excludes
    them; train.data.photo_patch_pool), pygame's ``camera`` tutorial
    photo (320x240 indoor scene), or gymnasium_robotics'
    ``marble_tile`` stone-floor photograph (1300x866) — the last two are
    INDEPENDENT holdouts that appear in no training rotation at all
    (bench.py measures generalization on both; VERDICT r3 #3 asked for
    n>=2 independent sources)."""
    try:
        from PIL import Image

        if source == "grace_hopper":
            import matplotlib

            path = os.path.join(os.path.dirname(matplotlib.__file__),
                                "mpl-data", "sample_data", "grace_hopper.jpg")
        elif source == "camera":
            os.environ.setdefault("PYGAME_HIDE_SUPPORT_PROMPT", "1")
            import pygame

            path = os.path.join(os.path.dirname(pygame.__file__),
                                "docs", "generated", "_images",
                                "camera_rgb.jpg")
        elif source == "marble_tile":
            import contextlib
            import io

            with contextlib.redirect_stdout(io.StringIO()):
                import gymnasium_robotics  # prints a version notice

            path = os.path.join(os.path.dirname(gymnasium_robotics.__file__),
                                "envs", "assets", "kitchen_franka",
                                "kitchen_assets", "textures",
                                "white_marble_tile.png")
        else:
            import sklearn

            path = os.path.join(os.path.dirname(sklearn.__file__),
                                "datasets", "images", f"{source}.jpg")
        return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)
    except Exception:
        return None


def _photo_clip(frames: int, size: int) -> Optional[np.ndarray]:
    """Shifted crops of the bundled photo -> a small pan 'clip'."""
    img = photo_image("grace_hopper")
    if img is None:
        return None
    h, w = img.shape[:2]
    if h < size + frames * 4 or w < size:
        return None
    return np.stack([img[4 * t : 4 * t + size, :size] for t in range(frames)])


def photo_clips_multi(
    frames: int = 2,
    size: int = 192,
    max_clips: int = 12,
    source: str = "grace_hopper",
) -> list:
    """Multiple pan clips tiling the eval photo across crops AND scales —
    the round-2 headline rested on ONE 192px crop (VERDICT r2 #6); this
    gives the >=8-sample population behind mean+-std reporting."""
    from PIL import Image

    img = photo_image(source)
    if img is None:
        return []
    clips = []
    for s in (1.0, 0.75, 0.5):
        if s == 1.0:
            a = img
        else:
            im = Image.fromarray(img.astype(np.uint8))
            a = np.asarray(
                im.resize((int(img.shape[1] * s), int(img.shape[0] * s)),
                          Image.LANCZOS), np.float32)
        h, w = a.shape[:2]
        need_h = size + 4 * (frames - 1)
        if h < need_h or w < size:
            continue
        ys = np.unique(np.linspace(0, h - need_h, 2 if s < 1.0 else 3).astype(int))
        xs = np.unique(np.linspace(0, w - size, 2 if s < 1.0 else 3).astype(int))
        for y in ys:
            for x in xs:
                clips.append(np.stack(
                    [a[y + 4 * t : y + 4 * t + size, x : x + size]
                     for t in range(frames)]
                ))
    return clips[:max_clips]


def holdout_clips(frames: int = 4, size: int = 256) -> Dict[str, np.ndarray]:
    """Evaluation families, all float32 [0,255] (N, size, size, 3)."""
    import jax

    from elvis_tpu.train.data import dead_leaves, synthetic_frames

    clips: Dict[str, np.ndarray] = {}
    photo = _photo_clip(frames, size)
    if photo is not None:
        clips["photo"] = photo
    clips["leaves"] = np.asarray(
        dead_leaves(jax.random.PRNGKey(9999), frames, size, size)
    )
    clips["legacy"] = np.asarray(
        synthetic_frames(jax.random.PRNGKey(9998), frames, size, size)
    )
    return clips


def sr_holdout_eval(
    upsample_fn: Callable,
    *,
    frames: int = 4,
    size: int = 256,
    block_size: int = 8,
    with_codec_noise: bool = True,
    max_level: int = 3,
) -> Dict[str, Dict[str, float]]:
    """Compare progressive restore with ``upsample_fn`` vs Lanczos.

    Returns {family: {psnr_lanczos, psnr_neural, dpsnr, ssim_lanczos,
    ssim_neural, dssim}} (+ '_codec'-suffixed families when enabled).
    """
    import jax
    import jax.numpy as jnp

    from elvis_tpu.degrade import adaptive_downsample
    from elvis_tpu.metrics import masked_psnr, masked_ssim
    from elvis_tpu.restore.progressive import lanczos_upsample_2x, progressive_restore
    from elvis_tpu.train.data import codec_noise

    results: Dict[str, Dict[str, float]] = {}

    @jax.jit
    def run_pair(clean, degraded, levels):
        lz = progressive_restore(degraded, levels, block_size,
                                 upsample_fn=lanczos_upsample_2x, max_level=max_level)
        nn = progressive_restore(degraded, levels, block_size,
                                 upsample_fn=upsample_fn, max_level=max_level)
        return (
            masked_psnr(clean, lz).mean(), masked_psnr(clean, nn).mean(),
            masked_ssim(clean, lz).mean(), masked_ssim(clean, nn).mean(),
        )

    for family, clip in holdout_clips(frames, size).items():
        clean = jnp.asarray(clip, dtype=jnp.float32)
        by = size // block_size
        scores = jax.random.uniform(jax.random.PRNGKey(7), (frames, by, by))
        degraded, levels = jax.jit(lambda a, s: adaptive_downsample(a, s, block_size))(
            clean, scores
        )
        variants = {family: degraded}
        if with_codec_noise:
            # fixed-key codec artifacts (bernoulli(0.7) per frame -> most
            # frames carry quantization noise, like pipeline stage 9 inputs)
            variants[family + "_codec"] = codec_noise(
                jax.random.PRNGKey(3), degraded, block_size
            )
        for name, deg in variants.items():
            p_lz, p_nn, s_lz, s_nn = (float(v) for v in run_pair(clean, deg, levels))
            results[name] = {
                "psnr_lanczos": round(p_lz, 3),
                "psnr_neural": round(p_nn, 3),
                "dpsnr": round(p_nn - p_lz, 3),
                "ssim_lanczos": round(s_lz, 4),
                "ssim_neural": round(s_nn, 4),
                "dssim": round(s_nn - s_lz, 4),
            }
    return results


def sr_photo_eval_multi(
    upsample_fn: Callable,
    *,
    frames: int = 2,
    size: int = 192,
    block_size: int = 8,
    max_clips: int = 12,
    source: str = "grace_hopper",
    with_codec_noise: bool = True,
    max_level: int = 3,
) -> Dict[str, float]:
    """Photo dPSNR/dSSIM vs Lanczos as mean+-std over many crops x scales
    of the held-out photo (the population the headline claim now rests
    on). Returns {n, dpsnr_mean, dpsnr_std, dpsnr_min, dssim_mean,
    dssim_std, psnr_lanczos_mean}."""
    import jax
    import jax.numpy as jnp

    from elvis_tpu.degrade import adaptive_downsample
    from elvis_tpu.metrics import masked_psnr, masked_ssim
    from elvis_tpu.restore.progressive import lanczos_upsample_2x, progressive_restore
    from elvis_tpu.train.data import codec_noise

    clips = photo_clips_multi(frames, size, max_clips, source)
    if not clips:
        return {"n": 0}

    @jax.jit
    def run_pair(clean, degraded, levels):
        lz = progressive_restore(degraded, levels, block_size,
                                 upsample_fn=lanczos_upsample_2x, max_level=max_level)
        nn = progressive_restore(degraded, levels, block_size,
                                 upsample_fn=upsample_fn, max_level=max_level)
        return (
            masked_psnr(clean, lz).mean(), masked_psnr(clean, nn).mean(),
            masked_ssim(clean, lz).mean(), masked_ssim(clean, nn).mean(),
        )

    by = size // block_size
    dpsnrs, dssims, lz_psnrs = [], [], []
    for i, clip in enumerate(clips):
        clean = jnp.asarray(clip, dtype=jnp.float32)
        scores = jax.random.uniform(jax.random.PRNGKey(7 + i), (frames, by, by))
        degraded, levels = jax.jit(
            lambda a, s: adaptive_downsample(a, s, block_size)
        )(clean, scores)
        if with_codec_noise:
            degraded = codec_noise(jax.random.PRNGKey(3 + i), degraded, block_size)
        p_lz, p_nn, s_lz, s_nn = (float(v) for v in run_pair(clean, degraded, levels))
        dpsnrs.append(p_nn - p_lz)
        dssims.append(s_nn - s_lz)
        lz_psnrs.append(p_lz)
    dpsnrs, dssims = np.asarray(dpsnrs), np.asarray(dssims)
    return {
        "n": len(clips),
        "dpsnr_mean": round(float(dpsnrs.mean()), 3),
        "dpsnr_std": round(float(dpsnrs.std()), 3),
        "dpsnr_min": round(float(dpsnrs.min()), 3),
        "dssim_mean": round(float(dssims.mean()), 4),
        "dssim_std": round(float(dssims.std()), 4),
        "psnr_lanczos_mean": round(float(np.mean(lz_psnrs)), 3),
    }


def deblur_holdout_eval(
    deblur_fn: Callable,
    *,
    frames: int = 4,
    size: int = 256,
    block_size: int = 8,
    max_rounds: int = 10,
) -> Dict[str, Dict[str, float]]:
    """Compare a deblur restorer against the classical unsharp baseline
    and the blurred input on the same held-out families as
    :func:`sr_holdout_eval`. ``deblur_fn(frames, levels, block_size)``.

    Returns {family: {psnr_blurred, psnr_unsharp, psnr_neural,
    dpsnr_vs_blurred, dpsnr_vs_unsharp, ...ssim}}.
    """
    import jax
    import jax.numpy as jnp

    from elvis_tpu.degrade import adaptive_blur
    from elvis_tpu.metrics import masked_psnr, masked_ssim
    from elvis_tpu.restore.unsharp import restore_blur_unsharp

    results: Dict[str, Dict[str, float]] = {}

    @jax.jit
    def run_all(clean, degraded, levels):
        us = restore_blur_unsharp(degraded, levels, block_size)
        nn = deblur_fn(degraded, levels, block_size)
        return (
            masked_psnr(clean, degraded).mean(), masked_psnr(clean, us).mean(),
            masked_psnr(clean, nn).mean(), masked_ssim(clean, degraded).mean(),
            masked_ssim(clean, us).mean(), masked_ssim(clean, nn).mean(),
        )

    for family, clip in holdout_clips(frames, size).items():
        clean = jnp.asarray(clip, dtype=jnp.float32)
        by = size // block_size
        scores = jax.random.uniform(jax.random.PRNGKey(7), (frames, by, by))
        degraded, levels = jax.jit(
            lambda a, s: adaptive_blur(a, s, block_size, max_rounds)
        )(clean, scores)
        p_in, p_us, p_nn, s_in, s_us, s_nn = (
            float(v) for v in run_all(clean, degraded, levels)
        )
        results[family] = {
            "psnr_blurred": round(p_in, 3),
            "psnr_unsharp": round(p_us, 3),
            "psnr_neural": round(p_nn, 3),
            "dpsnr_vs_blurred": round(p_nn - p_in, 3),
            "dpsnr_vs_unsharp": round(p_nn - p_us, 3),
            "ssim_blurred": round(s_in, 4),
            "ssim_unsharp": round(s_us, 4),
            "ssim_neural": round(s_nn, 4),
        }
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="held-out SR eval vs Lanczos")
    p.add_argument("--ckpt", default="checkpoints/srnet")
    p.add_argument("--model", choices=["srnet", "srnet_compact", "deblur"],
                   default=None, help="defaults from the ckpt dir name")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--json", dest="as_json", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from elvis_tpu.models import DeblurUNet, SRNet, SRNetCompact, srnet_upsample_fn
    from elvis_tpu.models.io import maybe_load_params

    name = args.model or (
        "deblur" if "deblur" in args.ckpt
        else "srnet_compact" if "compact" in args.ckpt else "srnet"
    )
    if name == "deblur":
        model = DeblurUNet()
        params = jax.jit(lambda r, x, m: model.init(r, x, m, 8))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4, 4), jnp.int32),
        )
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.ckpt), params
        )
        res = deblur_holdout_eval(
            lambda f, lv, b: model.apply(params, f, lv, b),
            frames=args.frames, size=args.size,
        )
        if args.as_json:
            print(json.dumps(res, indent=2))
        else:
            for fam, r in res.items():
                print(f"{fam:14s} PSNR blur {r['psnr_blurred']:6.2f} unsharp "
                      f"{r['psnr_unsharp']:6.2f} neural {r['psnr_neural']:6.2f} "
                      f"({r['dpsnr_vs_blurred']:+.2f} vs blur, "
                      f"{r['dpsnr_vs_unsharp']:+.2f} vs unsharp)")
        return 0
    model = SRNetCompact() if name == "srnet_compact" else SRNet()
    params = maybe_load_params(model, args.ckpt, jnp.zeros((1, 32, 32, 3)))
    res = sr_holdout_eval(lambda f: model.apply(params, f),
                          frames=args.frames, size=args.size)
    if args.as_json:
        print(json.dumps(res, indent=2))
    else:
        for fam, r in res.items():
            print(f"{fam:14s} PSNR {r['psnr_lanczos']:6.2f} -> {r['psnr_neural']:6.2f} "
                  f"({r['dpsnr']:+.3f} dB)   SSIM {r['ssim_lanczos']:.4f} -> "
                  f"{r['ssim_neural']:.4f} ({r['dssim']:+.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
