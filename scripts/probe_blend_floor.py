#!/usr/bin/env python3
"""Sweep the warp/PDE blend floor for the HINTED fill (round 5).

With the encoder-side motion hint the bg/hole PSNR is oracle-grade but
fg (the rotating disc) still trails PDE: translation warps misalign on
rotation and the 0.55 alpha floor forces 55% warp weight exactly where
diffusion should take over. Without the hint, lowering the floor traded
bg for fg (docs: floor 0.55 -> 18.03/17.84, 0.0 -> 17.44/18.45); with
the hint the bg alphas are high NATURALLY, so the floor may be free.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_blend_floor.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.diag_inpaint_inversion import build_clip  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from elvis_tpu.codec import calculate_target_bitrate
    from elvis_tpu.codec.dispatch import make_pipeline_codec
    from elvis_tpu.core.blocks import blockwise_reduce, upsample_map
    from elvis_tpu.degrade import apply_selective_removal, stretch_frames
    from elvis_tpu.ops.color import rgb_to_gray
    from elvis_tpu.ops.motion import motion_field_from_hint, motion_hint
    from elvis_tpu.restore.inpaint import (
        restore_removal_diffusion, restore_removal_temporal,
    )
    from elvis_tpu.scoring import removability_scores
    from elvis_tpu.scoring.complexity import texture_energy
    from elvis_tpu.scoring.saliency import get_saliency_fn
    from elvis_tpu.utils.transfer import pull

    b = 8
    clip, offs, fg_disc = build_clip()
    n, h, w = clip.shape[:3]
    fg_pix = jnp.asarray(fg_disc)[..., None]
    clip_j = jnp.asarray(clip).astype(jnp.float32)
    sal_fn = get_saliency_fn("motion_contrast")

    @jax.jit
    def _score(u8):
        f32 = u8.astype(jnp.float32)
        gray = rgb_to_gray(f32)
        sc = texture_energy(gray, b)
        diff = jnp.concatenate([jnp.zeros_like(gray[:1]), gray[1:] - gray[:-1]], 0)
        tc = texture_energy(diff, b)
        sal = sal_fn(f32)
        fg_pool = blockwise_reduce(sal.astype(jnp.float32), b, jnp.mean)
        return removability_scores(sc, tc, fg_pool >= 0.5, alpha=0.5,
                                   smoothing_beta=0.5)

    scores = _score(jnp.asarray(clip))
    shrunk, removal = jax.jit(
        lambda u8, sc: apply_selective_removal(u8, sc, b, 0.25, cooldown=1)
    )(jnp.asarray(clip), scores)
    shrunk = pull(shrunk)
    tb = calculate_target_bitrate(w, h, 30.0, 1.2)
    codec = make_pipeline_codec("nvc", "/tmp/probe_codec_cd1", shrunk.shape[2], h)
    stream = codec.encode(np.asarray(shrunk), target_bitrate=tb,
                          framerate=30.0, gop=30)
    dec = codec.decode(stream)
    stretched = pull(jax.jit(
        lambda f, m: stretch_frames(f, m, b))(jnp.asarray(dec), removal))

    removal_np = np.asarray(removal)
    by, bx = removal_np.shape[1], removal_np.shape[2]
    hole_pix = upsample_map(jnp.asarray(removal_np.astype(bool)), b)[..., None]
    gmv, dev = jax.jit(lambda f: motion_hint(f, b))(jnp.asarray(clip))
    mv_field = jax.jit(
        lambda g, d: motion_field_from_hint(g, d, by, bx))(gmv, dev)

    @jax.jit
    def _split_psnr(out):
        err = (out.astype(jnp.float32) - clip_j) ** 2

        def p(wpix):
            mse = (err * wpix).sum() / jnp.maximum(wpix.sum() * 3, 1.0)
            return 10 * jnp.log10(255.0**2 / mse)

        return (p(hole_pix), p(hole_pix * fg_pix),
                p(hole_pix * (1.0 - fg_pix)), p(jnp.ones_like(hole_pix)))

    def run(name, fn):
        out = jax.jit(fn)(jnp.asarray(stretched), removal)
        hp, fgp, bgp, fp = (float(v) for v in _split_psnr(out))
        print(f"{name:28s} hole {hp:6.2f}  fg {fgp:6.2f}  "
              f"bg {bgp:6.2f}  full {fp:6.2f}", flush=True)

    run("pde", lambda f, m: restore_removal_diffusion(f, m, b))
    for fl in (0.55, 0.4, 0.25, 0.1, 0.0):
        run(f"hinted floor={fl}",
            lambda f, m, fl=fl: restore_removal_temporal(
                f, m, b, window=8, ref_stride=20, motion_field=mv_field,
                blend_floor=fl))
    return 0


if __name__ == "__main__":
    sys.exit(main())
