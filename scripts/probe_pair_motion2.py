#!/usr/bin/env python3
"""Motion lever A/B (round-5 inpaint inversion, stage 2).

probe_pair_motion.py showed the per-pair global estimates systematically
biased toward ZERO (true dy -8 -> est -5; dx -5 -> est -3/-4): at
0.17 bpp the codec's blocking artifacts are STATIC in screen space, so
the masked SAD has a zero-shift attractor; the 31-step cumulative chain
multiplies the bias into the 2.4 dB oracle gap.

A/Bs two levers on the same cd1 operating point:
  1. masked LOW-PASS of the decoded luma before matching (the static
     artifact grid is high-frequency; the pan content is broadband);
  2. a binary LADDER of direct lag-{2,4,8} global refinements (init from
     the chained shorter-lag trajectory, warp, refine +-3): any (t,s)
     displacement then composes <=3 direct estimates instead of up to
     8 chained ones, and the refine window excludes the zero attractor.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pair_motion2.py
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
    from elvis_tpu.ops.filter import gaussian_blur
    from elvis_tpu.ops.motion import block_motion, block_motion_pyramid
    from elvis_tpu.ops.motion import _warp_by_block_field  # noqa
    from elvis_tpu.scoring import removability_scores
    from elvis_tpu.scoring.complexity import texture_energy
    from elvis_tpu.scoring.saliency import get_saliency_fn
    from elvis_tpu.utils.transfer import pull

    b = 8
    clip, offs, fg_disc = build_clip()
    n, h, w = clip.shape[:3]
    cum_true = -(offs - offs[0])

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

    frames = jnp.asarray(stretched)
    removed = np.asarray(removal).astype(bool)
    removed_j = jnp.asarray(removed)
    est_b = 2 * b
    luma_raw = rgb_to_gray(frames.astype(jnp.float32))
    valid = 1.0 - upsample_map(removed_j, b).astype(jnp.float32)

    @jax.jit
    def masked_blur(luma, valid):
        num = gaussian_blur((luma * valid)[..., None], ksize=7, sigma=1.8)[..., 0]
        den = gaussian_blur(valid[..., None], ksize=7, sigma=1.8)[..., 0]
        return num / jnp.maximum(den, 1e-3)

    def pair_globals(luma, lag, init=None, radius=4, levels=3):
        """Direct global estimate between luma[t-lag] and luma[t].
        Returns (n-lag, 2) float medians over reliable blocks."""
        prev, cur = luma[:-lag], luma[lag:]
        wp_, wc_ = valid[:-lag], valid[lag:]
        m = n - lag
        pc = (~removed_j[:-lag]) & (~removed_j[lag:])
        by, bx = pc.shape[1], pc.shape[2]
        ey, ex = -(-h // est_b), -(-w // est_b)
        pc_pad = jnp.pad(pc, ((0, 0), (0, 2 * ey - by), (0, 2 * ex - bx)))
        clean_e = pc_pad.reshape(m, ey, 2, ex, 2).all(axis=(2, 4))

        if init is None:
            mv, sad = block_motion_pyramid(
                prev, cur, est_b, radius, levels=levels,
                prev_weight=wp_, cur_weight=wc_, return_sad=True)
            base = jnp.zeros((m, 1, 1, 2), jnp.int32)
        else:
            v0 = jnp.round(init).astype(jnp.int32)  # (m,2)
            base = v0[:, None, None, :]
            field = jnp.broadcast_to(base, (m, ey, ex, 2))
            wprev = _warp_by_block_field(prev, field, est_b)
            wwp = _warp_by_block_field(wp_, field, est_b)
            mv, sad = block_motion(wprev, cur, est_b, 3, wwp, wc_,
                                   return_sad=True)
        sad_clean = jnp.where(clean_e, sad, jnp.nan)
        med_sad = jnp.nan_to_num(
            jnp.nanmedian(sad_clean, axis=(1, 2), keepdims=True))
        reliable = clean_e & (sad <= 3.0 * med_sad + 2.0)
        masked = jnp.where(reliable[..., None],
                           (mv + base).astype(jnp.float32), jnp.nan)
        return jnp.nan_to_num(jnp.nanmedian(masked, axis=(1, 2)))

    def ladder(luma):
        g1 = pair_globals(luma, 1)                       # (n-1,2)
        c = jnp.concatenate([jnp.zeros((1, 2)), jnp.cumsum(g1, 0)], 0)
        for lag in (2, 4, 8):
            init = c[lag:] - c[:-lag]                    # (n-lag,2)
            d = pair_globals(luma, lag, init=init)       # direct refine
            # rebuild trajectory: telescoping on this lag, anchored by the
            # previous trajectory for t < lag
            rows = [c[:lag]]
            cn = [np.asarray(v) for v in rows[0]]
            dnp = np.asarray(d)
            for t in range(lag, n):
                cn.append(cn[t - lag] + dnp[t - lag])
            c = jnp.asarray(np.stack(cn))
        return g1, c

    for name, lm in (("raw", luma_raw),
                     ("blur", masked_blur(luma_raw, valid))):
        g1, c = jax.jit(ladder)(lm) if False else ladder(lm)
        g1 = np.asarray(g1)
        c = np.asarray(c)
        cum_g1 = np.concatenate([np.zeros((1, 2)), np.cumsum(g1, 0)])
        e1 = cum_g1 - cum_true
        el = c - cum_true
        print(f"[{name}] chain-only final err {e1[-1].round(1).tolist()} "
              f"max |err| {np.abs(e1).max():.1f}")
        print(f"[{name}] ladder     final err {el[-1].round(1).tolist()} "
              f"max |err| {np.abs(el).max():.1f}")
        # per-lag displacement error for the fill's actual usage (|t-s|<=8)
        for lag in (1, 4, 8):
            derr = (c[lag:] - c[:-lag]) - (cum_true[lag:] - cum_true[:-lag])
            print(f"[{name}]   lag {lag}: mean|disperr| "
                  f"{np.abs(derr).mean(0).round(2).tolist()}  "
                  f"max {np.abs(derr).max():.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
