#!/usr/bin/env python3
"""Per-pair global-motion accuracy probe (round-5 inpaint inversion).

The diag shows the cumulative estimated pan drifting (est [-133,-97] vs
true [-161,-156] at frame 31 → 2.4 dB of ORACLE headroom unrealized).
This prints, for every consecutive pair of the diag content at the real
cd1 operating point: the true global delta, the estimated per-pair global
median, and the reliable-block count — to localize whether the drift is
bias, outlier pairs, or rounding.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pair_motion.py
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
    from elvis_tpu.ops.motion import block_motion_pyramid
    from elvis_tpu.restore.inpaint import _estimate_hole_motion
    from elvis_tpu.scoring import removability_scores
    from elvis_tpu.scoring.complexity import texture_energy
    from elvis_tpu.scoring.saliency import get_saliency_fn
    from elvis_tpu.utils.transfer import pull

    b = 8
    clip, offs, fg_disc = build_clip()
    n, h, w = clip.shape[:3]
    cum_true = -(offs - offs[0])
    true_delta = np.diff(cum_true, axis=0)  # (N-1, 2) per-pair global

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

    # mirror _estimate_hole_motion internals, instrumented
    frames = jnp.asarray(stretched)
    removed = removal.astype(bool)
    est_b = 2 * b
    luma = rgb_to_gray(frames.astype(jnp.float32))
    valid = 1.0 - upsample_map(removed, b).astype(jnp.float32)

    @jax.jit
    def probe(luma, valid, removed):
        mv, sad = block_motion_pyramid(
            luma[:-1], luma[1:], est_b, 4, levels=3,
            prev_weight=valid[:-1], cur_weight=valid[1:], return_sad=True,
        )
        ey, ex = mv.shape[1], mv.shape[2]
        by, bx = removed.shape[1], removed.shape[2]
        pc = (~removed[:-1]) & (~removed[1:])
        pc_pad = jnp.pad(pc, ((0, 0), (0, 2 * ey - by), (0, 2 * ex - bx)),
                         mode="constant")
        clean_e = pc_pad.reshape(n - 1, ey, 2, ex, 2).all(axis=(2, 4))
        sad_clean = jnp.where(clean_e, sad, jnp.nan)
        med_sad = jnp.nan_to_num(
            jnp.nanmedian(sad_clean, axis=(1, 2), keepdims=True))
        reliable = clean_e & (sad <= 3.0 * med_sad + 2.0)
        masked = jnp.where(reliable[..., None], mv.astype(jnp.float32), jnp.nan)
        gmed_f = jnp.nanmedian(masked, axis=(1, 2))  # (N-1, 2) FLOAT median
        return gmed_f, reliable.sum(axis=(1, 2)), clean_e.sum(axis=(1, 2))

    gmed_f, n_rel, n_clean = (np.asarray(v) for v in probe(luma, valid, removed))
    # full estimator output for comparison (after local arbitration + round)
    full = np.asarray(_estimate_hole_motion(frames, removed, b, 4, 3))
    full_med = np.median(full.reshape(n, -1, 2), axis=1)  # (N,2)

    print(f"{'t':>3} {'true dy,dx':>12} {'gmedF dy,dx':>14} "
          f"{'full dy,dx':>12} {'rel':>5} {'clean':>6}")
    cum_g = np.zeros(2)
    for t in range(n - 1):
        cum_g += gmed_f[t]
        print(f"{t:3d} {true_delta[t][0]:5d},{true_delta[t][1]:5d} "
              f"{gmed_f[t][0]:6.2f},{gmed_f[t][1]:6.2f} "
              f"{full_med[t + 1][0]:5.1f},{full_med[t + 1][1]:5.1f} "
              f"{int(n_rel[t]):5d} {int(n_clean[t]):6d}")
    print(f"cum true {cum_true[-1].tolist()}  cum gmedF {cum_g.round(1).tolist()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
