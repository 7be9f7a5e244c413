#!/usr/bin/env python3
"""Pinpoint the fg (rotating disc) inpaint gap (round 5).

Three questions, answered on the cd1 operating point:
  1. Is the hinted motion FIELD right on the disc? (per-block hint vs
     analytic truth: pan + rotation velocity field)
  2. What is the pure-warp ceiling on fg holes? (blend floor = 1)
  3. What could an ORACLE per-block warp/PDE choice achieve? (pick the
     truly-better side per hole block — diagnostic upper bound for the
     blend's alpha)

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fg_diag.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.diag_inpaint_inversion import (  # noqa: E402
    CROP_H, CROP_W, CROP_X, CROP_Y, FRAMES, TOTAL, build_clip,
)


def true_motion_field(offs, by, bx, b):
    """Analytic per-pair motion (N,By,Bx,2): pan everywhere, pan+rotation
    +translation on the disc (mirrors build_clip's generator)."""
    n = offs.shape[0]
    height, width = 1080, 1920
    yy = (np.arange(by) * b + b / 2)[None, :, None] + CROP_Y
    xx = (np.arange(bx) * b + b / 2)[None, None, :] + CROP_X
    field = np.zeros((n, by, bx, 2), np.float32)
    for t in range(1, n):
        pan = -(offs[t] - offs[t - 1])
        ph = 2 * np.pi * t / TOTAL
        cy = height // 2 + int(0.22 * height * np.sin(2 * ph))
        cx = int(width * (0.2 + 0.6 * t / max(TOTAL - 1, 1)))
        ph0 = 2 * np.pi * (t - 1) / TOTAL
        cy0 = height // 2 + int(0.22 * height * np.sin(2 * ph0))
        cx0 = int(width * (0.2 + 0.6 * (t - 1) / max(TOTAL - 1, 1)))
        # disc blocks: center translation + rotation about the center
        dy_c, dx_c = cy - cy0, cx - cx0
        ang = 0.0125
        yo, xo = yy - cy, xx - cx
        rot_dy = ang * xo  # d/dt of rotation: (dy,dx) ~ (w*xo, -w*yo)
        rot_dx = -ang * yo
        on_disc = (yo**2 + xo**2) < 110**2
        field[t, ..., 0] = np.where(on_disc[0], dy_c + rot_dy[0], pan[0])
        field[t, ..., 1] = np.where(on_disc[0], dx_c + rot_dx[0], pan[1])
    return field


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
    mv_field = np.asarray(jax.jit(
        lambda g, d: motion_field_from_hint(g, d, by, bx))(gmv, dev))

    # Q1: hint vs analytic truth, disc vs bg
    truef = true_motion_field(offs, by, bx, b)
    disc_b = np.zeros((n, by, bx), bool)
    for t in range(n):
        db = fg_disc[t].reshape(by, b, bx, b).mean(axis=(1, 3)) > 0.5
        disc_b[t] = db
    err = np.abs(mv_field - truef)
    print(f"field err bg  : mean {err[1:][~disc_b[1:]].mean():.2f} px  "
          f"p95 {np.percentile(err[1:][~disc_b[1:]], 95):.2f}")
    print(f"field err disc: mean {err[1:][disc_b[1:]].mean():.2f} px  "
          f"p95 {np.percentile(err[1:][disc_b[1:]], 95):.2f}", flush=True)
    # nonzero-dev coverage of the disc
    devnz = (np.abs(np.asarray(dev)).max(-1) > 0)
    print(f"dev nonzero frac: {devnz.mean():.3f}", flush=True)

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
        return np.asarray(out)

    pde = run("pde", lambda f, m: restore_removal_diffusion(f, m, b))
    warp = run("hinted PURE WARP (floor=1)",
               lambda f, m: restore_removal_temporal(
                   f, m, b, window=8, ref_stride=20,
                   motion_field=jnp.asarray(mv_field), blend_floor=1.0))
    run("TRUE field blend (default)",
        lambda f, m: restore_removal_temporal(
            f, m, b, window=8, ref_stride=20,
            motion_field=jnp.asarray(truef)))
    blend = run("hinted blend (default)",
                lambda f, m: restore_removal_temporal(
                    f, m, b, window=8, ref_stride=20,
                    motion_field=jnp.asarray(mv_field)))

    # Q3: oracle per-block choice between pure warp and pde
    errw = ((warp.astype(np.float32) - np.asarray(clip_j)) ** 2).mean(-1)
    errp = ((pde.astype(np.float32) - np.asarray(clip_j)) ** 2).mean(-1)
    ew_b = errw.reshape(n, by, b, bx, b).mean(axis=(2, 4))
    ep_b = errp.reshape(n, by, b, bx, b).mean(axis=(2, 4))
    pick_warp = (ew_b <= ep_b)[:, :, :, None]
    pick_pix = np.repeat(np.repeat(pick_warp, b, 1), b, 2)
    oracle = np.where(pick_pix, warp, pde)
    hp, fgp, bgp, fp = (float(v) for v in _split_psnr(jnp.asarray(oracle)))
    print(f"{'ORACLE per-block pick':28s} hole {hp:6.2f}  fg {fgp:6.2f}  "
          f"bg {bgp:6.2f}  full {fp:6.2f}", flush=True)
    hole_f = removal_np.astype(bool) & disc_b
    print(f"fg holes: warp better on {float((ew_b <= ep_b)[hole_f].mean()):.2f} "
          f"of blocks", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
