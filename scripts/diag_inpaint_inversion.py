#!/usr/bin/env python3
"""Diagnose the r4 end-to-end inpainting inversion (VERDICT r4 -> r5 task #1).

In both committed end-to-end artifacts the motion-compensated /neural
inpaint rows LOSE to the trivial PDE fill (docs/long_run_1080p.json:
ELVIS CV2 bg 18.51 dB vs ProPainter 16.10 / E2FGVI 15.85). Prime suspect:
``restore_removal_temporal`` estimates block motion with a hardcoded
``motion_radius=4`` px search, while the long-run pan moves ~5 px/frame
horizontally and up to ~8 px/frame vertically — the per-pair estimate
clamps at the search edge, the cumulative chain diverges, and the warped
fill copies textured photo content from the WRONG place (worse than a
smooth fill, PSNR-wise).

This harness rebuilds the long-run content at reduced crop (identical
px/frame velocities), runs the real shrink->NVC->stretch path, and then
A/Bs the inpaint backends — including an ORACLE variant fed the true
global pan — reporting hole-pixel PSNR and the estimated-vs-true motion
per frame. Run on the real chip:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_inpaint_inversion.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAMES = 32
TOTAL = 128          # pan phase denominator of the committed long run
CROP_H, CROP_W = 448, 768
CROP_Y, CROP_X = 316, 576


def build_clip():
    """First FRAMES frames of the long-run 1080p content, cropped to
    (CROP_H, CROP_W) — pan velocity in px/frame preserved. Returns
    (clip uint8, true window offsets (oy,ox) per frame, fg disc mask)."""
    from PIL import Image
    import matplotlib
    import sklearn

    base = os.path.join(os.path.dirname(sklearn.__file__), "datasets", "images")
    photos = [
        Image.open(os.path.join(base, "china.jpg")).convert("RGB"),
        Image.open(os.path.join(base, "flower.jpg")).convert("RGB"),
        Image.open(os.path.join(
            os.path.dirname(matplotlib.__file__), "mpl-data", "sample_data",
            "grace_hopper.jpg")).convert("RGB"),
    ]
    tile_h, tile_w = 720, 1280
    tiles = [np.asarray(p.resize((tile_w, tile_h), Image.LANCZOS), np.uint8)
             for p in photos]
    tiles.append(tiles[0][:, ::-1])
    canvas = np.concatenate(
        [np.concatenate(tiles[:2], axis=1), np.concatenate(tiles[2:], axis=1)],
        axis=0,
    )
    height, width = 1080, 1920
    slack_y, slack_x = canvas.shape[0] - height, canvas.shape[1] - width
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)

    out = np.empty((FRAMES, CROP_H, CROP_W, 3), np.uint8)
    fg = np.zeros((FRAMES, CROP_H, CROP_W), bool)
    offs = np.zeros((FRAMES, 2), np.int32)
    for t in range(FRAMES):
        ph = 2 * np.pi * t / TOTAL
        oy = int(slack_y * (0.5 + 0.45 * np.sin(ph)))
        ox = int(slack_x * t / max(TOTAL - 1, 1))
        offs[t] = (oy, ox)
        frame = canvas[oy:oy + height, ox:ox + width].astype(np.float32)
        cy = height // 2 + int(0.22 * height * np.sin(2 * ph))
        cx = int(width * (0.2 + 0.6 * t / max(TOTAL - 1, 1)))
        r = 110
        # Object-carried, slowly rotating texture (matches
        # scripts/long_run_1080p.py build_clip — see the comment there).
        ang = 0.0125 * t
        ca, sa = np.cos(ang), np.sin(ang)
        xo, yo = xx - cx, yy - cy
        xr, yr = ca * xo - sa * yo, sa * xo + ca * yo
        obj_tex = np.stack([
            205 + 28 * np.sin(2 * np.pi * (xr + yr) / 23),
            90 + 20 * np.cos(2 * np.pi * xr / 17),
            70 + 15 * np.sin(2 * np.pi * yr / 19),
        ], axis=-1)
        mask = xo ** 2 + yo ** 2 < r * r
        frame = np.where(mask[..., None], obj_tex, frame)
        frame += rng.normal(0, 1.5, frame.shape).astype(np.float32)
        full = np.clip(frame, 0, 255).astype(np.uint8)
        out[t] = full[CROP_Y:CROP_Y + CROP_H, CROP_X:CROP_X + CROP_W]
        fg[t] = mask[CROP_Y:CROP_Y + CROP_H, CROP_X:CROP_X + CROP_W]
    return out, offs, fg


def availability(removal_np, cum_true, b, h, w, window=8):
    """Fraction of removed blocks with >=1 clean ORACLE-warped source in
    +-window frames — the hard ceiling on temporal propagation coverage."""
    rm = removal_np.astype(bool)
    n, by, bx = rm.shape
    avail = np.zeros(rm.shape, bool)
    for t in range(n):
        for d in range(1, window + 1):
            for s in (t - d, t + d):
                if not (0 <= s < n):
                    continue
                disp = cum_true[t] - cum_true[s]
                y0 = np.arange(by)[:, None] * b - disp[0]
                x0 = np.arange(bx)[None, :] * b - disp[1]
                ok = (y0 >= 0) & (y0 + b <= h) & (x0 >= 0) & (x0 + b <= w)
                for qy in (y0 // b, (y0 + b - 1) // b):
                    for qx in (x0 // b, (x0 + b - 1) // b):
                        ok &= ~rm[s, np.clip(qy, 0, by - 1), np.clip(qx, 0, bx - 1)]
                avail[t] |= rm[t] & ok
    return float(avail[rm].mean())


def main():
    import jax
    import jax.numpy as jnp

    from elvis_tpu.codec import calculate_target_bitrate
    from elvis_tpu.codec.dispatch import make_pipeline_codec
    from elvis_tpu.core.blocks import blockwise_reduce, upsample_map
    from elvis_tpu.degrade import apply_selective_removal, stretch_frames
    from elvis_tpu.ops.color import rgb_to_gray
    from elvis_tpu.restore.inpaint import (
        _estimate_hole_motion,
        _propagate_fill,
        restore_removal_diffusion,
        restore_removal_temporal,
    )
    from elvis_tpu.scoring import removability_scores
    from elvis_tpu.scoring.complexity import texture_energy
    from elvis_tpu.scoring.saliency import get_saliency_fn
    from elvis_tpu.utils.transfer import pull

    b = 8
    t0 = time.time()
    clip, offs, fg_disc = build_clip()
    print(f"clip built {clip.shape} in {time.time()-t0:.1f}s", flush=True)
    n, h, w = clip.shape[:3]
    cum_true = -(offs - offs[0])  # window moves +off => content moves -off
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
    tb = calculate_target_bitrate(w, h, 30.0, 1.2)
    results = {}

    for cooldown in (0, 1):
        tag = f"cd{cooldown}"
        shrunk, removal = jax.jit(
            lambda u8, sc: apply_selective_removal(u8, sc, b, 0.25,
                                                   cooldown=cooldown)
        )(jnp.asarray(clip), scores)
        shrunk = pull(shrunk)
        removal_np = np.asarray(removal)
        av = availability(removal_np, cum_true, b, h, w)
        print(f"[{tag}] removed {removal_np.mean()*100:.1f}% of blocks; "
              f"holes with a clean oracle source in +-8: {av*100:.0f}%",
              flush=True)
        results[f"{tag}_source_availability"] = round(av, 3)

        codec = make_pipeline_codec("nvc", f"/tmp/diag_codec_{tag}",
                                    shrunk.shape[2], h)
        t0 = time.time()
        stream = codec.encode(np.asarray(shrunk), target_bitrate=tb,
                              framerate=30.0, gop=30)
        dec = codec.decode(stream)
        mbps = len(stream) * 8 * 30 / n / 1e6
        print(f"[{tag}] nvc roundtrip {time.time()-t0:.1f}s, {mbps:.2f} Mbps",
              flush=True)
        results[f"{tag}_mbps"] = round(mbps, 3)
        stretched = pull(jax.jit(
            lambda f, m: stretch_frames(f, m, b))(jnp.asarray(dec), removal))

        hole_pix = upsample_map(jnp.asarray(removal_np.astype(bool)), b)[..., None]

        @jax.jit
        def _split_psnr(out, hole_pix=hole_pix):
            err = (out.astype(jnp.float32) - clip_j) ** 2

            def p(wpix):
                mse = (err * wpix).sum() / jnp.maximum(wpix.sum() * 3, 1.0)
                return 10 * jnp.log10(255.0**2 / mse)

            return (p(hole_pix), p(hole_pix * fg_pix),
                    p(hole_pix * (1.0 - fg_pix)), p(jnp.ones_like(hole_pix)))

        def run(name, fn, stretched=stretched, removal=removal,
                _split_psnr=_split_psnr, tag=tag):
            t0 = time.time()
            out = jax.jit(fn)(jnp.asarray(stretched), removal)
            hp, fgp, bgp, fp = (float(v) for v in _split_psnr(out))
            results[f"{tag} {name}"] = {
                "hole_psnr": round(hp, 2), "fg_hole_psnr": round(fgp, 2),
                "bg_hole_psnr": round(bgp, 2), "full_psnr": round(fp, 2),
                "seconds": round(time.time() - t0, 1),
            }
            print(f"[{tag}] {name:32s} hole {hp:6.2f}  fg {fgp:6.2f}  "
                  f"bg {bgp:6.2f}  full {fp:6.2f}", flush=True)

        run("pde_diffusion (ELVIS CV2)",
            lambda f, m: restore_removal_diffusion(f, m, b))
        run("temporal PYRAMID masked (r5)",
            lambda f, m: restore_removal_temporal(f, m, b, window=8,
                                                  ref_stride=20))
        # Encoder-side motion hint (the r5 pipeline default): pristine-
        # frame motion shipped in the mask sidecar (ops.motion.motion_hint)
        from elvis_tpu.ops.motion import motion_field_from_hint, motion_hint

        by, bx = removal_np.shape[1], removal_np.shape[2]
        gmv, dev = jax.jit(lambda f: motion_hint(f, b))(jnp.asarray(clip))
        mv_field = jax.jit(
            lambda g, d: motion_field_from_hint(g, d, by, bx))(gmv, dev)
        results[f"{tag}_hint_bytes"] = int(
            np.asarray(gmv).nbytes + np.asarray(dev).nbytes)
        run("temporal HINTED (r5 default)",
            lambda f, m: restore_removal_temporal(f, m, b, window=8,
                                                  ref_stride=20,
                                                  motion_field=mv_field))
        if cooldown == 1:
            run("temporal zero-motion",
                lambda f, m: restore_removal_temporal(f, m, b, window=8,
                                                      ref_stride=20,
                                                      motion_radius=0))
            by, bx = removal_np.shape[1], removal_np.shape[2]
            pair_true = np.concatenate(
                [np.zeros((1, 2)), np.diff(np.asarray(cum_true), axis=0)])
            mv_oracle = jnp.broadcast_to(
                jnp.asarray(pair_true, jnp.float32)[:, None, None, :],
                (n, by, bx, 2))
            run("temporal ORACLE pan",
                lambda f, m: _propagate_fill(f, m.astype(bool), mv_oracle,
                                             b, 8, 60, ref_stride=20))
            est = np.asarray(jax.jit(lambda f, m: jnp.median(
                jnp.cumsum(_estimate_hole_motion(f, m.astype(bool), b, 4, 3),
                           axis=0).reshape(n, -1, 2), axis=1)
            )(jnp.asarray(stretched), removal))
            results["motion"] = {
                "true_last": cum_true[-1].tolist(),
                "est_masked_pyramid_last": est[-1].tolist(),
            }
            print(f"[{tag}] cum motion at frame {n-1}: true "
                  f"{cum_true[-1].tolist()} est {est[-1].tolist()}", flush=True)

    out_path = os.path.join(REPO, "docs", "diag_inpaint_inversion.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwritten {out_path}", flush=True)


if __name__ == "__main__":
    main()
