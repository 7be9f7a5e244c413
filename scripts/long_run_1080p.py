#!/usr/bin/env python3
"""Long-run scale harness: 100+ frames at 1080p through the FULL pipeline
on the real chip with every shipped checkpoint (VERDICT r2 #8; the
reference's own experiments are 82-frame DAVIS clips at scale,
elvis_grid_search.py:21-88).

Content is REAL-PHOTO: a camera pan over a 2x2 mosaic of the bundled
photographs (sklearn's china + flower, matplotlib's grace_hopper, and a
repeat tile), with a textured moving foreground object so saliency/ROI
have a target, plus mild sensor noise. 128 frames, 1920x1080, 30 fps.

Runs the pipeline TWICE in the same experiment dir: the second run
measures StageCache resume behaviour (scoring + all five encode branches
should be cache hits). Publishes a compact results digest to
``docs/long_run_1080p.json``: per-stage wall-clock for both runs,
per-approach quality/bitrate rows, and FVMD cost at length.

Usage:  python scripts/long_run_1080p.py [--frames 128] [--out docs/long_run_1080p.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_clip(frames: int = 128, height: int = 1080, width: int = 1920,
               fps: float = 30.0, seed: int = 0) -> np.ndarray:
    """(N,1080,1920,3) uint8: photo-mosaic pan + moving textured object."""
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
    tiles.append(tiles[0][:, ::-1])  # 4th tile: mirrored china
    canvas = np.concatenate(
        [np.concatenate(tiles[:2], axis=1), np.concatenate(tiles[2:], axis=1)],
        axis=0,
    )  # (1440, 2560, 3)

    slack_y, slack_x = canvas.shape[0] - height, canvas.shape[1] - width
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)

    out = np.empty((frames, height, width, 3), np.uint8)
    for t in range(frames):
        ph = 2 * np.pi * t / frames
        oy = int(slack_y * (0.5 + 0.45 * np.sin(ph)))
        ox = int(slack_x * t / max(frames - 1, 1))
        frame = canvas[oy:oy + height, ox:ox + width].astype(np.float32)
        # Moving foreground disc (the saliency target). The texture is
        # anchored to OBJECT coordinates and rotates slowly (~1.4 px/frame
        # tangential at the rim): a physically-consistent moving object
        # that carries its texture, like the deformable DAVIS foregrounds
        # the reference validates on (reference TECHNICAL_REPORT.md
        # bear.mp4) — r4's disc sampled a static screen-space pattern, a
        # "moving window" no real video contains, which made the
        # motion-compensated fill structurally unable to beat PDE on fg
        # (docs/diag_inpaint_inversion.json, VERDICT r4 weak #4).
        cy = height // 2 + int(0.22 * height * np.sin(2 * ph))
        cx = int(width * (0.2 + 0.6 * t / max(frames - 1, 1)))
        r = 110
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
        out[t] = np.clip(frame, 0, 255).astype(np.uint8)
    return out


def stage_digest(results: dict) -> dict:
    keep = {}
    for k, v in results.get("execution_times_seconds", {}).items():
        keep[k] = round(float(v), 1)
    return keep


def approach_digest(results: dict) -> dict:
    rows = {}
    for name, r in results.items():
        if not isinstance(r, dict) or "foreground" not in r:
            continue
        fg, bg = r["foreground"], r["background"]
        rows[name] = {
            "bitrate_mbps": round(float(r.get("bitrate_mbps", 0.0)), 3),
            "fg_psnr": round(float(fg["psnr_mean"]), 2),
            "bg_psnr": round(float(bg["psnr_mean"]), 2),
            "fg_ssim": round(float(fg["ssim_mean"]), 4),
            "bg_ssim": round(float(bg["ssim_mean"]), 4),
        }
        if np.isfinite(float(fg.get("fvmd", float("nan")))):
            rows[name]["fg_fvmd"] = round(float(fg["fvmd"]), 2)
    return rows


def _make_config(args):
    from elvis_tpu.pipeline.config import ElvisConfig

    clip_path = os.path.join(
        args.workdir, f"clip_{args.frames}f_{args.width}x{args.height}.npy")
    return ElvisConfig(
        reference_video=clip_path,
        width=args.width,
        height=args.height,
        block_size=8,
        max_frames=args.frames,
        framerate_override=30.0,
        codec="nvc",
        experiment_dir=os.path.join(args.workdir, "exp"),
        stage_cache=True,
        enable_fvmd=True,
        verbose=True,
    )


def _run_single_pass(args) -> None:
    """Child-process entry: ONE run_elvis pass -> pass digest JSON.

    Each pass runs in its own process because the axon TPU plugin leaks
    ~25% of every host->device push in host RSS (measured r3: pushes
    leak, pulls don't, malloc_trim doesn't help) — a 128f/1080p pass
    accumulates tens of GB that only process exit returns. Two passes in
    one process OOM-killed the first long-run attempt at 122 GB RSS."""
    import psutil

    from elvis_tpu.pipeline.run import run_elvis

    t0 = time.time()
    results = run_elvis(_make_config(args))
    digest = {
        "total_seconds": round(time.time() - t0, 1),
        "stages": stage_digest(results),
        "approaches": approach_digest(results),
        "peak_rss_gb": round(psutil.Process().memory_info().rss / 1e9, 1),
    }
    with open(args.emit_pass_digest, "w") as f:
        json.dump(digest, f, indent=2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--workdir", default="/tmp/longrun")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "long_run_1080p.json"))
    ap.add_argument("--emit-pass-digest", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.emit_pass_digest:
        _run_single_pass(args)
        return 0

    os.makedirs(args.workdir, exist_ok=True)
    clip_path = os.path.join(
        args.workdir, f"clip_{args.frames}f_{args.width}x{args.height}.npy")
    if not os.path.exists(clip_path):
        t0 = time.time()
        clip = build_clip(args.frames, args.height, args.width)
        np.save(clip_path, clip)
        print(f"[long_run] clip built: {clip.shape} in {time.time()-t0:.1f}s",
              flush=True)

    config = _make_config(args)
    cache_dir = os.path.join(args.workdir, "exp", "stage_cache")
    pre_cached = sorted(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else []

    digest = {
        "clip": {"frames": args.frames, "resolution": f"{args.width}x{args.height}", "fps": 30.0,
                 "content": "photo-mosaic pan (china/flower/grace_hopper) + moving object"},
        # Honest labeling: if a prior (crashed) attempt left stage-cache
        # entries, run 1 resumes them and its stage times are HIT times
        # for those stages, not cold times.
        "pre_existing_stage_cache": pre_cached,
        "config": {"codec": "nvc", "block_size": 8,
                   "sr_backends": config.sr_backends,
                   "deblur_backends": config.deblur_backends,
                   "inpaint_backends": config.inpaint_backends},
    }

    # Each pass runs in a CHILD process (see _run_single_pass: the axon
    # push leak makes a two-pass single process OOM at this scale) and
    # dumps its digest incrementally so a crash in pass 2 keeps pass 1.
    import subprocess

    base_argv = [sys.executable, "-u", os.path.abspath(__file__),
                 "--frames", str(args.frames), "--height", str(args.height),
                 "--width", str(args.width), "--workdir", args.workdir]
    for label in ("cold_run", "resume_run"):
        pass_json = os.path.join(args.workdir, f"pass_{label}.json")
        if os.path.exists(pass_json):
            os.remove(pass_json)
        t0 = time.time()
        proc = subprocess.run(base_argv + ["--emit-pass-digest", pass_json])
        if proc.returncode != 0 or not os.path.exists(pass_json):
            print(f"[long_run] {label} pass FAILED (rc={proc.returncode})",
                  flush=True)
            return 1
        with open(pass_json) as f:
            pd = json.load(f)
        digest[label] = {k: pd[k] for k in
                         ("total_seconds", "stages", "peak_rss_gb")}
        if label == "cold_run":
            digest["approaches"] = pd["approaches"]
        with open(args.out, "w") as f:
            json.dump(digest, f, indent=2)
        print(f"[long_run] {label}: {pd['total_seconds']:.0f}s "
              f"(peak rss {pd['peak_rss_gb']} GB) -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
