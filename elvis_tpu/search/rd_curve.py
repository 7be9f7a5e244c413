"""Rate-distortion curve sweep: quality vs bitrate per approach.

The reference's central analysis is the quality-curve harness — PSNR/SSIM
vs bitrate per method (BASELINE.json north star; notebook scatter plots).
This tool sweeps the built-in codec's QP ladder for each approach and
emits the curve data (JSON) + an optional figure, without running the
full pipeline per point (degradation maps are computed once; only the
encode/restore ends move along the ladder).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

__all__ = ["rd_sweep", "main"]


def rd_sweep(
    source: str = "synthetic://moving?frames=12",
    width: int = 256,
    height: int = 192,
    block_size: int = 8,
    qps: tuple = (20, 26, 32, 38, 44),
    out_json: Optional[str] = None,
) -> Dict[str, List[Dict]]:
    import jax
    import jax.numpy as jnp

    from elvis_tpu.codec import NvcCodec
    from elvis_tpu.codec.sidecar import encode_strength_maps
    from elvis_tpu.core.blocks import blockwise_reduce
    from elvis_tpu.degrade import adaptive_blur, adaptive_downsample
    from elvis_tpu.metrics import masked_psnr, masked_ssim
    from elvis_tpu.pipeline.io import load_clip
    from elvis_tpu.restore import restore_blur_unsharp, restore_downsample_lanczos
    from elvis_tpu.restore.progressive import progressive_restore
    from elvis_tpu.scoring import (
        get_saliency_fn,
        importance_scores,
        removability_scores,
        spatial_temporal_complexity,
    )
    from elvis_tpu.scoring.saliency import saliency_to_block_mask

    frames_np, fps = load_clip(source, width, height)
    n = frames_np.shape[0]
    duration = n / fps
    x = jnp.asarray(frames_np).astype(jnp.float32)

    comp = spatial_temporal_complexity(x, block_size)
    sal = get_saliency_fn("motion_contrast")(x)
    fg_block = saliency_to_block_mask(sal, block_size)
    scores = removability_scores(comp.SC, comp.TC, fg_block)
    fg_frac = blockwise_reduce((sal >= 0.5).astype(jnp.float32), block_size, jnp.mean)
    imp = importance_scores(comp.SC, comp.TC, (fg_frac > 0.1).astype(jnp.float32))

    down_frames, down_levels = adaptive_downsample(x, scores, block_size)
    blur_frames, blur_levels = adaptive_blur(x, scores, block_size)
    # Charge each degraded approach the ACTUAL compressed sidecar size the
    # pipeline ships (not an assumed ratio), so RD comparisons are honest.
    down_sidecar_bytes = len(encode_strength_maps(np.asarray(down_levels).astype(np.uint8)))
    blur_sidecar_bytes = len(encode_strength_maps(np.asarray(blur_levels).astype(np.uint8)))
    dqp_f = (1.0 - np.asarray(imp)) * 30.0 - 15.0
    dqp_f -= dqp_f.mean(axis=(1, 2), keepdims=True)
    dqp = np.clip(np.round(dqp_f), -14, 14).astype(np.int8)

    codec = NvcCodec()

    def quality(dec) -> Dict[str, float]:
        d = jnp.asarray(dec).astype(jnp.float32)
        return {
            "psnr": float(masked_psnr(x, d).mean()),
            "ssim": float(masked_ssim(x, d).mean()),
        }

    curves: Dict[str, List[Dict]] = {}

    def add(label, qp, stream, dec, extra_bytes=0):
        point = {"qp": qp, "kbps": (len(stream) + extra_bytes) * 8 / duration / 1000}
        point.update(quality(dec))
        curves.setdefault(label, []).append(point)

    for qp in qps:
        s = codec.encode(frames_np, qp=qp, framerate=fps)
        dec, _ = codec.decode(s)
        add("Baseline", qp, s, dec)

        s_roi = codec.encode(frames_np, qp=qp, framerate=fps, roi_delta_qp=dqp)
        dec_roi, _ = codec.decode(s_roi)
        add("PRESLEY QP", qp, s_roi, dec_roi)

        s_dn = codec.encode(np.asarray(down_frames).astype(np.uint8), qp=qp, framerate=fps)
        dn_dec, _ = codec.decode(s_dn)
        restored = progressive_restore(
            jnp.asarray(dn_dec), down_levels, block_size,
            max_level=int(down_levels.max()),
        )
        add("PRESLEY RealESRGAN", qp, s_dn, restored, extra_bytes=down_sidecar_bytes)
        add("PRESLEY Lanczos", qp, s_dn,
            restore_downsample_lanczos(jnp.asarray(dn_dec), down_levels, block_size),
            extra_bytes=down_sidecar_bytes)

        s_bl = codec.encode(np.asarray(blur_frames).astype(np.uint8), qp=qp, framerate=fps)
        bl_dec, _ = codec.decode(s_bl)
        add("PRESLEY Unsharp", qp, s_bl,
            restore_blur_unsharp(jnp.asarray(bl_dec), blur_levels, block_size),
            extra_bytes=blur_sidecar_bytes)

    if out_json:
        with open(out_json, "w") as f:
            json.dump(curves, f, indent=2)
    return curves


def plot_curves(curves: Dict[str, List[Dict]], out_png: str, metric: str = "psnr"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for label, pts in curves.items():
        pts = sorted(pts, key=lambda p: p["kbps"])
        ax.plot([p["kbps"] for p in pts], [p[metric] for p in pts],
                marker="o", ms=3, label=label)
    ax.set_xlabel("kbps")
    ax.set_ylabel(metric.upper())
    ax.set_xscale("log")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="RD-curve sweep")
    p.add_argument("--source", default="synthetic://moving?frames=12")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--qps", type=str, default="20,26,32,38,44")
    p.add_argument("--out-json", default="rd_curves.json")
    p.add_argument("--out-png", default=None)
    args = p.parse_args(argv)
    curves = rd_sweep(
        args.source, args.width, args.height,
        qps=tuple(int(q) for q in args.qps.split(",")),
        out_json=args.out_json,
    )
    if args.out_png:
        plot_curves(curves, args.out_png)
    for label, pts in curves.items():
        for pt in sorted(pts, key=lambda x: x["kbps"]):
            print(f"{label:22s} qp={pt['qp']:2d} {pt['kbps']:8.1f} kbps "
                  f"PSNR {pt['psnr']:.2f} SSIM {pt['ssim']:.4f}")


if __name__ == "__main__":
    main()
