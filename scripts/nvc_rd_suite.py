#!/usr/bin/env python3
"""NVC encoder-side RD calibration suite (CPU, hermetic).

Four 12-frame 96x144 synthetic contents spanning the codec's regimes
(textured pan / noisy static / sharp edges / smooth gradient) encoded at
a QP ladder; prints bytes + PSNR per (content, qp). Used to calibrate
encoder-side decisions (mode costs, deadzone offsets, deblock thresholds
— the tables cited in docs/DESIGN.md). A/B a change by running with
``--set name=value`` module-constant overrides, e.g.::

    python scripts/nvc_rd_suite.py --set QUANT_OFFSET_INTRA=0.5 \
        --set QUANT_OFFSET_INTER=0.5          # pre-deadzone baseline

Decoder compatibility is not at stake here (the decoder only dequantizes
the levels the encoder picked); tests/test_codec.py covers that.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def contents(n=12, h=96, w=144, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    clips = {}

    tex = 128 + 60 * np.sin(2 * np.pi * xx / 17) * np.cos(2 * np.pi * yy / 13)
    tex += 30 * np.sin(2 * np.pi * (xx + yy) / 41)
    pan = np.stack([np.roll(tex, (2 * t, 3 * t), axis=(0, 1)) for t in range(n)])
    clips["textured_pan"] = pan

    base = 128 + 40 * np.sin(2 * np.pi * xx / 29)
    noisy = base[None] + rng.normal(0, 12, (n, h, w)).astype(np.float32)
    clips["noisy_static"] = noisy

    edges = np.where((xx // 24 + yy // 24) % 2 == 0, 220.0, 40.0)
    drift = np.stack([np.roll(edges, t // 2, axis=1) for t in range(n)])
    clips["sharp_edges"] = drift

    grad = 40 + 170 * (xx / w) * (yy / h)
    slow = np.stack([grad + 2.0 * t for t in range(n)])
    clips["smooth_gradient"] = slow

    return {
        k: np.clip(v, 0, 255)[..., None].repeat(3, -1).astype(np.uint8)
        for k, v in clips.items()
    }


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qps", type=int, nargs="+", default=[28, 34, 40, 46])
    ap.add_argument("--set", action="append", default=[],
                    help="override a transform-module constant, NAME=FLOAT")
    ap.add_argument("--b-frames", action="store_true")
    ap.add_argument("--multi-ref", action="store_true")
    ap.add_argument("--gop", type=int, default=8,
                    help="intra period (short gop = I-frame-heavy stream)")
    # deblock / spatial intra prediction default ON since round 4;
    # the --no-* switches A/B the r3 behaviour
    ap.add_argument("--no-deblock", dest="deblock", action="store_false")
    ap.add_argument("--no-intra-pred", dest="intra_pred", action="store_false")
    ap.add_argument("--json", default=None, help="also dump rows to this path")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real chip (default: force CPU — the "
                    "env var JAX_PLATFORMS=cpu is ignored on this image, "
                    "jax.config is the only honoured switch)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from elvis_tpu.codec.nvc import codec as nvc
    from elvis_tpu.codec.nvc import transform

    for kv in args.set:
        name, val = kv.split("=", 1)
        assert hasattr(transform, name), name
        setattr(transform, name, float(val) if "." in val or "e" in val
                else type(getattr(transform, name))(float(val)))
    if args.set:
        jax.clear_caches()

    rows = []
    for name, clip in contents().items():
        for qp in args.qps:
            stream = nvc.encode(
                clip, qp=qp, gop=args.gop, me_radius=4,
                b_frames=args.b_frames, multi_ref=args.multi_ref,
                deblock=args.deblock, intra_pred=args.intra_pred,
            )
            dec, _ = nvc.decode(stream)
            rows.append({"content": name, "qp": qp, "bytes": len(stream),
                         "psnr": round(psnr(clip, dec), 3)})
            print(f"{name:16s} qp={qp:2d}  {len(stream):7d} B  "
                  f"{rows[-1]['psnr']:6.2f} dB", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"overrides": args.set, "rows": rows}, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
