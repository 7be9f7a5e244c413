#!/usr/bin/env python3
"""Evaluate an SR checkpoint on every holdout population: the
grace_hopper 12-crop rotation holdout plus the two fully-independent
sources (pygame 'camera', gymnasium_robotics 'marble_tile' — in NO
training rotation). Prints one JSON line per source.

Usage:
  python scripts/eval_sr_checkpoint.py --ckpt /tmp/ckpt_r4/srnet_compact \
      --arch compact [--sources grace_hopper camera marble_tile]
  --arch ensemble evaluates the shipped three-tier ensemble (no --ckpt).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_upsampler(arch: str, ckpt: str | None):
    import jax.numpy as jnp

    from elvis_tpu.models import SRNet, SRNetCompact, SRNetLarge, srnet_upsample_fn
    from elvis_tpu.models.io import load_params

    if arch == "ensemble":
        from elvis_tpu.pipeline.config import ElvisConfig
        from elvis_tpu.restore.backends import _srnet_upsampler

        fn, prov = _srnet_upsampler(ElvisConfig(), which="srnet_ensemble")
        assert fn is not None, "shipped tier checkpoints missing"
        return fn, prov
    if arch == "compact":
        model = SRNetCompact()
    elif arch == "large":
        model = SRNetLarge()
    elif arch == "rrdb":
        model = SRNet()
    elif arch == "student":
        meta = {}
        mp = ckpt.rstrip("/") + ".meta.json"
        if os.path.isfile(mp):
            with open(mp) as fh:
                meta = json.load(fh)
        model = SRNetCompact(features=int(meta.get("features", 128)),
                             num_convs=int(meta.get("num_convs", 10)))
    else:
        raise SystemExit(f"unknown arch {arch}")
    params = load_params(model, os.path.abspath(ckpt), jnp.zeros((1, 16, 16, 3)))
    return srnet_upsample_fn(model, params), f"{arch}:{ckpt}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--arch", default="compact",
                    choices=["compact", "large", "rrdb", "student", "ensemble"])
    ap.add_argument("--sources", nargs="*",
                    default=["grace_hopper", "camera", "marble_tile"])
    ap.add_argument("--size", type=int, default=None,
                    help="crop size override (camera is 320x240 -> 128)")
    args = ap.parse_args()

    from elvis_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from elvis_tpu.train.evaluate import sr_photo_eval_multi

    up, prov = build_upsampler(args.arch, args.ckpt)
    print(f"# {prov}", flush=True)
    for src in args.sources:
        size = args.size or (128 if src == "camera" else 192)
        res = sr_photo_eval_multi(up, source=src, size=size,
                                  with_codec_noise=False)
        print(json.dumps({"source": src, **res}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
