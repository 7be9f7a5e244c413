#!/usr/bin/env python3
"""Measure through-loop 1080p fps for candidate SR student architectures
on the real chip — picks the distillation student tier (VERDICT r3 #2:
the quality tier must stop costing 3 forward passes; the student must
hold >= 25 fps at 1080p while matching the ensemble's +1.8 dB).

Usage: python scripts/sr_tier_fps_probe.py [--iters 6]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from elvis_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from elvis_tpu.degrade import adaptive_downsample
    from elvis_tpu.models import SRNet, SRNetCompact
    from elvis_tpu.restore import progressive_restore

    n, h, w, b = 8, 1080, 1920, 8
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    clip = np.stack(
        [np.clip(128 + 80 * np.sin(2 * np.pi * (xx + 40 * t) / 300)
                 * np.cos(2 * np.pi * yy / 200), 0, 255) for t in range(n)]
    )
    frames = jnp.asarray(np.repeat(clip[..., None], 3, -1).astype(np.float32))
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.random((n, h // b, w // b)).astype(np.float32))
    degraded, levels = jax.jit(lambda a, s: adaptive_downsample(a, s, b))(
        frames, scores)
    jax.block_until_ready(degraded)
    max_level = int(levels.max())

    cands = {
        "compact_f128x5": SRNetCompact(),
        "f128x10": SRNetCompact(features=128, num_convs=10),
        "f128x14": SRNetCompact(features=128, num_convs=14),
        "f256x4": SRNetCompact(features=256, num_convs=4),
        "f256x6": SRNetCompact(features=256, num_convs=6),
        "large_f256x8": SRNetCompact(features=256, num_convs=8),
        "rrdb": SRNet(),
    }
    out = {}
    for name, model in cands.items():
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, 64, 3)))
        up = lambda f: model.apply(params, f)  # noqa: E731
        client = jax.jit(lambda d, l: jnp.mean(progressive_restore(
            d, l, b, upsample_fn=up, max_level=max_level)))
        float(client(degraded, levels))  # compile
        vals = []
        for _ in range(args.reps):
            t0 = time.time()
            for _ in range(args.iters):
                float(client(degraded, levels))
            vals.append(n / ((time.time() - t0) / args.iters))
        out[name] = round(float(np.mean(vals)), 2)
        print(f"{name}: {out[name]} fps", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
