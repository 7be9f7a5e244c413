#!/usr/bin/env python3
"""Measure 4K through-loop fps for candidate FINAL-stage finisher nets
(VERDICT r3 #4: serving_tier_fps_4k >= 24). The progressive loop runs
the shipped serving prefix (SRNetCompact f128x5) on every stage except
the last and the candidate on the final 2x stage — exactly the shipped
srnet_4k StagedUpsampler topology — so the fps measured here is the fps
bench.py will report once the finisher trains. Random weights: conv
cost is weight-independent.

Usage: python scripts/finisher_4k_fps_probe.py [--iters 4]
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
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from elvis_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from elvis_tpu.degrade import adaptive_downsample
    from elvis_tpu.models import SRNetCompact
    from elvis_tpu.models.srnet import srnet_upsample_fn
    from elvis_tpu.restore import progressive_restore
    from elvis_tpu.restore.progressive import StagedUpsampler

    n, b = 2, 8
    h4, w4 = 2160, 3840
    yy, xx = np.mgrid[0:h4, 0:w4].astype(np.float32)
    clip = np.stack(
        [np.clip(128 + 80 * np.sin(2 * np.pi * (xx + 40 * t) / 300)
                 * np.cos(2 * np.pi * yy / 200), 0, 255) for t in range(n)]
    )
    frames = jnp.asarray(np.repeat(clip[..., None], 3, -1).astype(np.float32))
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.random((n, h4 // b, w4 // b)).astype(np.float32))
    degraded, levels = jax.jit(lambda a, s: adaptive_downsample(a, s, b))(
        frames, scores)
    jax.block_until_ready(degraded)
    max_level = int(levels.max())

    def make_up(model):
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        return srnet_upsample_fn(model, params)

    prefix = make_up(SRNetCompact())

    cands = {
        "plain_f128x5": None,  # serving net on every stage (r3 baseline)
        "f64x5": SRNetCompact(features=64, num_convs=5),
        "f64x8": SRNetCompact(features=64, num_convs=8),
        "f96x5": SRNetCompact(features=96, num_convs=5),
        "f96x6": SRNetCompact(features=96, num_convs=6),
        "f80x6": SRNetCompact(features=80, num_convs=6),
    }

    out = {}
    for name, cand in cands.items():
        up = prefix if cand is None else StagedUpsampler(prefix, make_up(cand))
        fn = jax.jit(
            lambda d, l, up=up: jnp.mean(
                progressive_restore(d, l, b, upsample_fn=up,
                                    max_level=max_level)))
        float(fn(degraded, levels))  # compile
        vals = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                fn(degraded, levels).block_until_ready()
            vals.append(n * args.iters / (time.perf_counter() - t0))
        out[name] = round(float(np.mean(vals)), 2)
        # per-candidate spread so deltas can be read against the noise
        # floor (bench.py carries value_std for the same reason)
        out[name + "_std"] = round(float(np.std(vals)), 2)
        out[name + "_minmax"] = [round(min(vals), 2), round(max(vals), 2)]
        print(json.dumps({name: out[name], "std": out[name + "_std"],
                          "minmax": out[name + "_minmax"]}), flush=True)

    print(json.dumps({"fps_4k": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
