#!/usr/bin/env python3
"""A/B the phase-form (residual-at-input-resolution) SR loop (r5).

VERDICT r4 #3's named lever: stop paying the Lanczos base + f32 tail conv
at OUTPUT resolution inside every SRNet apply. The phase path computes
both on the (N,H,W,2,2,3) pre-interleave tensor and materializes full
res once per stage (models/srnet._TailConv, ops/resize.upsample2x_phases,
restore/progressive phase_fn routing). Same math (tests pin <0.1 abs);
this probe measures what it buys on the real chip at 4K and 1080p.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_phase_4k.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from elvis_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from elvis_tpu.degrade import adaptive_downsample
    from elvis_tpu.models import SRNetCompact
    from elvis_tpu.models.srnet import srnet_upsample_fn
    from elvis_tpu.restore import progressive_restore

    b = 8
    model = SRNetCompact()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 3)))
    up = srnet_upsample_fn(model, params)

    def plain(f):  # the r4 path: no .phase_fn attribute
        return model.apply(params, f.astype(jnp.float32))

    def timed(fn, args, n_frames, iters=5, reps=3):
        # scalar-pull timing (block_until_ready can ack early on axon)
        jax.block_until_ready(fn(*args))
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                float(fn(*args))
            vals.append(n_frames * iters / (time.perf_counter() - t0))
        return round(float(np.median(vals)), 2), round(float(np.std(vals)), 2)

    def device_fps(step, args, n_frames, loop_iters=4, reps=3):
        @jax.jit
        def looped(*a):
            def body(i, acc):
                return acc + step(a[0] + i.astype(jnp.float32) * 1e-12, *a[1:])

            return jax.lax.fori_loop(0, loop_iters, body, jnp.float32(0.0))

        float(looped(*args))
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(looped(*args))
            vals.append(n_frames * loop_iters / (time.perf_counter() - t0))
        return round(float(np.median(vals)), 2)

    rng = np.random.default_rng(0)
    out = {}
    for tag, (hh, ww, n) in (("1080", (1080, 1920, 8)), ("4k", (2160, 3840, 2))):
        yy, xx = np.mgrid[0:hh, 0:ww].astype(np.float32)
        clip = np.stack(
            [np.clip(128 + 80 * np.sin(2 * np.pi * (xx + 40 * t) / 300)
                     * np.cos(2 * np.pi * yy / 200), 0, 255) for t in range(n)])
        frames = jnp.asarray(np.repeat(clip[..., None], 3, -1).astype(np.float32))
        scores = jnp.asarray(rng.random((n, hh // b, ww // b)).astype(np.float32))
        deg, lev = jax.jit(lambda a, s: adaptive_downsample(a, s, b))(
            frames, scores)
        jax.block_until_ready(deg)
        ml = int(lev.max())

        for name, fn in (("plain", plain), ("phase", up)):
            step = lambda d, l, fn=fn: jnp.mean(progressive_restore(
                d, l, b, upsample_fn=fn, max_level=ml))
            f, s = timed(jax.jit(step), (deg, lev), n)
            dfps = device_fps(step, (deg, lev), n)
            out[f"{tag}_{name}_fps"] = f
            out[f"{tag}_{name}_fps_std"] = s
            out[f"{tag}_{name}_device_fps"] = dfps
            print(json.dumps({f"{tag}_{name}": [f, s, dfps]}), flush=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
