#!/usr/bin/env python3
"""Break down where 4K progressive-restore time goes (VERDICT r3 #4).

The finisher-width probe (finisher_4k_fps_probe.py) showed narrowing the
final-stage net from f128x5 to f64x5 moves 4K fps only 8.55 -> 9.04 —
conv FLOPs are NOT the wall. Candidate suspects, each timed in
isolation on the real chip:
  dispatch   — per-call tunnel/dispatch latency (tiny jitted op)
  conv_final — serving net alone on the final-stage input (1080p->4K)
  lanczos    — the loop with a pure-resize upsampler (no net at all)
  full       — the shipped serving loop (reference point)
  noinject   — upsample-only loop (no per-stage block re-injection)
  batch4     — full loop, 4 frames per call (amortizes dispatch)

Usage: python scripts/profile_4k_loop.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, args, n_frames, iters=5, reps=2):
    import jax

    jax.block_until_ready(fn(*args))
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fn(*args))
        vals.append(n_frames * iters / (time.perf_counter() - t0))
    return round(float(np.mean(vals)), 2)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from elvis_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from elvis_tpu.degrade import adaptive_downsample
    from elvis_tpu.models import SRNetCompact
    from elvis_tpu.models.srnet import srnet_upsample_fn
    from elvis_tpu.restore import progressive_restore
    from elvis_tpu.restore.progressive import lanczos_upsample_2x

    b = 8
    h4, w4 = 2160, 3840
    out = {}

    # dispatch latency floor
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8, 8))
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(tiny(z))
    out["dispatch_ms_per_call"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 2)

    model = SRNetCompact()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 3)))
    up = srnet_upsample_fn(model, params)

    def clip4(n):
        yy, xx = np.mgrid[0:h4, 0:w4].astype(np.float32)
        c = np.stack(
            [np.clip(128 + 80 * np.sin(2 * np.pi * (xx + 40 * t) / 300)
                     * np.cos(2 * np.pi * yy / 200), 0, 255)
             for t in range(n)])
        return jnp.asarray(np.repeat(c[..., None], 3, -1).astype(np.float32))

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    rng = np.random.default_rng(0)
    n = 2
    frames = clip4(n)
    scores = jnp.asarray(rng.random((n, h4 // b, w4 // b)).astype(np.float32))
    deg, lev = jax.jit(lambda a, s: adaptive_downsample(a, s, b))(
        frames, scores)
    jax.block_until_ready(deg)
    max_level = int(lev.max())

    full = jax.jit(lambda d, l: jnp.mean(progressive_restore(
        d, l, b, upsample_fn=up, max_level=max_level)))
    emit("full_n2", timed(full, (deg, lev), n))

    # async dispatch: enqueue all iters, block once — removes the
    # per-call tunnel round-trip from the measurement (device-throughput
    # view; this is how jax's own docs say to benchmark)
    def timed_async(fn, args, n_frames, iters=8, reps=2):
        jax.block_until_ready(fn(*args))
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            rs = [fn(*args) for _ in range(iters)]
            jax.block_until_ready(rs)
            vals.append(n_frames * iters / (time.perf_counter() - t0))
        return round(float(np.mean(vals)), 2)

    emit("full_n2_async", timed_async(full, (deg, lev), n))

    lz = jax.jit(lambda d, l: jnp.mean(progressive_restore(
        d, l, b, upsample_fn=lanczos_upsample_2x, max_level=max_level)))
    emit("lanczos_loop_n2", timed(lz, (deg, lev), n))

    # conv-only: serving net applied once on the final-stage input
    # resolution (1080p -> 4K), no loop machinery
    half = jax.jit(lambda d: jnp.mean(up(d[:, : h4 // 2, : w4 // 2, :])))
    emit("conv_final_only_n2", timed(half, (deg,), n))
    emit("conv_final_only_n2_async", timed_async(half, (deg,), n))

    # upsample-only loop: same stages, no re-injection selects
    def noinject(d):
        x = d[:, : h4 // 8, : w4 // 8, :]
        for _ in range(3):
            x = up(x)
        return jnp.mean(x)

    emit("noinject_n2", timed(jax.jit(noinject), (deg,), n))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
