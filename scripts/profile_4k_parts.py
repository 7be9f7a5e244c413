#!/usr/bin/env python3
"""Roofline anchors for the progressive loop's non-conv machinery at 4K
(VERDICT r3 #4 follow-up). profile_4k_loop.py showed the loop WITHOUT
any net (pure-lanczos upsampler) already costs ~55 ms/frame at 4K —
an order of magnitude above its nominal HBM traffic. Time each piece
in isolation (async dispatch, block once):

  copy_4k      — x + 1 on one 4K f32 frame (HBM roofline anchor)
  lanczos_up   — 1080p -> 4K exact-2x tap upsample
  area_down8   — 4K -> 540p reshape-mean
  inject_where — upsample_map mask + jnp.where at 4K
  mean_4k      — full-frame mean reduce

Usage: python scripts/profile_4k_parts.py
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

    from elvis_tpu.core.blocks import upsample_map
    from elvis_tpu.ops.resize import resize

    b = 8
    h4, w4 = 2160, 3840
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, h4, w4, 3)).astype(np.float32) * 255.0)
    xh = jnp.asarray(
        rng.random((1, h4 // 2, w4 // 2, 3)).astype(np.float32) * 255.0)
    blocks = jnp.asarray(
        rng.random((1, h4 // b, w4 // b)).astype(np.float32) < 0.5)
    jax.block_until_ready((x, xh, blocks))

    def timed_ms(fn, args, iters=10, reps=2):
        jax.block_until_ready(fn(*args))
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            rs = [fn(*args) for _ in range(iters)]
            jax.block_until_ready(rs)
            vals.append((time.perf_counter() - t0) / iters * 1e3)
        return round(float(np.mean(vals)), 2)

    cases = {
        "copy_4k_ms": (jax.jit(lambda a: a + 1.0), (x,)),
        "lanczos_up_ms": (
            jax.jit(lambda a: resize(a, (h4, w4), method="lanczos4")), (xh,)),
        "area_down8_ms": (
            jax.jit(lambda a: resize(a, (h4 // 8, w4 // 8), method="area")),
            (x,)),
        "inject_where_ms": (
            jax.jit(lambda a, c, m: jnp.where(
                upsample_map(m, b)[..., None], a, c)), (x, x + 1.0, blocks)),
        "mean_4k_ms": (jax.jit(lambda a: jnp.mean(a)), (x,)),
    }
    out = {}
    for k, (fn, args) in cases.items():
        out[k] = timed_ms(fn, args)
        print(json.dumps({k: out[k]}), flush=True)
    # effective HBM bandwidth from the copy anchor: read + write of a
    # ~100 MB tensor (~200 MB total traffic)
    gb = 2 * x.size * 4 / 1e9
    out["copy_eff_gbps"] = round(gb / (out["copy_4k_ms"] / 1e3), 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
