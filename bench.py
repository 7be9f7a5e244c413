#!/usr/bin/env python3
"""Benchmark: restored frames/sec/chip at 1080p (the north-star metric).

Runs the client-side restoration hot path — the progressive 2x
super-resolution loop with the neural SRNet upsampler at every stage
(reference semantics elvis.py:2522; BASELINE.json north star) — on the
real TPU chip, end to end on device, and reports steady-state throughput.

Baseline anchor: the reference's best practical neural restorer measured
0.46 FPS at 720p on a 48 GB GPU (RealESRGAN row,
DEGRADATION_ABLATION_REPORT.tex:502-526; BASELINE.md). ``vs_baseline`` is
our 1080p fps divided by that 0.46 fps — conservative, since our frames
are 2.25x larger.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from elvis_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from elvis_tpu.degrade import adaptive_downsample
    from elvis_tpu.models import SRNetCompact, srnet_upsample_fn
    from elvis_tpu.restore import progressive_restore

    n, h, w, b = 8, 1080, 1920, 8

    # Structured 1080p clip (moving gradients — representative block stats).
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    clip = np.stack(
        [
            np.clip(
                128 + 80 * np.sin(2 * np.pi * (xx + 40 * t) / 300)
                * np.cos(2 * np.pi * yy / 200),
                0, 255,
            )
            for t in range(n)
        ],
        axis=0,
    )
    frames = jnp.asarray(np.repeat(clip[..., None], 3, -1).astype(np.float32))
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.random((n, h // b, w // b)).astype(np.float32))

    degraded, levels = jax.jit(lambda a, s: adaptive_downsample(a, s, b))(
        frames, scores
    )
    jax.block_until_ready(degraded)

    import os

    # The real-time serving tier (SRNetCompact, the SRVGGNetCompact
    # counterpart); loads trained weights when present. A fresh zero-init
    # model computes identical FLOPs (and exactly reproduces classical
    # progressive-lanczos quality), so the throughput number is stable.
    model = SRNetCompact()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "checkpoints", "srnet_compact")
    if os.path.isdir(ckpt):
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(ckpt, params)
    upsample = srnet_upsample_fn(model, params)
    max_level = int(levels.max())

    # The jitted step returns a scalar checksum alongside the frames: on
    # this runtime block_until_ready can acknowledge before execution
    # completes, so timing forces a (tiny) scalar device->host pull, which
    # cannot resolve until the whole computation ran.
    client = jax.jit(
        lambda d, l: jnp.mean(
            progressive_restore(d, l, b, upsample_fn=upsample, max_level=max_level)
        )
    )
    float(client(degraded, levels))  # compile + run

    iters = 10
    t0 = time.time()
    acc = 0.0
    for _ in range(iters):
        acc += float(client(degraded, levels))
    dt = (time.time() - t0) / iters
    fps = n / dt

    # Quality vs the classical baseline on held-out natural content (the
    # reference's flagship claim shape: trained ESRGAN > Lanczos,
    # DEGRADATION_ABLATION_REPORT.tex:266-287). Photo family = a real
    # photograph the training corpus never contained.
    quality = {}
    try:
        from elvis_tpu.train.evaluate import sr_holdout_eval

        res = sr_holdout_eval(
            upsample, frames=2, size=192, with_codec_noise=False
        ).get("photo")
        if res:
            quality = {
                "photo_dpsnr_db_vs_lanczos": res["dpsnr"],
                "photo_dssim_vs_lanczos": res["dssim"],
            }
        # quality tier (SRNet RRDB, checkpoints/srnet): the slower/better
        # row, reported alongside the serving tier's
        from elvis_tpu.models import SRNet

        qckpt = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "checkpoints", "srnet"
        )
        if os.path.isdir(qckpt):
            import orbax.checkpoint as ocp

            qmodel = SRNet()
            qparams = jax.jit(qmodel.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
            )
            qparams = ocp.StandardCheckpointer().restore(qckpt, qparams)
            qres = sr_holdout_eval(
                lambda f: qmodel.apply(qparams, f),
                frames=2, size=192, with_codec_noise=False,
            ).get("photo")
            if qres:
                quality["quality_tier_photo_dpsnr_db_vs_lanczos"] = qres["dpsnr"]
    except Exception:
        pass  # throughput metric stands alone if eval content is missing

    baseline_fps = 0.46  # reference RealESRGAN @720p on 48GB GPU
    print(
        json.dumps(
            {
                "metric": "neural_progressive_restore_fps_1080p_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline_fps, 2),
                **quality,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
