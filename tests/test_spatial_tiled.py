"""Single-chip height tiling (pipeline._apply_height_tiled).

The reference runs feathered spatial tiles inside its restore paths at
high resolution (utils.py:176-326). The TPU build's single-chip analog
tiles the frame height with a receptive-field halo so full-res nets
bound their HBM footprint (measured: InpaintNet needs ~1.14 KB/px padded
— 23.7 GB for a 10-frame 1080p window). These tests pin the core claim:
tiled output == untiled output, because the halo covers the net's
receptive field and windows clamp inward at true image borders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elvis_tpu.pipeline.run import (
    _DataParallel,
    _apply_height_tiled,
    _height_tile_plan,
)


def _randomize_tail(params, rng_key):
    """The nets zero-init their output conv (identity fallback); give the
    tail a random kernel so equality tests exercise real feature paths."""
    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    tail = p["params"]["tail"]
    tail["kernel"] = 0.05 * jax.random.normal(
        rng_key, tail["kernel"].shape, tail["kernel"].dtype
    )
    return p


def test_plan_requires_declaration_and_large_frames():
    def fn(f):
        return f

    assert _height_tile_plan(fn, (8, 1080, 1920, 3), 8) is None
    fn.spatial_halo_rows = 16
    # 8 frames @1080p exceeds the 6M-px budget -> plan engages
    halo, win = _height_tile_plan(fn, (8, 1080, 1920, 3), 8)
    assert halo == 16 and win < 1080
    # small frames stay untiled
    assert _height_tile_plan(fn, (8, 48, 64, 3), 8) is None
    # per-backend budget override
    fn.spatial_pixel_budget = 1 << 40
    assert _height_tile_plan(fn, (8, 1080, 1920, 3), 8) is None


def test_inpaint_net_tiled_matches_untiled(rng):
    from elvis_tpu.models import InpaintNet

    net = InpaintNet()
    n, h, w, b = 4, 96, 16, 8
    frames = jnp.asarray(rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((n, h // b, w // b)) < 0.4).astype(np.int8))
    params = net.init(jax.random.PRNGKey(0), frames, mask, b)
    params = _randomize_tail(params, jax.random.PRNGKey(1))

    def fn(f, m):
        return net.apply(params, f, m, b)

    ref = np.asarray(fn(frames, mask))
    # halo 16 >= the net's ~12-row receptive field; win_rows=64 forces
    # tile=32 -> three windows over 96 rows, two of them clamped inward
    out = _apply_height_tiled(fn, [frames, mask], halo=16, win_rows=64)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=0.1)


def test_deblur_unet_tiled_matches_untiled(rng):
    from elvis_tpu.models import DeblurUNet

    net = DeblurUNet()
    n, h, w, b = 2, 256, 16, 8
    frames = jnp.asarray(rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32))
    smap = jnp.asarray(rng.integers(0, 5, (n, h // b, w // b)).astype(np.int32))
    params = net.init(jax.random.PRNGKey(0), frames, smap, b)
    params = _randomize_tail(params, jax.random.PRNGKey(1))

    def fn(f, m):
        return net.apply(params, f, m, b)

    ref = np.asarray(fn(frames, smap))
    # halo 64 >= the 3-level UNet's ~51-row receptive field. Tolerance:
    # a handful of elements differ by <0.2/255 from bf16 rounding under
    # shape-dependent XLA fusion (verified identical at halo 96, so not
    # receptive-field leakage); 0.5 is still below one uint8 LSB.
    out = _apply_height_tiled(fn, [frames, smap], halo=64, win_rows=192)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=0.5)


def test_dataparallel_routes_declared_backends_through_tiling(rng, monkeypatch):
    """dp.apply / dp.apply_temporal (single-chip) honor spatial_halo_rows:
    a local vertical 3-row mean tiled at a tiny forced budget equals the
    direct computation on both the short-clip and chunked long-clip paths."""
    import elvis_tpu.pipeline.run as run_mod

    dp = _DataParallel(enabled=False)
    assert dp.mesh is None
    n, h, w = 20, 64, 16
    # shrink the frame-chunk budget so the 20-frame clip takes the
    # chunked long-clip path (chunk = 8 frames)
    monkeypatch.setattr(run_mod, "_FRAME_CHUNK_PIXEL_BUDGET", 8 * h * w)

    def op(f, m):
        pad = jnp.pad(f, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
        sm = (pad[:, :-2] + pad[:, 1:-1] + pad[:, 2:]) / 3.0
        return sm + 0.0 * m.sum()

    frames = rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)
    mask = (rng.random((n, h // 8, w // 8)) < 0.5).astype(np.int8)
    ref = np.asarray(op(jnp.asarray(frames), jnp.asarray(mask)))

    op.spatial_halo_rows = 8
    # budget below one frame's pixels: apply() shrinks to 1-frame chunks
    # AND row-tiles each frame (the 4K-on-one-chip shape)
    op.spatial_pixel_budget = 32 * w
    out = dp.apply(op, frames, mask)
    np.testing.assert_allclose(out, ref, atol=1e-4)

    out_t = dp.apply_temporal(op, (frames, mask), overlap=2)
    np.testing.assert_allclose(out_t, ref, atol=1e-4)
