"""Scale-factor downsample variant + video strength-map sidecar."""

import numpy as np
import jax.numpy as jnp

from elvis_tpu.codec.sidecar import (
    decode_strength_maps_video,
    encode_strength_maps_video,
)
from elvis_tpu.degrade.adaptive import adaptive_downsample_scale
from elvis_tpu.ops.resize import resize_matrix


def _oracle_scale_variant(frame, importance, b, max_scale):
    """utils.py:1101-1168 ported with this framework's resize matrices."""
    by, bx = importance.shape
    inv = 1 - importance
    bins = np.clip(np.floor(inv * max_scale).astype(np.int32), 0, max_scale - 1)
    smap = np.where(bins == 0, 0, bins + 1)
    out = frame.astype(np.float64).copy()
    for i in range(by):
        for j in range(bx):
            s = smap[i, j]
            if s == 0:
                continue
            blk = frame[i * b : (i + 1) * b, j * b : (j + 1) * b].astype(np.float64)
            small = max(1, b // s)
            d = resize_matrix(small, b, "area")
            u = resize_matrix(b, small, "linear")
            y = np.einsum("oh,hwc->owc", d, blk)
            y = np.einsum("pw,hwc->hpc", d, y)
            y = np.einsum("oh,hwc->owc", u, y)
            y = np.einsum("pw,hwc->hpc", u, y)
            out[i * b : (i + 1) * b, j * b : (j + 1) * b] = y
    return out, smap


class TestScaleVariant:
    def test_matches_oracle(self, tiny_video, rng):
        b, ms = 8, 4
        imp = rng.random((5, 6, 8)).astype(np.float32)
        frames = jnp.asarray(tiny_video.astype(np.float32))
        got, smap = adaptive_downsample_scale(frames, jnp.asarray(imp), b, ms)
        for i in range(2):
            want, want_map = _oracle_scale_variant(tiny_video[i], imp[i], b, ms)
            np.testing.assert_array_equal(np.asarray(smap[i]), want_map)
            np.testing.assert_allclose(np.asarray(got[i]), want, atol=1e-2)

    def test_scale_values(self, rng):
        """Map values are 0 or 2..max_scale, never 1 (utils.py:1148)."""
        frames = jnp.asarray((rng.random((2, 32, 32, 3)) * 255).astype(np.float32))
        imp = jnp.asarray(rng.random((2, 4, 4)).astype(np.float32))
        _, smap = adaptive_downsample_scale(frames, imp, 8, 5)
        vals = set(np.unique(np.asarray(smap)))
        assert 1 not in vals
        assert vals <= {0, 2, 3, 4, 5}

    def test_high_importance_untouched(self, tiny_video):
        frames = jnp.asarray(tiny_video.astype(np.float32))
        out, smap = adaptive_downsample_scale(frames, jnp.ones((5, 6, 8)), 8, 4)
        assert int(jnp.max(smap)) == 0
        np.testing.assert_allclose(np.asarray(out), tiny_video, atol=1e-3)

    def test_scale_lanczos_restore(self, tiny_video, rng):
        """restore_downsample_scale_lanczos (reference utils.py:1253-1314):
        per degraded block, re-simulate the area downscale to b//s then
        Lanczos-4 up; untouched (scale 0) blocks pass through."""
        from elvis_tpu.restore.lanczos import restore_downsample_scale_lanczos

        b, ms = 8, 4
        imp = jnp.asarray(rng.random((5, 6, 8)).astype(np.float32))
        frames = jnp.asarray(tiny_video.astype(np.float32))
        degraded, smap = adaptive_downsample_scale(frames, imp, b, ms)
        restored = np.asarray(restore_downsample_scale_lanczos(degraded, smap, b, ms))

        sm = np.asarray(smap)
        dg = np.asarray(degraded, np.float64)
        for t, i, j in [(0, 0, 0), (1, 2, 3), (4, 4, 7), (2, 1, 5)]:
            blk = dg[t, i * b:(i + 1) * b, j * b:(j + 1) * b]
            s = int(sm[t, i, j])
            if s == 0:
                want = blk
            else:
                small = max(1, b // s)
                d = resize_matrix(small, b, "area")
                u = resize_matrix(b, small, "lanczos4")
                y = np.einsum("oh,hwc->owc", d, blk)
                y = np.einsum("pw,hwc->hpc", d, y)
                y = np.einsum("oh,hwc->owc", u, y)
                y = np.einsum("pw,hwc->hpc", u, y)
                want = y
            np.testing.assert_allclose(
                restored[t, i * b:(i + 1) * b, j * b:(j + 1) * b],
                want, atol=2e-2,
            )


class TestVideoSidecar:
    def test_roundtrip_lossy_but_close(self, rng):
        maps = rng.integers(0, 4, (6, 12, 16)).astype(np.uint8)
        stream, lo, hi = encode_strength_maps_video(maps)
        assert (lo, hi) == (0.0, 3.0)
        back = decode_strength_maps_video(stream, lo, hi)
        assert back.shape == maps.shape
        # lossy video coding: allow small level errors, most exact
        assert (back == maps).mean() > 0.7
        assert np.abs(back.astype(int) - maps.astype(int)).max() <= 1
