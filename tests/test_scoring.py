"""Scoring: complexity measures, saliency slot, fusion formula oracles."""

import numpy as np
import jax.numpy as jnp

from elvis_tpu.scoring import (
    importance_scores,
    motion_contrast_saliency,
    removability_scores,
    spatial_temporal_complexity,
)
from elvis_tpu.scoring.saliency import (
    center_prior_saliency,
    get_saliency_fn,
    saliency_to_block_mask,
)


class TestComplexity:
    def test_shapes(self, tiny_video):
        c = spatial_temporal_complexity(jnp.asarray(tiny_video), 8)
        assert c.SC.shape == (5, 6, 8)
        assert c.TC.shape == (5, 6, 8)
        assert float(jnp.abs(c.TC[0]).max()) == 0.0

    def test_flat_blocks_have_low_sc(self):
        """A flat frame has ~zero texture; a noisy one doesn't."""
        flat = jnp.full((1, 16, 16, 3), 128.0)
        noisy = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (1, 16, 16, 3)).astype(np.float32)
        )
        c_flat = spatial_temporal_complexity(flat, 8)
        c_noisy = spatial_temporal_complexity(noisy, 8)
        assert float(c_flat.SC.max()) < 1e-3
        assert float(c_noisy.SC.min()) > 1.0

    def test_static_clip_has_zero_tc(self):
        frame = np.random.default_rng(1).integers(0, 255, (24, 32, 3))
        clip = jnp.asarray(np.stack([frame] * 4).astype(np.float32))
        c = spatial_temporal_complexity(clip, 8)
        assert float(jnp.abs(c.TC).max()) < 1e-3


class TestSaliency:
    def test_center_prior_peak_in_center(self, tiny_video):
        s = np.asarray(center_prior_saliency(jnp.asarray(tiny_video)))
        assert s.shape == (5, 48, 64)
        assert s[0, 24, 32] > s[0, 0, 0]
        assert 0.99 <= s.max() <= 1.0

    def test_motion_contrast_highlights_moving_object(self):
        """A bright square moving over a dark static background should be
        the most salient region."""
        n, h, w = 6, 48, 64
        clip = np.full((n, h, w, 3), 30, dtype=np.float32)
        for t in range(n):
            x0 = 8 + 4 * t
            clip[t, 20:32, x0 : x0 + 12] = 220
        s = np.asarray(motion_contrast_saliency(jnp.asarray(clip)))
        inside = s[3, 20:32, 20:32].mean()
        outside = (s[3].sum() - s[3, 20:32, 20:32].sum()) / (h * w - 144)
        assert inside > 2 * outside

    def test_registry(self):
        assert get_saliency_fn("center_prior") is center_prior_saliency

    def test_block_mask(self):
        sal = jnp.zeros((1, 16, 16)).at[:, :8, :].set(1.0)
        m = np.asarray(saliency_to_block_mask(sal, 8))
        np.testing.assert_array_equal(m[0], [[True, True], [False, False]])


def _oracle_removability(sc, tc, fg_mask, alpha, beta):
    """Direct port of elvis.py:1160-1218 as oracle."""

    def norm(a):
        return (a - a.min()) / (a.max() - a.min() + 1e-8)

    sc, tc = norm(sc), norm(tc)
    out = np.zeros_like(sc)
    out[:-1] = alpha * sc[:-1] + (1 - alpha) * tc[1:]
    out[-1] = sc[-1]
    out[~fg_mask] *= 10.0
    sm = np.zeros_like(out)
    sm[0] = out[0]
    sm[1:] = beta * out[1:] + (1 - beta) * out[:-1]
    return norm(sm)


class TestFusion:
    def test_removability_matches_oracle(self, rng):
        sc = rng.random((4, 3, 5)).astype(np.float32)
        tc = rng.random((4, 3, 5)).astype(np.float32)
        fg = rng.random((4, 3, 5)) > 0.5
        got = np.asarray(
            removability_scores(
                jnp.asarray(sc), jnp.asarray(tc), jnp.asarray(fg), 0.3, 0.7
            )
        )
        want = _oracle_removability(sc.copy(), tc.copy(), fg, 0.3, 0.7)
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert got.min() >= 0 and got.max() <= 1.0 + 1e-6

    def test_background_scores_higher(self, rng):
        sc = rng.random((3, 4, 4)).astype(np.float32) + 0.5
        tc = rng.random((3, 4, 4)).astype(np.float32) + 0.5
        fg = np.zeros((3, 4, 4), dtype=bool)
        fg[:, :2] = True  # top half foreground
        got = np.asarray(
            removability_scores(jnp.asarray(sc), jnp.asarray(tc), jnp.asarray(fg))
        )
        assert got[:, 2:].mean() > got[:, :2].mean()

    def test_importance_per_frame_normalized(self, rng):
        sc = rng.random((4, 3, 5)).astype(np.float32)
        tc = rng.random((4, 3, 5)).astype(np.float32)
        w = rng.random((4, 3, 5)).astype(np.float32)
        got = np.asarray(
            importance_scores(jnp.asarray(sc), jnp.asarray(tc), jnp.asarray(w))
        )
        for i in range(4):
            assert abs(got[i].min()) < 1e-6
            assert abs(got[i].max() - 1.0) < 1e-5

    def test_importance_background_low(self, rng):
        sc = rng.random((3, 4, 4)).astype(np.float32) + 0.5
        tc = rng.random((3, 4, 4)).astype(np.float32) + 0.5
        w = np.ones((3, 4, 4), dtype=np.float32)
        w[:, 2:] = 0.1  # bottom half background
        got = np.asarray(
            importance_scores(jnp.asarray(sc), jnp.asarray(tc), jnp.asarray(w))
        )
        assert got[:, :2].mean() > got[:, 2:].mean()
