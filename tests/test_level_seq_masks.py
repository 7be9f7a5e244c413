"""Level-sequential restore, naive restorers, and external mask loading."""

import numpy as np
import jax.numpy as jnp

from elvis_tpu.degrade import adaptive_downsample
from elvis_tpu.restore import (
    get_restorer,
    level_sequential_restore,
    naive_sr_restore,
)
from elvis_tpu.pipeline.io import load_masks


class TestLevelSequential:
    def test_gathers_matching_level(self, tiny_video, rng):
        """restore_fn stamps its level into the frame; each block must end
        up with the stamp of its own level."""
        frames = jnp.asarray(tiny_video.astype(np.float32))
        levels = jnp.asarray(rng.integers(0, 3, (5, 6, 8)).astype(np.int32))

        def stamp(f, lvl):
            return jnp.full_like(f, float(lvl * 50))

        out = np.asarray(level_sequential_restore(stamp, frames, levels, 8, 2))
        lv = np.asarray(levels)
        for i, j in [(0, 0), (3, 5)]:
            want = tiny_video[0, i * 8, j * 8].astype(np.float32) if lv[0, i, j] == 0 else lv[0, i, j] * 50
            got = out[0, i * 8, j * 8]
            np.testing.assert_allclose(got, want, atol=1e-3)

    def test_level_zero_passthrough(self, tiny_video):
        frames = jnp.asarray(tiny_video.astype(np.float32))
        out = level_sequential_restore(
            lambda f, l: jnp.zeros_like(f), frames, jnp.zeros((5, 6, 8), jnp.int32), 8, 2
        )
        np.testing.assert_allclose(np.asarray(out), tiny_video, atol=1e-3)


class TestNaive:
    def test_naive_sr_shape_and_registration(self, tiny_video, rng):
        frames = jnp.asarray(tiny_video)
        scores = jnp.asarray(rng.random((5, 6, 8)).astype(np.float32))
        degraded, levels = adaptive_downsample(frames, scores, 8)
        out = naive_sr_restore(degraded, levels, 8)
        assert out.shape == frames.shape
        assert get_restorer("downsample", "naive_sr") is naive_sr_restore


class TestExternalMasks:
    def test_load_resize_threshold_carryforward(self, tmp_path):
        from PIL import Image

        m0 = np.zeros((20, 30), np.uint8)
        m0[5:15, 10:20] = 255
        Image.fromarray(m0).save(tmp_path / "00001.png")
        masks = load_masks(str(tmp_path), width=60, height=40, expected_frames=3)
        assert masks.shape == (3, 40, 60)
        assert masks.dtype == bool
        # nearest-resized square present
        assert masks[0, 20, 30]
        assert not masks[0, 0, 0]
        # carry-forward for missing frames 2..3
        np.testing.assert_array_equal(masks[1], masks[0])
        np.testing.assert_array_equal(masks[2], masks[0])

    def test_missing_dir_gives_empty(self):
        masks = load_masks("/nonexistent_dir_xyz", 8, 8, 2)
        assert masks.shape == (2, 8, 8) and not masks.any()
