"""Degradation ops vs NumPy oracles implementing the reference semantics."""

import numpy as np
import jax.numpy as jnp

from elvis_tpu.degrade import (
    adaptive_blur,
    adaptive_downsample,
    apply_selective_removal,
    dct_dampen,
    stretch_frames,
)
from elvis_tpu.degrade.shrink import plan_shrink, shrink_video, stretch_video
from elvis_tpu.ops.filter import gaussian_blur
from elvis_tpu.ops.resize import resize_matrix


def _oracle_downsample(image, scores, b):
    """Reference elvis.py:2141-2169 semantics, per-block NumPy loop."""
    h, w, c = image.shape
    by, bx = h // b, w // b
    levels = np.round(scores * int(np.log2(b))).astype(np.int32)
    out = image.astype(np.float64).copy()
    for i in range(by):
        for j in range(bx):
            lvl = levels[i, j]
            if lvl == 0:
                continue
            blk = image[i * b : (i + 1) * b, j * b : (j + 1) * b].astype(np.float64)
            small = max(1, b // (2**lvl))
            a_down = resize_matrix(small, b, "area")
            a_up = resize_matrix(b, small, "linear")
            d = np.einsum("oh,hwc->owc", a_down, blk)
            d = np.einsum("pw,hwc->hpc", a_down, d)
            u = np.einsum("oh,hwc->owc", a_up, d)
            u = np.einsum("pw,hwc->hpc", a_up, u)
            out[i * b : (i + 1) * b, j * b : (j + 1) * b] = u
    return out, levels


class TestAdaptiveDownsample:
    def test_matches_oracle(self, tiny_video, rng):
        b = 8
        frames = jnp.asarray(tiny_video[:2].astype(np.float32))
        scores = rng.random((2, 6, 8)).astype(np.float32)
        got, got_levels = adaptive_downsample(frames, jnp.asarray(scores), b)
        for i in range(2):
            want, want_levels = _oracle_downsample(tiny_video[i], scores[i], b)
            np.testing.assert_array_equal(np.asarray(got_levels[i]), want_levels)
            np.testing.assert_allclose(np.asarray(got[i]), want, atol=1e-2)

    def test_zero_scores_identity(self, tiny_video):
        frames = jnp.asarray(tiny_video)
        out, levels = adaptive_downsample(frames, jnp.zeros((5, 6, 8)), 8)
        np.testing.assert_array_equal(np.asarray(out), tiny_video)
        assert int(jnp.max(levels)) == 0


class TestAdaptiveBlur:
    def test_matches_per_block_blur(self, tiny_video):
        b = 8
        frames = jnp.asarray(tiny_video[:1].astype(np.float32))
        # Constant score 0.3 -> 3 rounds everywhere
        scores = jnp.full((1, 6, 8), 0.3)
        got, levels = adaptive_blur(frames, scores, b)
        assert int(levels[0, 0, 0]) == 3
        # Oracle: blur the block tensor 3 times with within-block borders
        from elvis_tpu.core.blocks import combine_blocks, split_into_blocks

        blocks = split_into_blocks(frames, b)
        for _ in range(3):
            blocks = gaussian_blur(blocks, 5, 1.0, h_axis=-3, w_axis=-2)
        want = combine_blocks(blocks)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    def test_block_independence(self, tiny_video):
        """Blurring one block must not leak into neighbours (per-block
        borders like the reference, not whole-frame convolution)."""
        b = 8
        frames = jnp.asarray(tiny_video[:1].astype(np.float32))
        scores = jnp.zeros((1, 6, 8)).at[0, 2, 3].set(1.0)
        got, _ = adaptive_blur(frames, scores, b)
        diff = np.abs(np.asarray(got) - tiny_video[:1].astype(np.float32))
        changed = diff.reshape(1, 6, b, 8, b, 3).max(axis=(2, 4, 5))
        assert changed[0, 2, 3] > 0.5
        changed[0, 2, 3] = 0
        assert changed.max() < 1e-4


def _oracle_selective_removal(image, frame_scores, b, shrink_amount):
    """Reference elvis.py:1387-1427 ported as the oracle."""
    by, bx = frame_scores.shape
    k = int(shrink_amount * bx) if shrink_amount < 1.0 else int(shrink_amount)
    k = min(k, bx)
    mask = np.zeros((by, bx), dtype=np.int8)
    kept_rows = []
    blocks = image.reshape(by, b, bx, b, 3).swapaxes(1, 2)
    for j in range(by):
        idx = np.argsort(-frame_scores[j], kind="stable")[:k]
        mask[j, idx] = 1
        kept = blocks[j, np.where(mask[j] == 0)[0]]
        kept_rows.append(kept)
    kept_blocks = np.stack(kept_rows, axis=0)
    img = kept_blocks.swapaxes(1, 2).reshape(by * b, (bx - k) * b, 3)
    return img, mask


class TestSelectiveRemoval:
    def test_matches_oracle(self, tiny_video, rng):
        b, amount = 8, 0.25
        scores = rng.random((5, 6, 8)).astype(np.float32)
        shrunk, mask = apply_selective_removal(
            jnp.asarray(tiny_video), jnp.asarray(scores), b, amount
        )
        assert shrunk.shape == (5, 48, 64 - 2 * b, 3)
        for i in range(5):
            want_img, want_mask = _oracle_selective_removal(
                tiny_video[i], scores[i], b, amount
            )
            np.testing.assert_array_equal(np.asarray(mask[i]), want_mask)
            np.testing.assert_array_equal(np.asarray(shrunk[i]), want_img)

    def test_cooldown_dithers_removal(self, tiny_video, rng):
        """cooldown=1 (the r5 pipeline default, VERDICT r4 #1): a block
        removed at frame t is protected at t+1, so every hole's content
        is transmitted in an adjacent frame; per-row count k and the
        cooldown=0 first frame stay exactly the reference's top-k."""
        from elvis_tpu.degrade.removal import removal_mask_from_scores

        b, amount = 8, 0.25
        # persistent scores: the pathological case (top-k would remove
        # the SAME blocks every frame — measured 79% persistence on the
        # long-run pan)
        scores = np.broadcast_to(
            rng.random((1, 6, 8)).astype(np.float32), (5, 6, 8)
        ).copy()
        m0 = np.asarray(removal_mask_from_scores(jnp.asarray(scores), 8, amount, 0))
        assert (m0[1:] == m0[:-1]).all()  # top-k: identical every frame
        m1 = np.asarray(removal_mask_from_scores(jnp.asarray(scores), 8, amount, 1))
        assert (m1.sum(-1) == 2).all()  # k per row preserved
        np.testing.assert_array_equal(m1[0], m0[0])  # frame 0 = pure top-k
        assert not (m1[:-1] & m1[1:]).any()  # no consecutive removal
        # shrink path consumes the dithered mask identically
        shrunk, mask = apply_selective_removal(
            jnp.asarray(tiny_video), jnp.asarray(scores), b, amount, cooldown=1
        )
        np.testing.assert_array_equal(np.asarray(mask), m1)
        assert shrunk.shape == (5, 48, 64 - 2 * b, 3)

    def test_stretch_restores_kept_blocks(self, tiny_video, rng):
        b, amount = 8, 0.25
        scores = rng.random((5, 6, 8)).astype(np.float32)
        x = jnp.asarray(tiny_video)
        shrunk, mask = apply_selective_removal(x, jnp.asarray(scores), b, amount)
        stretched = np.asarray(stretch_frames(shrunk, mask, b))
        m = np.asarray(mask)
        for i in range(5):
            pix_keep = np.repeat(np.repeat(m[i] == 0, b, 0), b, 1)
            np.testing.assert_array_equal(
                stretched[i][pix_keep], tiny_video[i][pix_keep]
            )
            assert (stretched[i][~pix_keep] == 0).all()


class TestShrinkMethods:
    def test_row_only_counts_and_roundtrip(self, tiny_video, rng):
        b, amount = 8, 0.25
        imp = rng.random((5, 6, 8)).astype(np.float32)
        x = jnp.asarray(tiny_video)
        shrunk, plans = shrink_video(x, imp, b, amount, method="row_only")
        target = int(6 * 8 * amount)
        for p in plans:
            assert p.removal_mask.sum() == target
        back = np.asarray(stretch_video(shrunk, plans, b))
        for i, p in enumerate(plans):
            pix_keep = np.repeat(np.repeat(~p.removal_mask, b, 0), b, 1)
            np.testing.assert_array_equal(back[i][pix_keep], tiny_video[i][pix_keep])
            assert (back[i][~pix_keep] == 0).all()

    def test_row_col_roundtrip(self, tiny_video, rng):
        b, amount = 8, 0.3
        imp = rng.random((5, 6, 8)).astype(np.float32)
        x = jnp.asarray(tiny_video)
        shrunk, plans = shrink_video(x, imp, b, amount, method="row_col")
        back = np.asarray(stretch_video(shrunk, plans, b))
        for i, p in enumerate(plans):
            assert p.removal_mask.sum() == int(6 * 8 * amount)
            pix_keep = np.repeat(np.repeat(~p.removal_mask, b, 0), b, 1)
            np.testing.assert_array_equal(back[i][pix_keep], tiny_video[i][pix_keep])

    def test_row_only_removes_lowest_importance(self):
        """With one full pass, each row loses its importance-argmin block
        (utils.py:714-730 greedy semantics)."""
        imp = np.array([[0.5, 0.1, 0.9, 0.8], [0.3, 0.7, 0.05, 0.6]])
        plan = plan_shrink(imp, shrink_amount=2 / 8, method="row_only")
        want = np.zeros((2, 4), dtype=bool)
        want[0, 1] = True
        want[1, 2] = True
        np.testing.assert_array_equal(plan.removal_mask, want)

    def test_removal_indices_metadata_shape(self, rng):
        imp = rng.random((4, 6))
        plan = plan_shrink(imp, 0.25, method="row_col")
        # 6 removals: one full row pass (4) + partial col pass (2)
        assert [len(a) for a in plan.removal_indices] == [4, 2]


class TestDctDampen:
    def test_zero_strength_identity(self, tiny_video):
        frames = jnp.asarray(tiny_video[:2].astype(np.float32))
        out, lvl = dct_dampen(frames, jnp.zeros((2, 6, 8)), 8)
        np.testing.assert_allclose(np.asarray(out), tiny_video[:2], atol=1e-2)
        assert int(jnp.max(lvl)) == 0

    def test_monotone_energy_reduction(self, tiny_video):
        frames = jnp.asarray(tiny_video[:1].astype(np.float32))
        prev_var = float(jnp.var(frames))
        for s in (0.3, 0.6, 1.0):
            out, _ = dct_dampen(frames, jnp.full((1, 6, 8), s), 8)
            v = float(jnp.var(out))
            assert v < prev_var
            prev_var = v

    def test_dc_preserved(self, tiny_video):
        """Block means survive full dampening (DC never attenuated)."""
        frames = jnp.asarray(tiny_video[:1].astype(np.float32))
        out, _ = dct_dampen(frames, jnp.ones((1, 6, 8)), 8)
        got = np.asarray(out)[0].reshape(6, 8, 8, 8, 3).mean(axis=(1, 3))
        want = tiny_video[0].astype(np.float64).reshape(6, 8, 8, 8, 3).mean(axis=(1, 3))
        np.testing.assert_allclose(got, want, atol=0.05)
