"""Image op oracles: resize matrices, Gaussian blur, color, DCT."""

import numpy as np
import jax.numpy as jnp
import pytest

import sys

from elvis_tpu.ops import color, dct
from elvis_tpu.ops import filter as F
import elvis_tpu.ops.resize  # noqa: F401 — ensure module registered

R = sys.modules["elvis_tpu.ops.resize"]


class TestResize:
    def test_area_downscale_integer_factor_is_mean_pool(self, tiny_video):
        img = tiny_video[0].astype(np.float32)
        got = np.asarray(R.resize(jnp.asarray(img), (24, 32), method="area"))
        want = img.reshape(24, 2, 32, 2, 3).mean(axis=(1, 3))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_area_matrix_rows_sum_to_one(self):
        for dst, src in [(3, 7), (5, 8), (7, 13)]:
            m = R.resize_matrix(dst, src, "area")
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-12)

    def test_fast_paths_match_dense_matrices(self):
        """The r4 tap/reshape fast paths (exact 2x upscale, integer-factor
        area) must reproduce the dense (dst,src) matmuls — same weights,
        same f32 accumulation, only the op count differs (the dense
        matrices are >99% zeros; at 4K they dominated the progressive
        loop, VERDICT r3 #4)."""
        rng = np.random.default_rng(0)
        x = (rng.random((2, 24, 36, 3)) * 255).astype(np.float32)

        def dense(images, out_hw, method):
            ah = jnp.asarray(R.resize_matrix(out_hw[0], images.shape[1], method),
                             jnp.float32)
            aw = jnp.asarray(R.resize_matrix(out_hw[1], images.shape[2], method),
                             jnp.float32)
            y = jnp.einsum("oh,...hwc->...owc", ah, jnp.asarray(images),
                           precision=R._PRECISION)
            return np.asarray(jnp.einsum("pw,...hwc->...hpc", aw, y,
                                         precision=R._PRECISION))

        for method in ("linear", "lanczos4"):
            got = np.asarray(R.resize(jnp.asarray(x), (48, 72), method=method))
            np.testing.assert_allclose(got, dense(x, (48, 72), method),
                                       atol=2e-3)
        for out in ((12, 18), (6, 9), (12, 36), (3, 4)):
            got = np.asarray(R.resize(jnp.asarray(x), out, method="area"))
            np.testing.assert_allclose(got, dense(x, out, "area"), atol=2e-3)
        # uint8 + channel-less maps route through the same fast paths
        u8 = (rng.random((2, 8, 12)) * 255).astype(np.uint8)
        got = np.asarray(R.resize(jnp.asarray(u8), (16, 24), method="lanczos4",
                                  channels=False))
        assert got.shape == (2, 16, 24) and got.dtype == np.uint8

    def test_linear_identity(self):
        m = R.resize_matrix(16, 16, "linear")
        np.testing.assert_allclose(m, np.eye(16))

    def test_linear_upscale_2x_endpoints(self):
        # cv2 half-pixel convention: dst[0] maps to src coord -0.25 (clamped)
        img = jnp.tile(jnp.arange(6, dtype=jnp.float32), (4, 1))[None]  # (1,4,6) gray
        y = np.asarray(R.resize(img, (4, 12), method="linear"))
        assert y.shape == (1, 4, 12)
        # interior spacing is 0.5 apart
        np.testing.assert_allclose(np.diff(y[0, 0])[1:-1], 0.5, atol=1e-5)

    def test_lanczos_reconstructs_smooth_signal(self):
        t = np.linspace(0, 2 * np.pi, 64, endpoint=False)
        sig = np.sin(t).astype(np.float32)
        img = np.tile(sig, (16, 1))[None]  # (1,16,64)
        small = R.resize(jnp.asarray(img), (16, 32), method="area")
        back = np.asarray(R.resize(small, (16, 64), method="lanczos4"))
        assert np.abs(back[0, 8] - img[0, 8]).mean() < 0.05

    def test_nearest(self):
        img = jnp.asarray(np.arange(24, dtype=np.uint8).reshape(1, 4, 6))
        y = np.asarray(R.resize(img, (2, 2), method="nearest"))
        np.testing.assert_array_equal(y[0], [[0, 3], [12, 15]])

    def test_uint8_round_and_clip(self):
        img = jnp.asarray(np.array([[0, 255], [255, 0]], dtype=np.uint8))[None]
        y = np.asarray(R.resize(img, (4, 4), method="lanczos4"))
        assert y.dtype == np.uint8

    def test_identity_resize_is_a_passthrough(self):
        """dst==src returns the input array unchanged (same object — the
        short-circuit skips the two full-frame HIGHEST matmuls the
        progressive loop's final stage would otherwise pay)."""
        img = jnp.asarray(np.random.default_rng(0).random((2, 8, 12, 3),
                                                          dtype=np.float32))
        for method in ("area", "linear", "lanczos4", "nearest"):
            assert R.resize(img, (8, 12), method=method) is img
        # channel-less maps short-circuit on their own spatial dims
        maps = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 4, 3))
        assert R.resize(maps, (4, 3), channels=False) is maps
        # int8 + clip_uint8_range is the one case the tail is NOT a no-op
        # (negatives clip to 0): must keep taking the full path
        s8 = jnp.asarray(np.array([[-5, 7]], dtype=np.int8))
        y = np.asarray(R.resize(s8, (1, 2)))
        np.testing.assert_array_equal(y, [[0, 7]])

    def test_channels_false_for_narrow_block_maps(self):
        """Regression: an (N, By, 3) block map must resize the SPATIAL axes
        when channels=False — the heuristic alone would treat Bx=3 as RGB."""
        maps = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 4, 3))
        y = np.asarray(R.resize(maps, (2, 6), method="area", channels=False))
        assert y.shape == (2, 2, 6)
        # heuristic path (channels=None) misreads the trailing 3 as RGB and
        # resizes the wrong axes — documents why call sites pass the flag
        y_heur = np.asarray(R.resize(maps, (2, 6), method="area"))
        assert y_heur.shape == (2, 6, 3)


class TestFilter:
    def test_gaussian_kernel_matches_cv2_values(self):
        # cv2.getGaussianKernel(5, 1.0) reference values
        want = np.array([0.05448868, 0.24420134, 0.40261996, 0.24420134, 0.05448868])
        np.testing.assert_allclose(F.gaussian_kernel_1d(5, 1.0), want, atol=1e-7)

    def test_blur_preserves_constant(self):
        img = jnp.full((2, 8, 8, 3), 100.0, dtype=jnp.float32)
        y = np.asarray(F.gaussian_blur(img))
        np.testing.assert_allclose(y, 100.0, atol=1e-4)

    def test_blur_oracle_small(self):
        """Direct 2-D correlation with reflect-101 padding as oracle."""
        rng = np.random.default_rng(2)
        img = rng.random((8, 8)).astype(np.float32)
        k1 = F.gaussian_kernel_1d(5, 1.0)
        k2 = np.outer(k1, k1)
        padded = np.pad(img, 2, mode="reflect")
        want = np.zeros_like(img)
        for i in range(8):
            for j in range(8):
                want[i, j] = (padded[i : i + 5, j : j + 5] * k2).sum()
        got = np.asarray(F.gaussian_blur(jnp.asarray(img)[None, :, :, None], h_axis=-3, w_axis=-2))[0, :, :, 0]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_iterated_levels_monotone_smoothing(self, tiny_video):
        img = jnp.asarray(tiny_video[:1]).astype(jnp.float32)
        levels = F.iterated_gaussian_blur_levels(img, 4)
        assert levels.shape == (5, 1, 48, 64, 3)
        variances = [float(jnp.var(levels[i])) for i in range(5)]
        assert all(variances[i] >= variances[i + 1] for i in range(4))

    def test_unsharp_sharpens(self, tiny_video):
        img = jnp.asarray(tiny_video[:1]).astype(jnp.float32)
        blurred = F.gaussian_blur(img)
        sharp = F.unsharp_mask(blurred, amount=0.5, radius=1)
        # unsharp should increase variance back toward original
        assert float(jnp.var(sharp)) > float(jnp.var(blurred))


class TestColor:
    def test_ycbcr_roundtrip(self, tiny_video):
        x = jnp.asarray(tiny_video.astype(np.float32))
        back = np.asarray(color.ycbcr_to_rgb(color.rgb_to_ycbcr(x)))
        np.testing.assert_allclose(back, tiny_video, atol=1.0)

    def test_gray_matches_bt601(self):
        rgb = jnp.asarray(np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], dtype=np.float32))
        g = np.asarray(color.rgb_to_gray(rgb))
        np.testing.assert_allclose(g[0], [76.245, 149.685, 29.07], atol=0.01)

    def test_yuv420_roundtrip_close(self, tiny_video):
        x = jnp.asarray(tiny_video.astype(np.float32))
        y, cb, cr = color.rgb_to_yuv420(x)
        assert cb.shape == (5, 24, 32)
        back = np.asarray(color.yuv420_to_rgb(y, cb, cr))
        # chroma subsampling loses detail; luma should be near-exact
        g0 = np.asarray(color.rgb_to_gray(x))
        g1 = np.asarray(color.rgb_to_gray(jnp.asarray(back)))
        np.testing.assert_allclose(g1, g0, atol=2.0)


class TestDCT:
    def test_orthonormal(self):
        d = dct.dct_matrix(8)
        np.testing.assert_allclose(d @ d.T, np.eye(8), atol=1e-12)

    def test_roundtrip(self, rng):
        x = jnp.asarray(rng.random((3, 4, 8, 8)).astype(np.float32) * 255)
        back = dct.block_idct2(dct.block_dct2(x))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-3)

    def test_dc_coefficient_is_block_mean(self, rng):
        x = jnp.asarray(rng.random((8, 8)).astype(np.float32))
        c = np.asarray(dct.block_dct2(x))
        np.testing.assert_allclose(c[0, 0], np.asarray(x).mean() * 8, atol=1e-5)


class TestBlockMotion:
    """ops.motion: the flat search saturates at +-radius; the pyramid
    (r5, VERDICT r4 #1) must recover pans well beyond it — the r4
    long-run pan moved 5-9 px/frame against a radius-4 search, and the
    clamped estimates diverged into the inpainting quality inversion."""

    def _pair(self, rng, dy, dx, h=96, w=128):
        from elvis_tpu.ops.filter import gaussian_blur

        pad = 32
        canvas = (rng.random((h + 2 * pad, w + 2 * pad)) * 255).astype(np.float32)
        canvas = np.asarray(
            gaussian_blur(jnp.asarray(canvas[..., None]), 7, 1.5)
        )[..., 0]
        prev = canvas[pad : pad + h, pad : pad + w]
        cur = canvas[pad - dy : pad - dy + h, pad - dx : pad - dx + w]
        return jnp.asarray(prev[None]), jnp.asarray(cur[None])

    def test_flat_recovers_small_shift(self, rng):
        from elvis_tpu.ops.motion import block_motion

        prev, cur = self._pair(rng, 3, -2)
        mv = np.asarray(block_motion(prev, cur, 16, 4))
        med = np.median(mv.reshape(-1, 2), axis=0)
        np.testing.assert_array_equal(med, [3, -2])

    def test_flat_saturates_beyond_radius(self, rng):
        from elvis_tpu.ops.motion import block_motion

        prev, cur = self._pair(rng, 11, 9)
        mv = np.asarray(block_motion(prev, cur, 16, 4))
        assert np.abs(mv).max() <= 4  # clamped — the r4 failure mode

    def test_pyramid_recovers_large_shift(self, rng):
        from elvis_tpu.ops.motion import block_motion_pyramid

        for dy, dx in [(11, 9), (-17, 20), (9, -6)]:
            prev, cur = self._pair(rng, dy, dx)
            mv = np.asarray(block_motion_pyramid(prev, cur, 16, 4, levels=3))
            med = np.median(mv.reshape(-1, 2), axis=0)
            np.testing.assert_array_equal(med, [dy, dx], err_msg=f"{(dy, dx)}")

    def test_pyramid_levels1_matches_flat(self, rng):
        from elvis_tpu.ops.motion import block_motion, block_motion_pyramid

        prev, cur = self._pair(rng, 2, 1)
        a = np.asarray(block_motion(prev, cur, 16, 4))
        b = np.asarray(block_motion_pyramid(prev, cur, 16, 4, levels=1))
        np.testing.assert_array_equal(a, b)

    def test_pyramid_zero_on_static(self, rng):
        from elvis_tpu.ops.motion import block_motion_pyramid

        prev, cur = self._pair(rng, 0, 0)
        mv = np.asarray(block_motion_pyramid(prev, cur, 16, 4, levels=3))
        np.testing.assert_array_equal(mv, 0)

    def test_pyramid_nonaligned_shape(self, rng):
        """H/W not divisible by block*2^(levels-1): internal padding must
        return the original grid and still find the shift."""
        from elvis_tpu.ops.motion import block_motion_pyramid

        prev, cur = self._pair(rng, 6, 5, h=80, w=112)  # 80/16=5 blocks, /4 pads
        mv = np.asarray(block_motion_pyramid(prev, cur, 16, 4, levels=3))
        assert mv.shape == (1, 5, 7, 2)
        med = np.median(mv.reshape(-1, 2), axis=0)
        np.testing.assert_array_equal(med, [6, 5])


class TestFastPanInpaint:
    """MC temporal inpainting on a pan FASTER than the flat radius — the
    exact r4 inversion scenario (VERDICT r4 #1). With the pyramid
    estimator the warped fill must beat both the co-located fill and the
    PDE diffusion fill on hole pixels."""

    def test_mc_beats_zero_motion_and_pde_on_fast_pan(self, rng):
        from elvis_tpu.core.blocks import upsample_map
        from elvis_tpu.ops.filter import gaussian_blur
        from elvis_tpu.restore.inpaint import (
            restore_removal_diffusion,
            restore_removal_temporal,
        )

        n, h, w, pan = 8, 48, 64, 9  # 9 px/frame >> flat radius 4
        wide = (rng.random((h, w + pan * n, 3)) * 255).astype(np.float32)
        wide = np.asarray(gaussian_blur(jnp.asarray(wide), 5, 1.2))
        clip = np.clip(
            np.stack([wide[:, pan * t : pan * t + w] for t in range(n)]), 0, 255
        ).astype(np.uint8)
        mask = (rng.random((n, h // 8, w // 8)) < 0.2).astype(np.int8)
        holes = np.asarray(upsample_map(jnp.asarray(mask), 8))[..., None].astype(bool)
        holed = jnp.asarray(np.where(holes, 0, clip))
        m = jnp.asarray(mask)

        def hole_mse(out):
            d = (np.asarray(out, np.float64) - clip.astype(np.float64)) ** 2
            return float(d[holes[..., 0]].mean())

        mc = hole_mse(restore_removal_temporal(holed, m, 8, motion_radius=4))
        zm = hole_mse(restore_removal_temporal(holed, m, 8, motion_radius=0))
        pde = hole_mse(restore_removal_diffusion(holed, m, 8))
        # masked pyramid + SAD-reliability completion measured 15.4 vs
        # ZM 623 / PDE 249 — lock in >=5x, not just "better"
        assert mc < 0.2 * zm, (mc, zm)
        assert mc < 0.2 * pde, (mc, pde)

    def test_unmatchable_blocks_flagged_by_sad(self, rng):
        """A clean block whose TRUE source region is fully holed in prev
        is unmatchable — block_motion(return_sad=True) must price its
        bogus winner well above genuine matches (the reliability signal
        _estimate_hole_motion thresholds on)."""
        from elvis_tpu.core.blocks import upsample_map
        from elvis_tpu.ops.filter import gaussian_blur
        from elvis_tpu.ops.motion import block_motion

        h, w = 64, 64
        canvas = (rng.random((h, w + 16)) * 255).astype(np.float32)
        canvas = np.asarray(gaussian_blur(jnp.asarray(canvas[..., None]), 5, 1.2))[..., 0]
        prev, cur = canvas[:, 8:8 + w], canvas[:, :w]  # shift (0,-8)
        mask_prev = np.zeros((8, 8), bool)
        mask_prev[4, 4] = mask_prev[4, 5] = True  # holes at cur block (4,5)'s source
        wp = 1.0 - np.asarray(upsample_map(jnp.asarray(mask_prev[None]), 8))[0]
        mv, sad = block_motion(
            jnp.asarray(np.where(wp == 0, 0, prev)[None]), jnp.asarray(cur[None]),
            8, 8, jnp.asarray(wp[None]), None, return_sad=True,
        )
        sad = np.asarray(sad)[0]
        genuine = np.median(sad)
        assert float(sad[4, 5]) > 3 * genuine + 2.0, (float(sad[4, 5]), genuine)
