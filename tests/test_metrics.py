"""Metric oracles: PSNR/MSE exact, SSIM vs a NumPy port of the skimage
algorithm (the implementation the reference calls at elvis.py:713-721)."""

import numpy as np
import jax.numpy as jnp

from elvis_tpu.metrics import (
    block_ssim_map,
    fg_bg_ssim,
    mask_union_bbox,
    masked_mse,
    masked_psnr,
    masked_ssim,
    ssim,
)




def _gauss_kernel(win, sigma=1.5):
    r = (win - 1) // 2
    t = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    return k / k.sum()


def _filt(img, k):
    r = (len(k) - 1) // 2
    p = np.pad(img, ((r, r), (r, r)), mode="edge")
    out = np.zeros_like(img, dtype=np.float64)
    for i in range(len(k)):
        out += k[i] * p[i : i + img.shape[0], r : r + img.shape[1]]
    p2 = np.pad(out, ((0, 0), (r, r)), mode="edge")
    out2 = np.zeros_like(img, dtype=np.float64)
    for i in range(len(k)):
        out2 += k[i] * p2[:, i : i + img.shape[1]]
    return out2


def _np_ssim(x, y, data_range=255.0, win=7):
    """Wang et al. SSIM with skimage conventions (sample covariance,
    border crop) as an independent oracle."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    k = _gauss_kernel(win)
    ux, uy = _filt(x, k), _filt(y, k)
    uxx, uyy, uxy = _filt(x * x, k), _filt(y * y, k), _filt(x * y, k)
    npix = win * win
    cn = npix / (npix - 1)
    vx, vy, vxy = cn * (uxx - ux**2), cn * (uyy - uy**2), cn * (uxy - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win - 1) // 2
    return s[pad:-pad, pad:-pad].mean()


class TestPsnrMse:
    def test_identical_is_100db(self, tiny_video):
        x = jnp.asarray(tiny_video)
        p = np.asarray(masked_psnr(x, x))
        np.testing.assert_allclose(p, 100.0)

    def test_known_mse(self):
        ref = jnp.zeros((1, 8, 8, 3))
        dec = jnp.full((1, 8, 8, 3), 10.0)
        assert float(masked_mse(ref, dec)[0]) == 100.0
        want_psnr = 20 * np.log10(255 / 10.0)
        np.testing.assert_allclose(float(masked_psnr(ref, dec)[0]), want_psnr, rtol=1e-5)

    def test_mask_restricts(self, tiny_video, rng):
        ref = jnp.asarray(tiny_video.astype(np.float32))
        noise = rng.normal(0, 5, tiny_video.shape).astype(np.float32)
        dec = ref + jnp.asarray(noise)
        mask = np.zeros((5, 48, 64), dtype=bool)
        mask[:, :24] = True  # top half only
        got = np.asarray(masked_mse(ref, dec, jnp.asarray(mask)))
        want = (noise[:, :24] ** 2).mean(axis=(1, 2, 3))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_empty_mask_conventions(self, tiny_video):
        x = jnp.asarray(tiny_video)
        empty = jnp.zeros((5, 48, 64), dtype=bool)
        np.testing.assert_allclose(np.asarray(masked_psnr(x, x + 5, empty)), 100.0)
        np.testing.assert_allclose(np.asarray(masked_mse(x, x + 5, empty)), 0.0)


class TestSsim:
    def test_identical_is_one(self, tiny_video):
        y = jnp.asarray(tiny_video.astype(np.float32).mean(-1))
        np.testing.assert_allclose(np.asarray(ssim(y, y)), 1.0, atol=1e-6)

    def test_matches_numpy_oracle(self, tiny_video, rng):
        x = tiny_video[0].astype(np.float32).mean(-1)
        y = np.clip(x + rng.normal(0, 12, x.shape), 0, 255).astype(np.float32)
        got = float(ssim(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
        want = _np_ssim(x, y)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_degradation_ordering(self, tiny_video):
        """More noise -> lower SSIM."""
        x = jnp.asarray(tiny_video.astype(np.float32).mean(-1))
        rng = np.random.default_rng(3)
        prev = 1.0
        for s in (2, 8, 25):
            y = x + jnp.asarray(rng.normal(0, s, x.shape).astype(np.float32))
            v = float(ssim(x, y).mean())
            assert v < prev
            prev = v


class TestMaskedSsim:
    def test_bbox(self):
        masks = np.zeros((2, 40, 60), dtype=bool)
        masks[0, 10:20, 12:30] = True
        masks[1, 8:18, 14:36] = True
        x, y, w, h = mask_union_bbox(masks)
        # union rows 8..19 (h=12), cols 12..35 (w=24); pad 1/1 each side
        assert (x, y) == (11, 7)
        assert (w, h) == (26, 14)

    def test_empty_mask_is_one(self, tiny_video):
        x = jnp.asarray(tiny_video)
        empty = jnp.zeros((5, 48, 64), dtype=bool)
        np.testing.assert_allclose(
            np.asarray(masked_ssim(x, x + 3, empty, bbox=(0, 0, 64, 48))), 1.0
        )

    def test_mask_zeroing_affects_result(self, tiny_video, rng):
        """Corruption outside the mask must not change masked SSIM."""
        ref = tiny_video.astype(np.float32)
        mask = np.zeros((5, 48, 64), dtype=bool)
        mask[:, 16:32, 16:48] = True
        dec_in = ref.copy()
        dec_in[:, 16:32, 16:48] += rng.normal(0, 10, (5, 16, 32, 3)).astype(np.float32)
        dec_out = dec_in.copy()
        dec_out[:, :8] = 0  # corrupt outside mask (and outside bbox)
        bbox = mask_union_bbox(mask)
        a = np.asarray(masked_ssim(jnp.asarray(ref), jnp.asarray(dec_in), jnp.asarray(mask), bbox=bbox))
        b = np.asarray(masked_ssim(jnp.asarray(ref), jnp.asarray(dec_out), jnp.asarray(mask), bbox=bbox))
        np.testing.assert_allclose(a, b, atol=1e-6)
        assert (a < 1.0).all()


class TestBlockSsim:
    def test_map_shape_and_perfect_blocks(self, tiny_video, rng):
        ref = jnp.asarray(tiny_video.astype(np.float32))
        dec = np.asarray(ref).copy()
        dec[:, 0:8, 0:8] += rng.normal(0, 25, (5, 8, 8, 3))  # corrupt block (0,0)
        smap = np.asarray(block_ssim_map(ref, jnp.asarray(dec), 8))
        assert smap.shape == (5, 6, 8)
        np.testing.assert_allclose(smap[:, 1:, 1:], 1.0, atol=1e-6)
        assert (smap[:, 0, 0] < 0.9).all()

    def test_fg_bg_split(self, tiny_video, rng):
        ref = jnp.asarray(tiny_video.astype(np.float32))
        dec = np.asarray(ref).copy()
        dec[:, :, 32:] += rng.normal(0, 20, (5, 48, 32, 3))  # corrupt right half
        fg = np.zeros((5, 48, 64), dtype=bool)
        fg[:, :, :32] = True  # left half is foreground
        overall, f, b = fg_bg_ssim(ref, jnp.asarray(dec), jnp.asarray(fg), 8)
        assert float(f) > float(b)
        assert min(float(f), float(b)) <= float(overall) <= max(float(f), float(b))


class TestFvmdIncremental:
    def test_std_populated_and_early_stop(self, rng):
        from elvis_tpu.metrics.fvmd import fvmd_incremental

        base = (rng.random((24, 32, 48, 3)) * 255).astype(np.float32)
        noisy = np.clip(base + rng.normal(0, 4, base.shape), 0, 255).astype(np.float32)
        v, s = fvmd_incremental(base, noisy, early_stop_delta=0.05, window=5)
        assert np.isfinite(v) and np.isfinite(s) and s >= 0
        # identical clips: distance ~0, std ~0
        v0, s0 = fvmd_incremental(base, base.copy(), early_stop_delta=0.05, window=5)
        assert v0 < 1e-6 and s0 < 1e-6

    def test_max_frames_and_stride(self, rng):
        from elvis_tpu.metrics.fvmd import fvmd_incremental

        clip = (rng.random((30, 32, 48, 3)) * 255).astype(np.float32)
        v, _ = fvmd_incremental(clip, clip, stride=2, max_frames=10)
        assert np.isfinite(v)
        v_nan, s_nan = fvmd_incremental(clip, clip, max_frames=2)
        assert np.isnan(v_nan) and np.isnan(s_nan)  # too few frames

    def test_chunked_features_match_one_shot(self, rng, monkeypatch):
        """Long-clip chunked extraction (2-frame overlap windows) equals
        the full-clip features, with and without a region mask. The
        one-shot baseline is JITTED like the chunks: on pure-noise input
        near-tied SADs flip argmin between jit and eager compilations,
        which is tie-breaking noise, not a chunking error."""
        import jax

        import elvis_tpu.metrics.fvmd as fvmd_mod
        from elvis_tpu.metrics.fvmd import _features_chunked, motion_features

        clip = (rng.random((23, 32, 48, 3)) * 255).astype(np.float32)
        mask = (rng.random((23, 32, 48)) < 0.5).astype(np.float32)
        jfeat = jax.jit(motion_features)
        one_shot = np.asarray(jfeat(jnp.asarray(clip)))
        monkeypatch.setattr(fvmd_mod, "_FVMD_CHUNK_FRAMES", 7)
        np.testing.assert_allclose(
            _features_chunked(clip, None, 16, 4), one_shot, atol=1e-5
        )
        jfeat_m = jax.jit(lambda f, m: motion_features(f, mask=m))
        one_shot_m = np.asarray(jfeat_m(jnp.asarray(clip), jnp.asarray(mask)))
        np.testing.assert_allclose(
            _features_chunked(clip, mask, 16, 4), one_shot_m, atol=1e-5
        )

    def test_mask_semantics(self, rng):
        """r5 mask semantics (VERDICT r4 #5): the mask POOLS block
        statistics of a full-frame motion field — it does NOT premask
        pixels (that created phantom mask-edge motion). Invariants:
        all-ones mask == no mask, and a region mask isolates that
        region's motion (fg-masked features of a moving-left-half clip
        differ from the bg-masked ones)."""
        import jax

        from elvis_tpu.metrics.fvmd import fvmd_incremental, motion_features

        ref = (rng.random((12, 32, 48, 3)) * 255).astype(np.float32)
        dec = np.clip(ref + rng.normal(0, 5, ref.shape), 0, 255).astype(np.float32)
        ones = np.ones((12, 32, 48), np.float32)
        v_mask, s_mask = fvmd_incremental(ref, dec, mask=ones)
        v_none, s_none = fvmd_incremental(ref, dec)
        assert np.isclose(v_mask, v_none, atol=1e-6)
        assert np.isclose(s_mask, s_none, atol=1e-6)

        # moving left half, static right half: region masks must separate
        base = np.asarray(jax.image.resize(
            jnp.asarray(rng.random((8, 12, 3)) * 255), (64, 96, 3), "linear"
        ), np.float32)
        clip = np.stack([base] * 8)
        # 6 px/frame: above the first velocity-magnitude bin's edge
        # (reach*1.5/bins = 22*1.5/8 ~= 4.1 px with the pyramid's range)
        for t in range(8):
            clip[t, :, :48] = np.roll(base[:, :48], 6 * t, axis=0)
        fg = np.zeros((8, 64, 96), np.float32)
        fg[:, :, :48] = 1.0
        jfeat_m = jax.jit(lambda f, m: motion_features(f, mask=m))
        f_fg = np.asarray(jfeat_m(jnp.asarray(clip), jnp.asarray(fg)))
        f_bg = np.asarray(jfeat_m(jnp.asarray(clip), jnp.asarray(1.0 - fg)))
        # bg is static -> velocity-magnitude mass in bin 0; fg moves 3 px
        assert float(f_bg[:, 0].mean()) > 0.9
        assert float(f_fg[:, 0].mean()) < 0.5

    def test_region_pair_matches_per_region_extraction(self, rng, monkeypatch):
        """region_motion_features (one frames push -> FG+BG features)
        equals two independent masked extractions, including across
        chunk boundaries, and fvmd_from_features on those features
        equals fvmd_incremental end to end."""
        import elvis_tpu.metrics.fvmd as fvmd_mod
        from elvis_tpu.metrics.fvmd import (
            _features_chunked, fvmd_from_features, fvmd_incremental,
            region_motion_features,
        )

        ref = (rng.random((13, 32, 48, 3)) * 255).astype(np.uint8)
        dec = np.clip(
            ref.astype(np.float32) + rng.normal(0, 5, ref.shape), 0, 255
        ).astype(np.uint8)
        fg = rng.random((13, 32, 48)) < 0.5
        monkeypatch.setattr(fvmd_mod, "_FVMD_CHUNK_FRAMES", 6)

        fgf, bgf = region_motion_features(ref, fg)
        np.testing.assert_allclose(
            fgf, _features_chunked(ref, fg.astype(np.float32), 16, 4), atol=1e-5)
        np.testing.assert_allclose(
            bgf, _features_chunked(ref, 1.0 - fg.astype(np.float32), 16, 4),
            atol=1e-5)

        dfg, _ = region_motion_features(dec, fg)
        v_new, s_new = fvmd_from_features(fgf, dfg)
        v_old, s_old = fvmd_incremental(ref, dec, mask=fg.astype(np.float32))
        assert np.isclose(v_new, v_old, rtol=1e-5, atol=1e-6)
        assert np.isclose(s_new, s_old, rtol=1e-5, atol=1e-6)

        # too-few-frames contract
        assert region_motion_features(ref[:3], fg[:3]) == (None, None)
        assert all(np.isnan(x) for x in fvmd_from_features(None, dfg))


class TestEvaluateChunking:
    def test_chunked_evaluation_is_invariant(self, rng, monkeypatch):
        """evaluate_approach streams frame chunks through one jitted
        kernel; the chunk size must not affect any reported number
        (per-frame metrics are frame-independent, FVMD windows overlap)."""
        import elvis_tpu.metrics.evaluate as ev

        ref = (rng.random((10, 32, 48, 3)) * 255).astype(np.uint8)
        dec = np.clip(
            ref.astype(np.float32) + rng.normal(0, 6, ref.shape), 0, 255
        ).astype(np.uint8)
        fg = np.zeros((10, 32, 48), bool)
        fg[:, 8:24, 12:36] = True
        kw = dict(metric_stride=2, enable_fvmd=True, fvmd_stride=1,
                  enable_vmaf=False)
        one = ev.evaluate_approach(ref, dec, fg, 1e6, **kw)
        monkeypatch.setattr(ev, "_EVAL_CHUNK_PIXELS", 2 * 32 * 48)
        many = ev.evaluate_approach(ref, dec, fg, 1e6, **kw)

        for region in ("foreground", "background"):
            for k, v in one[region].items():
                if np.isnan(v):
                    assert np.isnan(many[region][k])
                else:
                    assert np.isclose(many[region][k], v, rtol=1e-5, atol=1e-6), (
                        region, k, v, many[region][k])

    def test_reference_features_extracted_once_across_approaches(
            self, rng, monkeypatch):
        """The fan-out shares the reference clip's FVMD features across
        approaches (they're identical every time): N approaches must cost
        N+1 feature extractions, not 2N — at 128f/1080p the redundant
        reference re-extraction dominated evaluation wall-clock."""
        import elvis_tpu.metrics.evaluate as ev

        ref = (rng.random((8, 32, 48, 3)) * 255).astype(np.uint8)
        fg = np.zeros((8, 32, 48), bool)
        fg[:, 8:24, 12:36] = True
        videos = {}
        for i in range(3):
            videos[f"approach_{i}"] = np.clip(
                ref.astype(np.float32) + rng.normal(0, 3 + i, ref.shape), 0, 255
            ).astype(np.uint8)

        calls = []
        real = ev.region_motion_features

        def counting(frames, mask, **kw):
            calls.append(frames.shape)
            return real(frames, mask, **kw)

        monkeypatch.setattr(ev, "region_motion_features", counting)
        out = ev.analyze_encoding_performance(
            ref, videos, fg, {k: 1e6 for k in videos},
            enable_vmaf=False, enable_fvmd=True)
        assert len(calls) == len(videos) + 1  # 1 reference + 1 per approach
        for k in videos:
            assert np.isfinite(out[k]["foreground"]["fvmd"])


class TestTrainedLpips:
    def test_trained_backbone_ranks_distortion_ladders(self, rng):
        """With the shipped 2AFC-trained backbone, lpips must rank
        stronger distortions farther (>= 0.9 pairwise accuracy) on
        held-out dead-leaves content across blur/down/noise families,
        and score identical inputs ~0."""
        import os

        import jax
        import jax.numpy as jnp

        from elvis_tpu.metrics.perceptual import (
            PerceptualNet,
            lpips_distance,
            lpips_pairwise,
        )
        from elvis_tpu.models.io import default_checkpoint_dir, load_params
        from elvis_tpu.ops.filter import gaussian_blur
        from elvis_tpu.ops.resize import resize
        from elvis_tpu.train.data import dead_leaves

        ckpt = os.path.join(default_checkpoint_dir(), "perceptual")
        if not os.path.isdir(ckpt):
            pytest.skip("no trained perceptual checkpoint")
        model = PerceptualNet()
        params = load_params(model, ckpt, jnp.zeros((1, 64, 64, 3)))

        clean = dead_leaves(jax.random.PRNGKey(4242), 8, 64, 64)
        blur = gaussian_blur(clean, 5, 1.5)
        down = resize(resize(clean, (16, 16), method="area"), (64, 64), method="linear")
        noise = jnp.clip(
            clean + 30.0 * jax.random.normal(jax.random.PRNGKey(9), clean.shape), 0, 255
        )
        levels = (0.25, 0.5, 0.75)
        correct = total = 0
        for path in (blur, down, noise):
            dists = [
                np.asarray(lpips_pairwise(model, params, clean, (1 - t) * clean + t * path))
                for t in levels
            ]
            for i in range(len(levels)):
                for j in range(i + 1, len(levels)):
                    correct += int((dists[j] > dists[i]).sum())
                    total += dists[i].size
        assert correct / total >= 0.9, correct / total
        anchor = np.asarray(lpips_pairwise(model, params, clean, clean))
        assert anchor.max() < 1e-3
        # the module-level metric auto-loads the same checkpoint
        d = np.asarray(lpips_distance(clean, blur))
        assert (d > 0).all()


class TestMetricValidation:
    """Behavioral validation of the two surrogate metrics (VERDICT r2 #4):
    the block-matching FVMD must behave like a motion-dynamics distance
    (monotone in injected temporal jitter), and the trained 'lpips' must
    rank-correlate with PSNR/SSIM orderings across a real RD sweep."""

    def test_fvmd_monotone_in_temporal_jitter(self, rng):
        """Increasing frame-wise random displacement of a smooth pan =>
        increasing FVMD vs the clean pan (the reference metric's defining
        behaviour; elvis.py:3358)."""
        from elvis_tpu.metrics.fvmd import fvmd
        from elvis_tpu.train.data import natural_frames

        import jax

        scene = np.asarray(natural_frames(jax.random.PRNGKey(11), 1, 96, 128))[0]
        n = 16

        def pan(jitter_mag, seed):
            r = np.random.default_rng(seed)
            frames = []
            for t in range(n):
                dy = t  # smooth 1 px/frame pan
                jy, jx = (r.integers(-jitter_mag, jitter_mag + 1, 2)
                          if jitter_mag else (0, 0))
                frames.append(np.roll(np.roll(scene, dy + jy, 0), 2 * t + jx, 1))
            return np.stack(frames).astype(np.float32)

        ref = pan(0, 0)
        ds = [fvmd(ref, pan(m, 1), block_size=16, radius=6) for m in (0, 1, 2, 4)]
        assert np.isfinite(ds).all()
        assert ds[0] < 1e-6
        # monotone non-decreasing in jitter magnitude
        assert ds[1] < ds[2] < ds[3], ds

    def test_lpips_rank_correlates_with_psnr_on_rd_sweep(self, rng):
        """Across an actual NVC QP ladder (real codec degradations at
        increasing strength), the trained lpips ordering must match the
        PSNR ordering (Spearman rho <= -0.9: higher PSNR, lower lpips)."""
        import os

        import jax.numpy as jnp

        from elvis_tpu.codec.nvc.codec import decode as nvc_decode
        from elvis_tpu.codec.nvc.codec import encode as nvc_encode
        from elvis_tpu.metrics import masked_psnr
        from elvis_tpu.metrics.perceptual import lpips_distance
        from elvis_tpu.models.io import default_checkpoint_dir

        if not os.path.isdir(os.path.join(default_checkpoint_dir(), "perceptual")):
            pytest.skip("no trained perceptual checkpoint")
        from elvis_tpu.train.evaluate import photo_clips_multi

        clips = photo_clips_multi(2, 96, 1)
        clean = (clips[0] if clips
                 else (rng.random((2, 96, 96, 3)) * 255)).astype(np.uint8)
        psnrs, lpipses = [], []
        for qp in (14, 22, 30, 38, 46):
            dec, _ = nvc_decode(nvc_encode(clean, qp=qp))
            c = jnp.asarray(clean, jnp.float32)
            d = jnp.asarray(dec, jnp.float32)
            psnrs.append(float(masked_psnr(c, d).mean()))
            lpipses.append(float(np.asarray(lpips_distance(c, d)).mean()))

        def spearman(a, b):
            ra = np.argsort(np.argsort(a)).astype(float)
            rb = np.argsort(np.argsort(b)).astype(float)
            ra -= ra.mean(); rb -= rb.mean()
            return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))

        rho = spearman(psnrs, lpipses)
        assert rho <= -0.9, (rho, psnrs, lpipses)
