"""Restoration ops: oracles + quality properties (restore must beat degraded)."""

import os

import numpy as np
import jax.numpy as jnp

from elvis_tpu.degrade import adaptive_blur, adaptive_downsample, apply_selective_removal, stretch_frames
from elvis_tpu.restore import (
    get_restorer,
    progressive_restore,
    restore_blur_unsharp,
    restore_downsample_lanczos,
    restore_removal_diffusion,
    restore_removal_temporal,
    temporal_blend,
)
from elvis_tpu.restore.hybrid import blended_restoration
from elvis_tpu.restore.temporal import feathered_tile_apply


def _mse(a, b):
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


class TestLanczosRestore:
    def test_untouched_blocks_passthrough(self, tiny_video):
        frames = jnp.asarray(tiny_video)
        levels = jnp.zeros((5, 6, 8), dtype=jnp.int32)
        out = restore_downsample_lanczos(frames, levels, 8)
        np.testing.assert_array_equal(np.asarray(out), tiny_video)

    def test_matches_per_block_oracle(self, tiny_video, rng):
        """Reference elvis.py:2802-2818 semantics: re-simulate area down,
        then Lanczos-4 up, per degraded block. (The reference's measured
        gains for this restorer are SSIM-based on natural content; here we
        assert exact behaviour.)"""
        from elvis_tpu.ops.resize import resize

        b = 8
        frames = jnp.asarray(tiny_video.astype(np.float32))
        scores = jnp.asarray(rng.random((5, 6, 8)).astype(np.float32))
        degraded, levels = adaptive_downsample(frames, scores, b)
        restored = np.asarray(restore_downsample_lanczos(degraded, levels, b))
        lv = np.asarray(levels)
        dg = np.asarray(degraded)
        for i, j in [(0, 0), (2, 3), (5, 7)]:
            blk = jnp.asarray(dg[1, i * b : (i + 1) * b, j * b : (j + 1) * b][None])
            f = 2 ** int(lv[1, i, j])
            if f > 1:
                small = resize(blk, (b // f, b // f), method="area")
                want = np.asarray(resize(small, (b, b), method="lanczos4"))[0]
            else:
                want = np.asarray(blk)[0]
            np.testing.assert_allclose(
                restored[1, i * b : (i + 1) * b, j * b : (j + 1) * b], want, atol=1e-3
            )

    def test_improves_upsampling_of_smooth_content(self):
        """The primitive claim behind the restorer: Lanczos-4 upsampling
        beats the degradation's bilinear upsampling on smooth signals."""
        from elvis_tpu.ops.resize import resize

        yy, xx = np.mgrid[0:64, 0:64]
        img = (128 + 60 * np.sin(2 * np.pi * xx / 32) + 40 * np.cos(2 * np.pi * yy / 24)).astype(np.float32)[None]
        small = resize(jnp.asarray(img), (32, 32), method="area")
        up_lin = resize(small, (64, 64), method="linear")
        up_lcz = resize(small, (64, 64), method="lanczos4")
        assert _mse(up_lcz, img) < _mse(up_lin, img)


class TestUnsharpRestore:
    def test_matches_formula_oracle(self, tiny_video):
        """elvis.py:2854-2860: amount=0.5L, sigma=max(1,L), per block."""
        from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
        from elvis_tpu.ops.filter import gaussian_blur

        b, L = 8, 3
        frames = jnp.asarray(tiny_video.astype(np.float32))
        levels = jnp.full((5, 6, 8), L, dtype=jnp.int32)
        got = restore_blur_unsharp(frames, levels, b)
        blocks = split_into_blocks(frames, b)
        blurred = gaussian_blur(blocks, int(round(L * 6 + 1)) | 1, float(L), h_axis=-3, w_axis=-2)
        want = combine_blocks(jnp.clip((1 + 0.5 * L) * blocks - 0.5 * L * blurred, 0, 255))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    def test_recovers_contrast(self, tiny_video):
        """Unsharp after blur must raise variance back toward the source
        (the sharpening direction is right even where MSE is not the
        reference's metric)."""
        frames = jnp.asarray(tiny_video.astype(np.float32))
        degraded, levels = adaptive_blur(frames, jnp.full((5, 6, 8), 0.3), 8)
        restored = restore_blur_unsharp(degraded, levels, 8)
        assert float(jnp.var(restored)) > float(jnp.var(degraded))

    def test_level0_passthrough(self, tiny_video):
        frames = jnp.asarray(tiny_video)
        out = restore_blur_unsharp(frames, jnp.zeros((5, 6, 8), jnp.int32), 8)
        np.testing.assert_array_equal(np.asarray(out), tiny_video)


class TestProgressive:
    def test_all_level_zero_identity(self, tiny_video):
        frames = jnp.asarray(tiny_video)
        out = progressive_restore(frames, jnp.zeros((5, 6, 8), jnp.int32), 8)
        np.testing.assert_array_equal(np.asarray(out), tiny_video)

    def test_injects_authentic_blocks(self, tiny_video, rng):
        b = 8
        frames = jnp.asarray(tiny_video.astype(np.float32))
        scores = jnp.asarray((rng.random((5, 6, 8)) > 0.5).astype(np.float32))  # levels 0 or 3
        degraded, levels = adaptive_downsample(frames, scores, b)
        out = progressive_restore(degraded, levels, b)
        # level-0 blocks must be bit-identical to the degraded frame
        keep = np.repeat(np.repeat(np.asarray(levels) == 0, b, 1), b, 2)
        np.testing.assert_allclose(
            np.asarray(out)[keep], np.asarray(degraded)[keep], atol=1e-3
        )

    def test_beats_or_matches_plain_lanczos(self, tiny_video, rng):
        b = 8
        frames = jnp.asarray(tiny_video.astype(np.float32))
        scores = jnp.asarray(rng.random((5, 6, 8)).astype(np.float32))
        degraded, levels = adaptive_downsample(frames, scores, b)
        prog = progressive_restore(degraded, levels, b)
        assert _mse(prog, frames) < _mse(degraded, frames) * 1.5

    def test_registry_entry(self):
        fn = get_restorer("downsample", "progressive_lanczos")
        assert callable(fn)

    def test_fused_final_stage_matches_plain(self, tiny_video, rng):
        """A .phase-carrying upsample_fn routes the last stage through the
        phase-space fused path (4K lever, VERDICT r4 #3); output must
        match the plain per-stage path."""
        from elvis_tpu.models import SRNetCompact
        from elvis_tpu.models.srnet import srnet_upsample_fn

        b = 8
        model = SRNetCompact(features=8, num_convs=1)
        import jax

        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        params["params"]["tail"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(1),
                              params["params"]["tail"]["kernel"].shape) * 0.05
        )
        up = srnet_upsample_fn(model, params)

        def plain(f):  # same net, no .phase attribute
            return model.apply(params, f.astype(jnp.float32))

        frames = jnp.asarray(tiny_video.astype(np.float32))
        scores = jnp.asarray(rng.random((5, 6, 8)).astype(np.float32))
        degraded, levels = adaptive_downsample(frames, scores, b)
        fused = progressive_restore(degraded, levels, b, upsample_fn=up)
        ref = progressive_restore(degraded, levels, b, upsample_fn=plain)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=0.1)


class TestInpaint:
    def _setup(self, tiny_video, rng, amount=0.25):
        frames = jnp.asarray(tiny_video)
        scores = jnp.asarray(rng.random((5, 6, 8)).astype(np.float32))
        shrunk, mask = apply_selective_removal(frames, scores, 8, amount)
        stretched = stretch_frames(shrunk, mask, 8)
        return frames, stretched, mask

    def test_diffusion_fills_holes(self, tiny_video, rng):
        frames, stretched, mask = self._setup(tiny_video, rng)
        out = restore_removal_diffusion(stretched, mask, 8, iters=100)
        hole = np.repeat(np.repeat(np.asarray(mask) == 1, 8, 1), 8, 2)
        # holes are no longer black and closer to the reference than black
        assert np.asarray(out)[hole].mean() > 20
        assert _mse(out, frames) < _mse(stretched, frames)

    def test_diffusion_keeps_known_pixels(self, tiny_video, rng):
        frames, stretched, mask = self._setup(tiny_video, rng)
        out = restore_removal_diffusion(stretched, mask, 8, iters=20)
        keep = np.repeat(np.repeat(np.asarray(mask) == 0, 8, 1), 8, 2)
        np.testing.assert_array_equal(np.asarray(out)[keep], np.asarray(stretched)[keep])

    def test_temporal_beats_diffusion_on_static_clip(self, rng):
        """On a static-content clip, temporal propagation recovers blocks
        exactly; diffusion can only smooth."""
        frame = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        clip = jnp.asarray(np.stack([frame] * 5))
        scores = jnp.asarray(rng.random((5, 6, 8)).astype(np.float32))
        shrunk, mask = apply_selective_removal(clip, scores, 8, 0.25)
        stretched = stretch_frames(shrunk, mask, 8)
        t_out = restore_removal_temporal(stretched, mask, 8)
        d_out = restore_removal_diffusion(stretched, mask, 8, iters=100)
        assert _mse(t_out, clip) < _mse(d_out, clip)
        assert _mse(t_out, clip) < 1e-6  # exact recovery


class TestTemporalBlend:
    def test_matches_recurrence_oracle(self, tiny_video):
        out = np.asarray(temporal_blend(jnp.asarray(tiny_video.astype(np.float32)), 0.1))
        want = tiny_video.astype(np.float64).copy()
        for t in range(1, 5):
            want[t] = 0.9 * want[t] + 0.1 * want[t - 1]
        np.testing.assert_allclose(out, want, atol=1e-3)

    def test_zero_blend_identity(self, tiny_video):
        x = jnp.asarray(tiny_video)
        np.testing.assert_array_equal(np.asarray(temporal_blend(x, 0.0)), tiny_video)


class TestHybridAndTiles:
    def test_blend_weights(self, tiny_video):
        classical = jnp.asarray(tiny_video.astype(np.float32))
        neural = jnp.zeros_like(classical)
        levels = jnp.full((5, 6, 8), 3, dtype=jnp.int32)
        out = blended_restoration(classical, neural, levels, 8, alpha=0.5, max_level=3)
        np.testing.assert_allclose(np.asarray(out), tiny_video * 0.5, atol=1e-3)

    def test_feathered_identity_fn(self, tiny_video):
        x = jnp.asarray(tiny_video.astype(np.float32))
        out = feathered_tile_apply(x, lambda t: t, tile=16, halo=4)
        np.testing.assert_allclose(np.asarray(out), tiny_video, atol=1e-3)


class TestMotionCompensatedInpaint:
    """VERDICT #4: flow-guided-lite propagation (block motion warping,
    reference ProPainter slot elvis.py:1458) must beat co-located
    propagation on a panning clip."""

    def _pan_clip(self, rng, n=8, h=48, w=64, pan=3):
        from elvis_tpu.ops.filter import gaussian_blur

        wide = (rng.random((h, w + pan * n, 3)) * 255).astype(np.float32)
        wide = np.asarray(gaussian_blur(jnp.asarray(wide), 5, 1.2))  # band-limit
        clip = np.stack([wide[:, pan * t : pan * t + w] for t in range(n)])
        return np.clip(clip, 0, 255).astype(np.uint8)

    def test_mc_beats_colocated_on_pan(self, rng):
        from elvis_tpu.core.blocks import upsample_map

        clip = self._pan_clip(rng)
        n, h, w = clip.shape[:3]
        by, bx = h // 8, w // 8
        mask = (rng.random((n, by, bx)) < 0.2).astype(np.int8)
        holes = np.asarray(upsample_map(jnp.asarray(mask), 8))[..., None].astype(bool)
        holed = jnp.asarray(np.where(holes, 0, clip))
        m = jnp.asarray(mask)

        mc = restore_removal_temporal(holed, m, 8, motion_radius=4)
        zm = restore_removal_temporal(holed, m, 8, motion_radius=0)

        def hole_mse(out):
            d = (np.asarray(out, np.float64) - clip.astype(np.float64)) ** 2
            return float(d[holes[..., 0]].mean())

        assert hole_mse(mc) < 0.5 * hole_mse(zm), (hole_mse(mc), hole_mse(zm))

    def test_mc_noop_on_static_clip(self, tiny_video, rng):
        """Static content: estimated motion is zero, so MC == co-located."""
        from elvis_tpu.core.blocks import upsample_map

        clip = np.broadcast_to(tiny_video[:1], tiny_video.shape).copy()
        mask = (rng.random((5, 6, 8)) < 0.25).astype(np.int8)
        holes = np.asarray(upsample_map(jnp.asarray(mask), 8))[..., None].astype(bool)
        holed = jnp.asarray(np.where(holes, 0, clip))
        m = jnp.asarray(mask)
        mc = np.asarray(restore_removal_temporal(holed, m, 8, motion_radius=4))
        zm = np.asarray(restore_removal_temporal(holed, m, 8, motion_radius=0))
        np.testing.assert_array_equal(mc, zm)


class TestMotionHint:
    """Encoder-side motion hint (r5, VERDICT r4 #1): ops.motion.motion_hint
    computed on the PRISTINE frames rides the mask sidecar; the client
    fill consumes it as motion_field — decoder-side estimation cannot
    recover true motion on low-bitrate content (the codec's inter
    prediction anchors decoded content toward its reference)."""

    def _int_pan_clip(self, rng, n=6, h=96, w=128, dy=2, dx=3):
        from elvis_tpu.ops.filter import gaussian_blur

        canvas = (rng.random((h + dy * n, w + dx * n, 3)) * 255).astype(np.float32)
        canvas = np.asarray(gaussian_blur(jnp.asarray(canvas), 5, 1.5))
        clip = np.stack([canvas[dy * t : dy * t + h, dx * t : dx * t + w]
                         for t in range(n)])
        return np.clip(clip, 0, 255).astype(np.uint8)

    def test_hint_recovers_integer_pan_exactly(self, rng):
        from elvis_tpu.core.blocks import upsample_map
        from elvis_tpu.ops.motion import motion_field_from_hint, motion_hint

        clip = self._int_pan_clip(rng)
        n, h, w = clip.shape[:3]
        gmv, dev = motion_hint(jnp.asarray(clip), 8)
        # the crop window slides by (+dy,+dx) => content moves by (-dy,-dx);
        # the hint transports QUARTER-PEL units
        np.testing.assert_array_equal(
            np.asarray(gmv), np.tile([[-8, -12]], (n - 1, 1)))
        assert int((np.asarray(dev) != 0).sum()) == 0
        mv = motion_field_from_hint(gmv, dev, h // 8, w // 8)
        mask = np.zeros((n, h // 8, w // 8), np.int8)
        mask[2, 4:6, 5:8] = 1
        holes = np.asarray(upsample_map(jnp.asarray(mask), 8))[..., None].astype(bool)
        holed = jnp.asarray(np.where(holes, 0, clip))
        out = restore_removal_temporal(holed, jnp.asarray(mask), 8,
                                       motion_field=mv)
        np.testing.assert_array_equal(
            np.asarray(out)[holes[..., 0]], clip[holes[..., 0]])

    def test_displacement_composition_semantics(self, rng):
        """Trajectory composition (r5): global fields reproduce the
        cumulative sum exactly; object fields follow the mover through
        the grid (the co-located cumsum mixed pan into object chains —
        the r4 fg inversion's root cause)."""
        from elvis_tpu.restore.inpaint import _compose_displacements

        n, by, bx = 6, 5, 7
        gm = rng.integers(-3, 4, (n, 2)).astype(np.float32)
        gm[0] = 0
        mv = jnp.broadcast_to(jnp.asarray(gm)[:, None, None, :],
                              (n, by, bx, 2))
        back, fwd = _compose_displacements(mv, 3, 8)
        cum = np.cumsum(gm, axis=0)
        for d in range(1, 4):
            for t in range(n):
                if t - d >= 0:
                    np.testing.assert_allclose(
                        np.asarray(back[d - 1][t, 2, 3]), cum[t] - cum[t - d],
                        atol=1e-4)
                if t + d <= n - 1:
                    np.testing.assert_allclose(
                        np.asarray(fwd[d - 1][t, 2, 3]), cum[t] - cum[t + d],
                        atol=1e-4)
        # object: one block-row mover at +2 blocks/frame over static bg
        n, by, bx, bs = 5, 8, 16, 8
        mvl = np.zeros((n, by, bx, 2), np.float32)
        for t in range(1, n):
            c = 2 * t + 3
            if c < bx:
                mvl[t, 4, c] = (0, 16.0)
        back, fwd = _compose_displacements(jnp.asarray(mvl), 3, bs)
        # content at (t=4, col 11) came from t-2 at col 7: back = 32, not
        # the co-located 16+0
        np.testing.assert_allclose(np.asarray(back[1][4, 4, 11]), [0, 32.0],
                                   atol=0.5)
        # content at (t=2, col 7) sits at t+2 col 11: fwd disp = -32
        np.testing.assert_allclose(np.asarray(fwd[1][2, 4, 7]), [0, -32.0],
                                   atol=0.5)

    def test_moving_object_fill_beats_colocated(self, rng):
        """End-to-end fill: holes that track a moving object (its d=1
        neighbours hole the same content) must recover the OBJECT's
        texture from d=2 via the composed trajectory; zero-motion reads
        co-located background there."""
        n, h, w, b = 5, 64, 128, 8
        bg = (rng.random((h, w, 3)) * 255).astype(np.float32)
        tex = (rng.random((16, 16, 3)) * 255).astype(np.float32)
        clip = np.empty((n, h, w, 3), np.float32)
        mask = np.zeros((n, h // b, w // b), np.int8)
        truef = np.zeros((n, h // b, w // b, 2), np.float32)
        for t in range(n):
            f = bg.copy()
            x0 = 16 * t + 8  # +2 blocks/frame
            f[32:48, x0:x0 + 16] = tex
            clip[t] = f
            if 1 <= t <= 3:
                mask[t, 4, (x0 // b)] = 1  # hole the object's leading block
            if t >= 1:
                truef[t, 4, x0 // b:(x0 + 16) // b] = (0, 16.0)
        from elvis_tpu.core.blocks import upsample_map

        holes = np.asarray(upsample_map(jnp.asarray(mask), b))[..., None]
        holed = jnp.asarray(np.where(holes.astype(bool), 0.0, clip))
        out = restore_removal_temporal(
            holed, jnp.asarray(mask), b, window=3,
            motion_field=jnp.asarray(truef))
        out0 = restore_removal_temporal(holed, jnp.asarray(mask), b,
                                        window=3, motion_radius=0)
        hp = holes.astype(bool)[..., 0]

        def hole_mse(o):
            d = (np.asarray(o, np.float32) - clip) ** 2
            return float(d.mean(-1)[hp].mean())

        assert hole_mse(out) * 4 < hole_mse(out0), (
            hole_mse(out), hole_mse(out0))

    def test_hint_roundtrips_mask_sidecar(self, tmp_path, rng):
        from elvis_tpu.codec.sidecar import (
            load_removal_masks_npz, save_removal_masks_npz,
        )

        masks = rng.random((4, 6, 8)) < 0.3
        gmv = rng.integers(-30, 30, (3, 2)).astype(np.int16)
        dev = rng.integers(-5, 5, (3, 2, 2, 2)).astype(np.int8)
        p = str(tmp_path / "m.npz")
        size = save_removal_masks_npz(masks, p, motion_gmv=gmv, motion_dev=dev)
        assert size == os.path.getsize(p)
        m2, g2, d2 = load_removal_masks_npz(p, with_motion=True)
        np.testing.assert_array_equal(m2, masks)
        np.testing.assert_array_equal(g2, gmv)
        np.testing.assert_array_equal(d2, dev)
        # hint-free sidecars load as None (old streams stay decodable)
        p2 = str(tmp_path / "m0.npz")
        save_removal_masks_npz(masks, p2)
        _, g0, d0 = load_removal_masks_npz(p2, with_motion=True)
        assert g0 is None and d0 is None

    def test_hinted_fill_through_chunked_driver(self, rng):
        """The hint rides the temporal halo/chunk machinery as one more
        frame-axis array: chunked == unchunked exactly (a chunk's first
        per-pair entry is sliced in but never consumed)."""
        from elvis_tpu.core.blocks import upsample_map
        from elvis_tpu.ops.motion import motion_field_from_hint, motion_hint
        from elvis_tpu.pipeline.config import ElvisConfig
        from elvis_tpu.pipeline.run import _apply_inpaint_backend, _DataParallel
        from elvis_tpu.restore.backends import resolve_inpaint_backend

        clip = self._int_pan_clip(rng, n=10)
        n, h, w = clip.shape[:3]
        gmv, dev = motion_hint(jnp.asarray(clip), 8)
        mv = np.asarray(motion_field_from_hint(gmv, dev, h // 8, w // 8))
        mask = (rng.random((n, h // 8, w // 8)) < 0.2).astype(np.int8)
        holes = np.asarray(upsample_map(jnp.asarray(mask), 8))[..., None].astype(bool)
        holed = np.where(holes, 0, clip)

        cfg = ElvisConfig(propainter_neighbor_length=2,
                          propainter_parallel_chunk_length=4)
        fn, prov = resolve_inpaint_backend("temporal", cfg)
        dp = _DataParallel(False)
        chunked = _apply_inpaint_backend(dp, "temporal", fn, holed, mask, 8,
                                         motion_field=mv)
        direct = fn(jnp.asarray(holed), jnp.asarray(mask), 8, mv=jnp.asarray(mv))
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(direct),
                                   atol=1e-3)


class TestTemporalWindowKnobs:
    """The reference's ProPainter/E2FGVI window knobs drive this
    framework's propagation window + halo overlap (elvis.py:1506-1566,
    1864-1906) — previously declared but inert (VERDICT r2 #3)."""

    def _cfg(self, **kw):
        from elvis_tpu.pipeline.config import ElvisConfig

        return ElvisConfig(**kw)

    def test_propainter_knobs_set_window_and_overlap(self):
        from elvis_tpu.restore.backends import resolve_inpaint_backend

        fn, prov = resolve_inpaint_backend("temporal", self._cfg())
        assert fn.temporal_overlap == 16 and "window=8" in prov  # 2*4 default
        fn2, prov2 = resolve_inpaint_backend(
            "temporal", self._cfg(propainter_neighbor_length=2)
        )
        assert fn2.temporal_overlap == 8 and "window=4" in prov2
        # explicit chunk overlap wins
        fn3, _ = resolve_inpaint_backend(
            "temporal", self._cfg(propainter_chunk_overlap=6)
        )
        assert fn3.temporal_overlap == 6

    def test_subvideo_length_caps_window(self):
        from elvis_tpu.restore.backends import resolve_inpaint_backend

        _, prov = resolve_inpaint_backend(
            "temporal",
            self._cfg(propainter_neighbor_length=20, propainter_subvideo_length=9),
        )
        assert "window=4" in prov  # (9-1)//2

    def test_e2fgvi_stride_sets_neural_window(self):
        from elvis_tpu.restore.backends import resolve_inpaint_backend

        fn, prov = resolve_inpaint_backend(
            "neural", self._cfg(e2fgvi_neighbor_stride=3, auto_load_checkpoints=False)
        )
        assert fn.temporal_overlap == 12 and "window=6" in prov
        fn2, _ = resolve_inpaint_backend(
            "neural", self._cfg(e2fgvi_chunk_overlap=5, auto_load_checkpoints=False)
        )
        assert fn2.temporal_overlap == 5

    def test_window_bounds_the_temporal_search(self, rng):
        """A hole whose only clean source is 6 frames away is filled from
        it when the configured window reaches (w=6) and falls back to PDE
        diffusion when it doesn't (w=2) — the knob changes the output."""
        from elvis_tpu.restore.backends import resolve_inpaint_backend

        n, h, w = 8, 16, 16
        clip = np.full((n, h, w, 3), 40, np.uint8)
        clip[:, 0:8, 0:8] = 200  # bright block content
        mask = np.zeros((n, 2, 2), np.int8)
        mask[0:6, 0, 0] = 1  # removed in frames 0..5; frame 6+ clean
        holed = clip.copy()
        holed[0:6, 0:8, 0:8] = 0
        far, _ = resolve_inpaint_backend(
            "temporal", self._cfg(propainter_neighbor_length=3)  # window 6
        )
        near, _ = resolve_inpaint_backend(
            "temporal", self._cfg(propainter_neighbor_length=1)  # window 2
        )
        out_far = np.asarray(far(jnp.asarray(holed), jnp.asarray(mask), 8))
        out_near = np.asarray(near(jnp.asarray(holed), jnp.asarray(mask), 8))
        # reachable source: frame 0's hole recovers the bright content
        assert abs(float(out_far[0, 2:6, 2:6].mean()) - 200) < 10
        # unreachable: PDE fill pulls toward the dark surround instead
        assert float(out_near[0, 2:6, 2:6].mean()) < 150
        assert not np.array_equal(out_far, out_near)


class TestSrTierSelection:
    """The SR quality ladder (VERDICT r2 #1): 'srnet_ensemble' averages
    the serving + RRDB tiers (decorrelated errors; the measured-best
    quality tier on the multi-crop photo holdout) and generic slots
    resolve to the measured-best tier."""

    def _cfg(self, **kw):
        from elvis_tpu.pipeline.config import ElvisConfig

        return ElvisConfig(**kw)

    def test_ensemble_and_generic_resolution(self):
        import os

        import pytest

        from elvis_tpu.models.io import default_checkpoint_dir
        from elvis_tpu.restore.backends import resolve_sr_backend

        root = default_checkpoint_dir()
        if not (os.path.isdir(os.path.join(root, "srnet"))
                and os.path.isdir(os.path.join(root, "srnet_compact"))):
            pytest.skip("shipped SR checkpoints not present")
        fn, prov = resolve_sr_backend("srnet_ensemble", self._cfg())
        assert "srnet_ensemble" in prov
        assert "srnet_compact" in prov and "checkpoints/srnet" in prov
        # generic slot picks the measured-best tier: the distilled
        # student when shipped (r4), else the ensemble
        _, gprov = resolve_sr_backend("realesrgan", self._cfg())
        if os.path.isdir(os.path.join(root, "srnet_student")):
            assert "srnet_student" in gprov
        else:
            assert "srnet_ensemble" in gprov
        # the resolved restorer runs and preserves shape
        frames = jnp.asarray(np.full((1, 16, 16, 3), 128, np.float32))
        levels = jnp.ones((1, 2, 2), jnp.int32)
        out = fn(frames, levels, 8)
        assert out.shape == frames.shape

    def test_generic_without_checkpoints_is_lanczos(self):
        from elvis_tpu.restore.backends import resolve_sr_backend

        _, prov = resolve_sr_backend(
            "realesrgan", self._cfg(auto_load_checkpoints=False)
        )
        assert "lanczos" in prov

    def test_staged_upsampler_splits_final_stage(self):
        """StagedUpsampler runs `prefix` on every stage but the last and
        `final` on the last — the 4K tier's contract (the final stage is
        ~75% of the loop's FLOPs at 4K)."""
        from elvis_tpu.restore.progressive import (
            StagedUpsampler, lanczos_upsample_2x, progressive_restore)

        calls = []

        def tag(name):
            def up(f):
                calls.append((name, f.shape[-3]))
                return lanczos_upsample_2x(f)

            return up

        f = jnp.asarray(np.full((1, 32, 48, 3), 128, np.float32))
        m = jnp.full((1, 4, 6), 3, jnp.int32)
        out = progressive_restore(
            f, m, 8, upsample_fn=StagedUpsampler(tag("pre"), tag("fin")),
            max_level=3,
        )
        assert out.shape == f.shape
        assert calls == [("pre", 4), ("pre", 8), ("fin", 16)]
        # numerically identical to the plain path when both fns match
        plain = progressive_restore(f, m, 8, upsample_fn=lanczos_upsample_2x,
                                    max_level=3)
        staged = progressive_restore(
            f, m, 8,
            upsample_fn=StagedUpsampler(lanczos_upsample_2x, lanczos_upsample_2x),
            max_level=3,
        )
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(staged))

    def test_srnet_4k_backend_loads_staged(self, tmp_path, monkeypatch):
        """'srnet_4k' resolves to a StagedUpsampler built from the
        serving prefix + the narrow finisher recorded in its meta."""
        import jax
        import orbax.checkpoint as ocp

        from elvis_tpu.models import SRNetCompact
        from elvis_tpu.restore import backends as B
        from elvis_tpu.restore.progressive import StagedUpsampler

        ckptr = ocp.StandardCheckpointer()
        base = SRNetCompact()
        bp = jax.jit(base.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        ckptr.save(str(tmp_path / "srnet_compact"), bp)
        fin = SRNetCompact(features=16, num_convs=2)
        fp = jax.jit(fin.init)(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
        ckptr.save(str(tmp_path / "srnet_4k"), fp)
        ckptr.wait_until_finished()
        (tmp_path / "srnet_4k.meta.json").write_text(
            '{"features": 16, "num_convs": 2, "prefix": "srnet_compact"}')
        monkeypatch.setattr("elvis_tpu.models.io.default_checkpoint_dir",
                            lambda: str(tmp_path))
        fn, prov = B.resolve_sr_backend("srnet_4k", self._cfg())
        assert "srnet_4k" in prov
        frames = jnp.asarray(np.full((1, 16, 16, 3), 128, np.float32))
        out = fn(frames, jnp.ones((1, 2, 2), jnp.int32), 8)
        assert out.shape == frames.shape
        # the raw upsampler object is staged (prefix + final differ)
        up, _ = B._srnet_upsampler(self._cfg(), which="srnet_4k")
        assert isinstance(up, StagedUpsampler)


class TestInpaintSplitBackend:
    """The neural inpaint backend's two-phase split (seed through the
    temporal halo machinery, per-frame polish through plain chunking)
    must equal the fused backend exactly — the split exists only to
    bound peak HBM on long 1080p clips (docs/DESIGN.md round 3)."""

    def _cfg(self, **kw):
        from elvis_tpu.pipeline.config import ElvisConfig

        return ElvisConfig(**kw)

    def _backend(self):
        import os

        import pytest

        from elvis_tpu.restore.backends import resolve_inpaint_backend

        if not os.path.exists("checkpoints/inpaint"):
            pytest.skip("shipped inpaint checkpoint not present")
        return resolve_inpaint_backend("neural", self._cfg())

    def test_seed_plus_post_equals_fused(self, tiny_video, rng):
        fn, _ = self._backend()
        assert hasattr(fn, "split")
        mask = jnp.asarray((rng.random((5, 6, 8)) < 0.2).astype(np.int8))
        frames = jnp.asarray(tiny_video.astype(np.float32))
        fused = np.asarray(fn(frames, mask, 8))
        seeded = fn.split(frames, mask, 8)
        split = np.asarray(fn.split.post(seeded, mask, 8))
        np.testing.assert_array_equal(fused, split)

    def test_split_through_chunked_driver(self, tiny_video, rng, monkeypatch):
        """_apply_inpaint_backend routes split backends through the
        bounded-memory chunked driver; chunked == fused full-clip."""
        from elvis_tpu.pipeline import run as run_mod
        from elvis_tpu.pipeline.run import _DataParallel, _apply_inpaint_backend

        fn, _ = self._backend()
        n, h, w = 8, 16, 16
        clip = np.repeat(tiny_video[:1, :h, :w], n, axis=0).astype(np.float32)
        mask = (rng.random((n, h // 8, w // 8)) < 0.3).astype(np.int8)
        fused = np.asarray(fn(jnp.asarray(clip), jnp.asarray(mask), 8))
        monkeypatch.setattr(run_mod, "_FRAME_CHUNK_PIXEL_BUDGET", 3 * h * w)
        dp = _DataParallel(None, None)
        out = _apply_inpaint_backend(dp, "neural", fn, clip, mask, 8)
        # atol: the chunked driver jits its calls; XLA fuses the bf16
        # convs differently than the eager fused path (max ~0.005/255)
        np.testing.assert_allclose(np.asarray(out), fused, atol=0.02)
