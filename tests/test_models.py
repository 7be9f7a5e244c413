"""Neural model family: shapes, graceful-degradation properties, and a
real sharded train step on the 8-device mesh (loss must decrease)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elvis_tpu.models import (
    DeblurUNet,
    DiffusionRestorer,
    InpaintNet,
    SRNet,
    SRNetCompact,
    SaliencyNet,
    srnet_upsample_fn,
)
from elvis_tpu.parallel import make_mesh
from elvis_tpu.train import Trainer, synthetic_sr_batch, synthetic_video_batch


class TestSRNet:
    def test_output_shape_and_range(self):
        model = SRNet(features=16, growth=8, num_blocks=1)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 3)) * 255, jnp.float32)
        y = model.apply(params, x)
        assert y.shape == (2, 32, 32, 3)
        assert float(y.min()) >= 0 and float(y.max()) <= 255

    def test_untrained_equals_lanczos_base(self):
        """Residual design with zero-init tail: a fresh model IS the
        Lanczos-4 upsampler (training can only improve on the classical
        baseline)."""
        from elvis_tpu.ops.resize import resize

        model = SRNet(features=16, growth=8, num_blocks=1)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)) * 255, jnp.float32)
        y = model.apply(params, x)
        base = jnp.clip(resize(x, (32, 32), method="lanczos4"), 0, 255)
        np.testing.assert_allclose(np.asarray(y), np.asarray(base), atol=1e-3)

    def test_compact_untrained_equals_lanczos(self):
        """The serving tier shares SRNet's residual-over-lanczos contract."""
        from elvis_tpu.ops.resize import resize

        model = SRNetCompact(features=8, num_convs=2)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        x = jnp.asarray(np.random.default_rng(1).random((2, 16, 16, 3)) * 255, jnp.float32)
        y = model.apply(params, x)
        base = jnp.clip(resize(x, (32, 32), method="lanczos4"), 0, 255)
        np.testing.assert_allclose(np.asarray(y), np.asarray(base), atol=1e-3)

    @pytest.mark.parametrize("make", [
        lambda: SRNetCompact(features=8, num_convs=2),
        lambda: SRNet(features=16, growth=8, num_blocks=1),
    ])
    def test_phase_output_matches_interleaved(self, make):
        """phase_output mode (the residual-at-input-resolution 4K lever,
        VERDICT r4 #3) is bit-near-equal to the standard forward — with a
        RANDOM tail so the phase-domain tail conv is actually exercised."""
        from elvis_tpu.models.srnet import srnet_phase_fn
        from elvis_tpu.ops.resize import interleave_phases

        model = make()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        kshape = params["params"]["tail"]["kernel"].shape
        params["params"]["tail"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(1), kshape) * 0.05)
        params["params"]["tail"]["bias"] = (
            jax.random.normal(jax.random.PRNGKey(2), (3,)) * 0.1)
        x = jnp.asarray(
            np.random.default_rng(3).random((2, 24, 16, 3)) * 255, jnp.float32)
        y_ref = model.apply(params, x)
        ph = srnet_phase_fn(model, params)(x)
        assert ph.shape == (2, 24, 16, 2, 2, 3)
        np.testing.assert_allclose(
            np.asarray(interleave_phases(ph)), np.asarray(y_ref), atol=0.05)

    def test_upsample_fn_plugs_into_progressive(self, tiny_video):
        from elvis_tpu.degrade import adaptive_downsample
        from elvis_tpu.restore import progressive_restore

        model = SRNet(features=16, growth=8, num_blocks=1)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        up = srnet_upsample_fn(model, params)
        frames = jnp.asarray(tiny_video[:2].astype(np.float32))
        scores = jnp.full((2, 6, 8), 0.4)
        degraded, levels = adaptive_downsample(frames, scores, 8)
        out = progressive_restore(degraded, levels, 8, upsample_fn=up)
        assert out.shape == frames.shape


class TestDeblurAndInpaint:
    def test_deblur_shapes(self):
        model = DeblurUNet(features=8, levels=2)
        x = jnp.zeros((2, 32, 32, 3))
        smap = jnp.full((2, 4, 4), 3, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, smap, 8)
        y = model.apply(params, x, smap, 8)
        assert y.shape == x.shape

    def test_inpaint_touches_only_holes(self, tiny_video):
        model = InpaintNet(features=8, temporal_window=1)
        frames = jnp.asarray(tiny_video.astype(np.float32))
        mask = jnp.zeros((5, 6, 8), jnp.int8).at[:, 2, 3].set(1)
        params = model.init(jax.random.PRNGKey(0), frames, mask, 8)
        y = np.asarray(model.apply(params, frames, mask, 8))
        keep = np.repeat(np.repeat(np.asarray(mask) == 0, 8, 1), 8, 2)
        np.testing.assert_allclose(y[keep], tiny_video.astype(np.float32)[keep], atol=1e-4)


class TestSaliencyNet:
    def test_output_shape_and_range(self, tiny_video):
        model = SaliencyNet(features=8)
        x = jnp.asarray(tiny_video.astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        s = model.apply(params, x)
        assert s.shape == (5, 48, 64)
        assert float(s.min()) >= 0 and float(s.max()) <= 1


class TestDiffusion:
    def test_sample_shape(self):
        d = DiffusionRestorer(features=8)
        params = d.init(jax.random.PRNGKey(0), (2, 16, 16, 3))
        degraded = jnp.full((2, 16, 16, 3), 128.0)
        out = d.sample(params, degraded, steps=2)
        assert out.shape == (2, 16, 16, 3)
        assert float(out.min()) >= 0 and float(out.max()) <= 255

    def test_adaptive_reinjection_preserves_finished_blocks(self):
        d = DiffusionRestorer(features=8)
        params = d.init(jax.random.PRNGKey(0), (1, 16, 16, 3))
        degraded = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)) * 255, jnp.float32)
        smap = jnp.zeros((1, 2, 2), jnp.int32).at[0, 0, 0].set(2)
        out = np.asarray(d.restore_adaptive(params, degraded, smap, 8, max_rounds=2, steps_per_round=1))
        # blocks with strength 0 were never touched
        np.testing.assert_allclose(out[0, 8:, :], np.asarray(degraded)[0, 8:, :], atol=1e-4)


class TestTraining:
    def test_sr_loss_decreases_on_sharded_mesh(self):
        """One real multi-device training run: DPx TP mesh, 30 steps on
        synthetic SR pairs, loss must drop substantially."""
        mesh = make_mesh((("data", 4), ("tensor", 2)))
        model = SRNet(features=16, growth=8, num_blocks=1)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))

        def loss_fn(p, batch, rng):
            lo, hi = batch
            pred = model.apply(p, lo)
            return jnp.mean((pred - hi) ** 2) / (255.0**2)

        trainer = Trainer(loss_fn, params, mesh=mesh, learning_rate=3e-3)
        # Overfit one fixed batch: the canonical "training works" check.
        batch = synthetic_sr_batch(jax.random.PRNGKey(7), batch=8, patch=32)
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(60):
            rng, k = jax.random.split(rng)
            losses.append(trainer.step(batch, k))
        # The lanczos-base residual starts from a strong baseline, so the
        # relative drop is modest; 20% in 60 steps still proves the
        # sharded optimization works.
        assert losses[-1] < losses[0] * 0.8, losses[::10]

    def test_checkpoint_roundtrip(self, tmp_path):
        model = SRNet(features=16, growth=8, num_blocks=1)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))

        def loss_fn(p, batch, rng):
            lo, hi = batch
            return jnp.mean((model.apply(p, lo) - hi) ** 2)

        t = Trainer(loss_fn, params, ckpt_dir=str(tmp_path))
        t.save("test")
        restored = t.load("test")
        a = jax.tree.leaves(t.state.params)[0]
        b = jax.tree.leaves(restored)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_video_batch_has_motion(self):
        clip = synthetic_video_batch(jax.random.PRNGKey(0), 4, 32, 32)
        assert clip.shape == (4, 32, 32, 3)
        assert float(jnp.abs(clip[1] - clip[0]).mean()) > 0.5


class TestDiffusionCrossover:
    @pytest.mark.slow
    def test_shipped_weights_beat_blurred_at_heavy_blur(self):
        """The shipped diffusion checkpoint reproduces the reference's
        crossover (DEGRADATION_ABLATION_REPORT.tex:630-653): at heavy
        blur the classical unsharp restorer HURTS while diffusion GAINS
        over the blurred input. Guards the checkpoint from regressing to
        the identity-collapse failure mode (docs/DESIGN.md round 3)."""
        import os

        import orbax.checkpoint as ocp

        from elvis_tpu.degrade import adaptive_blur
        from elvis_tpu.metrics import masked_psnr
        from elvis_tpu.models.io import default_checkpoint_dir
        from elvis_tpu.restore.unsharp import restore_blur_unsharp
        from elvis_tpu.train.evaluate import photo_clips_multi

        path = os.path.join(default_checkpoint_dir(), "diffusion")
        if not os.path.isdir(path):
            pytest.skip("shipped diffusion checkpoint not present")
        d = DiffusionRestorer()
        abstract = jax.eval_shape(lambda: d.init(jax.random.PRNGKey(0)))
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(path), abstract
        )
        clip = photo_clips_multi(2, 96, 1)[0]
        clean = jnp.asarray(clip, jnp.float32)
        b, rounds = 8, 7
        by = clean.shape[1] // b
        scores = jnp.full((clean.shape[0], by, by), rounds / 10.0)
        deg, levels = adaptive_blur(clean, scores, b, 10)
        blurred_psnr = float(masked_psnr(clean, jnp.asarray(deg, jnp.float32)).mean())
        unsharp_psnr = float(
            masked_psnr(clean, jnp.asarray(
                restore_blur_unsharp(deg, levels, b, 10), jnp.float32)).mean()
        )
        diff = d.restore_adaptive(params, jnp.asarray(deg, jnp.float32), levels, b,
                                  max_rounds=10)
        diff_psnr = float(masked_psnr(clean, diff).mean())
        assert unsharp_psnr < blurred_psnr  # classical hurts at heavy blur
        assert diff_psnr > blurred_psnr  # diffusion gains — the crossover
