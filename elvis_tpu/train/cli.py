"""Restorer training CLI: ``python -m elvis_tpu.train.cli srnet --steps N``.

The reference downloads pretrained forks for every neural slot; with zero
egress this framework trains its own compact restorers on procedurally
generated degradation pairs (elvis_tpu.train.data) — the degradations are
the framework's own ops, so the training distribution matches inference
exactly. Checkpoints land where the pipeline's ``*_params_path`` config
fields can load them.
"""

from __future__ import annotations

import argparse
import time

__all__ = [
    "train_srnet",
    "train_srnet_compact",
    "train_srnet_student",
    "train_deblur",
    "train_inpaint",
    "train_saliency",
    "main",
]


def _mesh():
    from elvis_tpu.parallel import make_mesh

    import jax

    n = len(jax.devices())
    if n >= 2 and n % 2 == 0:
        return make_mesh((("data", n // 2), ("tensor", 2)))
    return make_mesh()


def _train_sr(model, tag: str, steps: int, ckpt_dir: str, lr: float, batch: int,
              patch: int, log_every: int, block_size: int,
              natural_fraction: float = 0.75, photo_fraction: float = 0.0,
              ema_decay: float = 0.999, val_every: int = 0,
              photos: tuple = ("china", "flower"), weight_decay: float = 1e-4,
              structured_fraction: float = 0.0, teacher_up=None,
              distill_weight: float = 1.0, frozen_prefix_up=None,
              sensor_fraction: float = 0.0, jpeg_gt_fraction: float = 0.0):
    """Train a 2x upsampler THROUGH the progressive restoration loop.

    Per-stage SR training does not compose: the deployed model runs
    inside the multi-stage loop (elvis_tpu.restore.progressive), where
    residual errors re-enter the next 2x stage. The loop is pure jnp and
    fully differentiable, so the loss is end-to-end:
    ``|| progressive_restore(adaptive_downsample(clean)) - clean ||``.
    The zero-init tail starts the model exactly at progressive-lanczos,
    making training a monotone refinement of the classical baseline.

    Data is the natural-statistics corpus (dead leaves + fractal texture,
    elvis_tpu.train.data.natural_frames) with codec-artifact augmentation —
    on band-limited synthetic content Lanczos is already near-optimal and
    there is nothing to learn (the round-1 blocker); on occlusion-edge
    content the learned edge prior has real headroom.

    ``structured_fraction`` mixes in the text/architecture procedural
    family (train.data.structured_frames — the round-3 off-corpus
    failure statistics). ``teacher_up`` (a 2x upsample callable, e.g.
    the shipped ensemble) adds a distillation term: the student's loop
    output must ALSO match the teacher's loop output, weighted
    ``distill_weight`` (VERDICT r3 #2 — one student instead of three
    forward passes). ``frozen_prefix_up`` trains ``model`` as the FINAL
    2x stage only, with every earlier stage running the given frozen
    upsampler — the 4K finisher recipe (the final stage carries ~75% of
    the loop's FLOPs at 4K; a narrower net there is the honest route to
    single-chip 4K real time).
    """
    import jax
    import jax.numpy as jnp

    from elvis_tpu.degrade import adaptive_downsample
    from elvis_tpu.restore.progressive import progressive_restore
    from elvis_tpu.train import Trainer
    from elvis_tpu.train.data import (
        codec_noise, natural_frames, photo_patch_pool, photometric_augment,
        sensor_augment, structured_frames, synthetic_frames)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, patch // 2, patch // 2, 3)))
    max_level = 3  # static stage count: factors up to 8x

    # Real-photo patches (sklearn's china/flower, never the eval photo):
    # the missing statistics the quality tier overfit past in round 2's
    # procedural-only recipes.
    pool = (
        jnp.asarray(photo_patch_pool(patch, True, 2048, 0, photos))
        if photo_fraction > 0 else None
    )

    @jax.jit
    def make_batch(rng):
        ks = jax.random.split(rng, 12)
        k1, k2, k3, k4, k5, k6, k7, k8, k9, k10, k11, k12 = ks
        # natural-statistics vs legacy band-limited content mix
        clean = jnp.where(
            jax.random.bernoulli(k4, natural_fraction, (batch, 1, 1, 1)),
            natural_frames(k1, batch, patch, patch),
            synthetic_frames(k5, batch, patch, patch),
        )
        if structured_fraction > 0:
            clean = jnp.where(
                jax.random.bernoulli(k9, structured_fraction, (batch, 1, 1, 1)),
                structured_frames(k10, batch, patch, patch), clean,
            )
        if pool is not None:
            photo = pool[jax.random.randint(k6, (batch,), 0, pool.shape[0])]
            clean = jnp.where(
                jax.random.bernoulli(k7, photo_fraction, (batch, 1, 1, 1)),
                photo, clean,
            )
        # photometric jitter on the clean source (round-3 anti-overfit
        # lever: the photo pool is a handful of images; gamma/gain/cast
        # jitter multiplies its effective diversity)
        clean = photometric_augment(k8, clean)
        if sensor_fraction > 0:
            # noisy GROUND TRUTH (grain/chroma noise the pair shares) —
            # the 'camera'-holdout statistics; see data.sensor_augment
            clean = sensor_augment(k11, clean, sensor_fraction)
        if jpeg_gt_fraction > 0:
            # JPEG-compressed GROUND TRUTH: mild 8x8 DCT quantization on
            # the clean source, shared by the pair — the holdout-is-a-
            # decoded-JPEG statistics (see data.codec_noise docstring)
            clean = codec_noise(k12, clean, block_size, 14.0, 30.0,
                                jpeg_gt_fraction)
        scores = jax.random.uniform(k2, (batch, patch // block_size, patch // block_size))
        degraded, levels = adaptive_downsample(clean, scores, block_size)
        degraded = codec_noise(k3, degraded, block_size)
        if teacher_up is not None:
            # teacher runs in the (jitted, grad-free) batch maker: the
            # backward pass never sees the three teacher networks
            teacher = progressive_restore(
                degraded, levels, block_size, upsample_fn=teacher_up,
                max_level=max_level,
            )
            return clean, degraded, levels, teacher
        return clean, degraded, levels

    def _up_for(p):
        """The loop's upsampler(s) under trainable params ``p``: every
        stage the model — or, in finisher mode, the frozen prefix with
        the model only on the final stage."""
        trainee = lambda f: model.apply(p, f)  # noqa: E731
        if frozen_prefix_up is None:
            return trainee
        return [frozen_prefix_up] * (max_level - 1) + [trainee]

    def loss_fn(p, data, rng):
        clean, degraded, levels = data[:3]
        restored = progressive_restore(
            degraded, levels, block_size,
            upsample_fn=_up_for(p),
            max_level=max_level,
        )
        loss = jnp.mean((restored - clean) ** 2) / 255.0**2
        if teacher_up is not None:
            loss = loss + distill_weight * jnp.mean(
                (restored - data[3]) ** 2) / 255.0**2
        return loss

    import optax

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10 + 1), decay_steps=steps
    )
    trainer = Trainer(loss_fn, params, mesh=_mesh(), learning_rate=schedule,
                      ckpt_dir=ckpt_dir, weight_decay=weight_decay)

    # EMA + held-out-validation checkpoint selection: the round-2 failure
    # mode was procedural overfit (wins in-corpus, loses on the photo).
    # EMA smooths late-training drift; the validation region (right strip
    # of the TRAINING photos — no pixel overlap with training patches,
    # and never the evaluation photo) picks the generalizing checkpoint.
    ema_update = jax.jit(
        lambda e, p: jax.tree.map(
            lambda a, b: ema_decay * a + (1.0 - ema_decay) * b, e, p
        )
    )
    # real copy (one jitted dispatch): the train step donates its params
    # buffers, which would invalidate mere aliases
    ema = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(trainer.state.params)
    best_psnr, best_params = -1.0, None
    val_state = None
    if val_every > 0:
        from elvis_tpu.restore.progressive import lanczos_upsample_2x
        from elvis_tpu.train.data import photo_patch_pool as _pool

        vp = 128
        # Draw a wide candidate pool from the held-out validation region
        # and keep the 16 most DETAILED patches (gradient energy): a val
        # strip that happens to be smooth (e.g. flower's bokeh right
        # edge, Lanczos ~48 dB) leaves the selector no headroom and
        # degenerates checkpoint selection to a no-op model (the round-3
        # xval 'china' rotation failure, docs/DESIGN.md).
        import numpy as _np

        cand = _pool(vp, False, 96, 1, photos)
        g = _np.abs(_np.diff(cand, axis=1)).mean(axis=(1, 2, 3)) + _np.abs(
            _np.diff(cand, axis=2)).mean(axis=(1, 2, 3))
        val_clean = jnp.asarray(cand[_np.argsort(-g)[:16]])
        vk = jax.random.PRNGKey(123)
        val_scores = jax.random.uniform(vk, (16, vp // block_size, vp // block_size))
        val_degraded, val_levels = jax.jit(
            lambda a, s: adaptive_downsample(a, s, block_size)
        )(val_clean, val_scores)

        @jax.jit
        def val_psnr(p):
            nn = progressive_restore(
                val_degraded, val_levels, block_size,
                upsample_fn=_up_for(p), max_level=max_level,
            )
            return -10.0 * jnp.log10(jnp.mean((nn - val_clean) ** 2) / 255.0**2)

        lz = progressive_restore(
            val_degraded, val_levels, block_size,
            upsample_fn=lanczos_upsample_2x, max_level=max_level,
        )
        lz_psnr = float(-10.0 * jnp.log10(jnp.mean((lz - val_clean) ** 2) / 255.0**2))
        print(f"{tag} val lanczos psnr: {lz_psnr:.3f}", flush=True)
        val_state = lz_psnr

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(steps):
        rng, k1, k2 = jax.random.split(rng, 3)
        loss = trainer.step(make_batch(k1), k2)
        ema = ema_update(ema, trainer.state.params)
        if val_every > 0 and (step % val_every == 0 or step == steps - 1) and step > 0:
            vp_now = float(val_psnr(ema))
            mark = ""
            if vp_now > best_psnr:
                best_psnr, best_params = vp_now, jax.tree.map(lambda x: x, ema)
                mark = " *best"
            print(f"{tag} step {step}: val psnr {vp_now:.3f}"
                  f" (lanczos {val_state:.3f}){mark}", flush=True)
        if step % log_every == 0 or step == steps - 1:
            print(f"{tag} step {step}: loss {loss:.6f} ({time.time()-t0:.0f}s)", flush=True)
    if best_params is not None:
        import dataclasses as _dc

        trainer.state = _dc.replace(trainer.state, params=best_params)
        print(f"{tag}: saving best-EMA checkpoint (val psnr {best_psnr:.3f})",
              flush=True)
    trainer.save(tag)
    return trainer


# r4 default corpus: the two sklearn photos PLUS the gymnasium_robotics
# texture photographs (wood/tile/marble/metal) and the structured
# text/architecture procedural family — the off-corpus generalization
# levers (VERDICT r3 #3).
_R4_PHOTOS = ("china", "flower", "wood", "tile", "marble", "metal",
              "sky", "grass", "fur", "darkwood", "silver", "skin")
_R4_STRUCTURED = 0.18


def train_srnet(steps: int, ckpt_dir: str, lr: float = 1e-4, batch: int = 16, patch: int = 64,
                log_every: int = 50, block_size: int = 8,
                photo_fraction: float = 0.5, val_every: int = 0,
                photos: tuple = _R4_PHOTOS,
                structured_fraction: float = _R4_STRUCTURED,
                sensor_fraction: float = 0.0,
                jpeg_gt_fraction: float = 0.0):
    from elvis_tpu.models import SRNet

    return _train_sr(SRNet(), "srnet", steps, ckpt_dir, lr, batch, patch,
                     log_every, block_size, photo_fraction=photo_fraction,
                     val_every=val_every, photos=photos,
                     structured_fraction=structured_fraction,
                     sensor_fraction=sensor_fraction,
                     jpeg_gt_fraction=jpeg_gt_fraction)


def train_srnet_compact(steps: int, ckpt_dir: str, lr: float = 4e-4, batch: int = 16,
                        patch: int = 64, log_every: int = 50, block_size: int = 8,
                        photo_fraction: float = 0.5, val_every: int = 0,
                        photos: tuple = _R4_PHOTOS,
                        structured_fraction: float = _R4_STRUCTURED,
                        sensor_fraction: float = 0.0,
                        jpeg_gt_fraction: float = 0.0):
    from elvis_tpu.models import SRNetCompact

    return _train_sr(SRNetCompact(), "srnet_compact", steps, ckpt_dir, lr, batch,
                     patch, log_every, block_size, photo_fraction=photo_fraction,
                     val_every=val_every, photos=photos,
                     structured_fraction=structured_fraction,
                     sensor_fraction=sensor_fraction,
                     jpeg_gt_fraction=jpeg_gt_fraction)


def train_srnet_student(steps: int, ckpt_dir: str, lr: float = 2e-4,
                        batch: int = 16, patch: int = 64, log_every: int = 50,
                        block_size: int = 8, photo_fraction: float = 0.5,
                        val_every: int = 0, features: int = 128,
                        num_convs: int = 10, distill_weight: float = 1.0,
                        structured_fraction: float = _R4_STRUCTURED,
                        photos: tuple = _R4_PHOTOS,
                        teacher_dihedral: bool = False,
                        extra_teachers: tuple = (),
                        sensor_fraction: float = 0.0,
                        jpeg_gt_fraction: float = 0.0):
    """Distill the 'srnet_ensemble' quality tier (compact + RRDB + large
    averaged — three forward passes) into ONE student conv stack
    (VERDICT r3 #2): trained against ground truth AND the ensemble's
    through-loop output on the widened corpus (real texture photos +
    the structured text/architecture family). The student replaces the
    ensemble wherever it measures at least as good, at ~8x the speed.

    The architecture (features x num_convs, SRNetCompact family — the
    family that generalizes off-corpus where RRDB overfits) is recorded
    in ``srnet_student.meta.json`` so the loader can reconstruct it.

    ``teacher_dihedral`` averages every teacher forward over the 8
    dihedral transforms (rot90 x flip) — test-time augmentation on the
    TEACHER only, worth ~0.1-0.2 dB of free label quality at zero
    inference cost for the student (the forwards run in the jitted,
    grad-free batch maker on 64px patches). ``extra_teachers`` adds
    checkpoints from earlier distillation rounds (SRNetCompact-family
    dirs with a sibling ``.meta.json`` recording width/depth) to the
    teacher average — self-distillation across generations.
    """
    import json
    import os

    import jax.numpy as jnp

    from elvis_tpu.models import SRNet, SRNetCompact, SRNetLarge
    from elvis_tpu.models.io import load_params

    student = SRNetCompact(features=features, num_convs=num_convs)

    if distill_weight == 0.0:
        # pure wide-corpus training of the student architecture (the
        # A/B control for the distillation term — and no teacher
        # forward passes in the batch maker)
        trainer = _train_sr(
            student, "srnet_student", steps, ckpt_dir, lr, batch, patch,
            log_every, block_size, photo_fraction=photo_fraction,
            val_every=val_every, photos=photos,
            structured_fraction=structured_fraction,
            sensor_fraction=sensor_fraction,
        )
        if ckpt_dir:
            with open(os.path.join(ckpt_dir, "srnet_student.meta.json"), "w") as fh:
                json.dump({"features": features, "num_convs": num_convs,
                           "teachers": [], "distill_weight": 0.0}, fh)
        return trainer

    from elvis_tpu.models.io import default_checkpoint_dir

    teachers = []
    teacher_names = []
    for name, make in (("srnet_compact", SRNetCompact),
                       ("srnet", SRNet), ("srnet_large", SRNetLarge)):
        # a freshly-retrained teacher in ckpt_dir wins; else the shipped one
        path = os.path.join(ckpt_dir or "checkpoints", name)
        if not os.path.isdir(path):
            path = os.path.join(default_checkpoint_dir(), name)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"teacher checkpoint {name} missing — train the tiers first")
        m = make()
        teachers.append((m, load_params(m, path, jnp.zeros((1, 16, 16, 3)))))
        teacher_names.append(name)
    for path in extra_teachers:
        # a prior-generation student: arch from its sibling meta file
        with open(path.rstrip("/") + ".meta.json") as fh:
            meta = json.load(fh)
        m = SRNetCompact(features=meta["features"],
                         num_convs=meta["num_convs"])
        teachers.append((m, load_params(m, path, jnp.zeros((1, 16, 16, 3)))))
        teacher_names.append(path)
    k = float(len(teachers))

    def _mean_up(f):
        return sum(m.apply(p, f) for m, p in teachers) / k

    if teacher_dihedral:
        def teacher_up(f):
            acc = 0.0
            for rot in range(4):
                for flip in (False, True):
                    g = jnp.rot90(f, rot, axes=(1, 2))
                    if flip:
                        g = jnp.flip(g, 2)
                    y = _mean_up(g)
                    if flip:
                        y = jnp.flip(y, 2)
                    acc = acc + jnp.rot90(y, -rot, axes=(1, 2))
            return acc / 8.0
    else:
        teacher_up = _mean_up

    trainer = _train_sr(
        student, "srnet_student", steps, ckpt_dir, lr, batch, patch,
        log_every, block_size, photo_fraction=photo_fraction,
        val_every=val_every, photos=photos, teacher_up=teacher_up,
        distill_weight=distill_weight,
        structured_fraction=structured_fraction,
        sensor_fraction=sensor_fraction,
        jpeg_gt_fraction=jpeg_gt_fraction,
    )
    if ckpt_dir:
        with open(os.path.join(ckpt_dir, "srnet_student.meta.json"), "w") as fh:
            json.dump({"features": features, "num_convs": num_convs,
                       "teachers": teacher_names,
                       "teacher_dihedral": teacher_dihedral,
                       "distill_weight": distill_weight}, fh)
    return trainer


def train_srnet_4k(steps: int, ckpt_dir: str, lr: float = 4e-4,
                   batch: int = 16, patch: int = 64, log_every: int = 50,
                   block_size: int = 8, photo_fraction: float = 0.5,
                   val_every: int = 0, features: int = 64,
                   num_convs: int = 5,
                   structured_fraction: float = _R4_STRUCTURED,
                   photos: tuple = _R4_PHOTOS):
    """The 4K serving finisher (VERDICT r3 #4): at 4K the FINAL 2x stage
    carries ~75% of the progressive loop's FLOPs (f128x5 convs at 1080p
    input = ~3.1 TFLOP/frame — a ~26 fps hard ceiling at the chip's
    measured 106 TF/s even at 100% MXU). The 4K tier keeps the full
    serving net on the cheap early stages and trains this narrow
    ``features x num_convs`` finisher for the final stage only, THROUGH
    the loop with the shipped serving tier frozen underneath. The
    architecture lands in ``srnet_4k.meta.json``.
    """
    import json
    import os

    import jax.numpy as jnp

    from elvis_tpu.models import SRNetCompact
    from elvis_tpu.models.io import default_checkpoint_dir, load_params

    finisher = SRNetCompact(features=features, num_convs=num_convs)

    base_path = os.path.join(ckpt_dir or "checkpoints", "srnet_compact")
    if not os.path.isdir(base_path):
        base_path = os.path.join(default_checkpoint_dir(), "srnet_compact")
    base = SRNetCompact()
    base_params = load_params(base, base_path, jnp.zeros((1, 16, 16, 3)))

    def frozen_up(f):
        return base.apply(base_params, f)

    trainer = _train_sr(
        finisher, "srnet_4k", steps, ckpt_dir, lr, batch, patch, log_every,
        block_size, photo_fraction=photo_fraction, val_every=val_every,
        photos=photos, structured_fraction=structured_fraction,
        frozen_prefix_up=frozen_up,
    )
    if ckpt_dir:
        with open(os.path.join(ckpt_dir, "srnet_4k.meta.json"), "w") as fh:
            json.dump({"features": features, "num_convs": num_convs,
                       "prefix": "srnet_compact"}, fh)
    return trainer


def train_deblur(steps: int, ckpt_dir: str, lr: float = 2e-4, batch: int = 8, patch: int = 64,
                 max_rounds: int = 10, log_every: int = 50,
                 photo_fraction: float = 0.0, val_every: int = 0,
                 ema_decay: float = 0.999):
    import jax
    import jax.numpy as jnp

    from elvis_tpu.degrade import adaptive_blur
    from elvis_tpu.models import DeblurUNet
    from elvis_tpu.train import Trainer
    from elvis_tpu.train.data import natural_frames, photo_patch_pool, synthetic_frames

    b = 8
    model = DeblurUNet(max_strength=float(max_rounds))
    params = jax.jit(lambda r, x, m: model.init(r, x, m, b))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, patch, patch, 3)),
        jnp.zeros((1, patch // b, patch // b), jnp.int32),
    )

    pool = (
        jnp.asarray(photo_patch_pool(patch, True, 2048, 0))
        if photo_fraction > 0 else None
    )

    @jax.jit
    def make_batch(rng):
        k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
        clean = jnp.where(
            jax.random.bernoulli(k3, 0.5, (batch, 1, 1, 1)),
            natural_frames(k4, batch, patch, patch),
            synthetic_frames(k1, batch, patch, patch),
        )
        if pool is not None:
            photo = pool[jax.random.randint(k5, (batch,), 0, pool.shape[0])]
            clean = jnp.where(
                jax.random.bernoulli(k6, photo_fraction, (batch, 1, 1, 1)),
                photo, clean,
            )
        scores = jax.random.uniform(k2, (batch, patch // b, patch // b))
        degraded, levels = adaptive_blur(clean, scores, b, max_rounds)
        return clean, degraded, levels

    def loss_fn(p, data, rng):
        clean, degraded, levels = data
        pred = model.apply(p, degraded, levels, b)
        return jnp.mean((pred - clean) ** 2) / 255.0**2

    trainer = Trainer(loss_fn, params, mesh=_mesh(), learning_rate=lr, ckpt_dir=ckpt_dir)

    # same EMA + held-out-photo-strip checkpoint selection as _train_sr
    ema_update = jax.jit(
        lambda e, p: jax.tree.map(
            lambda a, q: ema_decay * a + (1.0 - ema_decay) * q, e, p
        )
    )
    ema = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(trainer.state.params)
    best_psnr, best_params = -1.0, None
    if val_every > 0:
        vp = 128
        val_clean = jnp.asarray(photo_patch_pool(vp, False, 16, 1))
        val_scores = jax.random.uniform(jax.random.PRNGKey(123), (16, vp // b, vp // b))
        val_degraded, val_levels = jax.jit(
            lambda a, s: adaptive_blur(a, s, b, max_rounds)
        )(val_clean, val_scores)
        blurred_psnr = float(
            -10.0 * jnp.log10(jnp.mean((val_degraded - val_clean) ** 2) / 255.0**2)
        )
        print(f"deblur val blurred-input psnr: {blurred_psnr:.3f}", flush=True)

        @jax.jit
        def val_psnr(p):
            pred = model.apply(p, val_degraded, val_levels, b)
            return -10.0 * jnp.log10(jnp.mean((pred - val_clean) ** 2) / 255.0**2)

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(steps):
        rng, k1, k2 = jax.random.split(rng, 3)
        loss = trainer.step(make_batch(k1), k2)
        ema = ema_update(ema, trainer.state.params)
        if val_every > 0 and (step % val_every == 0 or step == steps - 1) and step > 0:
            vp_now = float(val_psnr(ema))
            mark = ""
            if vp_now > best_psnr:
                best_psnr, best_params = vp_now, jax.tree.map(lambda x: x, ema)
                mark = " *best"
            print(f"deblur step {step}: val psnr {vp_now:.3f}{mark}", flush=True)
        if step % log_every == 0 or step == steps - 1:
            print(f"deblur step {step}: loss {loss:.6f} ({time.time()-t0:.0f}s)")
    if best_params is not None:
        import dataclasses as _dc

        trainer.state = _dc.replace(trainer.state, params=best_params)
        print(f"deblur: saving best-EMA checkpoint (val psnr {best_psnr:.3f})",
              flush=True)
    trainer.save("deblur")
    if ckpt_dir:
        import json as _json

        # conditioning contract: record the trained strength
        # normalization so inference can't mis-condition the net when
        # the runtime gaussian_max_rounds differs
        import os

        with open(os.path.join(ckpt_dir, "deblur.meta.json"), "w") as fh:
            _json.dump({"max_strength": float(max_rounds)}, fh)
    return trainer


def train_inpaint(steps: int, ckpt_dir: str, lr: float = 2e-4, frames: int = 8, patch: int = 64,
                  log_every: int = 50):
    """InpaintNet trains on the input it sees at inference: panning
    natural-statistics clips, holes pre-filled by the motion-compensated
    temporal propagation (restore.backends 'neural' seeds the net the same
    way), so the net learns the residual polish over propagation."""
    import jax
    import jax.numpy as jnp

    from elvis_tpu.models import InpaintNet
    from elvis_tpu.restore.inpaint import restore_removal_temporal
    from elvis_tpu.train import Trainer
    from elvis_tpu.train.data import (
        natural_video_batch, photo_patch_pool, photo_video_batch)

    b = 8
    by = patch // b
    model = InpaintNet()
    params = jax.jit(lambda r, x, m: model.init(r, x, m, b))(
        jax.random.PRNGKey(0),
        jnp.zeros((frames, patch, patch, 3)),
        jnp.zeros((frames, by, by), jnp.int8),
    )

    from elvis_tpu.core.blocks import upsample_map

    # Half the clips are camera pans over REAL photographs (same sources
    # and train/val split as the SR/deblur recipes): large patches panned
    # through a drifting window, so the propagation seed sees true photo
    # statistics, not only dead leaves.
    max_pan = 3
    pool = jnp.asarray(photo_patch_pool(patch + 2 * max_pan * frames, True, 512, 2))

    @jax.jit
    def make_batch(rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        clip = jnp.where(
            jax.random.bernoulli(k3),
            photo_video_batch(k4, pool, frames, patch, patch, max_pan),
            natural_video_batch(k1, frames, patch, patch),
        )
        mask = (jax.random.uniform(k2, (frames, by, by)) < 0.25).astype(jnp.int8)
        holes = upsample_map(mask, b)[..., None]
        holed = jnp.where(holes.astype(bool), 0.0, clip)
        seeded = restore_removal_temporal(holed, mask, b)
        return clip, seeded, mask

    def loss_fn(p, data, rng):
        clean, seeded, mask = data
        pred = model.apply(p, seeded, mask, b)
        return jnp.mean((pred - clean) ** 2) / 255.0**2

    trainer = Trainer(loss_fn, params, mesh=None, learning_rate=lr, ckpt_dir=ckpt_dir)
    rng = jax.random.PRNGKey(1)
    for step in range(steps):
        rng, k1, k2 = jax.random.split(rng, 3)
        loss = trainer.step(make_batch(k1), k2)
        if step % log_every == 0 or step == steps - 1:
            print(f"inpaint step {step}: loss {loss:.6f}")
    trainer.save("inpaint")
    return trainer


def train_diffusion(steps: int, ckpt_dir: str, lr: float = 2e-4, batch: int = 16,
                    patch: int = 64, max_rounds: int = 10, log_every: int = 50,
                    photo_fraction: float = 0.5, val_every: int = 0,
                    ema_decay: float = 0.999):
    """Conditional diffusion restorer (the InstantIR slot): x0-residual
    prediction conditioned on the adaptively-blurred frame (models.
    diffusion; round-loop inference semantics elvis.py:2869-3160).

    Round-3 recipe (VERDICT r2 #2): the blur-strength curriculum is biased
    HEAVY (scores ~ sqrt(U) so most blocks sit at rounds>=5 — the regime
    where the reference's InstantIR beats classical restore,
    DEGRADATION_ABLATION_REPORT.tex:630-653, and where DeblurUNet/unsharp
    are weakest), half the batches are real-photo patches with photometric
    jitter, and checkpoint selection validates the SAMPLED restoration
    (not the train loss) on a held-out heavy-blur photo strip."""
    import jax
    import jax.numpy as jnp

    from elvis_tpu.degrade import adaptive_blur
    from elvis_tpu.models import DiffusionRestorer
    from elvis_tpu.train import Trainer
    from elvis_tpu.train.data import (
        natural_frames, photo_patch_pool, photometric_augment)

    b = 8
    d = DiffusionRestorer()
    params = jax.jit(lambda r: d.init(r, (1, patch, patch, 3)))(jax.random.PRNGKey(0))

    pool = (
        jnp.asarray(photo_patch_pool(patch, True, 2048, 0))
        if photo_fraction > 0 else None
    )

    @jax.jit
    def make_batch(rng):
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        clean = natural_frames(k1, batch, patch, patch)
        if pool is not None:
            photo = pool[jax.random.randint(k3, (batch,), 0, pool.shape[0])]
            clean = jnp.where(
                jax.random.bernoulli(k4, photo_fraction, (batch, 1, 1, 1)),
                photo, clean,
            )
        clean = photometric_augment(k5, clean)
        # heavy-blur bias: scores ~ sqrt(U) => median round = 7
        scores = jnp.sqrt(jax.random.uniform(k2, (batch, patch // b, patch // b)))
        degraded, _ = adaptive_blur(clean, scores, b, max_rounds)
        return clean, degraded

    def loss_fn(p, data, rng):
        clean, degraded = data
        return d.loss(p, rng, clean, degraded)

    trainer = Trainer(loss_fn, params, mesh=_mesh(), learning_rate=lr, ckpt_dir=ckpt_dir)

    ema_update = jax.jit(
        lambda e, p: jax.tree.map(
            lambda a, q: ema_decay * a + (1.0 - ema_decay) * q, e, p
        )
    )
    ema = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(trainer.state.params)
    best_psnr, best_params = -1.0, None
    if val_every > 0:
        vp = 128
        val_clean = jnp.asarray(photo_patch_pool(vp, False, 16, 1))
        # heavy-blur validation: the regime the slot must win
        val_scores = 0.5 + 0.5 * jax.random.uniform(
            jax.random.PRNGKey(123), (16, vp // b, vp // b)
        )
        val_degraded, val_levels = jax.jit(
            lambda a, s: adaptive_blur(a, s, b, max_rounds)
        )(val_clean, val_scores)
        blurred_psnr = float(
            -10.0 * jnp.log10(jnp.mean((val_degraded - val_clean) ** 2) / 255.0**2)
        )
        print(f"diffusion val blurred-input psnr: {blurred_psnr:.3f}", flush=True)

        @jax.jit
        def val_psnr(p):
            out = d.sample(p, val_degraded, steps=4, rng=jax.random.PRNGKey(5))
            return -10.0 * jnp.log10(jnp.mean((out - val_clean) ** 2) / 255.0**2)

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(steps):
        rng, k1, k2 = jax.random.split(rng, 3)
        loss = trainer.step(make_batch(k1), k2)
        ema = ema_update(ema, trainer.state.params)
        if val_every > 0 and (step % val_every == 0 or step == steps - 1) and step > 0:
            vp_now = float(val_psnr(ema))
            mark = ""
            if vp_now > best_psnr:
                best_psnr, best_params = vp_now, jax.tree.map(lambda x: x, ema)
                mark = " *best"
            print(f"diffusion step {step}: val sampled psnr {vp_now:.3f}{mark}",
                  flush=True)
        if step % log_every == 0 or step == steps - 1:
            print(f"diffusion step {step}: loss {loss:.6f} ({time.time()-t0:.0f}s)", flush=True)
    if best_params is not None:
        import dataclasses as _dc

        trainer.state = _dc.replace(trainer.state, params=best_params)
        print(f"diffusion: saving best-EMA checkpoint (val psnr {best_psnr:.3f})",
              flush=True)
    trainer.save("diffusion")
    return trainer


def train_perceptual(steps: int, ckpt_dir: str, lr: float = 1e-4, batch: int = 12,
                     patch: int = 64, log_every: int = 50):
    """LPIPS-style 2AFC ranking training for the PerceptualNet backbone
    (the reference uses pretrained-AlexNet LPIPS, elvis.py:3163; with zero
    egress the backbone is trained here): for a clean image and two
    degradation strengths t1 < t2 along a random distortion path
    (blur / downsample / noise / codec artifacts), the metric must rank
    d(clean, weak) < d(clean, strong) — a margin hinge on the LPIPS
    formula itself, so the learned features are monotone in perceived
    distortion across families."""
    import jax
    import jax.numpy as jnp

    from elvis_tpu.metrics.perceptual import PerceptualNet, lpips_pairwise
    from elvis_tpu.ops.filter import gaussian_blur
    from elvis_tpu.ops.resize import resize
    from elvis_tpu.train import Trainer
    from elvis_tpu.train.data import codec_noise, natural_frames, photo_patch_pool

    model = PerceptualNet()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, patch, patch, 3)))

    # half the ranking ladders sit on real photographs (same train pool
    # as the restorer recipes) so the learned features are monotone on
    # real content, not only procedural textures
    pool = jnp.asarray(photo_patch_pool(patch, True, 1024, 3))

    def heavy_endpoints(rng, clean):
        """Per-family maximal distortions (the t=1 path endpoints)."""
        k1, _ = jax.random.split(rng)
        blur = gaussian_blur(gaussian_blur(clean, 5, 2.0), 5, 2.0)
        down = resize(resize(clean, (patch // 4, patch // 4), method="area"),
                      (patch, patch), method="linear")
        noise = jnp.clip(clean + 40.0 * jax.random.normal(k1, clean.shape), 0, 255)
        codec = codec_noise(k1, clean)
        return jnp.stack([blur, down, noise, codec])  # (4,B,H,W,3)

    @jax.jit
    def make_batch(rng):
        k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
        clean = jnp.where(
            jax.random.bernoulli(k5, 0.5, (batch, 1, 1, 1)),
            pool[jax.random.randint(k6, (batch,), 0, pool.shape[0])],
            natural_frames(k1, batch, patch, patch),
        )
        ends = heavy_endpoints(k2, clean)  # (4,B,...)
        fam = jax.random.randint(k3, (batch,), 0, ends.shape[0])
        end = ends[fam, jnp.arange(batch)]  # (B,H,W,3)
        t1 = jax.random.uniform(k4, (batch, 1, 1, 1), minval=0.05, maxval=0.55)
        t2 = t1 + jax.random.uniform(k4, (batch, 1, 1, 1), minval=0.25, maxval=0.45)
        weak = (1 - t1) * clean + t1 * end
        strong = (1 - t2) * clean + t2 * end
        return clean, weak, strong

    def loss_fn(p, data, rng):
        clean, weak, strong = data
        d_weak = lpips_pairwise(model, p, clean, weak)
        d_strong = lpips_pairwise(model, p, clean, strong)
        margin = 0.05
        rank = jnp.maximum(0.0, margin + d_weak - d_strong).mean()
        # keep the metric anchored: identical inputs must score ~0
        anchor = lpips_pairwise(model, p, clean, clean).mean()
        return rank + anchor

    trainer = Trainer(loss_fn, params, mesh=_mesh(), learning_rate=lr, ckpt_dir=ckpt_dir)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(steps):
        rng, k1, k2 = jax.random.split(rng, 3)
        loss = trainer.step(make_batch(k1), k2)
        if step % log_every == 0 or step == steps - 1:
            print(f"perceptual step {step}: loss {loss:.6f} ({time.time()-t0:.0f}s)", flush=True)
    trainer.save("perceptual")
    return trainer


def train_saliency(steps: int, ckpt_dir: str, lr: float = 1e-3, frames: int = 8, patch: int = 64,
                   log_every: int = 50):
    """Distill the motion-contrast heuristic into the net (a bootstrap
    teacher; real datasets plug into the same loop)."""
    import jax
    import jax.numpy as jnp

    from elvis_tpu.models import SaliencyNet
    from elvis_tpu.scoring import motion_contrast_saliency
    from elvis_tpu.train import Trainer
    from elvis_tpu.train.data import (
        photo_patch_pool, photo_video_batch, synthetic_video_batch)

    model = SaliencyNet()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((frames, patch, patch, 3)))

    max_pan = 3
    pool = jnp.asarray(photo_patch_pool(patch + 2 * max_pan * frames, True, 256, 4))

    @jax.jit
    def make_batch(rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        clip = jnp.where(
            jax.random.bernoulli(k2, 0.3),
            photo_video_batch(k3, pool, frames, patch, patch, max_pan),
            synthetic_video_batch(k1, frames, patch, patch),
        )
        target = motion_contrast_saliency(clip)
        return clip, target

    def loss_fn(p, data, rng):
        clip, target = data
        pred = model.apply(p, clip)
        return jnp.mean((pred - target) ** 2)

    trainer = Trainer(loss_fn, params, mesh=None, learning_rate=lr, ckpt_dir=ckpt_dir)
    rng = jax.random.PRNGKey(1)
    for step in range(steps):
        rng, k1, k2 = jax.random.split(rng, 3)
        loss = trainer.step(make_batch(k1), k2)
        if step % log_every == 0 or step == steps - 1:
            print(f"saliency step {step}: loss {loss:.6f}")
    trainer.save("saliency")
    return trainer


_TRAINERS = {
    "srnet": train_srnet,
    "srnet_compact": train_srnet_compact,
    "srnet_student": train_srnet_student,
    "srnet_4k": train_srnet_4k,
    "deblur": train_deblur,
    "diffusion": train_diffusion,
    "inpaint": train_inpaint,
    "perceptual": train_perceptual,
    "saliency": train_saliency,
}


def main(argv=None) -> int:
    from elvis_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="train elvis-tpu restorers")
    p.add_argument("model", choices=sorted(_TRAINERS))
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--ckpt-dir", type=str, default="checkpoints")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--val-every", type=int, default=0,
                   help="EMA + best-checkpoint selection on the held-out "
                        "photo strip every N steps (srnet*/deblur/diffusion)")
    p.add_argument("--features", type=int, default=None,
                   help="student conv width (srnet_student/srnet_4k)")
    p.add_argument("--num-convs", type=int, default=None,
                   help="student conv depth (srnet_student/srnet_4k)")
    p.add_argument("--distill-weight", type=float, default=None,
                   help="ensemble-distillation loss weight (srnet_student; "
                        "0 = pure wide-corpus training, no teachers)")
    p.add_argument("--teacher-dihedral", action="store_true",
                   help="average teacher forwards over the 8 dihedral "
                        "transforms (srnet_student)")
    p.add_argument("--extra-teacher", action="append", default=[],
                   dest="extra_teachers", metavar="CKPT_DIR",
                   help="prior-generation student checkpoint dir to add "
                        "to the teacher average (repeatable)")
    p.add_argument("--sensor-fraction", type=float, default=None,
                   help="fraction of training samples given noisy ground "
                        "truth (camera-sensor grain; data.sensor_augment)")
    p.add_argument("--jpeg-gt-fraction", type=float, default=None,
                   help="fraction of training samples whose ground truth "
                        "is mildly JPEG-quantized (decoded-JPEG holdout "
                        "statistics; data.codec_noise on the clean source)")
    p.add_argument("--photos", type=str, default=None,
                   help="comma-separated photo corpus source names "
                        "(default: the 12-source round-4 set)")
    args = p.parse_args(argv)
    kw = dict(lr=args.lr)
    import inspect

    sig = inspect.signature(_TRAINERS[args.model]).parameters
    if "val_every" in sig:
        kw["val_every"] = args.val_every
    for extra in ("features", "num_convs", "distill_weight",
                  "sensor_fraction", "jpeg_gt_fraction"):
        if getattr(args, extra) is not None and extra in sig:
            kw[extra] = getattr(args, extra)
    if args.photos is not None and "photos" in sig:
        kw["photos"] = tuple(s for s in args.photos.split(",") if s)
    if args.teacher_dihedral and "teacher_dihedral" in sig:
        kw["teacher_dihedral"] = True
    if args.extra_teachers and "extra_teachers" in sig:
        kw["extra_teachers"] = tuple(args.extra_teachers)
    _TRAINERS[args.model](args.steps, args.ckpt_dir, **kw)
    return 0


if __name__ == "__main__":
    main()
