"""SRNet — the flagship 2x super-resolution network (ESRGAN-class slot).

Fills the Real-ESRGAN position in the reference (RRDBNet instantiation at
elvis.py:2384-2493; progressive 2x loop at elvis.py:2522) and the SinSR
position of the reference README's "ELVIS v2". Architecture is an
RRDB-style residual-in-residual dense CNN redesigned TPU-first:

  * NHWC channels-last layout (TPU conv native layout);
  * bfloat16 activations/weights with float32 residual accumulation —
    convs land on the MXU at full tile occupancy;
  * channel widths kept multiples of 128 lanes' friendly sizes;
  * predicts the residual over a bilinear 2x base, so an untrained or
    lightly-trained model degrades gracefully to bilinear instead of
    garbage (the hermetic-default principle, SURVEY.md §7.3 item 5);
  * tensor-parallel-ready: every conv kernel's output-channel axis can be
    sharded on a 'tensor' mesh axis (see elvis_tpu.train.trainer
    partition rules).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from elvis_tpu.ops.resize import resize

__all__ = ["SRNet", "SRNetCompact", "srnet_upsample_fn"]


class DenseBlock(nn.Module):
    features: int
    growth: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inp = x
        feats = [x]
        for i in range(3):
            h = nn.Conv(self.growth, (3, 3), dtype=self.dtype, name=f"conv{i}")(
                jnp.concatenate(feats, axis=-1)
            )
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        out = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="fuse")(
            jnp.concatenate(feats, axis=-1)
        )
        return inp + 0.2 * out


class RRDB(nn.Module):
    features: int
    growth: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(2):
            h = DenseBlock(self.features, self.growth, self.dtype, name=f"db{i}")(h)
        return x + 0.2 * h


class SRNet(nn.Module):
    """2x super-resolution: ``(N, H, W, 3) float32 [0,255] -> (N, 2H, 2W, 3)``.

    Defaults are MXU-shaped: 128-channel trunks fill the systolic array's
    lanes — measured on v5e, f128/g128/b3 (9.6M params) runs at the same
    speed as f64/g32/b6 (2.3M params). Capacity is free when the channel
    width matches the hardware.
    """

    features: int = 128
    growth: int = 128
    num_blocks: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # Residual over a Lanczos-4 base: the zero-initialized tail makes a
        # fresh model EXACTLY the classical progressive-lanczos restorer,
        # so training can only improve on that baseline.
        base = resize(x, (x.shape[-3] * 2, x.shape[-2] * 2), method="lanczos4")
        h = (x.astype(jnp.float32) / 127.5 - 1.0).astype(self.dtype)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="head")(h)
        skip = h
        for i in range(self.num_blocks):
            h = RRDB(self.features, self.growth, self.dtype, name=f"rrdb{i}")(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="body_out")(h)
        h = skip + h
        # 2x pixel shuffle upsample
        h = nn.Conv(self.features * 4, (3, 3), dtype=self.dtype, name="up")(h)
        n, hh, ww, c = h.shape
        h = h.reshape(n, hh, ww, 2, 2, c // 4)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh * 2, ww * 2, c // 4)
        h = nn.leaky_relu(h, 0.2)
        residual = nn.Conv(3, (3, 3), dtype=jnp.float32, kernel_init=nn.initializers.zeros, name="tail")(
            h.astype(jnp.float32)
        )
        return jnp.clip(base.astype(jnp.float32) + 127.5 * residual, 0.0, 255.0)


class SRNetCompact(nn.Module):
    """Fast 2x SR tier — the SRVGGNetCompact counterpart.

    The reference instantiates either RRDBNet (quality) or SRVGGNetCompact
    (speed) per model name (elvis.py:2384-2493); this is the speed tier:
    a plain conv stack + pixel shuffle, same residual-over-Lanczos
    contract as SRNet. The real-time 1080p serving model.

    Defaults are MXU-shaped: 128 channels fill the systolic array's lanes
    exactly — measured on v5e, a 128ch x 5conv stack runs 20% FASTER than
    64ch x 12conv despite 1.7x the FLOPs (64-channel convs pack the MXU at
    half occupancy).
    """

    features: int = 128
    num_convs: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        base = resize(x, (x.shape[-3] * 2, x.shape[-2] * 2), method="lanczos4")
        h = (x.astype(jnp.float32) / 127.5 - 1.0).astype(self.dtype)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="head")(h)
        h = nn.leaky_relu(h, 0.2)
        for i in range(self.num_convs):
            h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(12, (3, 3), dtype=self.dtype, name="up")(h)  # 3ch x 2x2 shuffle
        n, hh, ww, c = h.shape
        h = h.reshape(n, hh, ww, 2, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
            n, hh * 2, ww * 2, 3
        )
        residual = nn.Conv(
            3, (3, 3), dtype=jnp.float32, kernel_init=nn.initializers.zeros, name="tail"
        )(h.astype(jnp.float32))
        return jnp.clip(base.astype(jnp.float32) + 127.5 * residual, 0.0, 255.0)


def SRNetLarge() -> SRNetCompact:
    """Mid-quality 2x SR tier: the SRNetCompact architecture scaled to
    256ch x 8 convs. The conv-stack family generalizes off-corpus where
    RRDB overfits (round-3 quality sweep, docs/DESIGN.md): this model
    alone measures +1.78 dB over Lanczos on the multi-crop photo holdout
    (vs +1.48 serving / +1.27 RRDB), and it is the third member of the
    'srnet_ensemble' quality tier. 256 channels = 2 full MXU lanes."""
    return SRNetCompact(features=256, num_convs=8)


def srnet_upsample_fn(model: SRNet, params):
    """Adapter: (frames) -> 2x frames, for the progressive restore loop's
    ``upsample_fn`` slot (elvis_tpu.restore.progressive)."""

    @jax.jit
    def up(frames):
        return model.apply(params, frames.astype(jnp.float32))

    return up
