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

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from elvis_tpu.ops.resize import (
    interleave_phases,
    resize,
    upsample2x_phases,
)

__all__ = ["SRNet", "SRNetCompact", "srnet_upsample_fn", "srnet_phase_fn"]


@functools.lru_cache(maxsize=2)
def _phase_kernel_select() -> "np.ndarray":
    """Constant selector ``S[ky,kx,pq,ab,dy,dx] in {0,1}`` scattering a
    3x3 full-res kernel into its phase-domain (3,3,4Cin,4Co) form:
    output pixel ``(2i+a+dy, 2j+b+dx)`` of a pixel-shuffled image lives at
    low-res grid row ``i + (a+dy)//2`` phase ``(a+dy)%2`` (same for
    columns), so each (ky,kx,phase-pair) slot holds exactly one original
    tap — or none (the selector row is all zero)."""
    import numpy as np

    s = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ky, p = (a + dy) // 2, (a + dy) % 2
                    kx, q = (b + dx) // 2, (b + dx) % 2
                    s[ky + 1, kx + 1, 2 * p + q, 2 * a + b, dy + 1, dx + 1] = 1.0
    return s


class _TailConv(nn.Module):
    """The 3x3 full-resolution residual head, with an exact PHASE-DOMAIN
    application mode.

    Parameter tree is identical to the ``nn.Conv(3, (3,3), name="tail")``
    it replaces (``kernel`` HWIO ``(3,3,Cin,3)`` + ``bias (3,)``), so every
    shipped checkpoint loads unchanged. ``__call__`` is the original
    full-res conv; ``phase`` applies the SAME weights to the pre-shuffle
    tensor ``(N,H,W,2,2,Cin)`` at input resolution: a 3x3 conv over the
    pixel-shuffled image is algebraically a 3x3 conv over the 4Cin-channel
    phase tensor with a scattered kernel, and SAME zero padding maps
    one-to-one between the two forms. This keeps the SR final stage's
    residual math at 1/4 the spatial size — the '~50% loop machinery' 4K
    wall of VERDICT r4 #3 — and lets full resolution be materialized
    exactly once downstream.
    """

    cin: int
    features: int = 3

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.zeros,
            (3, 3, self.cin, self.features), jnp.float32)
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def __call__(self, x):
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), self.kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + self.bias

    def phase(self, x):
        """x ``(N,H,W,2,2,Cin)`` -> ``(N,H,W,2,2,features)``."""
        cin, co = self.cin, self.features
        n, hh, ww = x.shape[0], x.shape[1], x.shape[2]
        xf = x.astype(jnp.float32).reshape(n, hh, ww, 4 * cin)
        sel = jnp.asarray(_phase_kernel_select())
        k4 = jnp.einsum("uvpayx,yxio->uvpiao", sel, self.kernel)
        k4 = k4.reshape(3, 3, 4 * cin, 4 * co)
        out = jax.lax.conv_general_dilated(
            xf, k4, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.reshape(n, hh, ww, 2, 2, co) + self.bias


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
    # Return the pre-interleave (N,H,W,2,2,3) phase tensor instead of the
    # (N,2H,2W,3) frame — bit-equal math at 1/4 the full-res traffic (the
    # progressive loop injects + interleaves once; see _TailConv).
    phase_output: bool = False

    @nn.compact
    def __call__(self, x):
        # Residual over a Lanczos-4 base: the zero-initialized tail makes a
        # fresh model EXACTLY the classical progressive-lanczos restorer,
        # so training can only improve on that baseline.
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
        tail = _TailConv(cin=c // 4, name="tail")
        if self.phase_output:
            ph = nn.leaky_relu(h.reshape(n, hh, ww, 2, 2, c // 4), 0.2)
            res = tail.phase(ph.astype(jnp.float32))
            base = upsample2x_phases(x.astype(jnp.float32), "lanczos4")
            return jnp.clip(base + 127.5 * res, 0.0, 255.0)
        base = resize(x, (x.shape[-3] * 2, x.shape[-2] * 2), method="lanczos4")
        h = h.reshape(n, hh, ww, 2, 2, c // 4)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh * 2, ww * 2, c // 4)
        h = nn.leaky_relu(h, 0.2)
        residual = tail(h.astype(jnp.float32))
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
    phase_output: bool = False  # see SRNet.phase_output

    @nn.compact
    def __call__(self, x):
        h = (x.astype(jnp.float32) / 127.5 - 1.0).astype(self.dtype)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="head")(h)
        h = nn.leaky_relu(h, 0.2)
        for i in range(self.num_convs):
            h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(12, (3, 3), dtype=self.dtype, name="up")(h)  # 3ch x 2x2 shuffle
        n, hh, ww, c = h.shape
        tail = _TailConv(cin=3, name="tail")
        if self.phase_output:
            res = tail.phase(h.reshape(n, hh, ww, 2, 2, 3).astype(jnp.float32))
            base = upsample2x_phases(x.astype(jnp.float32), "lanczos4")
            return jnp.clip(base + 127.5 * res, 0.0, 255.0)
        base = resize(x, (x.shape[-3] * 2, x.shape[-2] * 2), method="lanczos4")
        h = h.reshape(n, hh, ww, 2, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
            n, hh * 2, ww * 2, 3
        )
        residual = tail(h.astype(jnp.float32))
        return jnp.clip(base.astype(jnp.float32) + 127.5 * residual, 0.0, 255.0)


def SRNetLarge() -> SRNetCompact:
    """Mid-quality 2x SR tier: the SRNetCompact architecture scaled to
    256ch x 8 convs. The conv-stack family generalizes off-corpus where
    RRDB overfits (round-3 quality sweep, docs/DESIGN.md): this model
    alone measures +1.78 dB over Lanczos on the multi-crop photo holdout
    (vs +1.48 serving / +1.27 RRDB), and it is the third member of the
    'srnet_ensemble' quality tier. 256 channels = 2 full MXU lanes."""
    return SRNetCompact(features=256, num_convs=8)


def srnet_phase_fn(model, params):
    """(frames) -> (N,H,W,2,2,3) float32 phase tensor: the same model
    applied in ``phase_output`` mode (same params, bit-equal math)."""
    pm = model.clone(phase_output=True)

    @jax.jit
    def up_phase(frames):
        return pm.apply(params, frames.astype(jnp.float32))

    return up_phase


def srnet_upsample_fn(model: SRNet, params):
    """Adapter: (frames) -> 2x frames, for the progressive restore loop's
    ``upsample_fn`` slot (elvis_tpu.restore.progressive).

    The returned callable carries a ``.phase_fn`` attribute — the
    pre-interleave variant the progressive loop uses to keep each stage's
    residual math at input resolution and materialize the upscaled frame
    exactly once per stage (VERDICT r4 #3: ~50% of the 4K wall was
    full-res machinery inside every apply)."""
    jit_up = jax.jit(
        lambda frames: model.apply(params, frames.astype(jnp.float32))
    )

    def up(frames):
        return jit_up(frames)

    up.phase_fn = srnet_phase_fn(model, params)
    return up
