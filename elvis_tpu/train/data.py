"""Synthetic training data: procedurally generated clips + degradations.

The reference trains nothing (all its models are external pretrained
forks); this framework ships trainable restorers, so it needs data. With
zero network egress, training pairs are manufactured on device: structured
procedural video (moving gradients, textured patches, edges — matched to
the block-compression artifacts being restored) degraded by the
framework's own degradation ops, which is exactly the distribution the
restorers see at inference time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "synthetic_frames",
    "synthetic_sr_batch",
    "synthetic_video_batch",
    "dead_leaves",
    "fractal_noise",
    "natural_frames",
    "natural_video_batch",
    "structured_frames",
    "codec_noise",
    "photo_patch_pool",
    "photo_video_batch",
    "photometric_augment",
    "sensor_augment",
]


@jax.jit
def photometric_augment(rng, frames: jnp.ndarray) -> jnp.ndarray:
    """Per-sample photometric jitter: gamma, gain, per-channel color cast,
    brightness offset. Applied to CLEAN sources before degradation (the
    pair stays consistent), multiplying the effective diversity of the
    tiny real-photo pool — the anti-overfit lever for the quality SR tier
    (round 2: procedural-only and plain-photo recipes both peaked early
    then overfit; the photo pool is only two images)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    b = frames.shape[0]
    x = frames.astype(jnp.float32) / 255.0
    gamma = jnp.exp(jax.random.uniform(k1, (b, 1, 1, 1), minval=-0.35, maxval=0.35))
    gain = jax.random.uniform(k2, (b, 1, 1, 1), minval=0.8, maxval=1.2)
    cast = jax.random.uniform(k3, (b, 1, 1, 3), minval=0.92, maxval=1.08)
    offset = jax.random.uniform(k4, (b, 1, 1, 1), minval=-0.06, maxval=0.06)
    x = jnp.clip(x, 1e-6, 1.0) ** gamma
    x = x * gain * cast + offset
    return jnp.clip(x * 255.0, 0.0, 255.0)


@jax.jit
def sensor_augment(rng, frames: jnp.ndarray,
                   fraction: float = 0.4) -> jnp.ndarray:
    """Camera-sensor statistics on CLEAN sources — the ground truth KEEPS
    the noise. Film grain with shadow weighting (webcam AGC amplifies
    shadows) and extra chroma noise (single-sensor demosaicing), applied
    BEFORE degradation so the input/target pair shares it.

    Why: the independent 'camera' bench holdout is a webcam photograph
    whose ground truth itself carries grain + compression noise. A model
    trained only on clean sources has never been asked to carry noisy
    texture through the restoration loop and oversmooths it (measured r4
    plateau: +1.01 dB while the in-rotation holdout sits at +1.68).
    Reconstructing noisy texture from its downsampled alias is learnable;
    this family puts it in the training distribution."""
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    b = frames.shape[0]
    x = frames.astype(jnp.float32)
    sigma = jax.random.uniform(k1, (b, 1, 1, 1), minval=0.5, maxval=5.0)
    # per-channel scale: chroma channels noisier than average ~40% of the
    # time (red/blue gain on single-sensor cameras)
    cscale = jnp.where(
        jax.random.bernoulli(k4, 0.4, (b, 1, 1, 3)),
        jax.random.uniform(k5, (b, 1, 1, 3), minval=1.0, maxval=2.0),
        1.0,
    )
    shadow = 1.0 + 0.8 * (1.0 - x / 255.0)  # 1.0 (highlights) .. 1.8 (shadows)
    noisy = x + sigma * cscale * shadow * jax.random.normal(k2, x.shape)
    apply = jax.random.bernoulli(k3, fraction, (b, 1, 1, 1))
    return jnp.where(apply, jnp.clip(noisy, 0.0, 255.0), frames)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def synthetic_frames(rng, batch: int, height: int, width: int) -> jnp.ndarray:
    """Procedural content mixing oriented waves, hard-edged rectangles,
    smooth disks, multi-frequency texture, and varying noise — a broad
    family so restorers generalize past any single pattern."""
    keys = jax.random.split(rng, 10)
    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :, None]

    freq = jax.random.uniform(keys[0], (batch, 1, 1, 3), minval=0.02, maxval=0.5)
    phase = jax.random.uniform(keys[1], (batch, 1, 1, 3), minval=0.0, maxval=6.28)
    angle = jax.random.uniform(keys[2], (batch, 1, 1, 1), minval=0.0, maxval=3.14)
    amp = jax.random.uniform(keys[3], (batch, 1, 1, 1), minval=20.0, maxval=90.0)
    waves = amp * jnp.sin(freq * (xx * jnp.cos(angle) + yy * jnp.sin(angle)) + phase)

    # fine texture at a second frequency
    freq2 = jax.random.uniform(keys[4], (batch, 1, 1, 3), minval=0.3, maxval=1.2)
    tex = 25 * jnp.sin(freq2 * (xx + 2 * yy))

    # hard-edged rectangle
    cy = jax.random.uniform(keys[5], (batch, 1, 1, 1), minval=0.2, maxval=0.8) * height
    cx = jax.random.uniform(keys[6], (batch, 1, 1, 1), minval=0.2, maxval=0.8) * width
    rect = ((jnp.abs(yy - cy) < height / 6) & (jnp.abs(xx - cx) < width / 6)).astype(
        jnp.float32
    ) * jax.random.uniform(keys[5], (batch, 1, 1, 1), minval=-70, maxval=70)

    # smooth disk (round objects / soft shading)
    dy = jax.random.uniform(keys[7], (batch, 1, 1, 1), minval=0.2, maxval=0.8) * height
    dx = jax.random.uniform(keys[8], (batch, 1, 1, 1), minval=0.2, maxval=0.8) * width
    r = jax.random.uniform(keys[9], (batch, 1, 1, 1), minval=0.1, maxval=0.3) * min(height, width)
    disk = 60.0 * jnp.exp(-(((yy - dy) ** 2 + (xx - dx) ** 2) / (r**2 + 1e-6)))

    sigma = jax.random.uniform(keys[4], (batch, 1, 1, 1), minval=0.0, maxval=6.0)
    noise = sigma * jax.random.normal(keys[0], (batch, height, width, 3))
    img = 128.0 + waves + tex + rect + disk + noise
    return jnp.clip(img, 0, 255)


@functools.partial(jax.jit, static_argnums=(1, 2))
def synthetic_sr_batch(rng, batch: int, patch: int = 64):
    """(low_res (B,p/2,p/2,3), high_res (B,p,p,3)) in [0,255] float32 —
    SR pairs via the framework's own area downsample.

    A random third of the targets are themselves area-downsampled 2x
    (then used at patch res), matching the progressive loop's
    intermediate stages where the 2x upsampler runs on already-reduced
    frames (elvis_tpu.restore.progressive)."""
    from elvis_tpu.ops.resize import resize

    k1, k2 = jax.random.split(rng)
    hi = synthetic_frames(k1, batch, patch * 2, patch * 2)
    hi_native = resize(hi, (patch, patch), method="area")  # band-limited content
    hi_sharp = hi[:, :patch, :patch]  # full-bandwidth crop
    pick = jax.random.bernoulli(k2, 0.5, (batch, 1, 1, 1))
    hi = jnp.where(pick, hi_sharp, hi_native)
    lo = resize(hi, (patch // 2, patch // 2), method="area")
    return lo, hi


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fractal_noise(rng, batch: int, height: int, width: int) -> jnp.ndarray:
    """1/f^alpha spectral noise — the power spectrum of natural textures.

    White spectral noise shaped by ``f^-alpha`` (alpha drawn per sample in
    [0.9, 1.6], bracketing the ~1.2 measured for natural images), inverse
    FFT, unit variance. Channels share a luminance field plus small
    independent chroma, matching natural inter-channel correlation.
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    fy = jnp.fft.fftfreq(height)[:, None]
    fx = jnp.fft.fftfreq(width)[None, :]
    f = jnp.sqrt(fy**2 + fx**2).at[0, 0].set(1.0)  # keep DC finite

    alpha = jax.random.uniform(k1, (batch, 1, 1, 1), minval=0.9, maxval=1.6)
    spec = jax.random.normal(k2, (batch, height, width, 2, 2))
    z = jax.lax.complex(spec[..., 0], spec[..., 1])  # (B,H,W,2): luma+chroma seed
    filt = f[None, :, :, None] ** (-alpha)
    img = jnp.fft.ifft2(z * filt, axes=(1, 2)).real  # (B,H,W,2)
    std = img.std(axis=(1, 2), keepdims=True) + 1e-6
    img = img / std
    luma, chroma = img[..., :1], img[..., 1:]
    mix = jax.random.uniform(k3, (batch, 1, 1, 3), minval=-0.35, maxval=0.35)
    return luma + mix * chroma  # (B,H,W,3), ~unit std, correlated channels


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def dead_leaves(rng, batch: int, height: int, width: int, num_shapes: int = 80) -> jnp.ndarray:
    """Dead-leaves occlusion model: the canonical natural-image-statistics
    generator (power-law object sizes + occlusion => 1/f spectrum, sharp
    scale-invariant edges). This is the family where a learned upsampler
    has real headroom over Lanczos: step edges destroyed by area
    downsampling are statistically recoverable from the occlusion prior.
    Returns (B,H,W,3) float32 in [0,255].
    """
    keys = jax.random.split(rng, 10)
    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]

    K, B = num_shapes, batch
    cy = jax.random.uniform(keys[0], (K, B), minval=-0.1, maxval=1.1) * height
    cx = jax.random.uniform(keys[1], (K, B), minval=-0.1, maxval=1.1) * width
    # r^-3 size density (classic dead leaves): r = rmin / sqrt(u)
    u = jax.random.uniform(keys[2], (K, B), minval=1e-3, maxval=1.0)
    r = jnp.clip(4.0 / jnp.sqrt(u), 2.0, 0.6 * min(height, width))
    # elongation down to 0.12 gives thin structures (branches, strokes)
    aspect = jnp.exp(jax.random.uniform(keys[3], (K, B), minval=-2.1, maxval=0.0))
    theta = jax.random.uniform(keys[4], (K, B), minval=0.0, maxval=3.14159)
    is_disk = jax.random.bernoulli(keys[5], 0.7, (K, B))
    # correlated natural colors: shared gray level + small chroma offsets
    gray = jax.random.uniform(keys[6], (K, B, 1), minval=15.0, maxval=240.0)
    chroma = 28.0 * jax.random.normal(keys[7], (K, B, 3))
    color = jnp.clip(gray + chroma, 0.0, 255.0)  # (K,B,3)

    def paint(img, shape):
        scy, scx, sr, sa, sth, sdisk, scol = shape
        dy = yy[None] - scy[:, None, None]  # (B,H,W)
        dx = xx[None] - scx[:, None, None]
        c, s = jnp.cos(sth)[:, None, None], jnp.sin(sth)[:, None, None]
        ry = (c * dy - s * dx) / (sr * sa)[:, None, None]
        rx = (s * dy + c * dx) / sr[:, None, None]
        mask_disk = ry**2 + rx**2 < 1.0
        mask_rect = (jnp.abs(ry) < 0.9) & (jnp.abs(rx) < 0.9)
        mask = jnp.where(sdisk[:, None, None], mask_disk, mask_rect)
        img = jnp.where(mask[..., None], scol[:, None, None, :], img)
        return img, None

    # background: mid-gray + fractal texture so uncovered area is natural
    bg = 128.0 + 30.0 * fractal_noise(keys[8], batch, height, width)
    img, _ = jax.lax.scan(paint, bg, (cy, cx, r, aspect, theta, is_disk, color))
    return jnp.clip(img, 0.0, 255.0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def natural_frames(rng, batch: int, height: int, width: int) -> jnp.ndarray:
    """The SR training corpus: dead-leaves structure + in-object fractal
    texture + smooth illumination + sensor noise — procedural content with
    natural edge/spectral statistics (the round-1 blocker was band-limited
    synthetic content on which Lanczos is already near-optimal)."""
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    base = dead_leaves(k1, batch, height, width)
    tex_amp = jax.random.uniform(k2, (batch, 1, 1, 1), minval=0.0, maxval=22.0)
    tex = tex_amp * fractal_noise(k3, batch, height, width)
    # large-scale illumination gradient (decorrelates blocks)
    yy = jnp.linspace(-1, 1, height)[None, :, None, None]
    xx = jnp.linspace(-1, 1, width)[None, None, :, None]
    gy = jax.random.uniform(k4, (batch, 1, 1, 1), minval=-18.0, maxval=18.0)
    gx = jax.random.uniform(k4, (batch, 1, 1, 1), minval=-18.0, maxval=18.0)
    sigma = jax.random.uniform(k5, (batch, 1, 1, 1), minval=0.0, maxval=3.0)
    noise = sigma * jax.random.normal(k5, (batch, height, width, 3))
    return jnp.clip(base + tex + gy * yy + gx * xx + noise, 0.0, 255.0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def structured_frames(rng, batch: int, height: int, width: int) -> jnp.ndarray:
    """Text- and architecture-like procedural content — the round-3
    off-corpus failure mode (VERDICT r3 #4: the 'china' rotation and its
    repetitive pagoda-roof / text-band structure measured only +0.3 dB;
    the dead-leaves corpus contains no periodic thin structure at all).

    Three families, drawn per sample:
      * lattice — product of two square waves at a small random skew
        (windows, mosaic tile, brick with alternate-row offset);
      * glyph rows — a random-bit ink grid sampled at a random per-sample
        scale, masked into text lines and word gaps;
      * thin gratings — one or two superposed hard square waves at
        arbitrary angles with low duty cycles (railings, branches,
        roof ridges).
    All are hard-edged and periodic: exactly the statistics area
    downsampling destroys and Lanczos cannot recover.
    Returns (B,H,W,3) float32 in [0,255].
    """
    keys = jax.random.split(rng, 20)
    B = batch
    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :]

    def square(t, duty):
        return ((t - jnp.floor(t)) < duty).astype(jnp.float32)

    # --- family 0: lattice (windows / tile / brick) ---
    py = jax.random.uniform(keys[0], (B, 1, 1), minval=5.0, maxval=40.0)
    px = jax.random.uniform(keys[1], (B, 1, 1), minval=5.0, maxval=40.0)
    duty_y = jax.random.uniform(keys[2], (B, 1, 1), minval=0.45, maxval=0.9)
    duty_x = jax.random.uniform(keys[3], (B, 1, 1), minval=0.45, maxval=0.9)
    ang = jax.random.uniform(keys[4], (B, 1, 1), minval=-0.15, maxval=0.15)
    c, s = jnp.cos(ang), jnp.sin(ang)
    u = (c * xx - s * yy) / px
    v = (s * xx + c * yy) / py
    brick = jax.random.bernoulli(keys[5], 0.5, (B, 1, 1)).astype(jnp.float32)
    u = u + 0.5 * brick * (jnp.floor(v) % 2.0)
    lattice = square(u, duty_x) * square(v, duty_y)

    # --- family 1: glyph rows (text) ---
    hc, wc = max(height // 4, 8), max(width // 4, 8)
    bits = jax.random.bernoulli(keys[6], 0.55, (B, hc, wc)).astype(jnp.float32)
    # per-sample glyph scale: 2-7 px per ink cell
    sy = jax.random.uniform(keys[7], (B,), minval=0.15, maxval=0.5)
    sx = jax.random.uniform(keys[8], (B,), minval=0.15, maxval=0.5)

    def sample_bits(bits_b, sy_b, sx_b):
        iy = (jnp.arange(height, dtype=jnp.float32) * sy_b).astype(jnp.int32) % hc
        ix = (jnp.arange(width, dtype=jnp.float32) * sx_b).astype(jnp.int32) % wc
        return bits_b[iy][:, ix]

    glyph = jax.vmap(sample_bits)(bits, sy, sx)  # (B,H,W)
    line_pitch = jax.random.uniform(keys[9], (B, 1, 1), minval=7.0, maxval=26.0)
    word_pitch = jax.random.uniform(keys[10], (B, 1, 1), minval=20.0, maxval=80.0)
    glyph = glyph * square(yy / line_pitch, 0.62) * square(xx / word_pitch, 0.86)

    # --- family 2: thin gratings (railings / branches / ridges) ---
    ga = jax.random.uniform(keys[11], (B, 1, 1), minval=0.0, maxval=3.14159)
    gp = jax.random.uniform(keys[12], (B, 1, 1), minval=4.0, maxval=28.0)
    gd = jax.random.uniform(keys[13], (B, 1, 1), minval=0.1, maxval=0.35)
    t1 = (jnp.cos(ga) * xx + jnp.sin(ga) * yy) / gp
    ga2 = ga + jax.random.uniform(keys[14], (B, 1, 1), minval=0.8, maxval=2.3)
    gp2 = jax.random.uniform(keys[15], (B, 1, 1), minval=6.0, maxval=40.0)
    t2 = (jnp.cos(ga2) * xx + jnp.sin(ga2) * yy) / gp2
    second = jax.random.bernoulli(keys[16], 0.5, (B, 1, 1)).astype(jnp.float32)
    grating = jnp.maximum(square(t1, gd), second * square(t2, gd))

    fam = jax.random.randint(keys[17], (B, 1, 1), 0, 3)
    mask = jnp.where(fam == 0, lattice, jnp.where(fam == 1, glyph, grating))

    ink = jax.random.uniform(keys[18], (B, 1, 1, 3), minval=5.0, maxval=250.0)
    paper = jax.random.uniform(keys[19], (B, 1, 1, 3), minval=5.0, maxval=250.0)
    # keep ink/paper contrast real (>=60 luma apart)
    gap = jnp.abs(ink.mean(-1, keepdims=True) - paper.mean(-1, keepdims=True))
    ink = jnp.where(gap < 60.0, jnp.where(paper > 127.0, paper - 90.0, paper + 90.0), ink)
    img = paper + (ink - paper) * mask[..., None]
    # smooth illumination + in-material fractal texture + sensor noise,
    # same finishing as natural_frames
    k1, k2, k3 = jax.random.split(keys[17], 3)
    tex = 8.0 * fractal_noise(k1, batch, height, width)
    gy = jax.random.uniform(k2, (B, 1, 1, 1), minval=-18.0, maxval=18.0)
    gx = jax.random.uniform(k2, (B, 1, 1, 1), minval=-18.0, maxval=18.0)
    yl = jnp.linspace(-1, 1, height)[None, :, None, None]
    xl = jnp.linspace(-1, 1, width)[None, None, :, None]
    sigma = jax.random.uniform(k3, (B, 1, 1, 1), minval=0.0, maxval=2.5)
    noise = sigma * jax.random.normal(k3, (B, height, width, 3))
    return jnp.clip(img + tex + gy * yl + gx * xl + noise, 0.0, 255.0)


@functools.partial(jax.jit, static_argnums=(2,))
def codec_noise(rng, frames: jnp.ndarray, block: int = 8,
                qp_min: float = 16.0, qp_max: float = 38.0,
                prob: float = 0.7) -> jnp.ndarray:
    """Codec-artifact augmentation: blockwise DCT quantize/dequantize at a
    random QP per sample (H.264-style Qstep=2^((QP-4)/6)), applied with
    probability ``prob``. At inference the restorers see DECODED frames
    (pipeline stage 9 runs on the codec round-trip), so training inputs
    carry matching blocking/ringing artifacts. No gradient flows through
    data generation, so the hard rounding is fine under jit.

    With a milder QP range this also serves as the JPEG-ground-truth
    family: applied to CLEAN sources before degradation, the pair shares
    the 8x8 quantization pattern — the statistics of any holdout that is
    itself a decoded JPEG (the 'camera' webcam photo)."""
    from elvis_tpu.codec.nvc.transform import qstep_from_qp
    from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
    from elvis_tpu.ops.dct import block_dct2, block_idct2

    k1, k2 = jax.random.split(rng)
    n = frames.shape[0]
    qp = jax.random.uniform(k1, (n, 1, 1, 1, 1, 1), minval=qp_min, maxval=qp_max)
    apply = jax.random.bernoulli(k2, prob, (n, 1, 1, 1))
    qstep = qstep_from_qp(qp)

    x = frames.astype(jnp.float32) - 128.0
    blocks = split_into_blocks(x, block)  # (B,By,Bx,b,b,3)
    planes = jnp.moveaxis(blocks, -1, 1)  # (B,3,By,Bx,b,b)
    coeffs = block_dct2(planes)
    levels = jnp.round(coeffs / qstep)
    recon = block_idct2(levels * qstep)
    out = combine_blocks(jnp.moveaxis(recon, 1, -1)) + 128.0
    out = jnp.clip(out, 0.0, 255.0)
    return jnp.where(apply, out, frames)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def synthetic_video_batch(rng, frames: int, height: int, width: int):
    """A short clip with coherent motion (for temporal models)."""
    k1, k2 = jax.random.split(rng)
    base = synthetic_frames(k1, 1, height, width)[0]
    shifts = jnp.cumsum(
        jax.random.randint(k2, (frames, 2), minval=-3, maxval=4), axis=0
    )

    def shift_frame(s):
        return jnp.roll(jnp.roll(base, s[0], axis=0), s[1], axis=1)

    return jax.vmap(shift_frame)(shifts)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def natural_video_batch(rng, frames: int, height: int, width: int, max_pan: int = 3):
    """A panning clip over natural-statistics content: a wide dead-leaves
    scene viewed through a drifting window (true camera pan — new content
    enters at the frame edge, unlike a wraparound roll). The training
    distribution for motion-aware temporal restorers."""
    k1, k2 = jax.random.split(rng)
    pad = max_pan * frames
    scene = natural_frames(k1, 1, height + 2 * pad, width + 2 * pad)[0]
    steps = jax.random.randint(k2, (frames, 2), minval=-max_pan, maxval=max_pan + 1)
    offsets = jnp.clip(jnp.cumsum(steps, axis=0), -pad, pad) + pad

    def crop(off):
        return jax.lax.dynamic_slice(scene, (off[0], off[1], 0), (height, width, 3))

    return jax.vmap(crop)(offsets)


@functools.lru_cache(maxsize=16)
def photo_patch_pool(
    patch: int = 64, train: bool = True, pool_size: int = 2048, seed: int = 0,
    photos: tuple = ("china", "flower"),
):
    """(pool_size, patch, patch, 3) float32 [0,255] patches from REAL
    photographs bundled in this zero-egress image. The default sources are
    scikit-learn's china.jpg + flower.jpg; the EVALUATION photo
    (matplotlib's grace_hopper.jpg) is deliberately excluded by default —
    pass ``photos`` explicitly to run the cross-validation rotation
    (train on two of {china, flower, grace_hopper}, hold out the third;
    train/evaluate.py:photo_image).

    Patches are drawn from a 5-level Lanczos pyramid (scale jitter) with
    the 8 dihedral augmentations. ``train=True`` uses columns < 480 of
    each photo, ``train=False`` the remaining right strip — a held-out
    VALIDATION region for checkpoint selection that shares no pixels
    with training. Returns a host numpy array (callers device_put once).

    Besides the sklearn/matplotlib photographs, real TEXTURE photographs
    bundled with gymnasium_robotics are accepted (round 4, the
    off-corpus lever): ``wood`` (bamboo planks), ``tile`` (mosaic — the
    'china'-style repetitive lattice statistics), ``marble``, ``metal``.
    The pygame ``camera`` photo and the ``marble_tile`` stone photo stay
    out of EVERY training rotation (bench holdouts).
    """
    import os

    import numpy as np
    from PIL import Image
    import sklearn

    base = os.path.join(os.path.dirname(sklearn.__file__), "datasets", "images")
    _TEXTURES = {"wood": "wood1.png", "tile": "tile1.png",
                 "marble": "marble1.png", "metal": "metal1.png"}
    # round-4 widening (VERDICT r3 #3): outdoor-natural and organic
    # photographic statistics from dm_control + the adroit hand assets —
    # sky/cloud smooth gradients, grass high-frequency stochastic
    # texture, fur/skin organic detail, brushed metal, plank wood. The
    # bench holdouts (pygame camera, the kitchen stone-floor photo,
    # grace_hopper) stay out — including the kitchen pack's SECOND
    # stone-floor photo, which shows the same material as the holdout
    # and would break source independence.
    _DM = ("dm_control",)
    _GR = ("gymnasium_robotics",)
    _EXTRA = {
        "sky": (_DM, "locomotion/arenas/assets/outdoor_natural/OutdoorSkybox2048.png"),
        "grass": (_DM, "locomotion/arenas/assets/outdoor_natural/OutdoorGrassFloorD.png"),
        "fur": (_DM, "suite/dog_assets/skin_texture.png"),
        "darkwood": (_GR, "envs/assets/adroit_hand/resources/textures/darkwood.png"),
        "silver": (_GR, "envs/assets/adroit_hand/resources/textures/silverRaw.png"),
        "skin": (_GR, "envs/assets/adroit_hand/resources/textures/skin.png"),
    }

    def _pkg_dir(pkg):
        import contextlib
        import importlib
        import io

        with contextlib.redirect_stdout(io.StringIO()):
            mod = importlib.import_module(pkg[0])  # may print a notice
        return os.path.dirname(mod.__file__)

    def _open(name):
        if name == "grace_hopper":
            import matplotlib

            return Image.open(os.path.join(
                os.path.dirname(matplotlib.__file__), "mpl-data", "sample_data",
                "grace_hopper.jpg")).convert("RGB"), 480
        if name in _TEXTURES:
            import contextlib
            import io

            with contextlib.redirect_stdout(io.StringIO()):
                import gymnasium_robotics  # prints a version notice

            img = Image.open(os.path.join(
                os.path.dirname(gymnasium_robotics.__file__), "envs", "assets",
                "kitchen_franka", "kitchen_assets", "textures",
                _TEXTURES[name])).convert("RGB")
            return img, int(0.75 * img.size[0])
        if name in _EXTRA:
            pkg, rel = _EXTRA[name]
            img = Image.open(os.path.join(_pkg_dir(pkg), rel)).convert("RGB")
            return img, int(0.75 * img.size[0])
        return Image.open(os.path.join(base, f"{name}.jpg")).convert("RGB"), 480

    arrs = []
    for name in photos:
        img, val_x = _open(name)
        w, h = img.size
        for s in (1.0, 0.85, 0.7, 0.55, 0.4):
            im2 = img if s == 1.0 else img.resize(
                (int(w * s), int(h * s)), Image.LANCZOS
            )
            a = np.asarray(im2, np.float32)
            cut = int(val_x * s)
            a = a[:, :cut] if train else a[:, cut:]
            if a.shape[0] >= patch and a.shape[1] >= patch:
                arrs.append(a)
    if not arrs:
        raise ValueError(f"no source region fits a {patch}px patch")
    rng = np.random.default_rng(seed)
    out = np.empty((pool_size, patch, patch, 3), np.float32)
    for i in range(pool_size):
        a = arrs[int(rng.integers(len(arrs)))]
        y = int(rng.integers(0, a.shape[0] - patch + 1))
        x = int(rng.integers(0, a.shape[1] - patch + 1))
        p = a[y : y + patch, x : x + patch]
        k = int(rng.integers(8))
        if k & 1:
            p = p[:, ::-1]
        if k & 2:
            p = p[::-1]
        if k & 4:
            p = np.swapaxes(p, 0, 1)
        out[i] = p
    return out


def photo_video_batch(rng, pool, frames: int, height: int, width: int,
                      max_pan: int = 3):
    """A camera pan over a REAL photograph: pick a scene from ``pool``
    ((K, height+2*pad, width+2*pad, 3), pad = max_pan*frames — build it
    with ``photo_patch_pool(size + 2*max_pan*frames, ...)``) and crop a
    drifting window. The photographic counterpart of
    :func:`natural_video_batch`; jit-friendly (static shapes, dynamic
    slicing)."""
    pad = max_pan * frames
    k1, k2 = jax.random.split(rng)
    scene = pool[jax.random.randint(k1, (), 0, pool.shape[0])]
    steps = jax.random.randint(k2, (frames, 2), minval=-max_pan, maxval=max_pan + 1)
    offsets = jnp.clip(jnp.cumsum(steps, axis=0), -pad, pad) + pad

    def crop(off):
        return jax.lax.dynamic_slice(scene, (off[0], off[1], 0), (height, width, 3))

    return jax.vmap(crop)(offsets)
