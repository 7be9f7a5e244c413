"""Block-matching motion estimation.

Serves the FVMD-style motion metric (elvis_tpu.metrics.fvmd — the
reference's FVMD uses PIPs point tracking, elvis.py:3358), the codec's
inter prediction, and motion-compensated temporal inpainting (the
flow-guidance move of ProPainter/E2FGVI, reference elvis.py:1458/1693).
TPU-first: the (2R+1)^2 candidate offsets are a static loop of
whole-frame shifts with per-block SAD reductions — no per-block Python,
one fused graph.
"""

from __future__ import annotations

import jax.numpy as jnp

from elvis_tpu.core.blocks import blockwise_reduce

__all__ = ["block_motion", "block_motion_pyramid", "pyramid_range",
           "field_sad", "median3_field", "subpel_refine", "motion_hint",
           "motion_field_from_hint"]


def pyramid_range(radius: int, levels: int, refine_radius: int = 2) -> int:
    """Maximum displacement (px) ``block_motion_pyramid`` can represent:
    +-radius at the coarsest scale plus the residual refinements.
    levels=3, radius=4 -> 4*4 + 2*(2+1) = 22."""
    if levels <= 1:
        return radius
    return radius * (1 << (levels - 1)) + refine_radius * ((1 << (levels - 1)) - 1)


def block_motion(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    block_size: int = 16,
    radius: int = 4,
    prev_weight: jnp.ndarray | None = None,
    cur_weight: jnp.ndarray | None = None,
    return_sad: bool = False,
) -> jnp.ndarray:
    """Estimate per-block integer motion from ``prev`` to ``cur``.

    prev/cur ``(N, H, W)`` luma -> mv ``(N, By, Bx, 2)`` (dy, dx) such
    that content at cur position p came from prev position ``p - mv``
    (mv is the per-block displacement of the content, in pixels).

    Candidate shifts are edge-clamped (not wraparound) so border blocks
    are scored against the pixels a warp would actually read.

    ``prev_weight``/``cur_weight`` (``(N,H,W)`` in [0,1], 1 = valid)
    turn the SAD into a MASKED match: invalid pixels (removal holes,
    out-of-frame reads) are excluded from the error, normalized by the
    valid mass, and offsets whose valid fraction falls below 25% are
    penalized out (unless every offset is invalid, which ties back to
    zero motion). Estimating on hole-stretched frames used to require a
    zero-motion prefill whose stale co-located content dragged SAD
    minima toward zero (~2x cumulative underestimate measured on the r4
    long-run pan, docs/diag_inpaint_inversion.json) — masking matches
    only real content.
    """
    # Zero-motion-first candidate order: jnp.argmin keeps the FIRST minimum,
    # so ties (flat blocks) and near-ties resolve to the smallest motion
    # instead of an arbitrary corner offset.
    offsets = sorted(
        ((dy, dx) for dy in range(-radius, radius + 1) for dx in range(-radius, radius + 1)),
        key=lambda o: o[0] * o[0] + o[1] * o[1],
    )
    p = prev.astype(jnp.float32)
    c = cur.astype(jnp.float32)
    h, w = p.shape[-2], p.shape[-1]
    pad = [(0, 0)] * (p.ndim - 2) + [(radius, radius), (radius, radius)]
    padded = jnp.pad(p, pad, mode="edge")
    weighted = prev_weight is not None or cur_weight is not None
    if weighted:
        wp = jnp.ones_like(p) if prev_weight is None else prev_weight.astype(jnp.float32)
        wc = jnp.ones_like(c) if cur_weight is None else cur_weight.astype(jnp.float32)
        # out-of-frame reads are invalid, not edge-extended
        padded_w = jnp.pad(wp, pad, mode="constant")
    sads = []
    for dy, dx in offsets:
        # shifted[y, x] = prev[clamp(y - dy), clamp(x - dx)]
        shifted = padded[..., radius - dy : radius - dy + h, radius - dx : radius - dx + w]
        if weighted:
            sw = padded_w[..., radius - dy : radius - dy + h, radius - dx : radius - dx + w]
            wgt = wc * sw
            num = blockwise_reduce(jnp.abs(c - shifted) * wgt, block_size, jnp.mean)
            den = blockwise_reduce(wgt, block_size, jnp.mean)  # valid fraction
            sad = num / jnp.maximum(den, 1e-6) + jnp.where(den < 0.25, 1e6, 0.0)
        else:
            sad = blockwise_reduce(jnp.abs(c - shifted), block_size, jnp.mean)
        sads.append(sad)
    sads = jnp.stack(sads, axis=-1)  # (N,By,Bx,K)
    best = jnp.argmin(sads, axis=-1)
    table = jnp.asarray(offsets, dtype=jnp.int32)  # (K,2)
    if return_sad:
        # per-block CONFIDENCE: the winning masked SAD. >= the 1e6
        # penalty means NO offset had enough valid mass (e.g. the whole
        # search region is stretch-holes) — the vector is a tie-break
        # artifact and must be flow-completed, not trusted.
        return table[best], jnp.min(sads, axis=-1)
    return table[best]


def _warp_by_block_field(frames: jnp.ndarray, mv: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """``warped[p] = frames[p - mv[block(p)]]`` with edge clamping.

    frames ``(N,H,W)``, mv ``(N,By,Bx,2)`` int pixels -> ``(N,H,W)``."""
    from elvis_tpu.core.blocks import upsample_map

    n, h, w = frames.shape
    dy = upsample_map(mv[..., 0], block_size)
    dx = upsample_map(mv[..., 1], block_size)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    sy = jnp.clip(yy - dy, 0, h - 1)
    sx = jnp.clip(xx - dx, 0, w - 1)
    return frames[jnp.arange(n)[:, None, None], sy, sx]


def field_sad(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    field: jnp.ndarray,
    block_size: int,
    prev_weight: jnp.ndarray | None = None,
    cur_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Masked per-block SAD of warping ``prev`` by an arbitrary integer
    block ``field`` (same convention as ``block_motion``): the candidate-
    arbitration primitive — evaluate competing motion fields (global
    translation vs local median) on equal footing. Out-of-frame reads
    and zero-weight pixels are excluded; a block with <25% valid mass is
    penalized to 1e6 like ``block_motion``."""
    n, h, w = prev.shape
    f = jnp.round(field).astype(jnp.int32)
    warped = _warp_by_block_field(prev.astype(jnp.float32), f, block_size)
    wp = (jnp.ones_like(prev, jnp.float32) if prev_weight is None
          else prev_weight.astype(jnp.float32))
    wc = (jnp.ones_like(cur, jnp.float32) if cur_weight is None
          else cur_weight.astype(jnp.float32))
    wwarp = _warp_by_block_field(wp, f, block_size)
    from elvis_tpu.core.blocks import upsample_map

    dy = upsample_map(f[..., 0], block_size)
    dx = upsample_map(f[..., 1], block_size)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    inb = ((yy - dy >= 0) & (yy - dy < h) & (xx - dx >= 0)
           & (xx - dx < w)).astype(jnp.float32)
    wgt = wc * wwarp * inb
    num = blockwise_reduce(
        jnp.abs(cur.astype(jnp.float32) - warped) * wgt, block_size, jnp.mean)
    den = blockwise_reduce(wgt, block_size, jnp.mean)
    return num / jnp.maximum(den, 1e-6) + jnp.where(den < 0.25, 1e6, 0.0)


def median3_field(field: jnp.ndarray) -> jnp.ndarray:
    """3x3 spatial median of a block-motion field ``(N,By,Bx,2)`` (edge
    padded) — the standard isolated-outlier killer for block matching."""
    f = field.astype(jnp.float32)
    p = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    stk = jnp.stack(
        [p[:, 1 + dy : p.shape[1] - 1 + dy, 1 + dx : p.shape[2] - 1 + dx]
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=0)
    return jnp.median(stk, axis=0)


def subpel_refine(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    field: jnp.ndarray,
    block_size: int,
    prev_weight: jnp.ndarray | None = None,
    cur_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Parabolic sub-pixel refinement of an integer block field: evaluate
    the masked SAD at the field and its four axis neighbours, fit a 1-D
    parabola per axis, and return ``field + delta`` (float, delta clipped
    to +-0.5). The standard half/quarter-pel estimator — rotation and
    non-integer pans alias to +-0.5 px errors on an integer grid, which
    is exactly the scale of the inpaint fill's residual fg misalignment
    (r5 sweeps)."""
    f = jnp.round(field).astype(jnp.int32)
    sads = {}
    for key, (dy, dx) in (("c", (0, 0)), ("u", (-1, 0)), ("d", (1, 0)),
                          ("l", (0, -1)), ("r", (0, 1))):
        off = jnp.asarray([dy, dx], jnp.int32)
        sads[key] = field_sad(prev, cur, f + off, block_size,
                              prev_weight, cur_weight)

    def para(sm, s0, sp):
        den = sm - 2.0 * s0 + sp
        d = jnp.where(jnp.abs(den) > 1e-6, 0.5 * (sm - sp) / den, 0.0)
        # only meaningful when the center is the local minimum; an exact
        # center match (SAD 0: static content, integer pans) IS the
        # minimum — the fitted parabola's vertex would drift off it
        # whenever the two neighbours differ
        d = jnp.where((s0 <= sm) & (s0 <= sp) & (s0 > 1e-3), d, 0.0)
        return jnp.clip(d, -0.5, 0.5)

    dy = para(sads["u"], sads["c"], sads["d"])
    dx = para(sads["l"], sads["c"], sads["r"])
    return f.astype(jnp.float32) + jnp.stack([dy, dx], axis=-1)


def motion_hint(
    frames: jnp.ndarray,
    block_size: int,
    radius: int = 4,
    levels: int = 4,
    coarse: int = 1,
    deadzone_px: float = 0.75,
    refine_radius: int = 2,
    est_scale: int = 2,
) -> tuple:
    """SERVER-side motion hint for the client inpaint fill (round 5).

    Client-side motion estimation on decoded low-bitrate content cannot
    recover true motion: the codec's own rate-optimal inter prediction
    anchors decoded content toward its reference frame, so the SAD
    landscape of the DECODED clip genuinely prefers reduced motion
    (measured: per-pair bias 1.6-1.9 px on the long-run pan at 0.17 bpp,
    compounding to 30-60 px over the chain — scripts/probe_pair_motion*.py;
    direct long-baseline refinement prefers the same ghosted offsets, so
    no decoder-side estimator fixes it). The encoder has the PRISTINE
    frames; transmitting its motion costs ~4 bytes/frame for the global
    vector + a zlib-killed zero field for the deviations — the same
    reason every real codec transmits motion vectors. This is the
    flow-guidance slot of the reference's ProPainter path
    (elvis.py:1458) moved to where the information actually exists.

    Returns ``(gmv (N-1,2) int16, dev (N-1,Cy,Cx,2) int8)`` in
    QUARTER-PEL units: per-pair global translation + coarse (``coarse``
    estimation blocks per cell ~ ``coarse*2*block_size`` px) local
    deviations, clipped to +-31.75 px. Sub-pixel precision is the fg
    lever: rotation and non-integer pans alias to +-0.5 px on an integer
    grid — exactly the residual misalignment the r5 sweeps measured on
    the rotating-object foreground. Estimated on the CLEAN frames at 2x
    fill-block granularity, 3x3-median-filtered, parabolic-refined;
    bitrate accounting must include both arrays (they ship in the
    removal-mask sidecar npz).
    """
    from elvis_tpu.ops.color import rgb_to_gray

    # est_scale: estimation blocks of est_scale*block_size px. 2 is the
    # default (enough content signal on decoded frames, r5 sweeps);
    # periodic object texture can phase-alias a 16 px matcher (every
    # texture-period shift is a SAD minimum) — larger blocks span more
    # periods and disambiguate.
    est_b = int(est_scale) * block_size
    if frames.ndim == 4:
        luma = rgb_to_gray(frames.astype(jnp.float32))
    else:
        luma = frames.astype(jnp.float32)
    n, h, w = luma.shape
    hp = -(-h // est_b) * est_b
    wp = -(-w // est_b) * est_b
    if (hp, wp) != (h, w):
        luma = jnp.pad(luma, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
    mv, sad = block_motion_pyramid(
        luma[:-1], luma[1:], est_b, radius, levels=levels,
        refine_radius=refine_radius, return_sad=True)
    med_sad = jnp.median(sad, axis=(1, 2), keepdims=True)
    reliable = sad <= 3.0 * med_sad + 2.0
    l_int = jnp.round(median3_field(mv)).astype(jnp.int32)
    l_sub = subpel_refine(luma[:-1], luma[1:], l_int, est_b)  # (N-1,ey,ex,2)
    masked = jnp.where(reliable[..., None], l_sub, jnp.nan)
    gmv_px = jnp.nan_to_num(jnp.nanmedian(masked, axis=(1, 2)))  # (N-1,2) px
    gmv = jnp.round(4.0 * gmv_px).astype(jnp.int16)  # quarter-pel
    dev = l_sub - (gmv.astype(jnp.float32) / 4.0)[:, None, None, :]
    if coarse > 1:
        ey, ex = dev.shape[1], dev.shape[2]
        cy, cx = -(-ey // coarse), -(-ex // coarse)
        dev = jnp.pad(dev, ((0, 0), (0, cy * coarse - ey),
                            (0, cx * coarse - ex), (0, 0)), mode="edge")
        dev = dev.reshape(n - 1, cy, coarse, cx, coarse, 2)
        dev = jnp.median(dev, axis=(2, 4))
    # Dead-zone: small deviations are estimator noise — zeroing them (a)
    # pins the global-motion background to EXACTLY the global vector and
    # (b) makes the field zlib-degenerate, so the sidecar stays a few
    # bytes/frame on pan content. The default coarse=1 ships the full
    # estimation grid: independently-moving objects get their true
    # motion at 2x-fill-block granularity — median-pooled 4x cells gave
    # a 220px object mostly MIXED cells whose pooled deviation was the
    # background's zero, warping object holes with the pan (the measured
    # r5 fg gap). Dead-zoned nonzero cells cover only the objects, so
    # rate stays ~object-area-proportional.
    mag = jnp.max(jnp.abs(dev), axis=-1, keepdims=True)
    dev = jnp.where(mag < deadzone_px, 0.0, dev)
    return gmv, jnp.clip(jnp.round(4.0 * dev), -127, 127).astype(jnp.int8)


def motion_field_from_hint(
    gmv: jnp.ndarray,
    dev: jnp.ndarray,
    by: int,
    bx: int,
    coarse: int = 1,
    est_scale: int = 2,
) -> jnp.ndarray:
    """CLIENT side: expand a ``motion_hint`` to the fill grid — per-pair
    block motion ``(N, By, Bx, 2)`` float32 PIXELS (frame 0 zeros; the
    transported ints are quarter-pel), the ``motion_field`` input of
    ``restore_removal_temporal``."""
    f = (dev.astype(jnp.float32)
         + gmv[:, None, None, :].astype(jnp.float32)) / 4.0  # (m,Cy,Cx,2) px
    if coarse > 1:
        f = jnp.repeat(jnp.repeat(f, coarse, axis=1), coarse, axis=2)
    s = int(est_scale)
    f = jnp.repeat(jnp.repeat(f, s, axis=1), s, axis=2)[:, :by, :bx]
    return jnp.concatenate(
        [jnp.zeros((1, by, bx, 2), jnp.float32), f], axis=0)


def block_motion_pyramid(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    block_size: int = 16,
    radius: int = 4,
    levels: int = 3,
    refine_radius: int = 2,
    prev_weight: jnp.ndarray | None = None,
    cur_weight: jnp.ndarray | None = None,
    return_sad: bool = False,
) -> jnp.ndarray:
    """Coarse-to-fine block motion: same convention as ``block_motion``
    but with effective search range ``radius * 2^(levels-1) + ...`` at a
    FRACTION of the flat search's cost.

    The flat (2R+1)^2 whole-frame-shift search saturates at +-radius —
    measured diverging on the committed long-run pan (~5-9 px/frame vs
    the default radius 4; the cumulative chain then amplified the clamp
    into the inpainting quality inversion, VERDICT r4 #1). Here the
    coarsest level searches +-radius at 1/2^(levels-1) resolution (cheap:
    shifts cost 1/4^k), each finer level warps ``prev`` by the upsampled
    prior field (one gather) and searches only +-refine_radius residually.
    For levels=3, radius=4: range +-(16+4+2)=+-22 px at ~45% of the flat
    radius-4 FLOPs at full res.

    ``prev_weight``/``cur_weight`` thread the masked-SAD semantics of
    ``block_motion`` through every level: weights downsample by area mean
    (fractional validity) and warp along the refinement field with their
    frames, so hole-stretched frames can be matched DIRECTLY — no
    prefill, no stale co-located bias.

    H and W must divide ``block_size``; coarser levels pad to alignment
    internally (edge-mode frames, zero-weight validity) and the returned
    field is the original ``(N, H/b, W/b, 2)`` grid.
    """
    if levels <= 1:
        return block_motion(prev, cur, block_size, radius,
                            prev_weight, cur_weight, return_sad=return_sad)
    p = prev.astype(jnp.float32)
    c = cur.astype(jnp.float32)
    n, h, w = p.shape
    weighted = prev_weight is not None or cur_weight is not None
    if weighted:
        wp_full = (jnp.ones_like(p) if prev_weight is None
                   else prev_weight.astype(jnp.float32))
        wc_full = (jnp.ones_like(c) if cur_weight is None
                   else cur_weight.astype(jnp.float32))
    s_max = 1 << (levels - 1)
    align = block_size * s_max
    hp, wp = -(-h // align) * align, -(-w // align) * align
    if (hp, wp) != (h, w):
        grow = ((0, 0), (0, hp - h), (0, wp - w))
        p = jnp.pad(p, grow, mode="edge")
        c = jnp.pad(c, grow, mode="edge")
        if weighted:
            # alignment padding is fake content: zero validity
            wp_full = jnp.pad(wp_full, grow, mode="constant")
            wc_full = jnp.pad(wc_full, grow, mode="constant")

    def down(x, s):
        if s == 1:
            return x
        return x.reshape(n, hp // s, s, wp // s, s).mean(axis=(2, 4))

    def down_masked(x, wgt, s):
        """Weighted-mean downsample: hole pixels must not leak their
        (zeroed) VALUES into the coarse image — only their weight. A
        plain mean mixed stretch-holes into every coarse pixel and the
        coarse search matched corrupted content (measured: 29% of
        clean-pair vectors wrong on an exact-shift pan)."""
        if s == 1:
            return x
        num = down(x * wgt, s)
        den = down(wgt, s)
        return num / jnp.maximum(den, 1e-6)

    mv, sad = None, None
    for k in range(levels - 1, -1, -1):
        s = 1 << k
        final = k == 0 and return_sad
        if weighted:
            pk = down_masked(p, wp_full, s)
            ck = down_masked(c, wc_full, s)
            wpk, wck = down(wp_full, s), down(wc_full, s)
        else:
            pk, ck = down(p, s), down(c, s)
            wpk = wck = None
        if mv is None:
            res = block_motion(pk, ck, block_size, radius, wpk, wck,
                               return_sad=final)
            mv, sad = res if final else (res, None)
        else:
            # upsample the prior field: 2x denser grid, 2x pixel values
            mv = jnp.repeat(jnp.repeat(mv * 2, 2, axis=1), 2, axis=2)
            warped = _warp_by_block_field(pk, mv, block_size)
            if weighted:
                wpk = _warp_by_block_field(wpk, mv, block_size)
            res = block_motion(warped, ck, block_size, refine_radius,
                               wpk, wck, return_sad=final)
            dmv, sad = res if final else (res, None)
            mv = mv + dmv
    mv = mv[:, : h // block_size, : w // block_size]
    if return_sad:
        return mv, sad[:, : h // block_size, : w // block_size]
    return mv
