"""Inpainting restorers for the removal degradation (ELVIS v1 client).

The reference offers three inpainting backends: OpenCV Telea
(elvis.py:4597-4606), ProPainter (elvis.py:1458) and E2FGVI (elvis.py:1693)
— the latter two are external CUDA models driven via subprocess. Here the
self-contained slots are:

  * ``diffusion`` — PDE (heat-equation) inpainting: masked Jacobi
    relaxation that propagates boundary colors inward. Same niche as
    Telea's fast-marching method (a smooth fill from the hole boundary),
    expressed as a ``lax.scan`` of 4-neighbour averages so the whole clip
    relaxes in one fused device loop.
  * ``temporal`` — MOTION-COMPENSATED temporal propagation + diffusion
    fallback: each removed block is filled from the nearest frame where
    its content survives, warped along accumulated block motion (the
    flow-guidance move of ProPainter, reference elvis.py:1458, with
    block-matching standing in for RAFT flow), then residual holes relax.
    Temporal propagation only works when the encoder actually transmits
    each hole's content nearby: pure top-k removal tracks content (79%
    frame-to-frame persistence measured on the long-run pan, VERDICT r4
    #1), which is why the shrink stage temporally dithers the removal
    set by default (``shrink_removal_cooldown``, degrade/removal.py).
  * a neural slot (elvis_tpu.models.inpaint_net) for the learned path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from elvis_tpu.core.blocks import upsample_map
from elvis_tpu.restore.registry import register_restorer

__all__ = ["restore_removal_diffusion", "restore_removal_temporal"]


def _masked_jacobi(frames: jnp.ndarray, hole: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Relax hole pixels toward the 4-neighbour mean; known pixels pinned.

    frames float32 ``(N,H,W,C)``, hole bool ``(N,H,W,1)``.
    """
    known = jnp.where(hole, 0.0, frames)

    def avg4(x):
        up = jnp.roll(x, 1, axis=1).at[:, 0].set(x[:, 0])
        dn = jnp.roll(x, -1, axis=1).at[:, -1].set(x[:, -1])
        lf = jnp.roll(x, 1, axis=2).at[:, :, 0].set(x[:, :, 0])
        rt = jnp.roll(x, -1, axis=2).at[:, :, -1].set(x[:, :, -1])
        return (up + dn + lf + rt) * 0.25

    def step(x, _):
        x = jnp.where(hole, avg4(x), known)
        return x, None

    # Start from the global mean of known pixels for faster convergence.
    denom = jnp.maximum((~hole).sum(axis=(1, 2), keepdims=True), 1)
    mean = known.sum(axis=(1, 2), keepdims=True) / denom
    x0 = jnp.where(hole, mean, known)
    out, _ = jax.lax.scan(step, x0, None, length=iters)
    return out


@register_restorer("removal", "diffusion")
def restore_removal_diffusion(
    frames: jnp.ndarray,
    removal_mask: jnp.ndarray,
    block_size: int,
    iters: int = 200,
) -> jnp.ndarray:
    """frames ``(N,H,W,C)`` stretched (holes black), removal_mask
    ``(N,By,Bx)`` nonzero = removed."""
    hole = upsample_map(removal_mask.astype(bool), block_size)[..., None]
    out = _masked_jacobi(frames.astype(jnp.float32), hole, iters)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)


@register_restorer("removal", "temporal")
def restore_removal_temporal(
    frames: jnp.ndarray,
    removal_mask: jnp.ndarray,
    block_size: int,
    iters: int = 60,
    window: int = 8,
    motion_radius: int = 4,
    ref_stride: int = 0,
    max_refs: int = -1,
    motion_levels: int = 3,
    motion_field: jnp.ndarray | None = None,
    blend_floor: float | None = None,
) -> jnp.ndarray:
    """Fill each removed block from the temporally nearest frame (within
    +-``window``) where its CONTENT survives — warped along accumulated
    block motion — then diffuse residual holes.

    Flow guidance, block-matching edition (ProPainter's core move,
    reference elvis.py:1458): consecutive-frame block motion is estimated
    once (``ops.motion.block_motion``; content at (t, p) came from
    (t-1, p - mv[t])) and accumulated, so the displacement between target
    frame t and source frame s is ``cum[t] - cum[s]`` per block. The
    candidate source block is the warped one, its cleanliness is checked
    at the warped location, and the fill gathers warped pixels. On a
    camera pan this reads the SAME CONTENT from a neighbour frame where
    the zero-motion variant would read content offset by the pan.

    ``motion_radius=0`` disables compensation (the zero-motion variant,
    kept as the cheap path and as the ablation baseline). The estimator
    is the coarse-to-fine pyramid (``motion_levels`` levels, effective
    range ~ ``motion_radius * 2^(levels-1) + ...`` px/frame): the r4
    long-run artifacts showed the flat +-4 px search SATURATING on the
    ~5-9 px/frame pan — the cumulative motion chain diverged (measured
    est (-49,-20) vs true (-161,-156) px at frame 31) and the warped fill
    copied textured content from the wrong place, landing BELOW the PDE
    fill (the r4 quality inversion). ``motion_levels=1`` recovers the
    flat search. The search is windowed (O(N*window)); blocks with no
    clean warped source in the window try the NON-LOCAL reference frames — every ``ref_stride``-th
    frame of the clip, ProPainter's global reference set
    (``propainter_ref_stride``, reference elvis.py:1458 plumbing;
    0 disables) — and only then fall back to PDE diffusion.
    """
    n = frames.shape[0]
    removed = removal_mask.astype(bool)  # (N,By,Bx)
    by, bx = removed.shape[1], removed.shape[2]

    fl = 0.25 if blend_floor is None else float(blend_floor)
    if motion_field is not None and motion_radius > 0 and n > 1:
        # Server-side motion hint (ops.motion.motion_hint): the encoder's
        # pristine-frame motion, shipped in the mask sidecar. Decoder-side
        # estimation on low-bitrate content measures the CODEC's reduced
        # apparent motion, not the scene's (see motion_hint docstring);
        # the hint removes that structural bias. Estimation below remains
        # the hint-free fallback and the ablation path.
        mv = jnp.asarray(motion_field).astype(jnp.float32)
        out = _propagate_fill(frames, removed, mv, block_size, window, iters,
                              ref_stride, max_refs, blend_floor=fl)
    elif motion_radius > 0 and n > 1:
        mv = _estimate_hole_motion(frames, removed, block_size,
                                   motion_radius, motion_levels)
        out = _propagate_fill(frames, removed, mv.astype(jnp.float32),
                              block_size, window, iters, ref_stride, max_refs,
                              blend_floor=fl)
    else:
        zero_mv = jnp.zeros((n, by, bx, 2), jnp.float32)
        out = _propagate_fill(frames, removed, zero_mv, block_size, window,
                              iters, ref_stride, max_refs, blend_floor=fl)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)


def _estimate_hole_motion(
    frames: jnp.ndarray,
    removed: jnp.ndarray,
    block_size: int,
    motion_radius: int,
    motion_levels: int,
) -> jnp.ndarray:
    """Per-pair block motion of a HOLE-STRETCHED clip, robust to codec
    degradation: GLOBAL translation by default, LOCAL deviation only
    where it provably matches better.

    Design (r5, measured on the long-run pan at its real bitrate,
    docs/diag_inpaint_inversion.json):

    * Matching runs directly on the holed frames with hole pixels masked
      out of the SAD (``block_motion_pyramid`` weights) — the r4 path
      estimated on a zero-motion prefill whose stale co-located content
      dragged every minimum toward zero.
    * Estimation uses 2x the fill block size: on heavily-quantized
      decoded content, 8 px blocks lock onto codec blocking artifacts
      (median error 1.0/1.9 px per pair); 16 px blocks carry enough
      content signal (0.2/0.6 px).
    * PER-BLOCK vectors are still too noisy on decoded content to drive
      the fill (hole PSNR 15.9 dB); the per-pair GLOBAL median over
      reliable blocks is nearly oracle-grade (18.6 vs oracle 19.4,
      PDE 16.6). Reliable = clean co-located pair + winning SAD below
      3x the pair's median clean-block SAD + 2 (self-calibrating, so
      codec noise that lifts ALL SADs doesn't mass-flag real matches).
    * Independently-moving objects (the flow-completion problem,
      ProPainter's core concern, reference elvis.py:1458) get a LOCAL
      candidate: the 3x3-median-smoothed field. Each block takes the
      local candidate only where its masked warp SAD beats the global
      candidate's by a margin — background stays pinned to the pan,
      object interiors follow the object.
    """
    from elvis_tpu.ops.color import rgb_to_gray
    from elvis_tpu.ops.motion import (
        block_motion_pyramid, field_sad, median3_field,
    )

    n = frames.shape[0]
    by, bx = removed.shape[1], removed.shape[2]
    est_b = 2 * block_size
    luma = rgb_to_gray(frames.astype(jnp.float32))
    valid = 1.0 - upsample_map(removed, block_size).astype(jnp.float32)
    # pad to the estimation grid (edge luma, zero validity)
    h, w = luma.shape[1], luma.shape[2]
    hp = -(-h // est_b) * est_b
    wp = -(-w // est_b) * est_b
    if (hp, wp) != (h, w):
        grow = ((0, 0), (0, hp - h), (0, wp - w))
        luma = jnp.pad(luma, grow, mode="edge")
        valid = jnp.pad(valid, grow, mode="constant")
    mv, sad = block_motion_pyramid(
        luma[:-1], luma[1:], est_b, motion_radius, levels=motion_levels,
        prev_weight=valid[:-1], cur_weight=valid[1:], return_sad=True,
    )
    ey, ex = mv.shape[1], mv.shape[2]
    # clean at the estimation grid: every covered fill block clean in
    # both frames
    pc = (~removed[:-1]) & (~removed[1:])  # (N-1,By,Bx)
    pc_pad = jnp.pad(pc, ((0, 0), (0, 2 * ey - by), (0, 2 * ex - bx)),
                     mode="constant")
    clean_e = pc_pad.reshape(n - 1, ey, 2, ex, 2).all(axis=(2, 4))
    sad_clean = jnp.where(clean_e, sad, jnp.nan)
    med_sad = jnp.nan_to_num(
        jnp.nanmedian(sad_clean, axis=(1, 2), keepdims=True))
    reliable = clean_e & (sad <= 3.0 * med_sad + 2.0)

    # candidate G: per-pair global translation (median over reliable)
    masked = jnp.where(reliable[..., None], mv.astype(jnp.float32), jnp.nan)
    gmed = jnp.round(jnp.nan_to_num(
        jnp.nanmedian(masked, axis=(1, 2), keepdims=True))).astype(jnp.int32)
    g_field = jnp.broadcast_to(gmed, mv.shape)
    # candidate L: 3x3-median-smoothed local field
    l_field = jnp.round(median3_field(mv)).astype(jnp.int32)

    sad_g = field_sad(luma[:-1], luma[1:], g_field, est_b,
                      valid[:-1], valid[1:])
    sad_l = field_sad(luma[:-1], luma[1:], l_field, est_b,
                      valid[:-1], valid[1:])
    # margin: local must be CLEARLY better (codec noise makes small SAD
    # differences meaningless — margin-1.0 let spurious local wins erode
    # the pan field, measured 17.0 vs 17.9 dB hole PSNR); unmatchable
    # blocks (both penalized) default to global.
    take_local = sad_l + 2.0 + 0.25 * sad_g < sad_g
    mv = jnp.where(take_local[..., None], l_field, g_field)

    # back to the fill grid
    mv = jnp.repeat(jnp.repeat(mv, 2, axis=1), 2, axis=2)[:, :by, :bx]
    return jnp.concatenate([jnp.zeros((1, by, bx, 2), jnp.int32), mv], axis=0)


def _compose_displacements(mv: jnp.ndarray, window: int, block_size: int):
    """Trajectory-composed displacement chains from per-pair block motion.

    ``mv[t]`` is the motion INTO frame t: content at ``(t, p)`` came from
    ``(t-1, p - mv[t](p))``, pixels. Returns ``(back, fwd)`` where
    ``back[d-1][t](p)`` is the displacement to source frame ``t-d``
    (content at ``(t,p)`` sits at ``(t-d, p - back)``) and
    ``fwd[d-1][t](p)`` the displacement to ``t+d``, both ``(N,By,Bx,2)``.

    The r4/r5 co-located ``cumsum`` accumulation summed vectors at a FIXED
    grid cell across time — exact for global pans but structurally wrong
    for independently-moving objects (at t-2 the cell held background, so
    the chain mixed pan into the object's trajectory; measured: the TRUE
    per-pair field warped fg holes to 14.9 dB, BELOW zero-motion, on the
    rotating-disc diag content). Composition instead follows the content:
    each step samples the next pair's field AT THE MOVED POSITION
    (bilinear on the block grid, edge-clamped) — the flow-composition move
    of ProPainter's propagation (reference elvis.py:1458), done on block
    fields. Forward steps use the first-order inverse ``-mv[t+1]``.
    """
    n, by, bx = mv.shape[0], mv.shape[1], mv.shape[2]
    bs = float(block_size)
    yy = jnp.arange(by)[None, :, None]
    xx = jnp.arange(bx)[None, None, :]

    def sample(field, off_px):
        """field/off_px (N,By,Bx,2): field sampled at (p - off_px/bs)."""
        sy = yy - off_px[..., 0] / bs
        sx = xx - off_px[..., 1] / bs
        iy = jnp.floor(sy)
        ix = jnp.floor(sx)
        fy = (sy - iy)[..., None]
        fx = (sx - ix)[..., None]
        y0 = jnp.clip(iy.astype(jnp.int32), 0, by - 1)
        x0 = jnp.clip(ix.astype(jnp.int32), 0, bx - 1)
        y1 = jnp.clip(y0 + 1, 0, by - 1)
        x1 = jnp.clip(x0 + 1, 0, bx - 1)
        ni = jnp.arange(field.shape[0])[:, None, None]
        v00 = field[ni, y0, x0]
        v01 = field[ni, y0, x1]
        v10 = field[ni, y1, x0]
        v11 = field[ni, y1, x1]
        top = v00 + fx * (v01 - v00)
        bot = v10 + fx * (v11 - v10)
        return top + fy * (bot - top)

    def shift_back(x):  # x[t] <- x[t-1] (t=0 row unused, masked by validity)
        return jnp.concatenate([x[:1], x[:-1]], axis=0)

    def shift_fwd(x):  # x[t] <- x[t+1]
        return jnp.concatenate([x[1:], x[-1:]], axis=0)

    def invert(mvn):
        """Forward field: ``mvn[t]`` maps (t,p) <- (t-1, p - mvn): scatter
        each correspondence's motion to its SOURCE block, so the t-1 grid
        learns where its content goes. A first-order inverse (-mvn at p)
        is exact for smooth fields but reads zero at blocks an object has
        not reached yet; the scatter handles discontinuous object fields.
        Blocks nothing maps back to (disocclusions) fall back to the
        frame-global median (the pan component). When an object's source
        block also receives a background correspondence (the object moved
        OFF the block, background got disoccluded ONTO it — both are real
        at block granularity), the deviation-from-global weighting lets
        the mover dominate: holes track content, and content that moves
        is what the global fallback cannot describe."""
        gmed = jnp.median(mvn, axis=(1, 2), keepdims=True)
        sy = jnp.clip(jnp.round(yy - mvn[..., 0] / bs), 0, by - 1)
        sx = jnp.clip(jnp.round(xx - mvn[..., 1] / bs), 0, bx - 1)
        inb = ((yy - mvn[..., 0] / bs >= -0.5)
               & (yy - mvn[..., 0] / bs <= by - 0.5)
               & (xx - mvn[..., 1] / bs >= -0.5)
               & (xx - mvn[..., 1] / bs <= bx - 0.5))
        nb = by * bx
        ni = jnp.arange(mvn.shape[0])[:, None, None]
        flat = (ni * nb + sy.astype(jnp.int32) * bx
                + sx.astype(jnp.int32)).reshape(-1)
        dev_mag = jnp.abs(mvn - gmed).sum(-1)
        wgt = (inb.astype(jnp.float32)
               * (1e-3 + 100.0 * dev_mag)).reshape(-1, 1)
        num = jnp.zeros((mvn.shape[0] * nb, 2), jnp.float32).at[flat].add(
            mvn.reshape(-1, 2) * wgt)
        den = jnp.zeros((mvn.shape[0] * nb, 1), jnp.float32).at[flat].add(wgt)
        f = (num / jnp.maximum(den, 1e-9)).reshape(mvn.shape)
        return jnp.where(den.reshape(*mvn.shape[:-1], 1) > 1e-4, f,
                         jnp.broadcast_to(gmed, mvn.shape))

    # forward motion t -> t+1 at p = the scatter-inverse of mv[t+1]
    g1 = invert(shift_fwd(mv))
    back, fwd = [mv], [g1]
    for _ in range(1, window):
        back.append(back[0] + sample(shift_back(back[-1]), back[0]))
        fwd.append(fwd[0] + sample(shift_fwd(fwd[-1]), -fwd[0]))
    # forward displacement convention: content sits at (t+d, p + fwd) ==
    # (s, p - disp) with disp = -fwd
    return back, [-f for f in fwd]


def _propagate_fill(
    frames: jnp.ndarray,
    removed: jnp.ndarray,
    mv: jnp.ndarray,
    block_size: int,
    window: int,
    iters: int,
    ref_stride: int = 0,
    max_refs: int = -1,
    blend_floor: float = 0.25,
) -> jnp.ndarray:
    """One propagation pass: nearest clean (warped) temporal source per
    removed block, pixel gather along the displacement, PDE fallback.
    ``mv`` is the per-pair block motion (pixels; see
    ``_compose_displacements``); zeros = the co-located variant.
    ``ref_stride`` adds ProPainter's non-local reference frames (every
    stride-th frame) as lower-priority sources."""
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    by, bx = removed.shape[1], removed.shape[2]
    t_idx = jnp.arange(n)
    grid_by = jnp.arange(by)[:, None]
    grid_bx = jnp.arange(bx)[None, :]

    mv = mv.astype(jnp.float32)  # quarter-pel hints carry fractions
    back_d, fwd_d = _compose_displacements(mv, window, block_size)
    # Non-local references sit at arbitrary distances: compose with the
    # per-frame GLOBAL median (the pan component — objects' local motion
    # cannot be trajectory-composed over unbounded gaps at block scale).
    gmed = jnp.median(mv, axis=(1, 2), keepdims=True)  # (N,1,1,2)
    cum_g = jnp.cumsum(gmed, axis=0)
    best_src = jnp.full(removed.shape, -1, dtype=jnp.int32)
    best_dy = jnp.zeros(removed.shape, jnp.float32)
    best_dx = jnp.zeros(removed.shape, jnp.float32)
    bs = block_size

    def consider(state, s_idx, disp, valid=None):
        """Fold candidate source frames ``s_idx`` (per target frame) into
        the first-clean-wins (best_src, best_dy, best_dx) state.
        ``disp``: (N,By,Bx,2) displacement (content at (t,p) sits at
        (s, p - disp)); ``valid``: (N,) mask of rows whose s_idx/disp are
        meaningful (None = all)."""
        best_src, best_dy, best_dx = state
        # The warped read region straddles up to 4 source blocks when
        # disp is not block-aligned — and one extra pixel per fractional
        # axis (the bilinear tap). ALL touched blocks must be clean and
        # in-frame, else a partial read would pull removed (black)
        # pixels into the fill. Integer displacements keep the exact
        # bs-wide footprint (no spurious extra-block requirement).
        y0 = grid_by * bs - disp[..., 0]
        x0 = grid_bx * bs - disp[..., 1]
        iy0 = jnp.floor(y0).astype(jnp.int32)
        ix0 = jnp.floor(x0).astype(jnp.int32)
        span_y = bs - 1 + (y0 > iy0).astype(jnp.int32)  # +1 px when frac
        span_x = bs - 1 + (x0 > ix0).astype(jnp.int32)
        qy_lo, qy_hi = iy0 // bs, (iy0 + span_y) // bs
        qx_lo, qx_hi = ix0 // bs, (ix0 + span_x) // bs
        inb = ((iy0 >= 0) & (iy0 + span_y <= h - 1)
               & (ix0 >= 0) & (ix0 + span_x <= w - 1))

        def _ok(qy, qx):
            qyc = jnp.clip(qy, 0, by - 1)
            qxc = jnp.clip(qx, 0, bx - 1)
            return ~removed[s_idx[:, None, None], qyc, qxc]

        clean = (
            inb
            & _ok(qy_lo, qx_lo) & _ok(qy_lo, qx_hi)
            & _ok(qy_hi, qx_lo) & _ok(qy_hi, qx_hi)
        )
        take = (best_src < 0) & clean & (s_idx != t_idx)[:, None, None]
        if valid is not None:
            take = take & valid[:, None, None]
        best_src = jnp.where(take, s_idx[:, None, None], best_src)
        best_dy = jnp.where(take, disp[..., 0], best_dy)
        best_dx = jnp.where(take, disp[..., 1], best_dx)
        return best_src, best_dy, best_dx

    state = (best_src, best_dy, best_dx)
    for d in range(1, window + 1):
        state = consider(state, jnp.clip(t_idx - d, 0, n - 1),
                         back_d[d - 1], t_idx - d >= 0)
        state = consider(state, jnp.clip(t_idx + d, 0, n - 1),
                         fwd_d[d - 1], t_idx + d <= n - 1)
    if ref_stride and ref_stride > 0:
        # Non-local references: tried only where the local window found no
        # clean source (first-clean-wins state), so they are strictly a
        # fallback ahead of PDE diffusion.
        refs = list(range(0, n, int(ref_stride)))
        if max_refs and max_refs > 0:
            refs = refs[: int(max_refs)]  # e2fgvi_num_ref cap (-1 = all)
        for r_ in refs:
            state = consider(state, jnp.full((n,), r_, dtype=t_idx.dtype),
                             jnp.broadcast_to(cum_g - cum_g[r_], mv.shape))
    best_src, best_dy, best_dx = state
    never_avail = best_src < 0
    src = jnp.where(never_avail, t_idx[:, None, None], best_src)
    hole_blocks = removed & ~never_avail

    # Context ring: each non-hole block adjacent to a hole inherits that
    # hole's (src, disp) so the SAME warp can be evaluated on pixels that
    # still exist — the per-hole confidence signal for the warp/diffusion
    # blend below. Edge-padded shifts (no wraparound).
    def _sh(x, dy_, dx_, fill):
        p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=fill)
        return p[:, 1 + dy_ : 1 + dy_ + by, 1 + dx_ : 1 + dx_ + bx]

    ext_src, ext_dy, ext_dx = src, best_dy, best_dx
    have = hole_blocks
    for dy_ in (-1, 0, 1):
        for dx_ in (-1, 0, 1):
            if dy_ == 0 and dx_ == 0:
                continue
            takeq = ~have & _sh(hole_blocks, dy_, dx_, False) & ~removed
            ext_src = jnp.where(takeq, _sh(src, dy_, dx_, 0), ext_src)
            ext_dy = jnp.where(takeq, _sh(best_dy, dy_, dx_, 0), ext_dy)
            ext_dx = jnp.where(takeq, _sh(best_dx, dy_, dx_, 0), ext_dx)
            have = have | takeq
    ring = have & ~hole_blocks

    # Warped gather at pixel resolution: per removed block (and its
    # context ring), read the source frame at the displaced location
    # (edge-clamped), BILINEARLY for fractional displacements — integer
    # displacements reduce to the exact single-tap gather (frac == 0
    # makes every lerp a no-op), preserving bit-exact static recovery.
    src_pix = upsample_map(ext_src, block_size)  # (N,H,W)
    dy_pix = upsample_map(ext_dy, block_size)
    dx_pix = upsample_map(ext_dx, block_size)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    sy_f = yy - dy_pix
    sx_f = xx - dx_pix
    iy = jnp.floor(sy_f)
    ix = jnp.floor(sx_f)
    fy = (sy_f - iy)[..., None]
    fx = (sx_f - ix)[..., None]
    sy = jnp.clip(iy.astype(jnp.int32), 0, h - 1)
    sx = jnp.clip(ix.astype(jnp.int32), 0, w - 1)
    sy1 = jnp.clip(sy + 1, 0, h - 1)
    sx1 = jnp.clip(sx + 1, 0, w - 1)
    ff = frames.astype(jnp.float32)

    def _bilerp(img):
        v00 = img[src_pix, sy, sx]
        v01 = img[src_pix, sy, sx1]
        v10 = img[src_pix, sy1, sx]
        v11 = img[src_pix, sy1, sx1]
        top = v00 + fx * (v01 - v00)
        bot = v10 + fx * (v11 - v10)
        return top + fy * (bot - top)

    filled = _bilerp(ff)

    # Warp/diffusion BLEND (r5, the decisive lever on codec-degraded
    # content — docs/diag_inpaint_inversion.json): the warp carries
    # aligned texture + codec noise + residual misalignment; the PDE fill
    # carries a smoothing residual proportional to local texture. Their
    # errors are largely independent, so the convex blend beats BOTH
    # (measured: warp 17.9 / PDE 16.6 / blend 18.2 dB hole PSNR at the
    # long-run operating point). Per-hole weight is the decision-theoretic
    # alpha = sigma_pde^2 / (sigma_pde^2 + sigma_warp^2) with
    # sigma_warp ~ ring-context SAD of the SAME warp on surviving pixels
    # and sigma_pde ~ 5x the local 4-neighbour texture deviation
    # (calibrated against the measured per-region optima), clipped to
    # [0.55, 1.0]: the floor keeps blended texture on trustworthy
    # content; alpha reaches exactly 1 only when the ring context matches
    # exactly (static content / clean pans), preserving the temporal
    # restorer's bit-exact recovery there.
    from elvis_tpu.core.blocks import blockwise_reduce
    from elvis_tpu.ops.color import rgb_to_gray

    valid = 1.0 - upsample_map(removed, block_size).astype(jnp.float32)
    den_b = blockwise_reduce(valid, block_size, jnp.mean)
    # The ring warp has NO cleanliness guarantee at the source (the
    # consider() scan only certifies the HOLE blocks' source regions):
    # a ring block's displaced read often lands on the very hole it
    # borders, and black source pixels would poison the SAD. Gather
    # source-frame validity through the same warp and weight by it;
    # rings with <1/4 doubly-valid pixels carry no signal (NaN → the
    # 3x3 pool ignores them).
    src_valid = _bilerp(valid[..., None])[..., 0]
    wgt = valid * src_valid
    den_w = blockwise_reduce(wgt, block_size, jnp.mean)
    num_b = blockwise_reduce(
        jnp.abs(filled - ff).mean(-1) * wgt, block_size, jnp.mean)
    ring_sad = jnp.where(ring & (den_w > 0.25),
                         num_b / jnp.maximum(den_w, 1e-6), jnp.nan)

    # PDE-error scale, measured the same way as the warp's: diffuse the
    # RING blocks together with the holes (one extra Jacobi pass over the
    # union mask) and score the actual |pde - truth| on those known
    # pixels. Both sigmas then live on the same mean-abs scale, so the
    # alpha needs no hand-calibrated texture multiplier. The union probe
    # deliberately OVERestimates PDE error (boundaries sit ~a block
    # farther than a real hole's): that slack compensates the warp side's
    # own overestimate — the ring SAD carries ~2x the codec noise of a
    # vs-truth error. A boundary-exact checkerboard probe was measured
    # WORSE for exactly this reason (r5 floor sweeps: union 18.92/18.95
    # hole/bg vs checkerboard 17.8-18.4 at the long-run operating point).
    all_hole_pix = upsample_map(removed, block_size)[..., None]
    pdefill = _masked_jacobi(ff, all_hole_pix, iters)
    ring_pix = upsample_map(ring, block_size)[..., None]
    probe_hole = all_hole_pix.astype(bool) | ring_pix.astype(bool)
    pde_probe = _masked_jacobi(ff, probe_hole, iters)
    pde_err_pix = jnp.abs(pde_probe - ff).mean(-1) * ring_pix[..., 0]
    den_r = blockwise_reduce(ring_pix[..., 0].astype(jnp.float32),
                             block_size, jnp.mean)
    tex_b = jnp.where(
        ring,
        blockwise_reduce(pde_err_pix, block_size, jnp.mean)
        / jnp.maximum(den_r, 1e-6),
        jnp.nan,
    )

    def _pool9(x):
        stk = jnp.stack(
            [_sh(x, dy_, dx_, jnp.nan) for dy_ in (-1, 0, 1)
             for dx_ in (-1, 0, 1)], axis=0)
        return jnp.nanmean(stk, axis=0)

    ctx = _pool9(ring_sad)   # warp-error scale per hole block
    tau = _pool9(tex_b)      # diffusion-error scale per hole block
    # Holes whose ring carries no signal (every neighbour is itself a
    # hole, or every ring warp lands on source holes) fall back to the
    # frame-level median ring SAD — the typical warp error of THIS pair
    # of frames — rather than to the alpha floor: on a static clip the
    # median is exactly 0, preserving bit-exact recovery everywhere.
    f_ctx = jnp.nanmedian(ring_sad, axis=(1, 2), keepdims=True)
    f_ctx = jnp.nan_to_num(
        jnp.where(jnp.isnan(f_ctx), jnp.nanmedian(ring_sad), f_ctx), nan=0.0)
    ctx = jnp.where(jnp.isnan(ctx), f_ctx, ctx)
    f_tau = jnp.nanmedian(tex_b, axis=(1, 2), keepdims=True)
    f_tau = jnp.nan_to_num(
        jnp.where(jnp.isnan(f_tau), jnp.nanmedian(tex_b), f_tau), nan=0.0)
    tau = jnp.where(jnp.isnan(tau), f_tau, tau)
    sp2 = tau**2
    alpha = jnp.clip(
        jnp.nan_to_num(sp2 / jnp.maximum(sp2 + ctx**2, 1e-6), nan=0.0),
        blend_floor, 1.0,
    )
    # ctx == 0 is an exact ring match (static content / clean pan):
    # trust the warp outright, even on flat blocks where tau == 0 too.
    alpha = jnp.where(ctx <= 0.0, 1.0, alpha)
    alpha = jnp.where(hole_blocks, alpha, 0.0)
    a_pix = upsample_map(alpha, block_size)[..., None]

    return jnp.where(
        all_hole_pix.astype(bool),
        a_pix * filled + (1.0 - a_pix) * pdefill,
        ff,
    )
