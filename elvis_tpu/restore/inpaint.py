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

    if motion_radius > 0 and n > 1:
        mv = _estimate_hole_motion(frames, removed, block_size,
                                   motion_radius, motion_levels)
        # Co-located accumulation: exact for global pans, approximate for
        # locally smooth object motion.
        cum = jnp.cumsum(mv, axis=0)  # (N,By,Bx,2) pixels
        out = _propagate_fill(frames, removed, cum, block_size, window, iters,
                              ref_stride, max_refs)
    else:
        zero_cum = jnp.zeros((n, by, bx, 2), jnp.int32)
        out = _propagate_fill(frames, removed, zero_cum, block_size, window,
                              iters, ref_stride, max_refs)
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
    """Per-pair block motion of a HOLE-STRETCHED clip, hole-completed.

    Matching runs directly on the holed frames with the hole pixels
    masked out of the SAD (``block_motion_pyramid`` weights): the r4 path
    estimated on a zero-motion PREFILL, whose stale co-located content
    dragged every minimum toward zero — est (-49,-20) vs true (-161,-156)
    px cumulative at frame 31 of the long-run pan
    (docs/diag_inpaint_inversion.json). Masked matching has no such bias.

    Flow completion (the ProPainter move, reference elvis.py:1458): a
    fully-holed block ties to zero motion, exactly where warping is
    needed. Instead of the r4 global median (which assigned PAN motion to
    holes on independently-moving objects), the field is completed
    LOCALLY — masked Jacobi diffusion over hole blocks, initialized at
    the pair's clean-block median — so a hole inside a moving object
    inherits the object's motion from its clean neighbours, and a hole in
    the background inherits the pan.
    """
    from elvis_tpu.ops.color import rgb_to_gray
    from elvis_tpu.ops.motion import block_motion_pyramid

    by, bx = removed.shape[1], removed.shape[2]
    luma = rgb_to_gray(frames.astype(jnp.float32))
    valid = 1.0 - upsample_map(removed, block_size).astype(jnp.float32)
    mv, sad = block_motion_pyramid(
        luma[:-1], luma[1:], block_size, motion_radius, levels=motion_levels,
        prev_weight=valid[:-1], cur_weight=valid[1:], return_sad=True,
    )
    # Reliability: the pair's co-located blocks are clean AND the winning
    # masked SAD is consistent with a genuine match. A block whose true
    # source region is entirely holed in prev has NO matchable offset —
    # the search then "wins" on wrong content with a SAD well above the
    # genuine-match level (measured: garbage 5-13 vs genuine 0-1.6 on an
    # exact-shift pan). The threshold self-calibrates per pair against
    # the median clean-block SAD, so codec noise (which lifts ALL SADs)
    # doesn't mass-flag real matches.
    pair_clean = ~removed[:-1] & ~removed[1:]  # (N-1,By,Bx)
    sad_clean = jnp.where(pair_clean, sad, jnp.nan)
    med_sad = jnp.nan_to_num(
        jnp.nanmedian(sad_clean, axis=(1, 2), keepdims=True))
    reliable = pair_clean & (sad <= 3.0 * med_sad + 2.0)
    # Complete the field at unreliable blocks: clean-median init + local
    # diffusion (30 iters reaches ~30 blocks of propagation radius), so a
    # hole inside a moving object inherits the object's motion while a
    # background hole inherits the pan.
    masked = jnp.where(reliable[..., None], mv.astype(jnp.float32), jnp.nan)
    med = jnp.nan_to_num(jnp.nanmedian(masked, axis=(1, 2), keepdims=True))
    init = jnp.where(reliable[..., None], mv.astype(jnp.float32), med)
    hole = (~reliable)[..., None]
    smooth = _masked_jacobi(init, hole, iters=30)
    mv = jnp.where(reliable[..., None], mv,
                   jnp.round(smooth).astype(jnp.int32))
    return jnp.concatenate([jnp.zeros((1, by, bx, 2), jnp.int32), mv], axis=0)


def _propagate_fill(
    frames: jnp.ndarray,
    removed: jnp.ndarray,
    cum: jnp.ndarray,
    block_size: int,
    window: int,
    iters: int,
    ref_stride: int = 0,
    max_refs: int = -1,
) -> jnp.ndarray:
    """One propagation pass: nearest clean (warped) temporal source per
    removed block, pixel gather along the displacement, PDE fallback.
    ``cum`` is the per-block cumulative motion (pixels); zeros = the
    co-located variant. ``ref_stride`` adds ProPainter's non-local
    reference frames (every stride-th frame) as lower-priority sources."""
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    by, bx = removed.shape[1], removed.shape[2]
    t_idx = jnp.arange(n)
    grid_by = jnp.arange(by)[:, None]
    grid_bx = jnp.arange(bx)[None, :]

    best_src = jnp.full(removed.shape, -1, dtype=jnp.int32)
    best_dy = jnp.zeros(removed.shape, jnp.int32)
    best_dx = jnp.zeros(removed.shape, jnp.int32)
    bs = block_size

    def consider(state, s_idx):
        """Fold candidate source frames ``s_idx`` (per target frame) into
        the first-clean-wins (best_src, best_dy, best_dx) state."""
        best_src, best_dy, best_dx = state
        # content at (t, p) sits at (s, p - (cum[t] - cum[s]))
        disp = cum - cum[s_idx]  # (N,By,Bx,2) pixels
        # The warped read region [p*bs - disp, +bs) straddles up to 4
        # source blocks when disp is not block-aligned; ALL of them
        # must be clean and in-frame, else a partial read would pull
        # removed (black) pixels into the fill.
        y0 = grid_by * bs - disp[..., 0]
        x0 = grid_bx * bs - disp[..., 1]
        qy_lo, qy_hi = y0 // bs, (y0 + bs - 1) // bs
        qx_lo, qx_hi = x0 // bs, (x0 + bs - 1) // bs
        inb = (y0 >= 0) & (y0 + bs <= h) & (x0 >= 0) & (x0 + bs <= w)

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
        best_src = jnp.where(take, s_idx[:, None, None], best_src)
        best_dy = jnp.where(take, disp[..., 0], best_dy)
        best_dx = jnp.where(take, disp[..., 1], best_dx)
        return best_src, best_dy, best_dx

    state = (best_src, best_dy, best_dx)
    for d in range(1, window + 1):
        for delta in (-d, d):
            state = consider(state, jnp.clip(t_idx + delta, 0, n - 1))
    if ref_stride and ref_stride > 0:
        # Non-local references: tried only where the local window found no
        # clean source (first-clean-wins state), so they are strictly a
        # fallback ahead of PDE diffusion.
        refs = list(range(0, n, int(ref_stride)))
        if max_refs and max_refs > 0:
            refs = refs[: int(max_refs)]  # e2fgvi_num_ref cap (-1 = all)
        for r_ in refs:
            state = consider(state, jnp.full((n,), r_, dtype=t_idx.dtype))
    best_src, best_dy, best_dx = state
    never_avail = best_src < 0
    src = jnp.where(never_avail, t_idx[:, None, None], best_src)

    # Warped gather at pixel resolution: per removed block, read the
    # source frame at the displaced location (edge-clamped).
    src_pix = upsample_map(src, block_size)  # (N,H,W)
    dy_pix = upsample_map(best_dy, block_size)
    dx_pix = upsample_map(best_dx, block_size)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    sy = jnp.clip(yy - dy_pix, 0, h - 1)
    sx = jnp.clip(xx - dx_pix, 0, w - 1)
    filled = frames[src_pix, sy, sx, :]
    hole_blocks = removed & ~never_avail
    hole_pix = upsample_map(hole_blocks, block_size)[..., None]
    out = jnp.where(hole_pix, filled, frames)

    # Blocks with no clean warped source in the window: diffuse.
    # (A no-op pass when the residual mask is empty.)
    residual = removed & never_avail
    res_pix = upsample_map(residual, block_size)[..., None]
    return _masked_jacobi(out.astype(jnp.float32), res_pix, iters)
