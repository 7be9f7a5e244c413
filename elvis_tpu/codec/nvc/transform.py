"""NVC transform/quantization stage — the on-TPU half of the codec.

Per 8x8 block: DCT (MXU matmuls, elvis_tpu.ops.dct) -> uniform scalar
quantization with per-block QP (H.264-style Qstep = 2^((QP-4)/6)) ->
int16 levels. P-frames choose per block between intra (transform the
pixels) and inter (motion-compensated residual against the previous
*reconstructed* frame: full-search integer motion + half-pel bilinear
refinement) by quantized-coefficient cost; the
encoder runs the same reconstruction the decoder will, as a ``lax.scan``
over the frame axis, so there is no drift.

Per-block QP is the codec's native ROI mechanism: the delta-QP map the
reference feeds to kvazaar/x265/SVT-AV1 through sidecar files
(utils.py:1026, elvis.py:2030) is here simply an argument to the
quantizer.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from elvis_tpu.core.blocks import combine_blocks, split_into_blocks
from elvis_tpu.ops.dct import block_dct2, block_idct2

__all__ = [
    "qstep_from_qp",
    "zigzag_order",
    "encode_plane",
    "decode_plane",
    "encode_plane_b",
    "decode_plane_b",
    "MODE_INTRA",
    "MODE_INTER",
    "MODE_INTER_BWD",
    "MODE_INTER_BI",
]

BLOCK = 8
# B-frame mode-decision cost: "bits" = estimated coefficient+mv bits
# (honest rate accounting, the round-3 default), "l1" = the round-2
# L1-coefficient proxy (kept for A/B measurement). B_MODE_MV_SCALE
# calibrates the per-vector charge against actual range-coder output;
# 0.5 measured Pareto-safe across the pan/noise/occlusion suite
# (pan -0.6% bytes +0.03 dB, occlusion-flicker -6.7% bytes +0.10 dB,
# noise neutral; scale 1.0 wins more on pans but costs +1% on noise,
# 2.0 over-corrects — full table in DESIGN.md).
B_MODE_COST = "bits"
B_MODE_MV_SCALE = 0.5
MODE_INTRA = 0
MODE_INTER = 1  # forward (previous-reference) prediction
# Mode value 2 is parity-resolved: on B (odd) frames of a b_frames stream
# it is the backward reference; on P-chain frames it is the SECOND-most-
# recent reference (multi-reference P, H.264's ref-list idea — helps
# occlusion/flicker where the immediate predecessor is a bad match).
MODE_INTER_BWD = 2  # backward (next-reference) prediction — B frames only
MODE_INTER_REF2 = 2  # two-back reference — P frames with multi_ref
MODE_INTER_BI = 3  # bidirectional average — B frames only
# Spatial intra prediction modes (full-intra frames only, round 4): the
# block's pixels are predicted from the RECONSTRUCTED pixel rows directly
# above it before the DCT, HEVC-style (every encoder the reference wraps —
# x265/kvazaar/SVT-AV1 — ships neighbour prediction; raw-DCT keyframes were
# the largest remaining RD lever at gop~1s). Mode 0 on an intra frame means
# "raw" (no prediction), keeping old streams decodable.
MODE_INTRA_DC = 4    # constant = mean of the row above
MODE_INTRA_V = 5     # vertical: copy the row above down the block
MODE_INTRA_GRAD = 6  # planar-style: extrapolate the vertical gradient


def qstep_from_qp(qp: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp2((qp.astype(jnp.float32) - 4.0) / 6.0)


@functools.lru_cache(maxsize=8)
def zigzag_order(b: int = BLOCK) -> np.ndarray:
    """Flat indices of a b x b block in JPEG zigzag order."""
    idx = sorted(
        ((u, v) for u in range(b) for v in range(b)),
        key=lambda uv: (uv[0] + uv[1], uv[1] if (uv[0] + uv[1]) % 2 == 0 else uv[0]),
    )
    return np.asarray([u * b + v for u, v in idx], dtype=np.int32)


def _blocks_of(plane: jnp.ndarray) -> jnp.ndarray:
    """``(H, W)`` -> ``(By, Bx, 8, 8)``."""
    return split_into_blocks(plane[..., None], BLOCK)[..., 0]


def _plane_of(blocks: jnp.ndarray) -> jnp.ndarray:
    return combine_blocks(blocks[..., None])[..., 0]


# RDOQ-lite lambda, in Qstep^2 units (H.264's mode lambda 0.85*2^((QP-12)/3)
# expressed against this codec's Qstep = 2^((QP-4)/6) is ~0.133*Qstep^2).
# Each coefficient picks between its rounded level l0 and l0-1 by true
# D + lambda*R under the range coder's bit model — in practice this zeroes
# isolated |c| < ~0.76*Qstep coefficients (a zero costs ~0.05 bits, the
# smallest nonzero level ~4) while leaving multi-level coefficients at full
# rounding precision. A blanket deadzone offset (H.264's f=1/3 / f=1/6) was
# measured NOT Pareto here: +2.3 dB at equal rate on textured pans but
# -1.7..-3.2 dB on sharp-edge/smooth content, where small coefficients are
# load-bearing; the per-coefficient decision keeps both (calibration table
# in docs/DESIGN.md round 3). 0 disables (plain rounding).
RDOQ_LAMBDA = 0.133


def _quantize(coeffs: jnp.ndarray, qstep: jnp.ndarray) -> jnp.ndarray:
    # qstep (By,Bx) -> broadcast over (By,Bx,8,8)
    q = qstep[..., None, None]
    a = jnp.abs(coeffs)
    l0 = jnp.round(a / q)
    if RDOQ_LAMBDA:
        l1 = jnp.maximum(l0 - 1.0, 0.0)
        lam = RDOQ_LAMBDA * q * q

        def bits(l):
            return jnp.where(l > 0, 2.0 * jnp.ceil(jnp.log2(l + 1.0)) + 2.0, 0.05)

        c0 = (a - l0 * q) ** 2 + lam * bits(l0)
        c1 = (a - l1 * q) ** 2 + lam * bits(l1)
        l0 = jnp.where(c1 < c0, l1, l0)
    lv = jnp.sign(coeffs) * l0
    return jnp.clip(lv, -32767, 32767).astype(jnp.int16)


def _dequantize(levels: jnp.ndarray, qstep: jnp.ndarray) -> jnp.ndarray:
    return levels.astype(jnp.float32) * qstep[..., None, None]


def _rd_cost(levels: jnp.ndarray, coeffs: jnp.ndarray, qstep: jnp.ndarray) -> jnp.ndarray:
    """Per-block rate-distortion cost D + lambda*R for mode decision.

    D = transform-domain quantization SSD (orthonormal DCT, so equal to
    pixel-domain SSD by Parseval); R = a bit estimate matching the range
    coder's binarization (sign + adaptive-unary length + mantissa per
    significant coefficient, a small floor for coded zeros);
    lambda = 0.85 * Qstep^2, the H.264 high-rate Lagrangian. Replaces
    the round-1 L1-coefficient proxy, which over-picked inter modes with
    many small costly coefficients."""
    rec = levels.astype(jnp.float32) * qstep[..., None, None]
    dist = ((rec - coeffs) ** 2).sum(axis=(-2, -1))
    mag = jnp.abs(levels).astype(jnp.float32)
    bits = jnp.where(mag > 0, 2.0 * jnp.ceil(jnp.log2(mag + 1.0)) + 2.0, 0.05)
    lam = 0.85 * qstep * qstep
    return dist + lam * bits.sum(axis=(-2, -1))


# In-loop deblocking thresholds, in units of the boundary's quantizer
# step (H.264-style weak filter: an edge step SMALLER than the step size
# is indistinguishable from quantization error and safe to smooth; a
# larger one is likely real content). Calibrated on the 12-frame 96x144
# CPU RD suite (textured pan / noisy-static / sharp-edges / smooth
# gradient, qp 28-46): this point is Pareto — <=0.004 dB cost at
# moderate rate, +0.69..+1.8 dB with flat-to-negative bytes at low rate
# (filtered references also predict better). See docs/DESIGN.md round 3.
DEBLOCK_EDGE = 0.8    # max |p0-q0| (in qstep) the filter touches
DEBLOCK_FLAT = 0.4    # max inner-gradient |p1-p0|, |q1-q0|
DEBLOCK_TC = 0.15     # clamp on the correction, in qstep


def _deblock_cols(plane: jnp.ndarray, qstep: jnp.ndarray) -> jnp.ndarray:
    """Filter the VERTICAL block boundaries of one plane ``(H, W)``.

    ``qstep (By, Bx)``. For each boundary column pair p1 p0 | q0 q1 the
    weak H.264 filter applies where the edge looks like quantization
    noise relative to the local quantizer step: p0/q0 move toward each
    other by a clamped delta."""
    h, w = plane.shape
    bx = w // BLOCK
    r = plane.reshape(h, bx, BLOCK)
    p1, p0 = r[:, :-1, BLOCK - 2], r[:, :-1, BLOCK - 1]
    q0, q1 = r[:, 1:, 0], r[:, 1:, 1]
    qs_rows = jnp.repeat(qstep, BLOCK, axis=0)[:h]  # (H, Bx)
    qs = 0.5 * (qs_rows[:, :-1] + qs_rows[:, 1:])   # (H, Bx-1)
    fit = (
        (jnp.abs(p0 - q0) < DEBLOCK_EDGE * qs)
        & (jnp.abs(p1 - p0) < DEBLOCK_FLAT * qs)
        & (jnp.abs(q1 - q0) < DEBLOCK_FLAT * qs)
    )
    delta = jnp.clip(
        ((q0 - p0) * 4.0 + (p1 - q1)) * 0.125,
        -DEBLOCK_TC * qs, DEBLOCK_TC * qs,
    ) * fit
    r = r.at[:, :-1, BLOCK - 1].add(delta)
    r = r.at[:, 1:, 0].add(-delta)
    return r.reshape(h, w)


def deblock_plane(plane: jnp.ndarray, qstep: jnp.ndarray) -> jnp.ndarray:
    """In-loop deblocking of one reconstructed plane ``(H, W)``.

    Both block-boundary directions, QP-adaptive thresholds. IN-LOOP:
    encoder and decoder apply it identically to every reference
    reconstruction, so prediction stays drift-free (the classic H.264
    loop filter move; the reference's external encoders all ship one —
    x265/kvazaar/SVT-AV1 — while the raw DCT codec here showed visible
    8x8 seams at low rate without it)."""
    plane = _deblock_cols(plane, qstep)
    return _deblock_cols(plane.T, qstep.T).T


def _intra_predictors(top2: jnp.ndarray) -> jnp.ndarray:
    """Candidate spatial predictions from the two reconstructed pixel
    rows directly above each block.

    ``top2 (Bx, 2, b)`` — ``top2[:, 1]`` is the adjacent row, ``top2[:, 0]``
    the one above it — -> ``(4, Bx, b, b)``: [raw (zeros), DC, vertical,
    gradient].  Prediction uses UN-deblocked reconstructions (the H.264
    convention), which is what the encode/decode wavefronts carry.
    """
    bx = top2.shape[0]
    t1 = top2[:, 1]
    t0 = top2[:, 0]
    shape = (bx, BLOCK, BLOCK)
    none = jnp.zeros(shape, jnp.float32)
    dc = jnp.broadcast_to(t1.mean(axis=-1)[:, None, None], shape)
    vert = jnp.broadcast_to(t1[:, None, :], shape)
    r = jnp.arange(1, BLOCK + 1, dtype=jnp.float32)[None, :, None]
    grad = jnp.clip(t1[:, None, :] + r * (t1 - t0)[:, None, :], 0.0, 255.0)
    return jnp.stack([none, dc, vert, grad])


def _intra_frame_encode(blocks: jnp.ndarray, qs: jnp.ndarray):
    """Spatially-predicted encode of one full-intra frame.

    TPU-native wavefront: a ``lax.scan`` over BLOCK ROWS (By sequential
    steps, each vectorized over the Bx blocks of the row) — every block
    predicts from the reconstructed bottom rows of the block above, so
    top-referencing modes (DC / vertical / gradient) need no per-block
    sequencing.  Left-neighbour modes would force a second scan over Bx
    (240 steps at 1080p) and are deliberately omitted; keyframes are
    sparse (gop ~ 1s) so the row scan's cost is negligible.

    blocks ``(By, Bx, b, b)``, qs ``(By, Bx)`` ->
    (levels int16 ``(By, Bx, b, b)``, modes int8 ``(By, Bx)`` in
    {0, MODE_INTRA_DC, MODE_INTRA_V, MODE_INTRA_GRAD}, recon blocks
    ``(By, Bx, b, b)`` float32).  Mode selection is the same D+lambda*R
    rule as inter mode decision (_rd_cost).
    """
    bx = blocks.shape[1]

    def row_step(top2, inp):
        blk, qr = inp  # (Bx,b,b), (Bx,)
        preds = _intra_predictors(top2)  # (4,Bx,b,b)
        cs = block_dct2(blk[None] - preds)
        lvs = _quantize(cs, qr[None])
        costs = _rd_cost(lvs, cs, qr[None])  # (4,Bx)
        midx = jnp.argmin(costs, axis=0)  # (Bx,)
        onehot = (jnp.arange(4)[:, None] == midx[None]).astype(jnp.float32)
        lv = (lvs.astype(jnp.float32) * onehot[..., None, None]).sum(axis=0)
        pred = (preds * onehot[..., None, None]).sum(axis=0)
        rec = jnp.clip(block_idct2(lv * qr[:, None, None]) + pred, 0.0, 255.0)
        mode = jnp.where(midx == 0, 0, midx + 3).astype(jnp.int8)
        return rec[:, -2:, :], (lv.astype(jnp.int16), mode, rec)

    top0 = jnp.full((bx, 2, BLOCK), 128.0, jnp.float32)
    _, (lv, modes, rec) = jax.lax.scan(row_step, top0, (blocks, qs))
    return lv, modes, rec


def _intra_frame_rd(lv, blocks, rec, qs, modes):
    """Honest FRAME-level cost of one intra-frame candidate, for the
    raw-vs-spatially-predicted arbiter in encode_plane.

    Per-block D+lambda*R estimates mislead here: mixing raw and predicted
    blocks fragments the DC-DPCM stream (codec._dc_dpcm codes each DC as
    the delta to the previous block in frame raster order), so a block's
    true DC cost depends on its neighbours' chosen modes. At frame level
    both candidates' bits ARE computable: AC bits via the range coder's
    binarization, DC bits over the actual in-frame DPCM sequence, and the
    mode plane at its empirical entropy (an all-raw plane is ~free).
    """
    dist = ((rec - blocks) ** 2).sum(axis=(-2, -1))  # (By,Bx)
    lvf = lv.astype(jnp.float32)
    mag = jnp.abs(lvf).at[..., 0, 0].set(0.0)
    bits_ac = jnp.where(
        mag > 0, 2.0 * jnp.ceil(jnp.log2(mag + 1.0)) + 2.0, 0.05
    ).sum(axis=(-2, -1))
    dc = lvf[..., 0, 0].reshape(-1)  # frame raster order
    dcd = jnp.abs(dc - jnp.concatenate([jnp.zeros((1,), jnp.float32), dc[:-1]]))
    bits_dc = jnp.where(dcd > 0, 2.0 * jnp.ceil(jnp.log2(dcd + 1.0)) + 2.0, 0.05)
    counts = jnp.stack(
        [(modes == v).sum() for v in (0, MODE_INTRA_DC, MODE_INTRA_V,
                                      MODE_INTRA_GRAD)]
    ).astype(jnp.float32)
    p = counts / jnp.maximum(counts.sum(), 1.0)
    ent = -(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-12)), 0.0)).sum()
    lam = 0.85 * qs * qs
    return (
        (dist + lam * bits_ac).sum()
        + (lam.reshape(-1) * bits_dc).sum()
        + lam.mean() * ent * counts.sum()
    )


def _intra_frame_decode(
    lvl: jnp.ndarray, mode: jnp.ndarray, qs: jnp.ndarray
) -> jnp.ndarray:
    """Decode-side wavefront, the exact mirror of _intra_frame_encode:
    lvl ``(By, Bx, b, b)`` float32 levels, mode ``(By, Bx)``,
    qs ``(By, Bx)`` -> reconstructed blocks ``(By, Bx, b, b)``."""
    bx = lvl.shape[1]

    def row_step(top2, inp):
        lv, md, qr = inp
        preds = _intra_predictors(top2)
        midx = jnp.where(md >= 4, md.astype(jnp.int32) - 3, 0)
        onehot = (jnp.arange(4)[:, None] == midx[None]).astype(jnp.float32)
        pred = (preds * onehot[..., None, None]).sum(axis=0)
        rec = jnp.clip(block_idct2(lv * qr[:, None, None]) + pred, 0.0, 255.0)
        return rec[:, -2:, :], rec

    top0 = jnp.full((bx, 2, BLOCK), 128.0, jnp.float32)
    _, rec = jax.lax.scan(row_step, top0, (lvl, mode, qs))
    return rec


def _motion_search(prev_recon: jnp.ndarray, cur_blocks: jnp.ndarray, radius: int, step: int):
    """Full-search block motion on the previous reconstruction.

    prev_recon ``(H, W)``, cur_blocks ``(By, Bx, b, b)`` ->
    mv ``(By, Bx, 2)`` int32 (dy, dx) minimizing per-block SAD. The
    candidate offsets are a static grid, evaluated as whole-frame rolls
    with per-block reductions (no per-block Python) — the TPU-native
    formulation of motion estimation.
    """
    offsets = [
        (dy, dx)
        for dy in range(-radius, radius + 1, step)
        for dx in range(-radius, radius + 1, step)
    ]
    # Edge-replicate pad so candidate shifts clamp at the frame border —
    # the same pixels _motion_predict will read — instead of wrapping
    # pixels in from the opposite edge (which let edge blocks pick vectors
    # scored against the wrong content).
    h, w = prev_recon.shape
    padded = jnp.pad(prev_recon, radius, mode="edge")
    sads = []
    for dy, dx in offsets:
        shifted = jax.lax.dynamic_slice(padded, (radius + dy, radius + dx), (h, w))
        diff = jnp.abs(cur_blocks - _blocks_of(shifted))
        sads.append(diff.sum(axis=(-2, -1)))
    best = jnp.argmin(jnp.stack(sads, axis=-1), axis=-1)  # (By,Bx)
    table = jnp.asarray(offsets, dtype=jnp.int32)
    return table[best]


@functools.lru_cache(maxsize=8)
def _mc_selection_table(b: int = BLOCK, reach: int = 1) -> np.ndarray:
    """(2*R2+1, b, window) selection/averaging matrices, R2 = 2*reach*b.

    ``reach`` is the prediction neighbourhood radius in BLOCKS: the
    window spans (2*reach+1) blocks and represents half-pel motion
    components up to |m| = 2*reach*b. Entry for half-pel component m maps
    a length-``window`` neighbourhood row (centred so index reach*b
    corresponds to the block's own first pel) to the b output pels at
    offset m/2: a single 1 for even m, two 0.5 taps for odd m (bilinear
    half-pel).
    """
    window = (2 * reach + 1) * b
    r2 = 2 * reach * b
    table = np.zeros((2 * r2 + 1, b, window), dtype=np.float64)
    for mi, m in enumerate(range(-r2, r2 + 1)):
        base = m // 2  # floor division (matches py//2 semantics)
        frac = m - 2 * base  # 0 or 1
        for u in range(b):
            p0 = min(max(reach * b + u + base, 0), window - 1)
            if frac == 0:
                table[mi, u, p0] = 1.0
            else:
                p1 = min(p0 + 1, window - 1)
                table[mi, u, p0] += 0.5
                table[mi, u, p1] += 0.5
    return table


def _neighbourhood(prev_recon: jnp.ndarray, reach: int = 1) -> jnp.ndarray:
    """(By, Bx, W, W) block neighbourhoods, W = (2*reach+1)*BLOCK: each
    block's surrounding (2*reach+1)^2 block window, edge blocks
    replicated (out-of-frame motion clamps at BLOCK granularity).

    Memory bound: the materialized tensor is (2*reach+1)^2 copies of the
    frame in f32 — ~(2r+1)^2 * H*W * 4 bytes. At 1080p that is ~75 MB for
    reach 1, ~0.4 GB for reach 3, and ~3 GB at the supported max
    me_radius=56 (reach 9); the vmapped B-frame batch multiplies it
    further. Keep reach <= 3 on large frames (the hierarchical ME in
    ``encode_plane`` covers long motion coarse-to-fine precisely so large
    reach is never needed at full resolution)."""
    blocks = _blocks_of(prev_recon)  # (By,Bx,b,b)

    def clamp_shift(x, d, axis):
        # shift so that out[i] = x[clamp(i + d)] along a block axis
        if d == 0:
            return x
        sl = [slice(None)] * x.ndim
        edge = [slice(None)] * x.ndim
        if d > 0:
            sl[axis] = slice(d, None)
            edge[axis] = slice(-1, None)
            pad = [x[tuple(edge)]] * d
            return jnp.concatenate([x[tuple(sl)]] + pad, axis=axis)
        sl[axis] = slice(None, d)
        edge[axis] = slice(0, 1)
        pad = [x[tuple(edge)]] * (-d)
        return jnp.concatenate(pad + [x[tuple(sl)]], axis=axis)

    span = range(-reach, reach + 1)
    rows = []
    for di in span:
        cols = [clamp_shift(clamp_shift(blocks, di, 0), dj, 1) for dj in span]
        rows.append(jnp.concatenate(cols, axis=-1))  # (By,Bx,b,(2r+1)b)
    return jnp.concatenate(rows, axis=-2)  # (By,Bx,W,W)


def _predict_from_nb(nb: jnp.ndarray, mv2: jnp.ndarray, reach: int = 1) -> jnp.ndarray:
    """MC prediction from a prebuilt neighbourhood (shared across the
    refinement candidates so the (2*reach+1)^2-copy NB is built once)."""
    r2 = 2 * reach * BLOCK
    table = jnp.asarray(_mc_selection_table(BLOCK, reach), dtype=jnp.float32)
    my = jnp.clip(mv2[..., 0], -r2, r2) + r2
    mx = jnp.clip(mv2[..., 1], -r2, r2) + r2
    ry = table[my]  # (By,Bx,b,W)
    rx = table[mx]
    y = jnp.einsum("...uw,...wv->...uv", ry, nb, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("...qv,...uv->...uq", rx, y, precision=jax.lax.Precision.HIGHEST)


def _motion_predict(
    prev_recon: jnp.ndarray, mv2: jnp.ndarray, reach: int = 1
) -> jnp.ndarray:
    """Per-block motion-compensated prediction at HALF-PEL resolution.

    prev_recon ``(H, W)``, mv2 ``(By, Bx, 2)`` in half-pel units -> pred
    blocks ``(By, Bx, b, b)``.

    Formulation: each block reads from its (2*reach+1)^2-block
    neighbourhood through two gathered ``(8, W)`` selection matrices
    (``pred = R[mv_y] @ NB @ R[mv_x].T``), the apply_block_matrix pattern —
    batched MXU smalls instead of an XLA 4D gather, which measured ~120
    ms/frame at 1080p (this path: ~100x cheaper). Out-of-frame motion
    clamps at BLOCK granularity (edge blocks replicate). The prediction
    for an in-range mv2 is identical for every reach that represents it,
    so encoder and decoder only need |mv2| <= 2*reach*BLOCK each — no
    drift (encode_plane clamps stored vectors to its own reach).
    """
    return _predict_from_nb(_neighbourhood(prev_recon, reach), mv2, reach)


def _integer_refine(
    prev_recon: jnp.ndarray,
    cur_blocks: jnp.ndarray,
    mv_int: jnp.ndarray,
    reach: int = 1,
    rounds: int = 1,
) -> jnp.ndarray:
    """``rounds`` greedy +-1 full-pel refinement steps around a coarse
    integer vector (the fine stage of the coarse-to-fine search)."""
    nb = _neighbourhood(prev_recon, reach)
    mv = mv_int
    for _ in range(rounds):
        cands, sads = [], []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                cand = mv + jnp.asarray([dy, dx], jnp.int32)
                pred = _predict_from_nb(nb, cand * 2, reach)
                sads.append(jnp.abs(cur_blocks - pred).sum(axis=(-2, -1)))
                cands.append(cand)
        best = jnp.argmin(jnp.stack(sads, axis=-1), axis=-1)
        stacked = jnp.stack(cands, axis=0)
        onehot = (jnp.arange(9)[:, None, None] == best[None]).astype(jnp.int32)[..., None]
        mv = (stacked * onehot).sum(axis=0)
    return mv


def _halfpel_refine(
    prev_recon: jnp.ndarray,
    cur_blocks: jnp.ndarray,
    mv_int: jnp.ndarray,
    reach: int = 1,
) -> jnp.ndarray:
    """Refine integer motion to half-pel: evaluate the 9 half-pel
    candidates around each block's integer vector, keep the SAD minimizer.
    Returns mv in half-pel units ``(By, Bx, 2)`` int32."""
    nb = _neighbourhood(prev_recon, reach)
    base2 = mv_int * 2
    cands = []
    sads = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            mv2 = base2 + jnp.asarray([dy, dx], jnp.int32)
            pred = _predict_from_nb(nb, mv2, reach)
            sads.append(jnp.abs(cur_blocks - pred).sum(axis=(-2, -1)))
            cands.append(mv2)
    best = jnp.argmin(jnp.stack(sads, axis=-1), axis=-1)  # (By,Bx)
    stacked = jnp.stack(cands, axis=0)  # (9,By,Bx,2)
    onehot = (
        jnp.arange(9)[:, None, None] == best[None]
    ).astype(jnp.int32)[..., None]
    return (stacked * onehot).sum(axis=0)


def _me_plan(me_radius: int):
    """Static search plan for a given radius: (coarse_factor,
    refine_rounds, reach). Radii <= 7 use the dense single-level search;
    larger radii search a 2^k-area-downsampled frame (whole-frame shifts
    stay cheap) and recover precision with greedy +-1 refinement."""
    if me_radius <= 7:
        return 1, 0, 1
    factor = 2
    while -(-me_radius // factor) > 5:
        factor *= 2
    rounds = min(3, factor // 2)
    max_mv = factor * (-(-me_radius // factor)) + rounds + 1
    reach = max(1, -(-max_mv // BLOCK))
    return factor, rounds, reach


def _coarse_motion(
    prev_recon: jnp.ndarray, cur_plane: jnp.ndarray, radius: int, factor: int
) -> jnp.ndarray:
    """Full search on a ``factor``-x area-downsampled frame pair; returns
    full-res per-block integer vectors (each coarse block's vector is
    shared by its factor^2 children, scaled back up)."""
    h, w = prev_recon.shape
    ph = (-h) % (BLOCK * factor)
    pw = (-w) % (BLOCK * factor)
    if ph or pw:
        prev_recon = jnp.pad(prev_recon, ((0, ph), (0, pw)), mode="edge")
        cur_plane = jnp.pad(cur_plane, ((0, ph), (0, pw)), mode="edge")
    hp, wp = h + ph, w + pw

    def ds(x):
        return x.reshape(hp // factor, factor, wp // factor, factor).mean(axis=(1, 3))

    rc = -(-radius // factor)
    mv_c = _motion_search(ds(prev_recon), _blocks_of(ds(cur_plane)), rc, 1)
    mv = jnp.repeat(jnp.repeat(mv_c, factor, axis=0), factor, axis=1) * factor
    return mv[: h // BLOCK, : w // BLOCK]


def _search_mv(
    recon_ref: jnp.ndarray,
    blocks: jnp.ndarray,
    me_radius: int,
    me_step: int,
    me_halfpel: bool,
    factor: int,
    rounds: int,
    reach: int,
) -> jnp.ndarray:
    """Full ME pipeline against one reference: (coarse) search + integer
    refinement + optional half-pel, clamped to the reach's representable
    (and the container's int8) half-pel range."""
    if factor == 1:
        # Dense integer search via whole-frame shifts (cheap: ~0.7ms per
        # candidate at 1080p).
        mv_int = _motion_search(recon_ref, blocks, me_radius, me_step)
    else:
        # Coarse full search at 1/factor resolution, then +-1 greedy
        # refinement at full res.
        mv_int = _coarse_motion(recon_ref, _plane_of(blocks), me_radius, factor)
        mv_int = _integer_refine(recon_ref, blocks, mv_int, reach=reach, rounds=rounds)
    if me_halfpel:
        mv = _halfpel_refine(recon_ref, blocks, mv_int, reach=reach)
    else:
        mv = mv_int * 2  # integer motion in half-pel units
    # Stored vectors must stay inside THIS reach's representable range
    # (and the container's int8 half-pel range): the decoder sizes its
    # tables from the stream's max |mv| and predictions agree for every
    # reach that covers it.
    lim = min(2 * reach * BLOCK, 126)
    return jnp.clip(mv, -lim, lim)


def encode_plane(
    plane: jnp.ndarray,
    qp_map: jnp.ndarray,
    gop: int = 0,
    me_radius: int = 4,
    me_step: int = 1,
    me_halfpel: bool = True,
    force_intra: "jnp.ndarray | None" = None,
    multi_ref: bool = False,
    frame_offset: int = 0,
    init_recon: "tuple | None" = None,
    deblock: bool = False,
    intra_pred: bool = True,
):
    """plane ``(N, H, W)`` float32 [0,255]; qp_map ``(N, By, Bx)`` int.

    Returns (levels (N,By,Bx,64) float32 in raster coefficient order,
    modes (N,By,Bx) int8, mv (N,By,Bx,2) int8 in HALF-PEL units,
    recon (N,H,W) float32).

    ``gop``: intra-frame period (0 = only frame 0 is intra).
    ``intra_pred``: spatial intra prediction on full-intra frames
    (_intra_frame_encode — modes {0, 4, 5, 6} appear there). False
    reproduces the raw-DCT keyframes of pre-round-4 streams bit-exactly.
    ``me_radius/me_step``: motion-search grid (0 radius = zero-motion).
    Radii above 7 switch to the hierarchical coarse-to-fine search
    (_me_plan): area-downsampled full search + greedy integer refinement,
    with the prediction neighbourhood widened to match.
    ``multi_ref``: per-block selection between the previous and the
    TWO-BACK reconstruction (mode MODE_INTER_REF2; searched at 2x the
    per-frame radius since the content moved two frames) — H.264-style
    multiple reference frames, RD-chosen. The decoder handles mode 2
    without a header flag (decode_plane carries both references).

    ``frame_offset``/``init_recon``: CHUNKED encoding support — the
    container encodes long clips in bounded-memory segments (one scan
    per segment instead of one clip-sized scan holding every frame's
    coefficients in HBM). ``frame_offset`` is this segment's first
    global frame index (keeps the gop phase and the frame-0 intra
    rule); ``init_recon`` is the ``(prev, prev2)`` reconstruction carry
    from the previous segment. Chunked output is BIT-EXACT vs the
    single-scan encode (tests/test_codec.py).
    """
    if me_radius > 56:
        raise ValueError(
            f"me_radius={me_radius} exceeds the int8 half-pel motion "
            "container range (max supported radius: 56)"
        )
    n, h, w = plane.shape
    factor, rounds, reach = _me_plan(me_radius)
    radius2 = min(2 * me_radius, 56)
    factor2, rounds2, reach2 = _me_plan(radius2)
    qstep = qstep_from_qp(qp_map)  # (N,By,Bx)
    frames_blocks = jax.vmap(_blocks_of)(plane)  # (N,By,Bx,8,8)

    if force_intra is None:
        t_idx = jnp.arange(n) + frame_offset
        force_intra = (t_idx == 0) if gop <= 0 else (t_idx % gop == 0)

    def step(carry, inputs):
        recon_prev, recon_prev2 = carry
        blocks, qs, intra_only = inputs
        if intra_pred:
            # Full-intra frames take the spatially-predicted wavefront;
            # lax.cond on the scalar per-frame flag means P frames pay
            # nothing for it (and intra frames skip motion search).
            def _intra_path():
                lv_sp, md_sp, rec_sp = _intra_frame_encode(blocks, qs)
                # raw (unpredicted) alternative + frame-level arbiter:
                # content where top-row prediction only fragments the
                # DC-DPCM stream (e.g. dense texture) stays raw
                c_raw = block_dct2(blocks)
                lv_raw = _quantize(c_raw, qs)
                rec_raw = jnp.clip(block_idct2(_dequantize(lv_raw, qs)),
                                   0.0, 255.0)
                md_raw = jnp.zeros_like(md_sp)
                use_sp = (
                    _intra_frame_rd(lv_sp, blocks, rec_sp, qs, md_sp)
                    < _intra_frame_rd(lv_raw, blocks, rec_raw, qs, md_raw)
                )
                lv_i = jnp.where(use_sp, lv_sp, lv_raw)
                md_i = jnp.where(use_sp, md_sp, md_raw)
                recon_i = _plane_of(jnp.where(use_sp, rec_sp, rec_raw))
                if deblock:
                    recon_i = deblock_plane(recon_i, qs)
                return (lv_i, md_i,
                        jnp.zeros(blocks.shape[:2] + (2,), jnp.int8), recon_i)

            lv, mode, mv, recon = jax.lax.cond(
                intra_only, _intra_path, lambda: _inter_path(
                    recon_prev, recon_prev2, blocks, qs, intra_only))
        else:
            lv, mode, mv, recon = _inter_path(
                recon_prev, recon_prev2, blocks, qs, intra_only)
        return (recon, recon_prev), (lv, mode, mv, recon)

    def _inter_path(recon_prev, recon_prev2, blocks, qs, intra_only):
        if me_radius > 0:
            mv = _search_mv(
                recon_prev, blocks, me_radius, me_step, me_halfpel,
                factor, rounds, reach,
            )
        else:
            mv = jnp.zeros(blocks.shape[:2] + (2,), jnp.int32)
        pred = _motion_predict(recon_prev, mv, reach=reach)  # (By,Bx,8,8)

        c_intra = block_dct2(blocks)
        c_inter = block_dct2(blocks - pred)
        lv_intra = _quantize(c_intra, qs)
        lv_inter = _quantize(c_inter, qs)

        cost_intra = _rd_cost(lv_intra, c_intra, qs)
        cost_inter = _rd_cost(lv_inter, c_inter, qs)

        if multi_ref:
            if me_radius > 0:
                mv2 = _search_mv(
                    recon_prev2, blocks, radius2, me_step, me_halfpel,
                    factor2, rounds2, reach2,
                )
            else:
                mv2 = jnp.zeros(blocks.shape[:2] + (2,), jnp.int32)
            pred2 = _motion_predict(recon_prev2, mv2, reach=reach2)
            c_inter2 = block_dct2(blocks - pred2)
            lv_inter2 = _quantize(c_inter2, qs)
            cost_inter2 = _rd_cost(lv_inter2, c_inter2, qs)
            costs = jnp.stack([cost_intra, cost_inter, cost_inter2], axis=-1)
            # intra wins ties; forced-intra frames only consider mode 0
            costs = jnp.where(
                intra_only, costs.at[..., 1:].set(jnp.inf), costs
            )
            mode = jnp.argmin(costs, axis=-1).astype(jnp.int8)  # (By,Bx)
            onehot = (jnp.arange(3)[:, None, None] == mode[None]).astype(jnp.float32)
            lv = (
                jnp.stack([lv_intra, lv_inter, lv_inter2]).astype(jnp.float32)
                * onehot[..., None, None]
            ).sum(axis=0)
            pred_sel = (
                jnp.stack([jnp.zeros_like(pred), pred, pred2])
                * onehot[..., None, None]
            ).sum(axis=0)
            mv = jnp.where((mode == MODE_INTER)[..., None], mv,
                           jnp.where((mode == MODE_INTER_REF2)[..., None], mv2, 0))
            rec = jnp.clip(
                block_idct2(lv * qs[..., None, None]) + pred_sel, 0.0, 255.0
            )
            recon = _plane_of(rec)
            if deblock:
                recon = deblock_plane(recon, qs)
            return (lv.astype(jnp.int16), mode, mv.astype(jnp.int8), recon)

        use_inter = jnp.logical_and(cost_inter <= cost_intra, ~intra_only)
        lv = jnp.where(use_inter[..., None, None], lv_inter, lv_intra)
        mv = jnp.where(use_inter[..., None], mv, 0)
        rec_res = block_idct2(_dequantize(lv, qs))
        rec = jnp.where(use_inter[..., None, None], rec_res + pred, rec_res)
        rec = jnp.clip(rec, 0.0, 255.0)
        recon = _plane_of(rec)
        if deblock:
            recon = deblock_plane(recon, qs)
        return (lv, use_inter.astype(jnp.int8), mv.astype(jnp.int8), recon)

    if init_recon is None:
        zero = jnp.zeros((h, w), dtype=jnp.float32)
        init = (zero, zero)
    else:
        init = (jnp.asarray(init_recon[0], jnp.float32),
                jnp.asarray(init_recon[1], jnp.float32))
    _, (levels, modes, mvs, recons) = jax.lax.scan(
        step, init, (frames_blocks, qstep, force_intra)
    )
    by, bx = levels.shape[1], levels.shape[2]
    # float32 return: int16 device->host transfers are pathologically slow
    # on this TPU runtime (~3 orders of magnitude); values are exact in f32.
    return (
        levels.reshape(n, by, bx, BLOCK * BLOCK).astype(jnp.float32),
        modes,
        mvs,
        recons,
    )


def decode_plane(
    levels: jnp.ndarray,
    modes: jnp.ndarray,
    mvs: jnp.ndarray,
    qp_map: jnp.ndarray,
    h: int,
    w: int,
    reach: int = 1,
    multi_ref: bool = False,
    init_recon: "tuple | None" = None,
    deblock: bool = False,
) -> jnp.ndarray:
    """Inverse of encode_plane: levels ``(N,By,Bx,64)``, modes
    ``(N,By,Bx)``, mvs ``(N,By,Bx,2)``, qp_map ``(N,By,Bx)`` ->
    plane ``(N,H,W)`` float32. ``reach`` must cover the stream's max
    |mv| (the container derives it host-side: ceil(max|mv2|/16)).
    ``multi_ref``: honour MODE_INTER_REF2 blocks (prediction from the
    two-back reconstruction); the container sets it iff mode 2 appears on
    P frames, so plain streams pay no extra motion compensation."""
    n, by, bx, _ = levels.shape
    qstep = qstep_from_qp(qp_map)
    lv = levels.reshape(n, by, bx, BLOCK, BLOCK).astype(jnp.float32)

    def step(carry, inputs):
        recon_prev, recon_prev2 = carry
        lvl, mode, mv, qs = inputs

        def _spatial():
            # any mode >= 4 marks a spatially-predicted full-intra frame
            # (encode_plane only emits them there) -> wavefront decode
            return _plane_of(_intra_frame_decode(lvl, mode, qs))

        def _normal():
            pred = _motion_predict(recon_prev, mv.astype(jnp.int32), reach=reach)
            if multi_ref:
                pred2 = _motion_predict(
                    recon_prev2, mv.astype(jnp.int32), reach=reach)
                pred = jnp.where(
                    (mode == MODE_INTER_REF2)[..., None, None], pred2, pred)
                is_inter = (mode == MODE_INTER) | (mode == MODE_INTER_REF2)
            else:
                is_inter = mode == MODE_INTER
            rec_res = block_idct2(lvl * qs[..., None, None])
            rec = jnp.where(is_inter[..., None, None], rec_res + pred, rec_res)
            return _plane_of(jnp.clip(rec, 0.0, 255.0))

        recon = jax.lax.cond(jnp.any(mode >= 4), _spatial, _normal)
        if deblock:
            recon = deblock_plane(recon, qs)
        return (recon, recon_prev), recon

    if init_recon is None:
        zero = jnp.zeros((h, w), dtype=jnp.float32)
        init = (zero, zero)
    else:
        init = (jnp.asarray(init_recon[0], jnp.float32),
                jnp.asarray(init_recon[1], jnp.float32))
    _, recons = jax.lax.scan(step, init, (lv, modes, mvs, qstep))
    return recons


def encode_plane_b(
    plane: jnp.ndarray,
    qp_map: jnp.ndarray,
    gop: int = 0,
    me_radius: int = 4,
    me_step: int = 1,
    me_halfpel: bool = True,
    b_qp_offset: int = 2,
    multi_ref: bool = False,
    deblock: bool = False,
    intra_pred: bool = True,
):
    """B-frame GOP structure, TPU-native: even-index frames form the
    P-reference chain (sequential ``lax.scan``, exactly encode_plane's
    loop) and every odd-index frame is a B frame bi-predicted from its
    two neighbouring references — B frames are never referenced, so they
    all encode in PARALLEL (``vmap``). This halves the sequential depth
    of the encode and gives fast/occluded content a backward reference
    (the reference's external encoders get B frames from x265/kvazaar;
    elvis.py:1226 two-pass x265 defaults include them).

    Per B block the mode is chosen by quantized-coefficient cost among
    intra / forward / backward / bidirectional (MODE_*).

    Returns (levels (N,By,Bx,64) float32, modes (N,By,Bx) int8,
    mvs (N,By,Bx,2,2) int8 half-pel [fwd, bwd] — P frames store their
    vector in the fwd slot with bwd=0 — recon (N,H,W) float32).

    ``me_radius`` is the per-DISPLAY-FRAME motion budget: the reference
    chain steps 2 frames at a time, so it searches 2*me_radius; B frames
    are 1 frame from each reference and search me_radius.
    """
    n, h, w = plane.shape
    ref_radius = min(2 * me_radius, 56) if me_radius > 0 else 0
    factor, rounds, reach = _me_plan(me_radius)
    ne = (n + 1) // 2
    nb = n // 2

    # Intra refresh lives on the reference chain: even frame 2k is intra
    # when a gop boundary was crossed since the previous reference.
    if gop <= 0:
        fi = np.zeros(ne, bool)
        fi[0] = True
    else:
        te = 2 * np.arange(ne)
        fi = np.empty(ne, bool)
        fi[0] = True
        fi[1:] = (te[1:] // gop) != (te[:-1] // gop)
    lv_e, md_e, mv_e, rec_e = encode_plane(
        plane[::2], qp_map[::2], gop=0, me_radius=ref_radius, me_step=me_step,
        me_halfpel=me_halfpel, force_intra=jnp.asarray(fi), multi_ref=multi_ref,
        deblock=deblock, intra_pred=intra_pred,
    )

    by, bx = qp_map.shape[1], qp_map.shape[2]
    if nb:
        k = jnp.arange(nb)
        ref_f = rec_e[k]  # reference before frame 2k+1
        ref_b = rec_e[jnp.minimum(k + 1, ne - 1)]  # reference after (or fwd ref again at the tail)
        blocks_b = jax.vmap(_blocks_of)(plane[1::2])
        # B frames are never referenced: quantize them b_qp_offset coarser
        # (the standard B-frame trade — bits drop, nothing propagates).
        qs_b = qstep_from_qp(jnp.clip(qp_map[1::2] + b_qp_offset, 0, 51))

        def encode_b(rf, rb, blocks, qs):
            if me_radius > 0:
                mvf = _search_mv(rf, blocks, me_radius, me_step, me_halfpel,
                                 factor, rounds, reach)
                mvb = _search_mv(rb, blocks, me_radius, me_step, me_halfpel,
                                 factor, rounds, reach)
            else:
                mvf = jnp.zeros(blocks.shape[:2] + (2,), jnp.int32)
                mvb = jnp.zeros_like(mvf)
            pf = _motion_predict(rf, mvf, reach=reach)
            pb = _motion_predict(rb, mvb, reach=reach)
            pbi = 0.5 * (pf + pb)
            preds = jnp.stack([jnp.zeros_like(pf), pf, pb, pbi])  # (4,By,Bx,b,b)
            lvs = jnp.stack([_quantize(block_dct2(blocks - p), qs) for p in preds])
            if B_MODE_COST == "bits":
                # Honest rate decision (round 3): estimated coefficient
                # bits (the range coder's binarization, as in _rd_cost)
                # PLUS per-active-list motion-vector bits. B frames are
                # never referenced, so at fixed QP the distortion across
                # modes is bounded by quantization — minimizing honest
                # bits is the right objective (full D+lambda*R measured
                # ~10x the QP ladder's bytes-per-dB here in round 2; the
                # L1 proxy under-charged bi/backward's extra vectors).
                mag = jnp.abs(lvs).astype(jnp.float32)
                cbits = jnp.where(
                    mag > 0, 2.0 * jnp.ceil(jnp.log2(mag + 1.0)) + 2.0, 0.05
                ).sum(axis=(-2, -1))  # (4,By,Bx)

                def mvbits(v):
                    a = jnp.abs(v).astype(jnp.float32)
                    return jnp.where(
                        a > 0, 2.0 * jnp.ceil(jnp.log2(a + 1.0)) + 2.0, 0.2
                    ).sum(axis=-1)  # (By,Bx)

                zero = jnp.zeros_like(mvbits(mvf))
                vbits = jnp.stack(
                    [zero, mvbits(mvf), mvbits(mvb), mvbits(mvf) + mvbits(mvb)]
                )
                costs = cbits + B_MODE_MV_SCALE * vbits
            else:
                # round-2 L1-coefficient proxy (kept measurable)
                costs = jnp.abs(lvs).sum(axis=(-2, -1))  # (4,By,Bx)
            mode = jnp.argmin(jnp.moveaxis(costs, 0, -1), axis=-1)  # (By,Bx)
            onehot = (jnp.arange(4)[:, None, None] == mode[None]).astype(jnp.float32)
            lv = (lvs.astype(jnp.float32) * onehot[..., None, None]).sum(axis=0)
            pred = (preds * onehot[..., None, None]).sum(axis=0)
            use_f = (mode == MODE_INTER) | (mode == MODE_INTER_BI)
            use_b = (mode == MODE_INTER_BWD) | (mode == MODE_INTER_BI)
            mvf = jnp.where(use_f[..., None], mvf, 0)
            mvb = jnp.where(use_b[..., None], mvb, 0)
            rec = jnp.clip(block_idct2(lv * qs[..., None, None]) + pred, 0.0, 255.0)
            rec = _plane_of(rec)
            if deblock:
                # B frames are never referenced: display-only filtering,
                # mirrored exactly by decode_plane_b
                rec = deblock_plane(rec, qs)
            return (
                lv,
                mode.astype(jnp.int8),
                jnp.stack([mvf, mvb], axis=-2).astype(jnp.int8),  # (By,Bx,2,2)
                rec,
            )

        lv_b, md_b, mv_b, rec_b = jax.vmap(encode_b)(ref_f, ref_b, blocks_b, qs_b)
    else:
        lv_b = jnp.zeros((0, by, bx, BLOCK, BLOCK), jnp.float32)
        md_b = jnp.zeros((0, by, bx), jnp.int8)
        mv_b = jnp.zeros((0, by, bx, 2, 2), jnp.int8)
        rec_b = jnp.zeros((0, h, w), jnp.float32)

    # Interleave display order: evens then odds back into place.
    levels = jnp.zeros((n, by, bx, BLOCK, BLOCK), jnp.float32)
    levels = levels.at[::2].set(lv_e.reshape(ne, by, bx, BLOCK, BLOCK))
    levels = levels.at[1::2].set(lv_b)
    modes = jnp.zeros((n, by, bx), jnp.int8).at[::2].set(md_e).at[1::2].set(md_b)
    mvs = jnp.zeros((n, by, bx, 2, 2), jnp.int8)
    mvs = mvs.at[::2, :, :, 0, :].set(mv_e).at[1::2].set(mv_b)
    recons = jnp.zeros((n, h, w), jnp.float32).at[::2].set(rec_e).at[1::2].set(rec_b)
    return levels.reshape(n, by, bx, BLOCK * BLOCK), modes, mvs, recons


def decode_plane_b(
    levels: jnp.ndarray,
    modes: jnp.ndarray,
    mvs: jnp.ndarray,
    qp_map: jnp.ndarray,
    h: int,
    w: int,
    reach: int = 1,
    b_qp_offset: int = 2,
    multi_ref: bool = False,
    deblock: bool = False,
) -> jnp.ndarray:
    """Inverse of encode_plane_b: mvs ``(N,By,Bx,2,2)`` [fwd, bwd]
    half-pel. Even frames decode as the sequential reference chain
    (``multi_ref`` iff mode 2 appears there), odd (B) frames decode in
    parallel from their two references."""
    n, by, bx, _ = levels.shape
    ne = (n + 1) // 2
    nb = n // 2
    qp_map = qp_map.at[1::2].set(jnp.clip(qp_map[1::2] + b_qp_offset, 0, 51))
    qstep = qstep_from_qp(qp_map)
    lv = levels.reshape(n, by, bx, BLOCK, BLOCK).astype(jnp.float32)

    rec_e = decode_plane(
        levels[::2], modes[::2], mvs[::2, :, :, 0, :], qp_map[::2], h, w,
        reach=reach, multi_ref=multi_ref, deblock=deblock,
    )

    if nb:
        k = jnp.arange(nb)
        ref_f = rec_e[k]
        ref_b = rec_e[jnp.minimum(k + 1, ne - 1)]

        def decode_b(rf, rb, lvl, mode, mv, qs):
            pf = _motion_predict(rf, mv[..., 0, :].astype(jnp.int32), reach=reach)
            pb = _motion_predict(rb, mv[..., 1, :].astype(jnp.int32), reach=reach)
            pbi = 0.5 * (pf + pb)
            preds = jnp.stack([jnp.zeros_like(pf), pf, pb, pbi])
            onehot = (
                jnp.arange(4)[:, None, None] == mode.astype(jnp.int32)[None]
            ).astype(jnp.float32)
            pred = (preds * onehot[..., None, None]).sum(axis=0)
            rec = jnp.clip(
                block_idct2(lvl * qs[..., None, None]) + pred, 0.0, 255.0
            )
            rec = _plane_of(rec)
            if deblock:
                rec = deblock_plane(rec, qs)
            return rec

        rec_b = jax.vmap(decode_b)(
            ref_f, ref_b, lv[1::2], modes[1::2], mvs[1::2], qstep[1::2]
        )
    else:
        rec_b = jnp.zeros((0, h, w), jnp.float32)

    return (
        jnp.zeros((n, h, w), jnp.float32).at[::2].set(rec_e).at[1::2].set(rec_b)
    )
