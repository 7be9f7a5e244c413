"""Per-block matrix transforms — the fused formulation of the hot
degradation/restoration ops.

Key observation: every per-block separable op in this domain is a pair of
small matrix multiplies. A within-block 5x5 sigma=1 Gaussian blur with
reflect-101 borders (reference elvis.py:2190) is ``B @ X @ B.T`` with B
the (b, b) convolution matrix; r iterated rounds are ``B^r @ X @ (B^r).T``
because row/column operators commute. A block downsample-then-upsample
(elvis.py:2158-2163) is ``R_l @ X @ R_l.T`` with ``R_l = Up_l @ Down_l``.

So the reference's hottest server loop — per block, a data-dependent
number of tiny cv2 calls (SURVEY.md §3.5) — becomes ONE batched einsum on
the MXU: gather each block's (b, b) matrix from an (L, b, b) table by its
level, then two batched matmuls. HBM traffic is one read + one write of
the frame (the level-stack formulation this replaces cost (L+1)x), and
the FLOPs all land on the systolic array.

Implementations:
  * ``apply_block_matrix`` — pure XLA (gather + batched einsum);
  * ``apply_block_matrix_kron`` — the Kronecker reformulation
    ``vec(T X T^T) = vec(X) @ (T (x) T)^T``: one dense (M, b^2) @
    (b^2, L*b^2) MXU matmul over ALL levels + a per-block slice select
    (contraction b^2=64 instead of b=8);
  * ``apply_block_matrix_pallas`` — Pallas batched-smalls kernel (the
    explicit-layout variant of the einsum path);
  * ``apply_block_matrix_pallas_kron`` — Pallas Kronecker kernel fusing
    the level select into the matmul epilogue so the (tile, L*b^2)
    intermediate never leaves VMEM. Fastest measured: 1.32 ms vs 2.91 ms
    (einsum) per 1080p frame on TPU v5e.
  * ``apply_block_matrix_fast`` — backend dispatch (pallas_kron on TPU,
    einsum elsewhere) with a linear-op custom VJP; what the
    degradation/restore call sites use.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from elvis_tpu.ops.filter import _reflect101_indices, gaussian_kernel_1d
from elvis_tpu.ops.resize import resize_matrix

__all__ = [
    "conv_matrix_reflect101",
    "blur_matrix_table",
    "resample_matrix_table",
    "apply_block_matrix",
    "apply_block_matrix_fast",
    "apply_block_matrix_kron",
    "apply_block_matrix_pallas",
    "apply_block_matrix_pallas_kron",
]

_PRECISION = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=64)
def conv_matrix_reflect101(b: int, ksize: int = 5, sigma: float = 1.0) -> np.ndarray:
    """(b, b) matrix equivalent of a 1-D ksize/sigma Gaussian correlation
    with OpenCV reflect-101 borders on a length-b signal."""
    kern = gaussian_kernel_1d(ksize, sigma)
    pad = (ksize - 1) // 2
    idx = _reflect101_indices(b, pad)  # length b + 2*pad
    mat = np.zeros((b, b), dtype=np.float64)
    for out_i in range(b):
        for t in range(ksize):
            mat[out_i, idx[out_i + t]] += kern[t]
    return mat


@functools.lru_cache(maxsize=32)
def blur_matrix_table(b: int, max_rounds: int, ksize: int = 5, sigma: float = 1.0) -> np.ndarray:
    """(max_rounds+1, b, b): entry r = B^r (r iterated within-block blurs)."""
    base = conv_matrix_reflect101(b, ksize, sigma)
    out = [np.eye(b)]
    cur = np.eye(b)
    for _ in range(max_rounds):
        cur = base @ cur
        out.append(cur)
    return np.stack(out, axis=0)


@functools.lru_cache(maxsize=32)
def resample_matrix_table(
    b: int, up_method: str = "linear", max_level: int | None = None
) -> np.ndarray:
    """(L+1, b, b): entry l = Up_l @ Down_l — area downsample to b/2^l
    then ``up_method`` upsample back (level 0 = identity).

    up_method 'linear' reproduces the degradation (elvis.py:2161-2163);
    'lanczos4' reproduces the classical restore (elvis.py:2812-2814).
    """
    if max_level is None:
        max_level = int(math.log2(b))
    out = [np.eye(b)]
    for lvl in range(1, max_level + 1):
        small = max(1, b // (2**lvl))
        down = resize_matrix(small, b, "area")
        up = resize_matrix(b, small, up_method)
        out.append(up @ down)
    return np.stack(out, axis=0)


def apply_block_matrix(
    blocks: jnp.ndarray, table: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """blocks ``(..., b, b, C)`` float, table ``(L, b, b)``, idx ``(...,)``
    int -> ``T[idx] @ X @ T[idx].T`` per block."""
    t = jnp.asarray(table, dtype=jnp.float32)[idx]  # (..., b, b)
    x = blocks.astype(jnp.float32)
    y = jnp.einsum("...ij,...jkc->...ikc", t, x, precision=_PRECISION)
    return jnp.einsum("...lk,...ikc->...ilc", t, y, precision=_PRECISION)


def apply_block_matrix_pallas(
    blocks: jnp.ndarray, table: jnp.ndarray, idx: jnp.ndarray, *, tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas variant: flat blocks ``(M, b, b, C)`` tiled through VMEM with
    the whole matrix table resident; one grid step transforms ``tile``
    blocks (channels folded into the block axis — Mosaic supports neither
    vector gathers nor 3D<->2D vector reshapes, which shapes the design:
    unrolled mask-select over the small table + reshape-free batched
    dot_generals).

    Measured on TPU v5e: within 0.04% of the XLA path in value (different
    accumulation order) at comparable speed (3.6 vs 2.9 ms per 1080p
    frame) — the b=8 contraction keeps the MXU near-idle in both. Kept as
    the explicit-layout baseline; the production kernel is
    :func:`apply_block_matrix_pallas_kron` (1.32 ms), which fixes the
    contraction shape instead of the layout.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, b, _, c = blocks.shape
    ell = table.shape[0]
    # Channels fold into the block axis so the kernel sees plain (b, b)
    # matrices (packed (k, c) lanes would make the column transform a
    # strided-lane op Mosaic can't express cleanly).
    mc = m * c
    x = blocks.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(mc, b, b)
    ix = jnp.repeat(idx.astype(jnp.int32), c).reshape(mc, 1)
    pad = (-mc) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, b, b), jnp.float32)], axis=0)
        ix = jnp.concatenate([ix, jnp.zeros((pad, 1), jnp.int32)], axis=0)
    mp = mc + pad

    tbl = jnp.asarray(table, dtype=jnp.float32)

    def kernel(idx_ref, x_ref, tbl_ref, out_ref):
        # Mosaic constraints shape this kernel: no vector gathers and no
        # 3D<->2D vector reshapes. The per-block matrix is selected with a
        # one-hot contraction over the table's L axis (rank-3 rhs is fine),
        # and both transform stages are reshape-free batched dot_generals.
        ids = idx_ref[:, 0]  # (tile,) int32 from VMEM
        # Statically unrolled table select (L is tiny): pure VPU masks,
        # no gathers, no reshapes.
        sel = jnp.zeros((tile, b, b), jnp.float32)
        for level in range(ell):
            mask = (ids == level).astype(jnp.float32)[:, None, None]
            sel = sel + mask * tbl_ref[level][None, :, :]
        x = x_ref[:]  # (tile, b, b) — channels folded into the tile axis
        # y = T X      : y[m,i,k] = sum_j T[m,i,j] X[m,j,k]
        y = jax.lax.dot_general(
            sel, x,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # z = y T^T    : z[m,i,l] = sum_k y[m,i,k] T[m,l,k]
        z = jax.lax.dot_general(
            y, sel,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[:] = z

    out = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ell, b, b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, b, b), jnp.float32),
        interpret=interpret,
    )(ix, x, tbl)
    return out[:mc].reshape(m, c, b, b).transpose(0, 2, 3, 1)


def _kron_of(table: np.ndarray) -> np.ndarray:
    """(L, b, b) -> (b*b, L*b*b): column-stacked T_l (x) T_l, so that
    ``vec(T X T^T) = vec(X) @ (T (x) T)^T`` lands level l's result in
    columns [l*b*b, (l+1)*b*b)."""
    ell, b, _ = table.shape
    ks = [np.kron(table[l], table[l]).T for l in range(ell)]  # (b2, b2) each
    return np.concatenate(ks, axis=1).astype(np.float32)  # (b2, L*b2)


def apply_block_matrix_kron(
    blocks: jnp.ndarray, table: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """MXU-shaped reformulation of :func:`apply_block_matrix`.

    The per-block two-sided transform ``T[idx] @ X @ T[idx].T`` is
    ``vec(X) @ (T_l (x) T_l)^T`` — so ALL levels evaluate as ONE dense
    ``(M, b^2) @ (b^2, L*b^2)`` matmul (contraction b^2 = 64 vs the
    batched formulation's b = 8; the MXU runs it at full tiling instead
    of ~1% occupancy), then each block keeps its own level's b^2 slice.
    Costs L x the FLOPs of the minimal op and an (M, L*b^2) intermediate
    in HBM — the Pallas variant fuses the selection into the matmul
    epilogue and writes only (M, b^2).
    """
    b = blocks.shape[-3]
    c = blocks.shape[-1]
    lead = blocks.shape[:-3]
    ell = table.shape[0]
    k = jnp.asarray(_kron_of(np.asarray(table, np.float64)))  # (b2, L*b2)
    # (..., b, b, C) -> (M*C, b*b): channels fold into rows; vec(X) is
    # row-major (i*b+j), matching np.kron's (i,j) block layout.
    x = blocks.astype(jnp.float32)
    m = int(np.prod(lead)) if lead else 1
    xv = x.transpose(*range(len(lead)), len(lead) + 2, len(lead), len(lead) + 1
                     ).reshape(m * c, b * b)
    y = jnp.dot(xv, k, precision=_PRECISION)  # (M*C, L*b2)
    y = y.reshape(m, c, ell, b * b)
    idxm = idx.reshape(m).astype(jnp.int32)
    sel = y[jnp.arange(m)[:, None], jnp.arange(c)[None, :], idxm[:, None], :]
    out = sel.reshape(*lead, c, b, b)
    perm = (*range(len(lead)), len(lead) + 1, len(lead) + 2, len(lead))
    return out.transpose(*perm)


def apply_block_matrix_pallas_kron(
    blocks: jnp.ndarray, table: jnp.ndarray, idx: jnp.ndarray, *, tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas-fused Kronecker path: per grid step, one ``(tile, b^2) @
    (b^2, L*b^2)`` MXU matmul in VMEM followed by an unrolled mask-select
    epilogue over the L column groups — the (tile, L*b^2) intermediate
    never leaves VMEM, so HBM traffic is exactly one read + one write of
    the blocks (the thing XLA cannot fuse through take_along_axis)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, b, _, c = blocks.shape
    ell = table.shape[0]
    b2 = b * b
    kmat = jnp.asarray(_kron_of(np.asarray(table, np.float64)))  # (b2, L*b2)

    mc = m * c
    xv = blocks.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(mc, b2)
    ix = jnp.repeat(idx.astype(jnp.int32), c).reshape(mc, 1)
    pad = (-mc) % tile
    if pad:
        xv = jnp.concatenate([xv, jnp.zeros((pad, b2), jnp.float32)], axis=0)
        ix = jnp.concatenate([ix, jnp.zeros((pad, 1), jnp.int32)], axis=0)
    mp = mc + pad

    def kernel(idx_ref, x_ref, k_ref, out_ref):
        y = jax.lax.dot_general(
            x_ref[:], k_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tile, L*b2) in VMEM
        ids = idx_ref[:, 0]
        acc = jnp.zeros((tile, b2), jnp.float32)
        for level in range(ell):
            mask = (ids == level).astype(jnp.float32)[:, None]
            acc = acc + mask * y[:, level * b2 : (level + 1) * b2]
        out_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, b2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b2, ell * b2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, b2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, b2), jnp.float32),
        interpret=interpret,
    )(ix, xv, kmat)
    return out[:mc].reshape(m, c, b, b).transpose(0, 2, 3, 1)


def apply_block_matrix_fast(
    blocks: jnp.ndarray, table, idx: jnp.ndarray, *, tile: int = 1024
) -> jnp.ndarray:
    """Backend-dispatched :func:`apply_block_matrix`: the fused Pallas
    Kronecker kernel on TPU (measured 2.2x the einsum path at 1080p —
    1.32 vs 2.91 ms/frame), the einsum formulation elsewhere.

    ``table`` must be a host-side (L, b, b) array (it is baked into the
    kernel as a constant). Differentiable in ``blocks``: the op is
    linear, so the VJP is the same transform with T^T, expressed through
    the einsum path.
    """
    table_np = np.asarray(table, np.float64)
    if jax.default_backend() != "tpu":
        return apply_block_matrix(blocks, jnp.asarray(table_np, jnp.float32), idx)

    @jax.custom_vjp
    def f(x, i):
        lead = x.shape[:-3]
        b, c = x.shape[-3], x.shape[-1]
        m = int(np.prod(lead)) if lead else 1
        out = apply_block_matrix_pallas_kron(
            x.reshape(m, b, b, c), table_np, i.reshape(m), tile=tile
        )
        return out.reshape(x.shape)

    def fwd(x, i):
        return f(x, i), i

    def bwd(i, g):
        t_t = jnp.asarray(np.swapaxes(table_np, -1, -2), jnp.float32)
        gx = apply_block_matrix(g, t_t, i)
        return gx, np.zeros(i.shape, dtype=jax.dtypes.float0)

    f.defvjp(fwd, bwd)
    return f(blocks, idx)
