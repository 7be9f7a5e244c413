"""Block-transform kernels: matrix-vs-direct-convolution oracles and the
Pallas variant (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from elvis_tpu.kernels import (
    apply_block_matrix,
    apply_block_matrix_pallas,
    blur_matrix_table,
    conv_matrix_reflect101,
    resample_matrix_table,
)
from elvis_tpu.ops.filter import gaussian_blur


class TestMatrices:
    def test_conv_matrix_equals_direct_blur(self, rng):
        """B @ x must equal the 1-D reflect-101 Gaussian of x."""
        b = 8
        m = conv_matrix_reflect101(b, 5, 1.0)
        x = rng.random((b,)).astype(np.float64)
        # direct blur via the (tested) separable filter on one axis
        img = jnp.asarray(np.tile(x, (4, 1)))[None, ..., None]  # (1,4,8,1)
        direct = np.asarray(gaussian_blur(img, 5, 1.0, h_axis=-3, w_axis=-2))
        # h blur over 4 constant rows = identity-ish on rows; compare col blur:
        np.testing.assert_allclose(direct[0, 1, :, 0], m @ x, atol=1e-5)

    def test_blur_table_iterates(self):
        b = 8
        t = blur_matrix_table(b, 3)
        np.testing.assert_allclose(t[0], np.eye(b))
        np.testing.assert_allclose(t[2], t[1] @ t[1], atol=1e-12)
        np.testing.assert_allclose(t[3], t[1] @ t[1] @ t[1], atol=1e-12)

    def test_resample_table_levels(self):
        t = resample_matrix_table(8, "linear")
        assert t.shape == (4, 8, 8)
        np.testing.assert_allclose(t[0], np.eye(8))
        # level 3 = down to 1x1 then up: every row equals the mean weights
        np.testing.assert_allclose(t[3], np.full((8, 8), 1 / 8), atol=1e-12)


class TestApplyBlockMatrix:
    def _data(self, rng, m=20, b=8, c=3, ell=4):
        blocks = jnp.asarray(rng.random((m, b, b, c)).astype(np.float32) * 255)
        table = jnp.asarray(blur_matrix_table(b, ell - 1), dtype=jnp.float32)
        idx = jnp.asarray(rng.integers(0, ell, (m,)).astype(np.int32))
        return blocks, table, idx

    def test_matches_explicit_matmul(self, rng):
        blocks, table, idx = self._data(rng)
        got = np.asarray(apply_block_matrix(blocks, table, idx))
        for i in [0, 7, 19]:
            t = np.asarray(table)[int(idx[i])]
            want = np.einsum("ij,jkc->ikc", t, np.asarray(blocks)[i])
            want = np.einsum("lk,ikc->ilc", t, want)
            np.testing.assert_allclose(got[i], want, atol=1e-3)

    def test_pallas_matches_xla(self, rng):
        blocks, table, idx = self._data(rng, m=70)
        want = np.asarray(apply_block_matrix(blocks, table, idx))
        got = np.asarray(
            apply_block_matrix_pallas(blocks, table, idx, tile=32, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_kron_matches_xla(self, rng):
        from elvis_tpu.kernels import apply_block_matrix_kron

        blocks, table, idx = self._data(rng, m=70)
        want = np.asarray(apply_block_matrix(blocks, table, idx))
        got = np.asarray(apply_block_matrix_kron(blocks, table, idx))
        np.testing.assert_allclose(got, want, atol=1e-3)
        # multi-dim lead (N, By, Bx) layout
        b4 = blocks.reshape(5, 2, 7, 8, 8, 3)
        i4 = idx.reshape(5, 2, 7)
        got4 = np.asarray(apply_block_matrix_kron(b4, table, i4))
        np.testing.assert_allclose(got4.reshape(want.shape), want, atol=1e-3)

    def test_pallas_kron_matches_xla(self, rng):
        from elvis_tpu.kernels import apply_block_matrix_pallas_kron

        blocks, table, idx = self._data(rng, m=70)
        want = np.asarray(apply_block_matrix(blocks, table, idx))
        got = np.asarray(
            apply_block_matrix_pallas_kron(blocks, table, idx, tile=32, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_fast_dispatch_and_grad(self, rng):
        """apply_block_matrix_fast must match the einsum path on this
        backend and expose the linear-op VJP (d/dblocks = T^T . T)."""
        from elvis_tpu.kernels import apply_block_matrix_fast

        blocks, table, idx = self._data(rng, m=24)
        table_np = np.asarray(table)
        want = np.asarray(apply_block_matrix(blocks, table, idx))
        got = np.asarray(apply_block_matrix_fast(blocks, table_np, idx))
        np.testing.assert_allclose(got, want, atol=1e-3)

        def loss(x):
            return jnp.sum(apply_block_matrix_fast(x, table_np, idx) ** 2)

        g = jax.grad(loss)(blocks)
        # linear op: grad = 2 * T^T (T X T^T) T
        tt = np.swapaxes(table_np, -1, -2)
        want_g = 2.0 * np.asarray(
            apply_block_matrix(jnp.asarray(want), jnp.asarray(tt), idx)
        )
        np.testing.assert_allclose(np.asarray(g), want_g, rtol=1e-3, atol=1e-2)

    def test_identity_level_passthrough(self, rng):
        blocks, table, _ = self._data(rng)
        idx = jnp.zeros((blocks.shape[0],), jnp.int32)
        out = np.asarray(apply_block_matrix(blocks, table, idx))
        np.testing.assert_allclose(out, np.asarray(blocks), atol=1e-4)
