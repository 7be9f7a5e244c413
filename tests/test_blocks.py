"""Block algebra: split/combine round-trip and map up/down-sampling.

Oracle: the reshape/swapaxes semantics of the reference's
``split_image_into_blocks``/``combine_blocks_into_image``
(reference elvis.py:1369-1385, 1429-1434), reimplemented in NumPy here.
"""

import numpy as np
import jax.numpy as jnp

from elvis_tpu.core import blocks as B


def _oracle_split(image: np.ndarray, b: int) -> np.ndarray:
    h, w, c = image.shape
    x = image.reshape(h // b, b, w // b, b, c)
    return x.swapaxes(1, 2)


def test_split_matches_oracle(tiny_video):
    img = tiny_video[0]
    got = np.asarray(B.split_into_blocks(jnp.asarray(img), 8))
    want = _oracle_split(img, 8)
    np.testing.assert_array_equal(got, want)


def test_split_combine_roundtrip(tiny_video):
    x = jnp.asarray(tiny_video)  # batched (N,H,W,C)
    for b in (4, 8, 16):
        blk = B.split_into_blocks(x, b)
        assert blk.shape == (5, 48 // b, 64 // b, b, b, 3)
        back = B.combine_blocks(blk)
        np.testing.assert_array_equal(np.asarray(back), tiny_video)


def test_upsample_then_downsample_mask():
    m = jnp.asarray(np.random.default_rng(1).random((3, 6, 8)) > 0.5)
    up = B.upsample_map(m.astype(jnp.float32), 8)
    assert up.shape == (3, 48, 64)
    down = B.downsample_mask(up, 8)
    np.testing.assert_array_equal(np.asarray(down), np.asarray(m))


def test_blockwise_reduce_mean(tiny_video):
    x = jnp.asarray(tiny_video).astype(jnp.float32)
    got = np.asarray(B.blockwise_reduce(x, 8, jnp.mean, with_channels=True))
    want = _oracle_split(tiny_video[0].astype(np.float32), 8).mean(axis=(2, 3, 4))
    np.testing.assert_allclose(got[0], want, rtol=1e-5)
    # grayscale path
    g = x.mean(axis=-1)
    got2 = np.asarray(B.blockwise_reduce(g, 8, jnp.max))
    assert got2.shape == (5, 6, 8)
