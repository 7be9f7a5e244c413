from elvis_tpu.ops.color import rgb_to_gray, rgb_to_ycbcr, ycbcr_to_rgb
from elvis_tpu.ops.dct import block_dct2, block_idct2, dct_matrix
from elvis_tpu.ops.filter import gaussian_blur, gaussian_kernel_1d, unsharp_mask
from elvis_tpu.ops.resize import resize

__all__ = [
    "block_dct2",
    "block_idct2",
    "dct_matrix",
    "gaussian_blur",
    "gaussian_kernel_1d",
    "resize",
    "rgb_to_gray",
    "rgb_to_ycbcr",
    "unsharp_mask",
    "ycbcr_to_rgb",
]
