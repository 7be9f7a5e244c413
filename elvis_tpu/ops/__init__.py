from elvis_tpu.ops.color import rgb_to_gray, rgb_to_ycbcr, ycbcr_to_rgb
from elvis_tpu.ops.dct import block_dct2, block_idct2, dct_matrix
from elvis_tpu.ops.filter import gaussian_blur, gaussian_kernel_1d, sobel_energy, unsharp_mask
from elvis_tpu.ops.motion import block_motion
from elvis_tpu.ops.resize import resize

__all__ = [
    "block_dct2",
    "block_motion",
    "block_idct2",
    "dct_matrix",
    "gaussian_blur",
    "gaussian_kernel_1d",
    "resize",
    "rgb_to_gray",
    "rgb_to_ycbcr",
    "sobel_energy",
    "unsharp_mask",
    "ycbcr_to_rgb",
]
