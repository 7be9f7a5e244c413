from elvis_tpu.metrics.pixel import (
    masked_mse,
    masked_psnr,
    masked_ssim,
    mask_union_bbox,
    ssim,
)
from elvis_tpu.metrics.block_ssim import block_ssim_map, fg_bg_ssim

__all__ = [
    "block_ssim_map",
    "fg_bg_ssim",
    "mask_union_bbox",
    "masked_mse",
    "masked_psnr",
    "masked_ssim",
    "ssim",
]
