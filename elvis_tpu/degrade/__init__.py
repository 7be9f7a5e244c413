from elvis_tpu.degrade.adaptive import (
    adaptive_blur,
    adaptive_downsample,
    blur_levels_from_scores,
    downsample_levels_from_scores,
)
from elvis_tpu.degrade.dct_dampen import dct_dampen
from elvis_tpu.degrade.removal import apply_selective_removal, stretch_frames

__all__ = [
    "adaptive_blur",
    "adaptive_downsample",
    "apply_selective_removal",
    "blur_levels_from_scores",
    "dct_dampen",
    "downsample_levels_from_scores",
    "stretch_frames",
]
