from elvis_tpu.restore.dampen import restore_dct_dampen_inverse
from elvis_tpu.restore.inpaint import (
    restore_removal_diffusion,
    restore_removal_temporal,
)
from elvis_tpu.restore.lanczos import restore_downsample_lanczos
from elvis_tpu.restore.level_seq import (
    level_sequential_restore,
    naive_diffusion_restore,
    naive_sr_restore,
)
from elvis_tpu.restore.progressive import progressive_restore
from elvis_tpu.restore.registry import get_restorer, register_restorer, safe_restore
from elvis_tpu.restore.temporal import temporal_blend
from elvis_tpu.restore.unsharp import restore_blur_unsharp

__all__ = [
    "get_restorer",
    "progressive_restore",
    "register_restorer",
    "level_sequential_restore",
    "naive_diffusion_restore",
    "naive_sr_restore",
    "restore_blur_unsharp",
    "restore_dct_dampen_inverse",
    "restore_downsample_lanczos",
    "restore_removal_diffusion",
    "restore_removal_temporal",
    "safe_restore",
    "temporal_blend",
]
