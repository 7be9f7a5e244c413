from elvis_tpu.kernels.block_transform import (
    apply_block_matrix,
    apply_block_matrix_fast,
    apply_block_matrix_kron,
    apply_block_matrix_pallas,
    apply_block_matrix_pallas_kron,
    blur_matrix_table,
    conv_matrix_reflect101,
    resample_matrix_table,
)

__all__ = [
    "apply_block_matrix",
    "apply_block_matrix_fast",
    "apply_block_matrix_kron",
    "apply_block_matrix_pallas",
    "apply_block_matrix_pallas_kron",
    "blur_matrix_table",
    "conv_matrix_reflect101",
    "resample_matrix_table",
]
