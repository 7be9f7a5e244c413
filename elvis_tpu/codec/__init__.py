"""Codec boundary: hermetic NVC codec + gated external encoder wrappers.

QUALITY_PRESETS parity: reference utils.py:54-60 / presley.py:47-53 —
named tiers mapping to per-encoder parameters; extended with an 'nvc_qp'
column for the built-in codec (chosen so each tier's bitrate class is
comparable).
"""

from elvis_tpu.codec.nvc.codec import NvcCodec, decode as nvc_decode, encode as nvc_encode
from elvis_tpu.codec.roi import (
    qp_offsets_from_scores,
    select_ctu_size,
    write_kvazaar_roi,
    write_svtav1_roi,
    write_x265_qpfile,
)
from elvis_tpu.codec.sidecar import (
    decode_strength_maps,
    encode_strength_maps,
    load_removal_masks_npz,
    load_strength_maps_npz,
    save_removal_masks_npz,
    save_strength_maps_npz,
)
from elvis_tpu.codec.y4m import read_y4m, write_y4m

QUALITY_PRESETS = {
    "lossless": {"kvazaar_qp": 2, "svtav1_crf": 1, "qp_range": 0, "nvc_qp": 4},
    "high": {"kvazaar_qp": 30, "svtav1_crf": 30, "qp_range": 10, "nvc_qp": 24},
    "medium": {"kvazaar_qp": 35, "svtav1_crf": 40, "qp_range": 12, "nvc_qp": 32},
    "low": {"kvazaar_qp": 38, "svtav1_crf": 50, "qp_range": 14, "nvc_qp": 38},
    "lowest": {"kvazaar_qp": 42, "svtav1_crf": 60, "qp_range": 15, "nvc_qp": 44},
}


def calculate_target_bitrate(
    width: int, height: int, framerate: float, quality_factor: float = 1.2
) -> int:
    """Reference bitrate model (elvis.py:857-862): W*H*fps*0.01*qf bps."""
    return int(width * height * framerate * 0.01 * quality_factor)


__all__ = [
    "NvcCodec",
    "QUALITY_PRESETS",
    "calculate_target_bitrate",
    "decode_strength_maps",
    "encode_strength_maps",
    "load_removal_masks_npz",
    "load_strength_maps_npz",
    "nvc_decode",
    "nvc_encode",
    "qp_offsets_from_scores",
    "read_y4m",
    "save_removal_masks_npz",
    "save_strength_maps_npz",
    "select_ctu_size",
    "write_kvazaar_roi",
    "write_svtav1_roi",
    "write_x265_qpfile",
]
