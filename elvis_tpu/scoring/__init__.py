from elvis_tpu.scoring.complexity import spatial_temporal_complexity
from elvis_tpu.scoring.fusion import importance_scores, removability_scores
from elvis_tpu.scoring.saliency import (
    center_prior_saliency,
    get_saliency_fn,
    motion_contrast_saliency,
    register_saliency,
)

__all__ = [
    "center_prior_saliency",
    "get_saliency_fn",
    "importance_scores",
    "motion_contrast_saliency",
    "register_saliency",
    "removability_scores",
    "spatial_temporal_complexity",
]
