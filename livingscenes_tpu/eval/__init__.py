from .metrics import (
    compute_chamfer_distance,
    compute_volumetric_iou,
    volumetric_iou_sampled,
    compute_sdf_recall,
    distance_p2p,
    f_score,
    chamfer_distance_under_transforms,
)

__all__ = [
    "compute_chamfer_distance",
    "compute_volumetric_iou",
    "volumetric_iou_sampled",
    "compute_sdf_recall",
    "distance_p2p",
    "f_score",
    "chamfer_distance_under_transforms",
]
