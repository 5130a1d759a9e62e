from .shape_prior import (
    ShapePrior,
    ShapePriorConfig,
    slice_codes,
    concat_codes,
    transform_codes,
)
from .sim3recon import SIM3Recon, TrainLossConfig

__all__ = [
    "ShapePrior",
    "ShapePriorConfig",
    "slice_codes",
    "concat_codes",
    "transform_codes",
    "SIM3Recon",
    "TrainLossConfig",
]
