from .config import (
    apply_overrides,
    cfg_with_default,
    load_config,
    load_run_config,
    prepare_log_dir,
    update_recursive,
)
from .data import (
    AugmentConfig,
    ShapeNetSDFDataset,
    SyntheticShapeDataset,
    augment_scene_sim,
    augment_sim3,
    batch_iterator,
)
from .logger import TrainLogger, configure_logging
from .trainer import Trainer, TrainerConfig, TrainState, make_lr_schedule

__all__ = [
    "apply_overrides",
    "cfg_with_default",
    "load_config",
    "load_run_config",
    "prepare_log_dir",
    "update_recursive",
    "AugmentConfig",
    "ShapeNetSDFDataset",
    "SyntheticShapeDataset",
    "augment_scene_sim",
    "augment_sim3",
    "batch_iterator",
    "TrainLogger",
    "configure_logging",
    "Trainer",
    "TrainerConfig",
    "TrainState",
    "make_lr_schedule",
]
