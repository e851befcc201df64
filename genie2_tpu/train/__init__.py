from genie2_tpu.train.loss import genie_loss, residue_error_norm
from genie2_tpu.train.prefetch import PrefetchIterator, prefetch
from genie2_tpu.train.state import TrainState, create_train_state, make_train_step
from genie2_tpu.train.data import (
    MotifAugmentConfig,
    StructureDataset,
    apply_motif_augmentation,
    discover_structures,
    resolve_filepath,
    setup_split,
    synthetic_dataset,
)

__all__ = [
    "genie_loss",
    "residue_error_norm",
    "PrefetchIterator",
    "prefetch",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "MotifAugmentConfig",
    "StructureDataset",
    "apply_motif_augmentation",
    "discover_structures",
    "resolve_filepath",
    "setup_split",
    "synthetic_dataset",
]
