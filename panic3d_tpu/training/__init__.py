from .loss import LossConfig, OrthoCondLoss, mask_view_orthofront
from .loop import (
    GANTrainState,
    TrainConfig,
    build_train_step,
    init_state,
    make_optimizers,
    phases_for_step,
)
from .stats import Collector, JsonlLogger
