"""Training loop, optimizer construction, checkpointing."""

from .trainer import (  # noqa: F401
    TrainState,
    adc_step,
    batch_loss_fn,
    init_train_state,
    load_checkpoint,
    make_optimizer,
    make_train_step,
    opacity_raise_step,
    position_lr,
    restore_pool,
    save_checkpoint,
)
from .fit import FitReport, fit  # noqa: F401
