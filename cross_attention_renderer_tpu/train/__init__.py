"""L4 training runtime."""

from cross_attention_renderer_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    create_train_state,
    fit,
    make_loss_fn,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    shard_state,
)

__all__ = ['TrainConfig', 'TrainState', 'create_train_state', 'fit',
           'make_loss_fn', 'make_optimizer', 'make_train_step',
           'restore_checkpoint', 'save_checkpoint', 'shard_state']
