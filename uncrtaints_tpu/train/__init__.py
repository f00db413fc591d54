from uncrtaints_tpu.train.engine import (
    TrainState, create_train_state, make_train_step, make_eval_step,
    set_learning_rate, epoch_lr, dropout_rng,
)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "set_learning_rate", "epoch_lr", "dropout_rng"]
