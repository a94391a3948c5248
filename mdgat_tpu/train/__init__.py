from mdgat_tpu.train.loop import (
    TrainState, create_train_state, make_train_step, make_eval_step,
)
