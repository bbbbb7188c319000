from radzero_tpu.train.optim import (
    build_optimizer,
    merge_params,
    partition_params,
)
from radzero_tpu.train.step import make_eval_step, make_train_step
