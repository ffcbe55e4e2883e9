from ultra_tpu.train.loop import (
    TrainState,
    init_train_state,
    init_ultra_params,
    make_optimizer,
    make_train_step,
    self_adversarial_bce,
)
from ultra_tpu.train.eval import evaluate, compute_metrics, score_and_rank_batch
