from multimodal_auv_tpu.engine.mc import mc_logits, refresh_batch_stats  # noqa: F401
from multimodal_auv_tpu.engine.optim import (  # noqa: F401
    BayesTrainState,
    StepLR,
    define_optimizers_and_schedulers,
    kl_annealing_weight,
    make_optimizer,
)
from multimodal_auv_tpu.engine.steps import make_eval_step, make_train_step  # noqa: F401
