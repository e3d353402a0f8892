from dense2sparse_vit_tpu.train.schedule import (  # noqa: F401
    cosine_lr,
    sigma_schedule,
    current_keep_ratio,
    current_patch_score_threshold,
)
from dense2sparse_vit_tpu.train.optimizer import (  # noqa: F401
    label_params,
    build_optimizer,
    make_optimizer,
)
from dense2sparse_vit_tpu.train.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
