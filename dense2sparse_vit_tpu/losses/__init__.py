from dense2sparse_vit_tpu.losses.mask_loss import (  # noqa: F401
    aggregate_teacher_cls_attn,
    mask_loss,
)
from dense2sparse_vit_tpu.losses.backbone_loss import backbone_loss  # noqa: F401
from dense2sparse_vit_tpu.losses.distill import (  # noqa: F401
    dynamic_vit_distill_loss,
    kd_loss,
    keep_ratio_loss,
    predictor_bce_vs_teacher,
)
