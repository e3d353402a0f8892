from dense2sparse_vit_tpu.data.mixup import Mixup, mixup_cutmix_batch  # noqa: F401
from dense2sparse_vit_tpu.data.pipeline import (  # noqa: F401
    ImageFolder,
    eval_transform,
    train_transform,
    make_loader,
)
from dense2sparse_vit_tpu.data.split import (  # noqa: F401
    split_train_val_indices,
    split_imagenet_validation_set,
)
