from dense2sparse_vit_tpu.utils.convert import (  # noqa: F401
    convert_deit_state_dict,
    resize_pos_embed,
)
from dense2sparse_vit_tpu.utils.checkpoint import (  # noqa: F401
    CheckpointManager,
)
