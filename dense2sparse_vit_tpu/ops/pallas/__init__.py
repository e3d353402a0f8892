from dense2sparse_vit_tpu.ops.pallas.attention import (  # noqa: F401
    fused_attention,
    fused_attention_block,
    fused_attention_block_trainable,
    fused_attention_packed,
    fused_attention_packed_trainable,
)
from dense2sparse_vit_tpu.ops.pallas.gather import (  # noqa: F401
    fused_gather_tokens,
)
from dense2sparse_vit_tpu.ops.pallas.mlp import (  # noqa: F401
    fused_mlp_residual,
)
from dense2sparse_vit_tpu.ops.pallas.predictor import (  # noqa: F401
    fused_predictor_lg,
)
