from dense2sparse_vit_tpu.nn.layers import (  # noqa: F401
    Mlp,
    Attention,
    Block,
    PatchEmbed,
    DropPath,
)
from dense2sparse_vit_tpu.nn.predictor import PredictorLG  # noqa: F401
