from dense2sparse_vit_tpu.nn.layers import (  # noqa: F401
    Mlp,
    Attention,
    Block,
    PatchEmbed,
    HybridEmbed,
    DropPath,
)
from dense2sparse_vit_tpu.nn.predictor import (  # noqa: F401
    PredictorAggregator,
    PredictorLG,
    PredictorReconstructor,
)
from dense2sparse_vit_tpu.nn.t2t import (  # noqa: F401
    T2TModule,
    TokenPerformer,
    TokenTransformer,
)
