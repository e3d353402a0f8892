from dense2sparse_vit_tpu.core.config import (  # noqa: F401
    ModelConfig,
    PruningConfig,
    TrainConfig,
    DataConfig,
    ExperimentConfig,
)
from dense2sparse_vit_tpu.core.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
)
