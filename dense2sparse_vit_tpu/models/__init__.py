from dense2sparse_vit_tpu.models.teacher import ViTTeacher  # noqa: F401
from dense2sparse_vit_tpu.models.student import (  # noqa: F401
    DiffPruningStudent,
    StudentOutput,
)
from dense2sparse_vit_tpu.models.registry import (  # noqa: F401
    create_model,
    register_model,
    list_models,
)
