from dense2sparse_vit_tpu.utils.convert import (  # noqa: F401
    convert_deit_state_dict,
    export_student_state_dict,
    resize_pos_embed,
)
from dense2sparse_vit_tpu.utils.checkpoint import (  # noqa: F401
    CheckpointManager,
)
from dense2sparse_vit_tpu.utils.logging import (  # noqa: F401
    MetricsLogger,
    slurm_job_name,
)
from dense2sparse_vit_tpu.utils.profiling import (  # noqa: F401
    flops_of,
    latency_breakdown,
    pruned_vs_dense_flops,
    time_jitted,
)
from dense2sparse_vit_tpu.utils.export import (  # noqa: F401
    export_student,
    load_exported,
)
from dense2sparse_vit_tpu.utils.serving import (  # noqa: F401
    ServingModel,
)
