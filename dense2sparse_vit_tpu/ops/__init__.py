from dense2sparse_vit_tpu.ops.masked_softmax import softmax_with_policy  # noqa: F401
from dense2sparse_vit_tpu.ops.topk import (  # noqa: F401
    topk_keep_indices,
    mask_from_scores,
    threshold_keep_mask,
    gather_tokens,
    compose_kept_indices,
)
from dense2sparse_vit_tpu.ops.gumbel import gumbel_softmax_keep  # noqa: F401
from dense2sparse_vit_tpu.ops.perturbed_topk import perturbed_topk  # noqa: F401
