from dense2sparse_vit_tpu.viz.attention_segmentation import (  # noqa: F401
    cls_attention_histogram,
    display_patch_drop,
    dynamic_keep_ratio_hist,
    generate_patch_mask,
    get_attention_masks,
    get_jaccard_similarity,
    save_image_grid,
    visualize_heads,
)
from dense2sparse_vit_tpu.viz.hooks import epoch_visualize  # noqa: F401
