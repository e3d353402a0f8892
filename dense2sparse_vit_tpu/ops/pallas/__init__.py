from dense2sparse_vit_tpu.ops.pallas.attention import fused_attention  # noqa: F401
