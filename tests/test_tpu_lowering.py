"""Cross-platform TPU lowering gates.

Every other test runs the Pallas kernels in interpret mode (pure jax ops),
which proves the MATH but not that Mosaic can lower the kernels for a real
TPU. `jax.export(platforms=("tpu",))` runs the full Mosaic lowering
pipeline on this CPU host, so unsupported ops / layout violations in any
kernel fail HERE instead of at first contact with the chip — the gate that
would have caught an int8-dot or tiling rejection during the relay outage.

Flagship widths (C=384, H=6, N=197 -> padded 208) at reduced depth: Mosaic
tiling/padding behavior is shape-dependent, so the test keeps the
deployment geometry and trims only the block count.
"""

import functools

import pytest

import jax
import jax.numpy as jnp
from jax import export as jax_export

from dense2sparse_vit_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    PruningConfig,
    TrainConfig,
)
from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
from dense2sparse_vit_tpu.utils.export import export_student


def _interpret_init(monkeypatch):
    """flax init on CPU still touches the packed-attention / gather /
    predictor kernels; run those in interpret mode. The lowering under
    test happens inside jax.export, which uses the TPU lowering rules."""
    import dense2sparse_vit_tpu.ops.pallas.attention as A
    import dense2sparse_vit_tpu.ops.pallas.gather as G
    import dense2sparse_vit_tpu.ops.pallas.predictor as P

    monkeypatch.setattr(
        A, "fused_attention_packed",
        functools.partial(A.fused_attention_packed, interpret=True),
    )
    monkeypatch.setattr(
        P, "fused_predictor_lg",
        functools.partial(P.fused_predictor_lg, interpret=True),
    )
    orig_gather = G.fused_gather_tokens
    monkeypatch.setattr(
        G, "fused_gather_tokens",
        lambda x, idx, block_batch=8, interpret=False:
            orig_gather(x, idx, block_batch, True),
    )


# flagship widths, 2 blocks with the pruning stage between them
FLAG = ModelConfig(
    img_size=224, patch_size=16, embed_dim=384, depth=2, num_heads=6,
    num_classes=10, dtype="bfloat16", use_fused_attention=True,
)


def _init_student(student, monkeypatch, rngs=None):
    x1 = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    return student.init(rngs or jax.random.PRNGKey(1), x1)


class TestServingLowering:
    def test_bf16_serving_graph_lowers_for_tpu(self, monkeypatch):
        _interpret_init(monkeypatch)
        student = DiffPruningStudent(
            cfg=FLAG,
            pruning=PruningConfig(
                pruning_locs=(1,), keep_ratios=(0.7,), small_predictor=True
            ),
        )
        variables = _init_student(student, monkeypatch)
        blob = export_student(
            student, variables, batch_size=8, platforms=("tpu",)
        )
        assert len(blob) > 0

    def test_int8_serving_graph_lowers_for_tpu(self, monkeypatch):
        _interpret_init(monkeypatch)
        student = DiffPruningStudent(
            cfg=FLAG.replace(quant="int8"),
            pruning=PruningConfig(
                pruning_locs=(1,), keep_ratios=(0.7,), small_predictor=True
            ),
        )
        variables = _init_student(student, monkeypatch)
        blob = export_student(
            student, variables, batch_size=8, platforms=("tpu",)
        )
        assert len(blob) > 0


class TestTrainStepLowering:
    """The whole-block / MLP-half / attention-half BACKWARD kernels only
    run under jax.grad — lower the full jitted train step for TPU to pin
    their Mosaic lowering too (plain mode via topk, policy mode + dPolicy
    via threshold)."""

    def _lower_train_step(self, monkeypatch, pruning):
        import optax

        from dense2sparse_vit_tpu.train.train_step import (
            create_train_state,
            make_train_step,
        )

        _interpret_init(monkeypatch)
        student = DiffPruningStudent(cfg=FLAG, pruning=pruning)
        teacher = ViTTeacher(cfg=FLAG)
        x1 = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
        tx = optax.adamw(1e-4)
        state = create_train_state(student, tx, jax.random.PRNGKey(1), x1)
        tparams = teacher.init(jax.random.PRNGKey(2), x1)["params"]
        cfg = ExperimentConfig(
            model=FLAG, pruning=pruning,
            train=TrainConfig(batch_size=4, epochs=2, warmup_epochs=0),
            data=DataConfig(num_classes=FLAG.num_classes),
        )
        step = make_train_step(student, teacher, tx, cfg)

        specs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            (
                state, tparams,
                jnp.zeros((4, 224, 224, 3), jnp.float32),
                jnp.zeros((4,), jnp.int32),
                jax.random.PRNGKey(3),
                jnp.float32(1.0),
            ),
        )
        exported = jax_export.export(
            jax.jit(step), platforms=("tpu",)
        )(*specs)
        # export() returning IS the gate: Mosaic lowering ran. (.serialize()
        # additionally needs optax pytree registrations — not under test.)
        assert exported.mlir_module_serialized
        assert "tpu" in exported.platforms

    def test_topk_train_step_lowers_for_tpu(self, monkeypatch):
        self._lower_train_step(
            monkeypatch,
            PruningConfig(
                pruning_locs=(1,), keep_ratios=(0.7,), small_predictor=True
            ),
        )

    def test_threshold_train_step_lowers_for_tpu(self, monkeypatch):
        # policy-mask kernels (fwd + backward with dPolicy)
        self._lower_train_step(
            monkeypatch,
            PruningConfig(
                pruning_locs=(1,), keep_ratios=(0.7,),
                small_predictor=True, patch_score_threshold=0.25,
            ),
        )
