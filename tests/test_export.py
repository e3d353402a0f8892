"""AOT export/serving tests: serialize the pruned forward, reload it
without the model objects, and match the live apply() output."""

import numpy as np

import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.models import DiffPruningStudent
from dense2sparse_vit_tpu.utils.export import export_student, load_exported

TINY = ModelConfig(
    img_size=32, patch_size=8, embed_dim=16, depth=2, num_heads=2,
    num_classes=5,
)


def _student_and_vars():
    student = DiffPruningStudent(
        cfg=TINY, pruning=PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,))
    )
    imgs = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    variables = student.init(jax.random.PRNGKey(1), imgs[:1])
    return student, variables, imgs


def test_fixed_batch_roundtrip(tmp_path):
    student, variables, imgs = _student_and_vars()
    blob = export_student(student, variables, batch_size=4)
    path = tmp_path / "student.jaxexport"
    path.write_bytes(blob)

    fn = load_exported(str(path))
    got = np.asarray(fn(imgs))
    want = np.asarray(
        student.apply(variables, imgs).logits.astype(jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_symbolic_batch_serves_multiple_sizes():
    student, variables, imgs = _student_and_vars()
    fn = load_exported(export_student(student, variables, batch_size=None))
    for b in (1, 3, 8):
        xb = jax.random.normal(jax.random.PRNGKey(b), (b, 32, 32, 3))
        got = np.asarray(fn(xb))
        assert got.shape == (b, TINY.num_classes)
        want = np.asarray(
            student.apply(variables, xb).logits.astype(jnp.float32)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cls_from_teacher_export_rejected():
    student = DiffPruningStudent(
        cfg=TINY,
        pruning=PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.5,), cls_from_teacher=True
        ),
    )
    import pytest

    with pytest.raises(ValueError, match="cls_from_teacher"):
        export_student(student, {"params": {}}, batch_size=2)


def test_random_selection_and_gumbel_students_export():
    import jax.random as jr

    # random-drop selection: export binds the fixed eval selection stream
    student = DiffPruningStudent(
        cfg=TINY,
        pruning=PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.5,), selection="random"
        ),
    )
    imgs = jr.normal(jr.PRNGKey(0), (2, 32, 32, 3))
    variables = student.init(
        {"params": jr.PRNGKey(1), "selection": jr.PRNGKey(2)}, imgs[:1]
    )
    fn = load_exported(export_student(student, variables, batch_size=2))
    want = student.apply(
        variables, imgs, rngs={"selection": jr.PRNGKey(0)}
    ).logits
    np.testing.assert_allclose(
        np.asarray(fn(imgs)),
        np.asarray(want.astype(jnp.float32)),
        rtol=1e-5, atol=1e-5,
    )

    # gumbel baseline: no collect_cls_attns kwarg — the fallback apply path
    from dense2sparse_vit_tpu.models.dynamic_vit_default import (
        DynamicViTStudent,
    )

    g = DynamicViTStudent(
        cfg=TINY,
        pruning=PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.5,), selection="gumbel"
        ),
    )
    gv = g.init(jr.PRNGKey(3), imgs[:1])
    fn = load_exported(export_student(g, gv, batch_size=2))
    want = g.apply(gv, imgs).logits
    np.testing.assert_allclose(
        np.asarray(fn(imgs)), np.asarray(want.astype(jnp.float32)),
        rtol=1e-5, atol=1e-5,
    )
