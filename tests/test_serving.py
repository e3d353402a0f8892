"""ServingModel: bucketed dispatch over AOT artifacts (utils/serving.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.models import DiffPruningStudent
from dense2sparse_vit_tpu.utils.serving import ServingModel

CFG = ModelConfig(
    img_size=32, patch_size=8, embed_dim=16, depth=2, num_heads=2,
    num_classes=5,
)


@pytest.fixture(scope="module")
def student_and_vars():
    student = DiffPruningStudent(
        cfg=CFG,
        pruning=PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,)),
    )
    variables = student.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    return student, variables


def _live_logits(student, variables, x):
    return np.asarray(
        student.apply(
            variables, jnp.asarray(x), collect_cls_attns=False
        ).logits.astype(jnp.float32)
    )


@pytest.fixture(scope="module")
def bucketed(student_and_vars):
    student, variables = student_and_vars
    return ServingModel.export(
        student, variables, buckets=(2, 4), try_symbolic=False
    )


class TestBucketedDispatch:
    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 9])
    def test_any_batch_size_matches_live(self, student_and_vars, bucketed, n):
        student, variables = student_and_vars
        rng = np.random.default_rng(n)
        x = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
        got = bucketed(x)
        assert got.shape == (n, CFG.num_classes)
        np.testing.assert_allclose(
            got, _live_logits(student, variables, x), rtol=1e-4, atol=1e-4
        )

    def test_padding_rows_do_not_leak(self, bucketed):
        """Same request padded into different buckets yields identical rows
        (pruning/top-k must be per-sample; zero pad rows can't bleed in)."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        np.testing.assert_allclose(
            bucketed(x), bucketed(np.concatenate([x, x[:1]]))[:2],
            rtol=1e-5, atol=1e-5,
        )

    def test_empty_batch_raises(self, bucketed):
        with pytest.raises(ValueError):
            bucketed(np.zeros((0, 32, 32, 3), np.float32))


class TestSaveLoad:
    def test_roundtrip_without_model_code(
        self, student_and_vars, bucketed, tmp_path
    ):
        student, variables = student_and_vars
        bucketed.save(str(tmp_path))
        loaded = ServingModel.load(str(tmp_path))
        assert loaded.buckets == (2, 4)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
        np.testing.assert_allclose(
            loaded(x), _live_logits(student, variables, x),
            rtol=1e-4, atol=1e-4,
        )

    def test_symbolic_roundtrip(self, student_and_vars, tmp_path):
        student, variables = student_and_vars
        sm = ServingModel.export(student, variables, try_symbolic=True)
        sm.save(str(tmp_path))
        loaded = ServingModel.load(str(tmp_path))
        rng = np.random.default_rng(2)
        x = rng.normal(size=(7, 32, 32, 3)).astype(np.float32)
        np.testing.assert_allclose(
            loaded(x), _live_logits(student, variables, x),
            rtol=1e-4, atol=1e-4,
        )


class TestDriverExport:
    @pytest.mark.slow
    def test_cli_train_then_export_serving(self, tmp_path):
        """2-step training run via run_experiment with export_serving: the
        saved artifact dir serves any batch with no model build."""
        import os
        from PIL import Image
        from dense2sparse_vit_tpu.core.config import (
            DataConfig, ExperimentConfig, TrainConfig,
        )
        from dense2sparse_vit_tpu.train.loop import run_experiment

        root = tmp_path / "ds"
        rng = np.random.default_rng(0)
        for c in range(2):
            d = root / f"class_{c}"
            os.makedirs(d)
            for i in range(12):
                Image.fromarray(
                    rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                ).save(d / f"{i}.jpg")

        art = str(tmp_path / "artifacts")
        cfg = ExperimentConfig(
            model=CFG.replace(num_classes=2),
            pruning=PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,)),
            train=TrainConfig(batch_size=8, epochs=1, warmup_epochs=1),
            data=DataConfig(
                imgnet_val_dir=str(root), num_classes=2,
                eval_resize=36, eval_crop=32, mixup=0.0, cutmix=0.0,
                reprob=0.0,
            ),
        )
        run_experiment(
            cfg, str(tmp_path / "wd"), max_steps_per_epoch=2,
            export_serving=art,
        )
        assert os.path.exists(os.path.join(art, "manifest.json"))
        sm = ServingModel.load(art)
        x = np.random.default_rng(1).normal(size=(3, 32, 32, 3)).astype(
            np.float32
        )
        out = sm(x)
        assert out.shape == (3, 2)
        assert np.all(np.isfinite(out))
