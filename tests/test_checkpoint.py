"""Orbax checkpoint save/restore/resume tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig, TrainConfig
from dense2sparse_vit_tpu.models import DiffPruningStudent
from dense2sparse_vit_tpu.train import create_train_state, make_optimizer
from dense2sparse_vit_tpu.utils.checkpoint import CheckpointManager

TINY = ModelConfig(
    img_size=16, patch_size=8, embed_dim=8, depth=1, num_heads=1, num_classes=3
)


def _state():
    student = DiffPruningStudent(
        cfg=TINY, pruning=PruningConfig(pruning_locs=(0,), keep_ratios=(0.5,))
    )
    tx = make_optimizer(TrainConfig(), steps_per_epoch=1)
    imgs = jnp.zeros((1, 16, 16, 3))
    return create_train_state(student, tx, jax.random.PRNGKey(0), imgs)


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        state = _state()
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(0, state)
        assert mgr.latest_step() == 0
        restored = mgr.restore(state)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params,
            restored.params,
        )
        assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
        mgr.close()

    def test_save_if_best_tracks_metric(self, tmp_path):
        state = _state()
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.save_if_best(0, state, 0.5)
        assert not mgr.save_if_best(1, state, 0.4)  # worse -> no save
        assert mgr.save_if_best(2, state, 0.6)
        assert mgr.latest_step() == 2
        mgr.close()

    def test_resume_from_fresh_manager(self, tmp_path):
        state = _state()
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        bumped = state.replace(step=state.step + 7)
        mgr.save(7, bumped)
        mgr.close()
        mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
        restored = mgr2.restore(state)
        assert int(restored.step) == 7
        mgr2.close()

    def test_plateau_resume_prefers_latest_stream(self, tmp_path):
        """Best saved at step 2, accuracy plateaus while latest-epoch saves
        advance to step 6: resume restores step 6 (no silent rewind), and
        restore_best still yields the step-2 deployable checkpoint."""
        state = _state()
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.save_if_best(2, state.replace(step=state.step + 2), 0.9)
        for s in (4, 6):  # plateau epochs: no new best
            assert not mgr.save_if_best(
                s, state.replace(step=state.step + s), 0.5
            )
            mgr.save(s, state.replace(step=state.step + s))
        assert mgr.latest_step() == 6
        assert mgr.best_step() == 2
        assert int(mgr.restore(state).step) == 6
        assert int(mgr.restore_best(state).step) == 2
        mgr.close()
        # a fresh manager (new process, --resume) sees the same picture
        mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr2.latest_step() == 6
        assert int(mgr2.restore(state).step) == 6
        mgr2.close()

    def test_best_metric_survives_resume(self, tmp_path):
        """A fresh manager (post-crash --resume) must seed best_metric from
        the best stream, or the first post-resume eval would overwrite the
        historical best checkpoint with a worse one."""
        state = _state()
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.save_if_best(5, state.replace(step=state.step + 5), 0.8)
        mgr.close()
        mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr2.best_metric == 0.8
        assert not mgr2.save_if_best(
            6, state.replace(step=state.step + 6), 0.6
        )  # worse than the historical best: must NOT save
        assert mgr2.best_step() == 5
        assert mgr2.save_if_best(7, state.replace(step=state.step + 7), 0.9)
        mgr2.close()

    def test_latest_save_idempotent_per_step(self, tmp_path):
        """An epoch with zero train steps re-saves the same step number;
        orbax would raise StepAlreadyExistsError without the skip."""
        state = _state()
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(0, state)
        mgr.save(0, state)  # must be a no-op, not a crash
        assert mgr.latest_step() == 0
        mgr.close()

    def test_best_newer_than_latest_wins_resume(self, tmp_path):
        """When the best save is the most recent step (normal improving
        run), resume restores it even with older latest-stream saves."""
        state = _state()
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(3, state.replace(step=state.step + 3))
        assert mgr.save_if_best(5, state.replace(step=state.step + 5), 0.9)
        assert mgr.latest_step() == 5
        assert int(mgr.restore(state).step) == 5
        mgr.close()
