"""MetricsLogger and job-name tests."""

import json
import os

from dense2sparse_vit_tpu.core.config import ExperimentConfig, PruningConfig
from dense2sparse_vit_tpu.utils.logging import MetricsLogger, slurm_job_name


class TestMetricsLogger:
    def test_jsonl_and_summary(self, tmp_path):
        logger = MetricsLogger(str(tmp_path), job_name="t")
        logger.log({"loss": 1.5, "acc": 0.25}, step=0, prefix="train")
        logger.log({"loss": 1.2}, step=1, prefix="train")
        logger.summary({"best_acc": 0.5})
        logger.close()
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["train/loss"] == 1.5
        assert lines[1]["step"] == 1
        summary = json.load(open(tmp_path / "summary.json"))
        assert summary["best_acc"] == 0.5

    def test_tensorboard_sink(self, tmp_path):
        logger = MetricsLogger(
            str(tmp_path), job_name="t", use_tensorboard=True
        )
        logger.log({"loss": 1.0}, step=0)
        logger.close()
        assert os.path.isdir(tmp_path / "tb")
        assert os.listdir(tmp_path / "tb")  # event file written

    def test_wandb_gated_when_missing(self, tmp_path):
        # wandb is not installed in this image; must degrade gracefully
        logger = MetricsLogger(str(tmp_path), job_name="t", use_wandb=True)
        logger.log({"x": 1.0}, step=0)
        logger.close()


class TestJobName:
    def test_encodes_hyperparameters(self, monkeypatch):
        monkeypatch.delenv("SLURM_JOB_ID", raising=False)
        cfg = ExperimentConfig(
            arch="deit_small",
            pruning=PruningConfig(
                pruning_locs=(3, 6, 9),
                keep_ratios=(0.7, 0.49, 0.343),
                small_predictor=True,
                mask_loss_type="mse",
            ),
        )
        name = slurm_job_name(cfg)
        assert name == "deit_small_L3-6-9_K0.7-0.49-0.343_topk_mse_sMP"

    def test_appends_slurm_job_id(self, monkeypatch):
        monkeypatch.setenv("SLURM_JOB_ID", "12345")
        name = slurm_job_name(ExperimentConfig())
        assert name.endswith("_12345")
