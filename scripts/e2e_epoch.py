"""End-to-end epoch throughput: the REAL loader feeding the REAL chip.

Closes the round-2 verdict's "loader and step have never been run together"
gap: builds a synthetic-JPEG ImageFolder (decode work is real), then runs
`train.loop.run_experiment` — the same epoch driver the CLI uses
(parity: reference mask_predictor.py:295-329) — for several epochs with the
frozen-teacher cache + decoded-uint8 cache + uint8-to-device pipeline, and
reports the measured train-phase images/sec per epoch next to the
synthetic-fed step rate from bench_train.

Epoch 0 pays JPEG decode + teacher-cache build; epochs >= 1 are the steady
state (decode-free, teacher-forward-free, uint8 host->device transfer with
on-device normalize).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/e2e_epoch.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("E2E_IMAGES", 4096))  # 80% -> 25 steps @ B=128
BATCH = int(os.environ.get("E2E_BATCH", 128))
EPOCHS = int(os.environ.get("E2E_EPOCHS", 3))
# E2E_TCACHE=0: run the augmented train_transform pipeline (RandomResizedCrop
# + RandAugment + RandomErasing, decode every epoch) with the live teacher —
# the reference's exact training config; decode-bound on a 1-core host
TCACHE = os.environ.get("E2E_TCACHE", "1") == "1"


def build_dataset(root: str, n: int = N_IMAGES):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in range(8):
        cls_dir = os.path.join(root, f"class_{cls}")
        os.makedirs(cls_dir, exist_ok=True)
        for i in range(n // 8):
            arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(cls_dir, f"{i:05d}.jpg"))


def main():
    from dense2sparse_vit_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from dense2sparse_vit_tpu.core.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        PruningConfig,
        TrainConfig,
    )
    from dense2sparse_vit_tpu.train.loop import run_experiment

    with tempfile.TemporaryDirectory() as root, \
            tempfile.TemporaryDirectory() as workdir:
        build_dataset(root)
        cfg = ExperimentConfig(
            model=ModelConfig(dtype="bfloat16"),
            pruning=PruningConfig(),
            train=TrainConfig(
                batch_size=BATCH, epochs=EPOCHS, warmup_epochs=1,
                teacher_cache=TCACHE, log_every_steps=10,
            ),
            data=DataConfig(
                imgnet_val_dir=root, num_workers=0,
                mixup=0.0, cutmix=0.0, mixup_prob=0.0,
            ),
        )
        run_experiment(cfg, workdir, viz_every=10**9)

        rows = []
        with open(os.path.join(workdir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "time/epoch_seconds" in rec:
                    rows.append(rec)

    per_epoch = [
        {
            "epoch": r["step"],
            "train_img_per_s": round(r["time/train_img_per_s"], 1),
            "train_seconds": round(r["time/train_seconds"], 1),
            "epoch_seconds": round(r["time/epoch_seconds"], 1),
        }
        for r in rows
    ]
    steady = per_epoch[-1]["train_img_per_s"] if per_epoch else 0.0
    print(
        json.dumps(
            {
                "metric": "end-to-end train img/s (real loader -> real "
                + f"chip, B={BATCH}, "
                + ("teacher-cache + uint8 cache)" if TCACHE
                   else "augmented pipeline + live teacher)"),
                "value": steady,
                "unit": "images/sec",
                "extra": {"per_epoch": per_epoch, "cpu_count": os.cpu_count()},
            }
        )
    )


if __name__ == "__main__":
    main()
