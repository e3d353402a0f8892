"""ImageNet-style data pipeline (host-side, NHWC numpy batches).

Replaces the reference's torchvision ImageFolder + timm transform stack
(/root/reference/build_data_sets.py): an index over class folders, per-sample
PIL decode + transform, and a simple double-buffered batch iterator feeding
the TPU. Eval transform parity: Resize(256, bicubic) -> CenterCrop(224) ->
Normalize (build_data_sets.py:25-30). Train transform parity:
RandomResizedCrop(224, bicubic) -> flip -> RandAugment -> Normalize ->
RandomErasing (build_data_sets.py:15-24 via timm create_transform).
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from dense2sparse_vit_tpu.core.config import DataConfig
from dense2sparse_vit_tpu.data.augment import parse_rand_augment, random_erasing

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageFolder:
    """Directory-per-class dataset index (torchvision ImageFolder parity)."""

    def __init__(self, root: str, transform: Optional[Callable] = None):
        self.root = root
        self.transform = transform
        classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        if not classes:
            raise FileNotFoundError(f"no class directories under {root}")
        self.classes = classes
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append(
                        (os.path.join(cdir, fname), self.class_to_idx[c])
                    )

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int):
        path, label = self.samples[i]
        img = Image.open(path).convert("RGB")
        if self.transform is not None:
            img = self.transform(img)
        return img, label


def _normalize(arr: np.ndarray, cfg: DataConfig) -> np.ndarray:
    if arr.dtype == np.uint8:
        # fused single-pass kernel (native/d2s_native.c) with numpy fallback
        from dense2sparse_vit_tpu.native import normalize_u8

        return normalize_u8(arr, cfg.mean, cfg.std)
    arr = arr.astype(np.float32) / 255.0
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    return (arr - mean) / std


def eval_transform(cfg: DataConfig) -> Callable:
    """Resize(short side = eval_resize, bicubic) -> CenterCrop -> Normalize."""

    def tf(img: Image.Image) -> np.ndarray:
        w, h = img.size
        scale = cfg.eval_resize / min(w, h)
        img = img.resize(
            (max(1, round(w * scale)), max(1, round(h * scale))),
            Image.BICUBIC,
        )
        w, h = img.size
        c = cfg.eval_crop
        left, top = (w - c) // 2, (h - c) // 2
        img = img.crop((left, top, left + c, top + c))
        return _normalize(np.asarray(img), cfg)

    return tf


def train_transform(cfg: DataConfig, seed: int = 0) -> Callable:
    """RandomResizedCrop -> flip -> RandAugment -> Normalize -> RandomErasing."""
    ra = parse_rand_augment(cfg.auto_augment) if cfg.auto_augment else None
    rng = np.random.default_rng(seed)
    interp = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR}[
        cfg.train_interpolation
    ]

    def tf(img: Image.Image) -> np.ndarray:
        # RandomResizedCrop(scale=(0.08, 1.0), ratio=(3/4, 4/3))
        w, h = img.size
        area = w * h
        for _ in range(10):
            target = rng.uniform(0.08, 1.0) * area
            ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(target * ar)))
            ch = int(round(np.sqrt(target / ar)))
            if cw <= w and ch <= h:
                left = rng.integers(0, w - cw + 1)
                top = rng.integers(0, h - ch + 1)
                img = img.crop((left, top, left + cw, top + ch))
                break
        else:  # center fallback
            s = min(w, h)
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w + s) // 2, (h + s) // 2))
        img = img.resize((cfg.eval_crop, cfg.eval_crop), interp)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if ra is not None:
            img = ra(img, rng)
        arr = _normalize(np.asarray(img), cfg)
        if cfg.reprob > 0:
            arr = random_erasing(
                arr, rng, prob=cfg.reprob, count=cfg.recount
            )
        return arr

    return tf


def make_loader(
    dataset: ImageFolder,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    indices: Optional[Sequence[int]] = None,
    prefetch: int = 2,
) -> Callable[[], Iterator[Tuple[np.ndarray, np.ndarray]]]:
    """Batch iterator factory with a background prefetch thread.

    Replaces torch DataLoader (mask_predictor.py:249-259). Returns a callable
    producing a fresh epoch iterator; pass `indices` for subset sampling (the
    80/20 SubsetRandomSampler split, mask_predictor.py:239-246).
    """
    idx = np.asarray(indices if indices is not None else np.arange(len(dataset)))

    def epoch_iter():
        order = idx.copy()
        if shuffle:
            np.random.default_rng(seed + epoch_iter.count).shuffle(order)
        epoch_iter.count += 1
        n_batches = (
            len(order) // batch_size
            if drop_last
            else -(-len(order) // batch_size)
        )
        q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)

        def worker():
            for b in range(n_batches):
                sel = order[b * batch_size:(b + 1) * batch_size]
                imgs, labels = [], []
                for i in sel:
                    x, y = dataset[int(i)]
                    imgs.append(x)
                    labels.append(y)
                q.put(
                    (
                        np.stack(imgs).astype(np.float32),
                        np.asarray(labels, np.int32),
                    )
                )
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item

    epoch_iter.count = 0
    return epoch_iter
