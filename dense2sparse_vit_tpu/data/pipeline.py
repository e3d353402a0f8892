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


class _FeederError:
    """Exception carrier from the prefetch thread to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


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


def device_normalize(x, cfg: DataConfig):
    """Jit-friendly uint8 -> normalized float on DEVICE.

    Matches `_normalize` to float32 rounding (~1e-7 relative); moving it
    into the jitted step lets the host ship raw uint8 batches (4x fewer
    bytes over PCIe/relay than float32) and turns the per-batch host
    normalize into a fused VPU elementwise op XLA overlaps with compute.
    """
    import jax.numpy as jnp

    mean = jnp.asarray(cfg.mean, jnp.float32) * 255.0
    # precompute 1/(std*255) so the hot op is a fused multiply-add
    inv = 1.0 / (jnp.asarray(cfg.std, jnp.float32) * 255.0)
    return (x.astype(jnp.float32) - mean) * inv


def eval_transform(cfg: DataConfig, normalize: bool = True) -> Callable:
    """Resize(short side = eval_resize, bicubic) -> CenterCrop -> Normalize.

    With normalize=False the transform returns uint8 HWC arrays — the
    decoded-uint8 form used by the loader's cache and by batch-level
    normalization (one fused native-kernel pass per batch instead of one
    per image).
    """

    def tf(img: Image.Image) -> np.ndarray:
        # torchvision F.resize semantics EXACTLY (short side = size, long
        # side = int(size * long / short) — TRUNCATION, not round; no-op
        # when the short side already equals size). A one-pixel size
        # difference shifts the center crop and can move top-1 by more
        # than the 0.2% parity budget.
        w, h = img.size
        size = cfg.eval_resize
        if not ((w <= h and w == size) or (h <= w and h == size)):
            if w < h:
                ow, oh = size, int(size * h / w)
            else:
                oh, ow = size, int(size * w / h)
            img = img.resize((ow, oh), Image.BICUBIC)
        # torchvision center_crop: offsets via int(round((full-crop)/2))
        w, h = img.size
        c = cfg.eval_crop
        left = int(round((w - c) / 2.0))
        top = int(round((h - c) / 2.0))
        img = img.crop((left, top, left + c, top + c))
        arr = np.asarray(img)
        return _normalize(arr, cfg) if normalize else arr

    return tf


def device_random_erasing(key, x, cfg: DataConfig):
    """timm RandomErasing (mode='pixel') on device, over a normalized
    (B, H, W, C) batch.

    Distributionally identical to the host path
    (data.augment.random_erasing, itself pinned to timm semantics,
    build_data_sets.py:22-23): one per-sample Bernoulli(reprob) gate, then
    `recount` boxes, each drawn as 10 rejection attempts over
    area in [0.02, 1/3)*H*W and log-uniform aspect in [0.3, 10/3), filled
    with unit normal noise. Static shapes throughout: the box becomes a
    broadcasted-iota mask, so this jits into a handful of fused
    elementwise ops (no host round trip, no dynamic slicing).
    """
    B, H, W, C = x.shape
    prob, count = float(cfg.reprob), int(cfg.recount)
    if prob <= 0.0 or count <= 0:
        return x
    import jax.numpy as jnp
    import jax.random as jr

    area = float(H * W)
    ATTEMPTS = 10
    kgate, kboxes = jr.split(key)
    # host semantics: ONE prob gate per sample, then all `count` boxes
    apply = jr.uniform(kgate, (B,)) <= prob

    def one_box(x, k):
        kt, ka, ktop, kleft, kn = jr.split(k, 5)
        target = jr.uniform(
            kt, (B, ATTEMPTS), minval=0.02, maxval=1.0 / 3.0
        ) * area
        aspect = jnp.exp(jr.uniform(
            ka, (B, ATTEMPTS),
            minval=jnp.log(0.3), maxval=jnp.log(10.0 / 3.0),
        ))
        h = jnp.round(jnp.sqrt(target * aspect)).astype(jnp.int32)
        w = jnp.round(jnp.sqrt(target / aspect)).astype(jnp.int32)
        valid = (h < H) & (w < W)
        pick = jnp.argmax(valid, axis=1)  # first valid attempt (host loop)
        any_valid = jnp.any(valid, axis=1)
        h = jnp.take_along_axis(h, pick[:, None], 1)[:, 0]
        w = jnp.take_along_axis(w, pick[:, None], 1)[:, 0]
        top = jnp.floor(
            jr.uniform(ktop, (B,)) * (H - h + 1).astype(jnp.float32)
        ).astype(jnp.int32)
        left = jnp.floor(
            jr.uniform(kleft, (B,)) * (W - w + 1).astype(jnp.float32)
        ).astype(jnp.int32)
        rows = jnp.arange(H)[None, :]
        cols = jnp.arange(W)[None, :]
        rmask = (rows >= top[:, None]) & (rows < (top + h)[:, None])
        cmask = (cols >= left[:, None]) & (cols < (left + w)[:, None])
        mask = rmask[:, :, None] & cmask[:, None, :]  # (B, H, W)
        mask = mask & (apply & any_valid)[:, None, None]
        noise = jr.normal(kn, x.shape, x.dtype)
        return jnp.where(mask[..., None], noise, x)

    for i in range(count):
        x = one_box(x, jr.fold_in(kboxes, i))
    return x


def train_transform(
    cfg: DataConfig, seed: int = 0, as_uint8: bool = False
) -> Callable:
    """RandomResizedCrop -> flip -> RandAugment -> Normalize -> RandomErasing.

    as_uint8: stop after RandAugment and return the raw uint8 array —
    the loader then ships 4x fewer host->device bytes, and the epoch
    driver applies Normalize + RandomErasing ON DEVICE (device_normalize +
    device_random_erasing) before mixup, preserving the reference's op
    order (build_data_sets.py:15-24 then mask_predictor.py:261-267).
    """
    # geometric-op fill = round(255*mean), as timm's create_transform
    # passes via aa_params img_mean (build_data_sets.py:15-24)
    fill = tuple(min(255, round(255 * m)) for m in cfg.mean)
    ra = (
        parse_rand_augment(cfg.auto_augment, fill=fill)
        if cfg.auto_augment else None
    )
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
        if as_uint8:
            return np.asarray(img, dtype=np.uint8)
        arr = _normalize(np.asarray(img), cfg)
        if cfg.reprob > 0:
            arr = random_erasing(
                arr, rng, prob=cfg.reprob, count=cfg.recount
            )
        return arr

    return tf


# fork-shared dataset handle for pool workers (copy-on-write: the index and
# transform close over into children at fork time, no pickling per task)
_WORKER_DATASET = None


def _pool_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _load_batch(sel):
    imgs, labels = [], []
    for i in sel:
        x, y = _WORKER_DATASET[int(i)]
        imgs.append(x)
        labels.append(y)
    batch = np.stack(imgs)
    return batch, np.asarray(labels, np.int32)


def make_loader(
    dataset: ImageFolder,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    indices: Optional[Sequence[int]] = None,
    prefetch: int = 2,
    num_workers: int = 0,
    normalize_cfg: Optional[DataConfig] = None,
    cache_decoded: bool = False,
    with_indices: bool = False,
    as_uint8: bool = False,
    shared_cache: Optional[dict] = None,
) -> Callable[[], Iterator[Tuple[np.ndarray, np.ndarray]]]:
    """Batch iterator factory with parallel decode and prefetch.

    Replaces torch's multi-worker DataLoader (mask_predictor.py:249-259).
    Returns a callable producing a fresh epoch iterator; pass `indices` for
    subset sampling (the 80/20 SubsetRandomSampler split,
    mask_predictor.py:239-246).

    Args:
      num_workers: >0 forks a multiprocessing pool; each task decodes one
        full batch (JPEG decode + PIL transforms are the host bottleneck —
        the GIL serializes them in threads, processes don't).
      normalize_cfg: when the dataset transform yields uint8 (e.g.
        eval_transform(cfg, normalize=False)), normalize per BATCH with the
        fused native kernel — one pass over contiguous memory instead of
        one per image.
      cache_decoded: keep decoded uint8 samples in one preallocated host
        array; epochs after the first skip JPEG decode entirely. Memory:
        N * H * W * 3 bytes (ImageNet-val at 224 ≈ 7.5 GB — size the host
        accordingly). Requires a uint8-producing transform. Augmenting
        train transforms must NOT be cached (they are sampled per epoch);
        only deterministic transforms qualify.
      with_indices: yield (batch, labels, dataset_indices) triples — the
        key the frozen-teacher cache (train/teacher_cache.py) looks rows
        up by.
      as_uint8: yield raw uint8 batches (requires a uint8 transform);
        normalization happens on DEVICE inside the jitted step
        (device_normalize) — 4x fewer host->device bytes.
      shared_cache: pass the same dict to several make_loader calls over
        the SAME indices to share one decoded-uint8 store between them
        (e.g. the teacher-cache pre-pass and the epoch loader — the shard
        is then decoded exactly once).
    """
    idx = np.asarray(indices if indices is not None else np.arange(len(dataset)))

    if as_uint8:
        # validate HERE (not in the feeder thread, where a raise would
        # leave the consumer blocked on the queue forever)
        if np.asarray(dataset[int(idx[0])][0]).dtype != np.uint8:
            raise ValueError(
                "as_uint8 requires a uint8 transform "
                "(eval_transform(cfg, normalize=False))"
            )

    cache: dict = shared_cache if shared_cache is not None else {}
    if cache_decoded and "store" not in cache:
        probe = dataset[int(idx[0])][0]
        if probe.dtype != np.uint8:
            raise ValueError(
                "cache_decoded requires a uint8 transform "
                "(eval_transform(cfg, normalize=False))"
            )
        # store sized by the index SUBSET (the 80/20 split would otherwise
        # allocate 2x what this loader can ever touch), remapped through a
        # global-index -> row dict
        cache["pos"] = {int(i): r for r, i in enumerate(idx)}
        cache["store"] = np.empty((len(idx),) + probe.shape, np.uint8)
        cache["filled"] = np.zeros(len(idx), bool)
        cache["labels"] = np.empty(len(idx), np.int32)

    pool = None
    if num_workers > 0:
        import atexit
        import multiprocessing as mp

        pool = mp.get_context("fork").Pool(
            num_workers, initializer=_pool_init, initargs=(dataset,)
        )
        # terminate before interpreter shutdown: Pool.__del__ during final GC
        # trips on already-closed pipe fds otherwise
        atexit.register(pool.terminate)

    def finalize(batch, labels, sel=None):
        if as_uint8:
            if batch.dtype != np.uint8:
                raise ValueError("as_uint8 requires a uint8 transform")
        else:
            if normalize_cfg is not None and batch.dtype == np.uint8:
                batch = _normalize(batch, normalize_cfg)
            batch = batch.astype(np.float32, copy=False)
        if with_indices:
            return batch, labels, sel
        return batch, labels

    def load_cached(sel):
        store, filled, lab = cache["store"], cache["filled"], cache["labels"]
        pos = cache["pos"]
        rows = [pos[int(i)] for i in sel]
        for i, r in zip(sel, rows):
            if not filled[r]:
                x, y = dataset[int(i)]
                store[r], lab[r], filled[r] = x, y, True
        return store[rows], lab[rows]

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
        sels = [
            order[b * batch_size:(b + 1) * batch_size]
            for b in range(n_batches)
        ]
        q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)

        def feeder():
            # any exception must reach the consumer: a bare raise here
            # would end the thread without the sentinel and deadlock the
            # blocking q.get() below
            try:
                if cache_decoded:
                    for sel in sels:
                        q.put(finalize(*load_cached(sel), sel=sel))
                elif pool is not None:
                    # imap keeps batch order; the pool decodes several
                    # batches ahead, bounded by the queue
                    for sel, (batch, labels) in zip(
                        sels, pool.imap(_load_batch, sels)
                    ):
                        q.put(finalize(batch, labels, sel=sel))
                else:
                    for sel in sels:
                        _pool_init(dataset)
                        q.put(finalize(*_load_batch(sel), sel=sel))
            except BaseException as exc:  # noqa: BLE001
                q.put(_FeederError(exc))
                return
            q.put(None)

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, _FeederError):
                raise item.exc
            yield item

    epoch_iter.count = 0
    return epoch_iter
