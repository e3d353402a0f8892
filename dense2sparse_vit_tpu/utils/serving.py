"""Batch-bucketed serving over AOT-exported artifacts.

The reference has no deployment story; `utils/export.py` provides the
artifact, and this module provides the missing operational layer: real
serving traffic arrives at ragged batch sizes, while XLA executables are
fixed-shape. ServingModel pads each request up to the nearest configured
bucket, dispatches to that bucket's compiled artifact, and slices the
result back to the true rows — the standard static-shape serving pattern
on TPUs (bucketing bounds the compile set; padding rows ride along for
free on the MXU). Where the backend supports the symbolic-batch lowering,
ONE artifact serves everything and bucketing is bypassed.

Typical flow:

    sm = ServingModel.export(student, variables, buckets=(1, 8, 32, 128))
    sm.save("artifacts/")                  # ships without model code
    # serving process:
    sm = ServingModel.load("artifacts/")
    logits = sm(images)                    # ANY leading batch size
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from dense2sparse_vit_tpu.utils.export import export_student, load_exported

_MANIFEST = "manifest.json"
_SYMBOLIC = "symbolic.jaxexport"


class ServingModel:
    """Callable serving wrapper over one-or-more exported artifacts."""

    def __init__(
        self,
        bucket_fns: Dict[int, Callable],
        bucket_blobs: Dict[int, bytes],
        symbolic_fn: Optional[Callable] = None,
        symbolic_blob: Optional[bytes] = None,
    ):
        if symbolic_fn is None and not bucket_fns:
            raise ValueError("need at least one bucket or a symbolic artifact")
        self._bucket_fns = dict(sorted(bucket_fns.items()))
        self._bucket_blobs = bucket_blobs
        self._symbolic_fn = symbolic_fn
        self._symbolic_blob = symbolic_blob

    # -- construction ------------------------------------------------------

    @classmethod
    def export(
        cls,
        student,
        variables,
        buckets: Sequence[int] = (1, 8, 32, 128),
        try_symbolic: bool = True,
        **export_kwargs,
    ) -> "ServingModel":
        """Export the student once per bucket (or once symbolically)."""
        if try_symbolic:
            try:
                blob = export_student(
                    student, variables, batch_size=None, **export_kwargs
                )
                return cls({}, {}, load_exported(blob), blob)
            except Exception:
                pass  # symbolic lowering rejected -> fixed buckets
        if not buckets:
            raise ValueError("symbolic export unavailable and no buckets")
        blobs = {
            int(b): export_student(
                student, variables, batch_size=int(b), **export_kwargs
            )
            for b in sorted(set(int(b) for b in buckets))
        }
        fns = {b: load_exported(blob) for b, blob in blobs.items()}
        return cls(fns, blobs)

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        manifest = {"buckets": sorted(self._bucket_blobs)}
        if self._symbolic_blob is not None:
            with open(os.path.join(path, _SYMBOLIC), "wb") as f:
                f.write(self._symbolic_blob)
            manifest["symbolic"] = True
        for b, blob in self._bucket_blobs.items():
            with open(os.path.join(path, f"bucket_{b}.jaxexport"), "wb") as f:
                f.write(blob)
        with open(os.path.join(path, _MANIFEST), "w") as f:
            json.dump(manifest, f)

    @classmethod
    def load(cls, path: str) -> "ServingModel":
        with open(os.path.join(path, _MANIFEST)) as f:
            manifest = json.load(f)
        symbolic_fn = symbolic_blob = None
        if manifest.get("symbolic"):
            with open(os.path.join(path, _SYMBOLIC), "rb") as f:
                symbolic_blob = f.read()
            symbolic_fn = load_exported(symbolic_blob)
        blobs = {}
        for b in manifest["buckets"]:
            with open(
                os.path.join(path, f"bucket_{b}.jaxexport"), "rb"
            ) as f:
                blobs[int(b)] = f.read()
        fns = {b: load_exported(blob) for b, blob in blobs.items()}
        return cls(fns, blobs, symbolic_fn, symbolic_blob)

    # -- dispatch ----------------------------------------------------------

    @property
    def buckets(self) -> Tuple[int, ...]:
        return tuple(self._bucket_fns)

    def _bucket_for(self, n: int) -> int:
        for b in self._bucket_fns:  # sorted ascending
            if b >= n:
                return b
        return max(self._bucket_fns)

    def __call__(self, images) -> np.ndarray:
        """images: (B, H, W, 3) float32, any B >= 1 -> (B, num_classes)."""
        images = np.asarray(images, dtype=np.float32)
        n = images.shape[0]
        if n == 0:
            raise ValueError("empty batch")
        if self._symbolic_fn is not None:
            return np.asarray(self._symbolic_fn(images))
        out = []
        i = 0
        while i < n:
            b = self._bucket_for(n - i)
            chunk = images[i : i + b]
            take = chunk.shape[0]
            if take < b:  # pad the tail request up to the bucket
                pad = np.zeros((b - take,) + images.shape[1:], np.float32)
                chunk = np.concatenate([chunk, pad], axis=0)
            out.append(np.asarray(self._bucket_fns[b](chunk))[:take])
            i += take
        return np.concatenate(out, axis=0)
