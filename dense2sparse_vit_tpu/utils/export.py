"""AOT export of the pruned-inference graph for serving.

The reference has no deployment story (research scripts only); this is the
TPU-native one: `jax.export` serializes the jitted student forward —
StableHLO plus the lowered Mosaic kernels — so a serving process can
deserialize and `call()` it without the model code, flax, or a Python
re-trace, with the batch dimension optionally symbolic.

Typical flow:

    blob = export_student(student, params, batch_size=None)   # poly batch
    open("student.jaxexport", "wb").write(blob)
    # serving side:
    fn = load_exported("student.jaxexport")
    logits = fn(images)                                       # any batch
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_student(
    student,
    variables,
    batch_size: Optional[int] = None,
    img_size: Optional[int] = None,
    platforms=None,
) -> bytes:
    """Serialize the student's pruned inference forward (images -> logits).

    Args:
      student: a model with `.apply(variables, images, ...) -> out.logits`
        (DiffPruningStudent / DynamicViTStudent / any registry model whose
        output carries `.logits`).
      variables: the trained variables dict ({'params': ...}); baked into
        the exported artifact as constants.
      batch_size: fixed batch, or None for a symbolic ("b") batch dim —
        one artifact serves every batch size.
      img_size: input resolution; defaults to student.cfg.img_size.
      platforms: lowering platforms (e.g. ("tpu",)); defaults to the
        current backend.

    Returns the serialized artifact bytes.
    """
    size = img_size or student.cfg.img_size
    dtype = jnp.dtype(student.cfg.dtype)

    # mirror make_eval_step's apply configuration so the exported artifact
    # computes EXACTLY what the validated eval computes
    pr = getattr(student, "pruning", None)
    apply_kwargs = {}
    if pr is not None:
        if pr.cls_from_teacher:
            # the student would silently fall back to its own scores
            # without the teacher's CLS attentions — a different pruning
            # policy than the one validated at eval
            raise ValueError(
                "cls_from_teacher students take the frozen teacher's CLS "
                "attentions as a runtime input; export the "
                "teacher-independent configuration instead"
            )
        if pr.selection == "random":
            # fixed selection stream, matching make_eval_step
            apply_kwargs["rngs"] = {"selection": jax.random.PRNGKey(0)}

    def forward(images):
        try:
            out = student.apply(
                variables, images.astype(dtype), collect_cls_attns=False,
                **apply_kwargs,
            )
        except TypeError:
            # models without the CLS-capture switch (e.g. the gumbel
            # baseline student)
            out = student.apply(
                variables, images.astype(dtype), **apply_kwargs
            )
        logits = out.logits if hasattr(out, "logits") else out
        return logits.astype(jnp.float32)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, size, size, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct(
            (batch_size, size, size, 3), jnp.float32
        )
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(forward), **kw)(spec)
    return exported.serialize()


def load_exported(path_or_bytes):
    """Deserialize an exported artifact; returns images -> logits."""
    blob = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else open(path_or_bytes, "rb").read()
    )
    exported = jax_export.deserialize(bytes(blob))

    def fn(images):
        return exported.call(images)

    return fn
