"""Frozen-teacher cache tests: cached vs live-teacher train step parity,
cache build coverage, loader index plumbing, and the mixup guard.

The cache is a TPU-native extension (the reference recomputes the frozen
teacher every step, train.py:30-40); validity = bit-identical supervision
up to the bf16 storage rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import (
    ExperimentConfig,
    ModelConfig,
    PruningConfig,
    TrainConfig,
)
from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
from dense2sparse_vit_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from dense2sparse_vit_tpu.train.teacher_cache import (
    TeacherCache,
    make_teacher_outputs_fn,
)

TINY = ModelConfig(
    img_size=16, patch_size=4, embed_dim=16, depth=3, num_heads=2, num_classes=7
)
PR = PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,))
TR = TrainConfig(batch_size=8, epochs=10, warmup_epochs=2)
B = 8


def _setup(pruning=PR):
    cfg = ExperimentConfig(model=TINY, pruning=pruning, train=TR)
    student = DiffPruningStudent(cfg=TINY, pruning=pruning)
    teacher = ViTTeacher(cfg=TINY)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (B, 16, 16, 3))
    labels = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 7)
    tx = make_optimizer(TR, steps_per_epoch=1)
    state = create_train_state(student, tx, jax.random.PRNGKey(2), imgs[:1])
    tparams = teacher.init(jax.random.PRNGKey(3), imgs[:1])["params"]
    return cfg, student, teacher, tx, state, tparams, imgs, labels


@pytest.mark.parametrize("cls_from_teacher", [False, True])
def test_cached_step_matches_live(cls_from_teacher):
    pruning = PR.replace(cls_from_teacher=cls_from_teacher)
    cfg, student, teacher, tx, state, tparams, imgs, labels = _setup(pruning)
    outputs_fn = make_teacher_outputs_fn(teacher, cfg)
    teacher_in = jax.jit(outputs_fn)(tparams, imgs)

    live = jax.jit(make_train_step(student, teacher, tx, cfg))
    cached = jax.jit(
        make_train_step(student, teacher, tx, cfg, cached_teacher=True)
    )
    rng, ep = jax.random.PRNGKey(7), jnp.float32(3.0)
    s_live, m_live = live(state, tparams, imgs, labels, rng, ep)
    s_cached, m_cached = cached(state, teacher_in, imgs, labels, rng, ep)

    # supervision is stored in bf16 -> small rounding in the loss is expected
    assert np.isclose(
        float(m_live["loss"]), float(m_cached["loss"]), rtol=2e-2, atol=2e-2
    )
    # params moved identically up to that rounding
    d_live = jax.tree.leaves(s_live.params)
    d_cached = jax.tree.leaves(s_cached.params)
    for a, b in zip(d_live, d_cached):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-2, atol=5e-3,
        )


def test_outputs_fn_keys():
    cfg, _, teacher, _, _, tparams, imgs, _ = _setup()
    out = jax.jit(make_teacher_outputs_fn(teacher, cfg))(tparams, imgs)
    # diff-pruning consumer: token supervision is cached as the
    # precomputed softmax + per-row entropy (not raw tokens)
    assert set(out) == {"logits", "token_probs", "token_entropy", "target"}
    n_patches = (16 // 4) ** 2
    assert out["target"].shape == (B, n_patches)
    assert out["token_probs"].shape == (B, n_patches, 16)
    assert out["token_entropy"].shape == (B, n_patches)
    np.testing.assert_allclose(
        np.asarray(out["token_probs"], np.float32).sum(-1), 1.0, atol=1e-2
    )
    # storage dtype follows the model: fp32 models keep fp32 supervision
    # (the cache switch must not silently quantize the objective)
    want_dt = (
        jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    )
    assert out["logits"].dtype == want_dt

    cfg2, _, teacher2, _, _, tp2, imgs2, _ = _setup(
        PR.replace(cls_from_teacher=True)
    )
    out2 = jax.jit(make_teacher_outputs_fn(teacher2, cfg2))(tp2, imgs2)
    assert set(out2) == {"logits", "token_probs", "token_entropy", "attns"}

    # gumbel consumer: its distill loss is a token MSE -> raw tokens stay
    cfg3, _, teacher3, _, _, tp3, imgs3, _ = _setup(
        PR.replace(selection="gumbel")
    )
    out3 = jax.jit(make_teacher_outputs_fn(teacher3, cfg3))(tp3, imgs3)
    assert set(out3) == {"logits", "tokens", "target"}


def test_cache_build_and_lookup():
    cfg, _, teacher, _, _, tparams, imgs, labels = _setup()
    outputs_fn = make_teacher_outputs_fn(teacher, cfg)
    indices = np.array([5, 11, 3, 42, 7])  # arbitrary global ids, odd count
    imgs_np = np.asarray(imgs)[: len(indices)]
    labels_np = np.asarray(labels)[: len(indices)]

    def loader(bs=2):
        def it():
            for b in range(0, len(indices), bs):
                sel = indices[b : b + bs]
                yield imgs_np[b : b + bs], labels_np[b : b + bs], sel

        return it

    cache = TeacherCache(indices)
    cache.build(outputs_fn, tparams, loader(), batch_size=2)
    assert cache.filled.all()
    assert cache.nbytes > 0

    # lookup in shuffled order must return each sample's own rows
    # (allclose, not equal: the cache was built at batch 2, the reference
    # in one batch — fp32 storage keeps the reduction-order noise that
    # bf16 storage used to round away)
    got = cache.lookup([42, 5])
    ref = jax.jit(outputs_fn)(tparams, imgs)
    np.testing.assert_allclose(
        np.asarray(got["logits"][1], np.float32),
        np.asarray(ref["logits"][0], np.float32), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got["logits"][0], np.float32),
        np.asarray(ref["logits"][3], np.float32), rtol=1e-5, atol=1e-6,
    )

    # unfilled coverage must raise, not silently train on garbage
    cache2 = TeacherCache(indices)

    def short_loader():
        yield imgs_np[:2], labels_np[:2], indices[:2]

    with pytest.raises(RuntimeError, match="unfilled"):
        cache2.build(outputs_fn, tparams, lambda: short_loader(), 2)


def test_device_resident_cache_matches_host_lookup():
    """to_device + lookup_device: on-device gather (incl. images/labels)
    must return exactly the host lookup's rows; only the index vector
    crosses the host->device link."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dense2sparse_vit_tpu.core.mesh import make_mesh

    cfg, _, teacher, _, _, tparams, imgs, labels = _setup()
    outputs_fn = make_teacher_outputs_fn(teacher, cfg)
    indices = np.array([5, 11, 3, 42, 7, 9, 13, 21])
    imgs_u8 = np.random.default_rng(0).integers(
        0, 255, (len(indices),) + np.asarray(imgs).shape[1:], dtype=np.uint8
    )
    labels_np = np.arange(len(indices), dtype=np.int32)

    def loader():
        for b in range(0, len(indices), 4):
            yield imgs_u8[b:b + 4], labels_np[b:b + 4], indices[b:b + 4]

    cache = TeacherCache(indices)
    cache.build(outputs_fn, tparams, lambda: loader(), 4, cache_images=True)
    assert "images" in cache._store and "labels" in cache._store
    # gathered batch length must divide the mesh's data axis (same
    # constraint as the global train batch)
    sel = [42, 9, 5, 13, 3, 21, 11, 7]
    host_rows = cache.lookup(sel)

    mesh = make_mesh()
    ok = cache.to_device(
        NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    )
    assert ok and cache.on_device and cache.device_has_images
    # host copies of moved keys are freed
    assert not cache._store

    got = cache.lookup_device(sel)
    assert set(got) == set(host_rows)
    for k in host_rows:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(host_rows[k]), err_msg=k
        )


def test_to_device_over_limit_falls_back():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dense2sparse_vit_tpu.core.mesh import make_mesh

    cfg, _, teacher, _, _, tparams, imgs, labels = _setup()
    outputs_fn = make_teacher_outputs_fn(teacher, cfg)
    indices = np.arange(1, 9)
    imgs_u8 = np.zeros((8,) + np.asarray(imgs).shape[1:], np.uint8)

    def loader():
        yield imgs_u8, np.zeros(8, np.int32), indices

    cache = TeacherCache(indices)
    cache.build(outputs_fn, tparams, lambda: loader(), 8, cache_images=True)
    teacher_bytes = sum(
        v.nbytes for k, v in cache._store.items()
        if k not in ("images", "labels")
    )
    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))

    # limit below even the teacher rows: stays host, images dropped
    assert not cache.to_device(repl, dsh, limit_bytes=1)
    assert not cache.on_device
    assert "images" not in cache._store and "labels" not in cache._store
    assert cache.lookup([1, 2])  # teacher rows still served host-side

    # limit that fits teacher rows but not images: partial residency
    cache2 = TeacherCache(indices)
    cache2.build(outputs_fn, tparams, lambda: loader(), 8, cache_images=True)
    assert cache2.to_device(repl, dsh, limit_bytes=teacher_bytes + 8)
    assert cache2.on_device and not cache2.device_has_images
    got = cache2.lookup_device([3, 1, 2, 4, 5, 6, 7, 8])
    assert "images" not in got and "logits" in got


def test_loader_with_indices(tmp_path):
    from PIL import Image

    from dense2sparse_vit_tpu.core.config import DataConfig
    from dense2sparse_vit_tpu.data import ImageFolder, eval_transform, make_loader

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), np.uint8)
            ).save(d / f"{i}.jpg")
    dcfg = DataConfig(imgnet_val_dir=str(tmp_path), eval_resize=20, eval_crop=16)
    ds = ImageFolder(str(tmp_path), eval_transform(dcfg, normalize=False))
    loader = make_loader(
        ds, 2, drop_last=False, with_indices=True, normalize_cfg=dcfg
    )
    seen = []
    for xb, yb, sel in loader():
        assert xb.shape[1:] == (16, 16, 3)
        assert xb.dtype == np.float32
        assert len(sel) == len(yb)
        seen.extend(int(i) for i in sel)
    assert sorted(seen) == list(range(6))


def test_mixup_guard(tmp_path):
    from dense2sparse_vit_tpu.core.config import DataConfig
    from dense2sparse_vit_tpu.train.loop import run_experiment

    cfg = ExperimentConfig(
        model=TINY,
        pruning=PR,
        train=TR.replace(teacher_cache=True),
        data=DataConfig(imgnet_val_dir=str(tmp_path), mixup=0.8),
    )
    with pytest.raises(ValueError, match="mixup"):
        run_experiment(cfg, str(tmp_path / "wd"))
