"""Worker for the 2-process x 4-device CPU multi-host dryrun test.

Usage: python multihost_worker.py <process_id> <port>

Proves the DCN-side path the reference implements with mp.spawn + NCCL
(ddp_training.py:4-8): jax.distributed.initialize, a global mesh spanning
both processes (data=4 x model=2), per-host batch assembly with
put_global_batch / put_global_batch_from_full, and a jitted train step whose
loss comes back identical (and replicated) on every host.
"""

import json
import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS_EXTRA", "")
)

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from dense2sparse_vit_tpu.core.config import (  # noqa: E402
    ExperimentConfig,
    ModelConfig,
    PruningConfig,
    TrainConfig,
)
from dense2sparse_vit_tpu.core.mesh import (  # noqa: E402
    make_mesh,
    process_local_indices,
    put_global_batch,
    put_global_batch_from_full,
)
from dense2sparse_vit_tpu.models import (  # noqa: E402
    DiffPruningStudent,
    ViTTeacher,
)
from dense2sparse_vit_tpu.train import (  # noqa: E402
    create_train_state,
    make_optimizer,
    make_train_step,
)

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

mesh = make_mesh(data=4, model=2)
repl = NamedSharding(mesh, P())
img_sh = NamedSharding(mesh, P("data", None, None, None))
lbl_sh = NamedSharding(mesh, P("data"))

mcfg = ModelConfig(
    img_size=16, patch_size=8, embed_dim=16, depth=2, num_heads=2,
    num_classes=10,
)
cfg = ExperimentConfig(
    model=mcfg,
    pruning=PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,)),
    train=TrainConfig(batch_size=8, epochs=2, warmup_epochs=0),
)
student = DiffPruningStudent(cfg=mcfg, pruning=cfg.pruning)
teacher = ViTTeacher(cfg=mcfg)

GB = 8  # global batch
xb_full = np.asarray(
    jax.random.normal(jax.random.PRNGKey(0), (GB, 16, 16, 3))
)
yb_full = np.arange(GB) % 10

# per-host slice, loop.py-style (each host decodes only its rows)
local = GB // jax.process_count()
xb = put_global_batch(img_sh, xb_full[pid * local:(pid + 1) * local])
yb = put_global_batch(lbl_sh, yb_full[pid * local:(pid + 1) * local])
assert xb.shape == (GB, 16, 16, 3)

# replicate params across hosts (loop.py _repl path)
tx = make_optimizer(cfg.train, steps_per_epoch=4)
state = create_train_state(
    student, tx, jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3))
)
tparams = teacher.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 3)))[
    "params"
]
state = jax.tree.map(
    lambda a: put_global_batch_from_full(repl, a), jax.device_get(state)
)
tparams = jax.tree.map(
    lambda a: put_global_batch_from_full(repl, a), jax.device_get(tparams)
)

step = jax.jit(make_train_step(student, teacher, tx, cfg), donate_argnums=(0,))
losses = []
for i in range(2):
    state, metrics = step(
        state, tparams, xb, yb, jax.random.PRNGKey(3), jnp.float32(1.0)
    )
    losses.append(float(metrics["loss"]))

# eval-style full-batch placement path: every shard holds exactly the rows
# its global index says it should
xb2 = put_global_batch_from_full(img_sh, xb_full)
for sh in xb2.addressable_shards:
    np.testing.assert_allclose(np.asarray(sh.data), xb_full[sh.index])

# cached-teacher HOST-ROW branch under multi-host (the device-resident
# fast path is single-host only): each process caches ONLY its own index
# shard, looks rows up host-side, and assembles the global teacher batch
# with put_global_batch — loop.py's nproc>1 teacher-cache configuration
from dense2sparse_vit_tpu.train.teacher_cache import (  # noqa: E402
    TeacherCache,
    make_teacher_outputs_fn,
)

local_idx = np.arange(pid * local, (pid + 1) * local)
xb_local = xb_full[local_idx]


def _cache_loader():
    yield xb_local, yb_full[local_idx].astype(np.int32), local_idx


tcache = TeacherCache(local_idx)
tcache.build(
    make_teacher_outputs_fn(teacher, cfg),
    jax.device_get(tparams), lambda: _cache_loader(), local,
)
teacher_in = {
    k: put_global_batch(lbl_sh, v)
    for k, v in tcache.lookup(local_idx).items()
}
cached_step = jax.jit(
    make_train_step(student, teacher, tx, cfg, cached_teacher=True),
    donate_argnums=(0,),
)
state, metrics = cached_step(
    state, teacher_in, xb, yb, jax.random.PRNGKey(4), jnp.float32(1.0)
)
cached_loss = float(metrics["loss"])
assert np.isfinite(cached_loss)

print(
    json.dumps({"pid": pid, "losses": losses, "cached_loss": cached_loss}),
    flush=True,
)
