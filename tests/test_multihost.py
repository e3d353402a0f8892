"""Multi-host (2 processes x 4 CPU devices) dryrun.

The JAX-native "multi-node without a cluster" test, replacing the
reference's single-node DDP smoke test (ddp_hello_world.py:190-200): two OS
processes join one jax.distributed cluster over localhost, build a global
data=4 x model=2 mesh, assemble global batches from per-host rows, and run
jitted train steps. Both processes must agree on the (replicated) loss, and
it must match a single-process 8-device run of the same computation.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


pytestmark = pytest.mark.slow


def test_two_process_train_step_matches_single_process():
    import portpicker

    port = portpicker.pick_unused_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    l0, l1 = outs[0]["losses"], outs[1]["losses"]
    # replicated metrics: every host reads the same global loss
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    # cached-teacher host-row branch: both hosts agree and it's finite
    np.testing.assert_allclose(
        outs[0]["cached_loss"], outs[1]["cached_loss"], rtol=1e-6
    )

    # single-process reference on the in-process 8-device CPU mesh
    # (conftest forces xla_force_host_platform_device_count=8)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dense2sparse_vit_tpu.core.config import (
        ExperimentConfig,
        ModelConfig,
        PruningConfig,
        TrainConfig,
    )
    from dense2sparse_vit_tpu.core.mesh import make_mesh
    from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
    from dense2sparse_vit_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

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
    xb = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3)), img_sh
    )
    yb = jax.device_put(jnp.arange(8) % 10, lbl_sh)
    tx = make_optimizer(cfg.train, steps_per_epoch=4)
    state = create_train_state(
        student, tx, jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3))
    )
    tparams = teacher.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 3))
    )["params"]
    state = jax.device_put(state, repl)
    tparams = jax.device_put(tparams, repl)
    step = jax.jit(
        make_train_step(student, teacher, tx, cfg), donate_argnums=(0,)
    )
    want = []
    for _ in range(2):
        state, metrics = step(
            state, tparams, xb, yb, jax.random.PRNGKey(3), jnp.float32(1.0)
        )
        want.append(float(metrics["loss"]))
    np.testing.assert_allclose(l0, want, rtol=1e-5, atol=1e-6)
