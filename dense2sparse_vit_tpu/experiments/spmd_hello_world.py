"""SPMD hello world: multi-device training without a cluster.

Parity: reference ddp_hello_world.py — a toy convnet trained both
single-device and data-parallel to validate the distributed setup
(:77-129,190-200). The torch version spawns one process per GPU and wires
NCCL by hand; the TPU-native version is the SAME jitted train step run under
two device placements — the mesh is the only difference, XLA inserts the
gradient all-reduce. Run on CPU with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to simulate 8 devices (the JAX-native "multi-node without a cluster").
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dense2sparse_vit_tpu.core.mesh import make_mesh


class ToyConvNet(nn.Module):
    """Small convnet in the spirit of the reference's CIFAR10 net
    (ddp_hello_world.py:34-60)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(16, (3, 3), name="conv1")(x))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(32, (3, 3), name="conv2")(x))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(64, name="fc1")(x))
        return nn.Dense(self.num_classes, name="fc2")(x)


def make_synthetic_data(n=256, img=16, classes=10, seed=0):
    """Separable synthetic data so a few steps show real learning."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, classes, n)
    base = rng.normal(size=(classes, img, img, 3)).astype(np.float32)
    images = base[labels] + 0.3 * rng.normal(size=(n, img, img, 3)).astype(
        np.float32
    )
    return jnp.asarray(images), jnp.asarray(labels)


def train(images, labels, *, mesh=None, steps=20, lr=1e-2, seed=0):
    """Train the toy net; with a mesh, batch is sharded over 'data'."""
    model = ToyConvNet()
    params = model.init(jax.random.PRNGKey(seed), images[:1])["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        images = jax.device_put(
            images, NamedSharding(mesh, P("data", None, None, None))
        )
        labels = jax.device_put(labels, NamedSharding(mesh, P("data")))

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            logp = jax.nn.log_softmax(logits)
            loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))
            acc = jnp.mean(jnp.argmax(logits, -1) == y)
            return loss, acc

        (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    history = []
    for _ in range(steps):
        params, opt_state, loss, acc = step(params, opt_state, images, labels)
    return params, float(loss), float(acc)


def main():  # pragma: no cover - demo entry
    images, labels = make_synthetic_data()
    _, loss1, acc1 = train(images, labels, mesh=None)
    print(f"single-device: loss={loss1:.4f} acc={acc1:.2%}")
    mesh = make_mesh()
    _, loss8, acc8 = train(images, labels, mesh=mesh)
    print(
        f"{mesh.shape['data']}-device SPMD: loss={loss8:.4f} acc={acc8:.2%}"
    )
    assert abs(loss1 - loss8) < 1e-3, "SPMD must match single-device math"
    print("OK: data-parallel SPMD matches single-device training")


if __name__ == "__main__":  # pragma: no cover
    main()
