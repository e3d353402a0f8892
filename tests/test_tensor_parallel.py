"""Tensor-parallel sharding tests: TP numerics must match replicated."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.core.mesh import make_mesh
from dense2sparse_vit_tpu.models import DiffPruningStudent
from dense2sparse_vit_tpu.parallel.tensor_parallel import (
    param_partition_spec,
    shard_params,
)

TINY = ModelConfig(
    img_size=16, patch_size=4, embed_dim=32, depth=2, num_heads=2,
    num_classes=7,
)


class TestPartitionSpecs:
    def test_block_matmuls_are_sharded(self):
        two_d = jnp.zeros((8, 8))
        assert param_partition_spec("blocks_0/attn/qkv/kernel", two_d) == P(
            None, "model"
        )
        assert param_partition_spec("blocks_0/attn/proj/kernel", two_d) == P(
            "model", None
        )
        assert param_partition_spec("blocks_3/mlp/fc1/kernel", two_d) == P(
            None, "model"
        )
        assert param_partition_spec("blocks_3/mlp/fc2/kernel", two_d) == P(
            "model", None
        )

    def test_everything_else_replicated(self):
        assert param_partition_spec("pos_embed", jnp.zeros((1, 5, 8))) == P()
        assert param_partition_spec("head/kernel", jnp.zeros((8, 8))) == P()
        assert param_partition_spec(
            "blocks_0/norm1/scale", jnp.zeros((8,))
        ) == P()
        assert param_partition_spec(
            "score_predictor_0/in_0/dense/kernel", jnp.zeros((8, 8))
        ) == P()


class TestTPNumerics:
    def test_tp_forward_matches_replicated(self):
        model = DiffPruningStudent(
            cfg=TINY, pruning=PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,))
        )
        imgs = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
        params = model.init(jax.random.PRNGKey(1), imgs)["params"]

        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x).logits)
        want = fwd(params, imgs)

        mesh = make_mesh(data=4, model=2)
        params_tp = shard_params(params, mesh)
        imgs_tp = jax.device_put(
            imgs, NamedSharding(mesh, P("data", None, None, None))
        )
        got = fwd(params_tp, imgs_tp)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )
        # qkv kernels really are distributed over the model axis
        qkv = params_tp["blocks_0"]["attn"]["qkv"]["kernel"]
        assert qkv.sharding.spec == P(None, "model")


class TestParallelHelpers:
    def test_host_local_batch(self):
        from dense2sparse_vit_tpu.parallel import host_local_batch
        import pytest as _pytest

        mesh = make_mesh()
        assert host_local_batch(64, mesh) == 8
        with _pytest.raises(ValueError):
            host_local_batch(63, mesh)

    def test_all_reduce_mean_under_shard_map(self):
        from functools import partial

        from jax import shard_map

        from dense2sparse_vit_tpu.parallel import all_reduce_mean

        mesh = make_mesh()
        x = jnp.arange(8.0)

        @partial(
            shard_map, mesh=mesh, in_specs=P("data"), out_specs=P("data")
        )
        def f(xs):
            return all_reduce_mean({"v": xs})["v"]

        out = f(x)
        np.testing.assert_allclose(np.asarray(out), np.full(8, 3.5))

    def test_batch_and_replicated_shardings(self):
        from dense2sparse_vit_tpu.parallel import (
            batch_sharding,
            replicated_sharding,
        )

        mesh = make_mesh()
        bs = batch_sharding(mesh, ndim=2)
        assert bs.spec == P("data", None)
        assert replicated_sharding(mesh).spec == P()
