"""Int8 serving-path tests (ops/pallas/quant.py + Block/ModelConfig wiring).

Three layers of evidence:
  1. kernel vs independent jnp twin (interpret mode): the Pallas plumbing
     computes exactly the specified PTQ math;
  2. quantized vs fp32 block: int8 error is bounded (per-channel weights +
     per-row activations keep relative error at the sub-percent level);
  3. model level: a quant="int8" student dispatches to the int8 kernel on
     the deterministic dense path only, and its logits track the bf16/fp32
     student's closely enough to preserve rankings on random weights.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dense2sparse_vit_tpu.ops.pallas.quant as Q
from dense2sparse_vit_tpu.ops.pallas.quant import (
    _ref_quant_block,
    fused_transformer_block_int8,
    quantize_block_params,
    quantize_weight,
)


def _params(key, c, hidden, dtype=jnp.float32):
    ks = jax.random.split(key, 6)

    def w(k, shape):
        return (0.05 * jax.random.normal(k, shape)).astype(dtype)

    return {
        "ln1_scale": jnp.ones((c,), dtype) * 1.1,
        "ln1_bias": jnp.zeros((c,), dtype) + 0.01,
        "wqkv": w(ks[0], (c, 3 * c)),
        "bqkv": (0.01 * jax.random.normal(ks[1], (3 * c,))).astype(dtype),
        "wproj": w(ks[2], (c, c)),
        "bproj": jnp.zeros((c,), dtype),
        "ln2_scale": jnp.ones((c,), dtype) * 0.9,
        "ln2_bias": jnp.zeros((c,), dtype) - 0.02,
        "w1": w(ks[3], (c, hidden)),
        "b1": jnp.zeros((hidden,), dtype) + 0.005,
        "w2": w(ks[4], (hidden, c)),
        "b2": jnp.zeros((c,), dtype),
    }


class TestQuantizeWeight:
    def test_roundtrip_error_bounded(self):
        w = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (64, 96))
        q, s = quantize_weight(w)
        assert q.dtype == jnp.int8
        deq = q.astype(jnp.float32) * s
        # symmetric per-channel: |err| <= scale/2 per element
        assert float(jnp.max(jnp.abs(deq - w) / s)) <= 0.5 + 1e-6

    def test_per_channel_scales(self):
        w = jnp.ones((8, 4)) * jnp.array([0.1, 1.0, 10.0, 0.5])
        _, s = quantize_weight(w)
        np.testing.assert_allclose(
            np.asarray(s[0]), np.array([0.1, 1.0, 10.0, 0.5]) / 127.0,
            rtol=1e-6,
        )


class TestKernelVsTwin:
    @pytest.mark.parametrize("n", [16, 13])  # aligned and padded
    def test_interpret_matches_reference(self, n):
        c, h, heads = 32, 64, 2
        p = _params(jax.random.PRNGKey(1), c, h)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, n, c))
        got = fused_transformer_block_int8(
            x, p, heads, block_batch=2, interpret=True
        )
        want = _ref_quant_block(x, p, heads)
        # identical quantized integers by construction; remaining delta is
        # fp32 accumulation order between per-head and batched-head dots
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_prequantized_params_accepted(self):
        c, h, heads = 32, 64, 2
        p = _params(jax.random.PRNGKey(3), c, h)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, c))
        qp = quantize_block_params(p)
        a = fused_transformer_block_int8(x, p, heads, interpret=True)
        b = fused_transformer_block_int8(x, qp, heads, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


class TestQuantizationError:
    def test_int8_block_tracks_fp32_block(self):
        from dense2sparse_vit_tpu.ops.pallas.block import _ref_block

        c, h, heads = 64, 128, 4
        p = _params(jax.random.PRNGKey(5), c, h)
        x = jax.random.normal(jax.random.PRNGKey(6), (4, 24, c))
        q8 = np.asarray(_ref_quant_block(x, p, heads))
        fp = np.asarray(_ref_block(x, p, heads, None, None, 1e-6))
        # relative RMS error of the residual-stream update: int8 with
        # per-channel + per-row scales stays at the few-percent level
        err = np.sqrt(np.mean((q8 - fp) ** 2)) / (np.std(fp) + 1e-9)
        assert err < 0.05, f"int8 block error too large: {err:.4f}"


class TestModelWiring:
    def _student(self, quant):
        from dense2sparse_vit_tpu.core.config import (
            ModelConfig,
            PruningConfig,
        )
        from dense2sparse_vit_tpu.models import DiffPruningStudent

        cfg = ModelConfig(
            img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            num_classes=5, use_fused_attention=True, quant=quant,
        )
        return DiffPruningStudent(
            cfg=cfg,
            pruning=PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,)),
        )

    def test_int8_requires_fused(self):
        from dense2sparse_vit_tpu.core.config import ModelConfig

        with pytest.raises(ValueError, match="use_fused_attention"):
            ModelConfig(quant="int8", use_fused_attention=False)
        with pytest.raises(ValueError, match="quant"):
            ModelConfig(quant="fp4")

    @staticmethod
    def _interpret_all(monkeypatch):
        """Force interpret mode on every kernel a fused student reaches on
        CPU (the test_pallas_block monkeypatch pattern, extended to the
        gather/predictor kernels the eval path uses)."""
        import dense2sparse_vit_tpu.ops.pallas.attention as A
        import dense2sparse_vit_tpu.ops.pallas.block as BLK
        import dense2sparse_vit_tpu.ops.pallas.gather as G
        import dense2sparse_vit_tpu.ops.pallas.predictor as P

        for mod, name in [
            (A, "fused_attention_packed"),
            (BLK, "fused_transformer_block"),
            (P, "fused_predictor_lg"),
        ]:
            monkeypatch.setattr(
                mod, name,
                functools.partial(getattr(mod, name), interpret=True),
            )
        # custom_vjp: positional args only
        orig_gather = G.fused_gather_tokens
        monkeypatch.setattr(
            G, "fused_gather_tokens",
            lambda x, idx, block_batch=8, interpret=False:
                orig_gather(x, idx, block_batch, True),
        )

    def test_student_dispatches_to_int8_kernel(self, monkeypatch):
        calls = []
        orig = Q.fused_transformer_block_int8

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw, interpret=True)

        monkeypatch.setattr(Q, "fused_transformer_block_int8", spy)
        self._interpret_all(monkeypatch)

        student = self._student("int8")
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 32, 3))
        variables = student.init(jax.random.PRNGKey(8), x)
        out = student.apply(variables, x, collect_cls_attns=False)
        assert calls, "int8 student never reached the int8 kernel"
        assert bool(jnp.all(jnp.isfinite(out.logits)))

        # the CLS-attn scoring block (return_cls_attn) and any policy-mask
        # call must NOT be quantized: count < total block applications
        fp_student = self._student("none")
        fp_out = fp_student.apply(variables, x, collect_cls_attns=False)
        # same weights: logits must track closely (tiny 2-block model)
        a = np.asarray(out.logits, np.float32)
        b = np.asarray(fp_out.logits, np.float32)
        cos = float(
            (a * b).sum()
            / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        )
        assert cos > 0.99, f"int8 logits diverged: cos={cos:.4f}"

    def test_vanilla_deit_threads_quant(self, monkeypatch):
        """The zoo-wide threading: a plain DeiT (the dense serving
        baseline) built with quant='int8' also dispatches to the int8
        kernel on its deterministic forward."""
        from dense2sparse_vit_tpu.models import create_model

        calls = []
        orig = Q.fused_transformer_block_int8

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw, interpret=True)

        monkeypatch.setattr(Q, "fused_transformer_block_int8", spy)
        self._interpret_all(monkeypatch)
        model = create_model(
            "deit_small_patch16_224",
            img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            num_classes=5, use_fused_attention=True, quant="int8",
        )
        x = jax.random.normal(jax.random.PRNGKey(11), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(12), x)
        logits = model.apply(variables, x, deterministic=True)
        assert calls, "vanilla DeiT never reached the int8 kernel"
        assert bool(jnp.all(jnp.isfinite(jnp.asarray(logits))))

    def test_int8_export_roundtrip(self, monkeypatch):
        from dense2sparse_vit_tpu.utils.export import (
            export_student,
            load_exported,
        )

        monkeypatch.setattr(
            Q, "fused_transformer_block_int8",
            functools.partial(
                Q.fused_transformer_block_int8, interpret=True
            ),
        )
        self._interpret_all(monkeypatch)
        student = self._student("int8")
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 32, 3))
        variables = student.init(jax.random.PRNGKey(10), x)
        fn = load_exported(export_student(student, variables, batch_size=2))
        got = np.asarray(fn(x))
        want = np.asarray(
            student.apply(
                variables, x, collect_cls_attns=False
            ).logits.astype(jnp.float32)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
