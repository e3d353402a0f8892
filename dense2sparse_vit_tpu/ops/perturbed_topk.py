"""Differentiable perturbed top-k (Cordonnier et al., "Differentiable Patch
Selection for Image Recognition").

Semantics match the reference's custom autograd function
(/root/reference/vit_models/peturbed_topk.py:16-80): the forward pass is the
Monte-Carlo expectation over Gaussian perturbations of the one-hot top-k
indicator matrix; the backward pass is the expected noise-gradient estimator
    dL/dx[b,d] = (1/(nS*sigma)) * sum_n sum_k 1[idx(b,n,k)=d]
                  * g[b,k,d] * z[b,n,d].

TPU redesign: the reference materializes the (B, nS, k, N) one-hot tensor
(peturbed_topk.py:43) — ~3.4 GB at B=64, nS=500, K=137, N=196 — and einsums
against it. We never build it: the forward indicator is a scatter-add over
top-k indices, and the backward gathers noise/grad at those indices, so peak
memory is O(B*nS*N), and both passes are VPU-friendly gathers/scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _perturbed_topk_core(x, z, sigma, k_arr):
    return _forward(x, z, sigma, k_arr.shape[0])[0]


def _forward(x, z, sigma, k):
    """x: (B, N) scores; z: (B, nS, N) unit Gaussian noise; sigma: scalar."""
    B, N = x.shape
    nS = z.shape[1]
    perturbed = x[:, None, :] + sigma * z  # (B, nS, N)
    _, idx = jax.lax.top_k(perturbed, k)  # (B, nS, k)
    # reference sorts the indices ascending before one-hotting
    # (peturbed_topk.py:34) so the k rows follow spatial order
    idx = jnp.sort(idx, axis=-1)
    # indicators[b, j, d] = (1/nS) * sum_n 1[idx[b, n, j] == d]
    b_ix = jnp.broadcast_to(jnp.arange(B)[:, None, None], idx.shape)
    j_ix = jnp.broadcast_to(jnp.arange(k)[None, None, :], idx.shape)
    indicators = jnp.zeros((B, k, N), jnp.float32)
    indicators = indicators.at[b_ix, j_ix, idx].add(1.0 / nS)
    return indicators.astype(x.dtype), idx


def _fwd(x, z, sigma, k_arr):
    indicators, idx = _forward(x, z, sigma, k_arr.shape[0])
    return indicators, (z, sigma, idx)


def _bwd(res, g):
    z, sigma, idx = res
    B, nS, N = z.shape
    k = idx.shape[-1]
    b_ix = jnp.broadcast_to(jnp.arange(B)[:, None, None], idx.shape)
    j_ix = jnp.broadcast_to(jnp.arange(k)[None, None, :], idx.shape)
    # g[b, j, idx[b,n,j]] and z[b, n, idx[b,n,j]] at the selected positions
    g_sel = g.astype(jnp.float32)[b_ix, j_ix, idx]  # (B, nS, k)
    z_sel = jnp.take_along_axis(z.astype(jnp.float32), idx, axis=-1)
    contrib = g_sel * z_sel / (nS * sigma)
    grad_x = jnp.zeros((B, N), jnp.float32)
    grad_x = grad_x.at[b_ix, idx].add(contrib)
    return (
        grad_x.astype(g.dtype),
        jnp.zeros_like(z),
        jnp.zeros_like(sigma),
        None,
    )


_perturbed_topk_core.defvjp(_fwd, _bwd)


def perturbed_topk(
    key: jax.Array,
    x: jnp.ndarray,
    k: int,
    num_samples: int = 500,
    sigma=0.05,
) -> jnp.ndarray:
    """Expected top-k indicator matrix, differentiable in x.

    Args:
      key: PRNG key for the Gaussian perturbations.
      x: (B, N) per-token scores.
      k: static number of selected tokens.
      num_samples: Monte-Carlo sample count (reference default 500).
      sigma: perturbation std, may be a traced scalar; the reference decays it
        linearly over training (utils.py:95).

    Returns:
      (B, k, N) soft indicator matrix; each row ~ one-hot of a kept token,
      rows ordered by ascending token index (reference peturbed_topk.py:34).
    """
    B, N = x.shape
    z = jax.random.normal(key, (B, num_samples, N), jnp.float32)
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-12)
    # k is carried as a shape (custom_vjp args must be arrays / pytrees)
    k_arr = jnp.zeros((k,), jnp.int8)
    return _perturbed_topk_core(x.astype(jnp.float32), z, sigma, k_arr).astype(
        x.dtype
    )
