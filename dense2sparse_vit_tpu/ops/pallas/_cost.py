"""Symbolic-shape-safe CostEstimate construction.

`pl.CostEstimate` requires python ints; under `jax.export` with a symbolic
batch dimension the shape-derived FLOP counts become `_DimExpr`s and the
constructor raises — which used to break symbolic-batch serving export
(observed: bench_serve fell back to fixed-batch artifacts). The scheduler
hint is optional, so under symbolic shapes we simply omit it.
"""

from __future__ import annotations

from jax.experimental import pallas as pl


def safe_cost_estimate(*, flops, bytes_accessed, transcendentals):
    """pl.CostEstimate when every field is concrete, else None."""
    try:
        return pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(bytes_accessed),
            transcendentals=int(transcendentals),
        )
    except Exception:
        return None
