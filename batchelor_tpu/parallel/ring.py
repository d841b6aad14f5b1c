"""Ring-rotated cross-batch kNN: the ring-attention analog for cells.

For the 10M+-cell regime the all-gathered opposing batch (N x d) stops
fitting comfortably in HBM (SURVEY.md §5 "long-context analog"). Here each
device keeps only its shard; data blocks rotate around the ring via
lax.ppermute while every device merges a running top-k of its local query
rows against the visiting block. Peak memory per device: one shard + the
(S1, k) running best — independent of total N.

Equivalent to query_knn against the all-gathered set (same selection,
including tie order by global index, because blocks are visited in
ascending source order via the reversed ring).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.knn import query_knn
from .mesh import CELLS_AXIS

__all__ = ["ring_query_knn_local"]


def ring_query_knn_local(
    qshard: jnp.ndarray,
    dshard: jnp.ndarray,
    dvalid: jnp.ndarray,
    k: int,
    n_devices: int,
    axis: str = CELLS_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-device body (call inside shard_map): k nearest rows of the
    *global* data (sharded as ``dshard`` blocks) for each local query row.

    Returns (global_indices (S1, k), distances). Visits blocks in
    ascending source-device order so tie-breaking matches the all-gather
    path.
    """
    s2 = dshard.shape[0]
    my = lax.axis_index(axis)

    # walk the ring so that at step t we hold the block of device (my + t):
    # send each block to the *previous* device every step.
    perm = [(i, (i - 1) % n_devices) for i in range(n_devices)]

    def step(carry, t):
        block, bvalid, best_s, best_i = carry
        src = (my + t) % n_devices
        res = query_knn(qshard, block, min(k, s2), data_mask=bvalid, squared=True)
        cand_i = res.indices + src * s2
        cand_s = -res.distances  # larger = closer, for the merge
        all_s = jnp.concatenate([best_s, cand_s], axis=1)
        all_i = jnp.concatenate([best_i, cand_i.astype(best_i.dtype)], axis=1)
        # stable merge: prefer earlier entries (lower source device) on ties
        top_s, pos = lax.top_k(all_s, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        block = lax.ppermute(block, axis, perm)
        bvalid = lax.ppermute(bvalid, axis, perm)
        return (block, bvalid, top_s, top_i), None

    init = (
        dshard,
        dvalid,
        jnp.full((qshard.shape[0], k), -jnp.inf, jnp.float32),
        jnp.zeros((qshard.shape[0], k), jnp.int32),
    )
    (block, bvalid, best_s, best_i), _ = lax.scan(
        step, init, jnp.arange(n_devices), length=n_devices
    )
    return best_i, jnp.sqrt(jnp.maximum(-best_s, 0.0))
