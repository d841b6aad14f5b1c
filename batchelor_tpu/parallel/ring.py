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

__all__ = [
    "ring_query_knn_local",
    "ring_membership",
    "ring_segment_reduce",
    "ring_weighted_gather",
]


def ring_query_knn_local(
    qshard: jnp.ndarray,
    dshard: jnp.ndarray,
    dvalid: jnp.ndarray,
    k: int,
    n_devices: int,
    axis: str = CELLS_AXIS,
    method: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-device body (call inside shard_map): k nearest rows of the
    *global* data (sharded as ``dshard`` blocks) for each local query row.

    Returns (global_indices (S1, k), distances). Visits blocks starting
    from the local one, so tie-breaking can differ from the all-gather
    path (which always prefers the lowest global index) — distances match.
    """
    s2 = dshard.shape[0]
    my = lax.axis_index(axis)

    # walk the ring so that at step t we hold the block of device (my + t):
    # send each block to the *previous* device every step.
    perm = [(i, (i - 1) % n_devices) for i in range(n_devices)]

    def step(carry, t):
        block, bvalid, best_s, best_i = carry
        src = (my + t) % n_devices
        res = query_knn(qshard, block, min(k, s2), data_mask=bvalid,
                        squared=True, method=method)
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
        jnp.full((qshard.shape[0], k), -jnp.inf,
                 jnp.promote_types(qshard.dtype, jnp.float32)),
        jnp.zeros((qshard.shape[0], k), jnp.int32),
    )
    (block, bvalid, best_s, best_i), _ = lax.scan(
        step, init, jnp.arange(n_devices), length=n_devices
    )
    return best_i, jnp.sqrt(jnp.maximum(-best_s, 0.0))


def ring_membership(
    l2r: jnp.ndarray,
    r2l_shard: jnp.ndarray,
    my_ids: jnp.ndarray,
    s2: int,
    n_devices: int,
    axis: str = CELLS_AXIS,
) -> jnp.ndarray:
    """mutual[i, p] = my_ids[i] in r2l[l2r[i, p]] with r2l sharded by right
    cells — the MNN membership test (reference src/find_mutual_nns.cpp:7-41)
    without all-gathering the (N2, k1) neighbour table.

    The r2l blocks rotate around the ring; each visit resolves the l2r
    entries that land in the visiting block's global range. Row-chunked so
    the (chunk, k2, k1) gather stays bounded.
    """
    nsl, k2 = l2r.shape
    k1 = r2l_shard.shape[1]
    my = lax.axis_index(axis)
    perm = [(i, (i - 1) % n_devices) for i in range(n_devices)]
    chunk = max(1, min(nsl, (1 << 22) // max(1, k1 * k2)))
    nblk = -(-nsl // chunk)
    pad = nblk * chunk - nsl
    l2r_p = jnp.pad(l2r, ((0, pad), (0, 0)), constant_values=-1)
    ids_p = jnp.pad(my_ids, (0, pad), constant_values=-1)

    def step(carry, t):
        block, mut = carry
        lo = ((my + t) % n_devices) * s2

        def blk(args):
            rows, ids = args                    # (C, k2), (C,)
            inr = (rows >= lo) & (rows < lo + s2)
            safe = jnp.clip(rows - lo, 0, s2 - 1)
            hit = jnp.any(block[safe] == ids[:, None, None], axis=-1)
            return hit & inr

        m = lax.map(
            blk, (l2r_p.reshape(nblk, chunk, k2), ids_p.reshape(nblk, chunk))
        ).reshape(-1, k2)[:nsl]
        mut = mut | m
        block = lax.ppermute(block, axis, perm)
        return (block, mut), None

    init = (r2l_shard, jnp.zeros((nsl, k2), bool))
    (_, mut), _ = lax.scan(step, init, jnp.arange(n_devices), length=n_devices)
    return mut


def ring_segment_reduce(
    l_rows: jnp.ndarray,
    l2r: jnp.ndarray,
    mutual: jnp.ndarray,
    s2: int,
    n_devices: int,
    axis: str = CELLS_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ring reduce-scatter of per-pair left-row sums into right-cell
    segments: returns (lsums (S2, d), counts (S2,)) for the *local* right
    shard, fully reduced over all devices.

    The accumulator for shard s starts at device s, walks the whole ring
    collecting each device's contribution, and arrives home reduced —
    per-device memory O(S2 x d), independent of the global cell count
    (the constant-memory analog of the psummed (N2, d) segment_sum in
    driver._step_local).
    """
    d = l_rows.shape[1]
    dt = l_rows.dtype
    my = lax.axis_index(axis)
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]

    from ..ops.correction import pair_segment_sums

    def step(carry, t):
        lsums, counts = carry
        s = (my - t) % n_devices            # shard this accumulator serves
        lo = s * s2
        dl, dc = pair_segment_sums(l_rows, l2r, mutual, s2, lo=lo)
        lsums = lax.ppermute(lsums + dl, axis, perm)
        counts = lax.ppermute(counts + dc, axis, perm)
        return (lsums, counts), None

    init = (jnp.zeros((s2, d), dt), jnp.zeros((s2,), dt))
    (lsums, counts), _ = lax.scan(
        step, init, jnp.arange(n_devices), length=n_devices
    )
    return lsums, counts


def ring_weighted_gather(
    idx: jnp.ndarray,
    w: jnp.ndarray,
    table_shard: jnp.ndarray,
    s2: int,
    n_devices: int,
    axis: str = CELLS_AXIS,
) -> jnp.ndarray:
    """sum_p w[:, p] * table[idx[:, p]] where ``table`` is sharded by right
    cells (the tricube-weighted correction apply with a distributed
    correction table; cf. driver._step_local's avg2[idx] einsum)."""
    nr, kk = idx.shape
    my = lax.axis_index(axis)
    perm = [(i, (i - 1) % n_devices) for i in range(n_devices)]

    def step(carry, t):
        block, out = carry
        lo = ((my + t) % n_devices) * s2

        def inner(acc, inp):
            col, wp = inp                   # (nr,), (nr,)
            inr = (col >= lo) & (col < lo + s2)
            safe = jnp.clip(col - lo, 0, s2 - 1)
            return acc + jnp.where(inr, wp, 0.0)[:, None] * block[safe], None

        out, _ = lax.scan(inner, out, (idx.T, w.T))
        block = lax.ppermute(block, axis, perm)
        return (block, out), None

    init = (table_shard, jnp.zeros((nr, table_shard.shape[1]), table_shard.dtype))
    (_, out), _ = lax.scan(step, init, jnp.arange(n_devices), length=n_devices)
    return out
