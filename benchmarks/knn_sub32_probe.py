"""Prototype: 32-row sub-chunk selection for the exact kNN rescore.

The gather-granularity probe (knn_gather_granularity.py) showed the
rescore's true workload moves 2.2x faster at 8 KB (32-row) slices than the
current 32 KB (128-row) ones, because only k chunks are gathered per query
regardless of granularity. The blocker was Mosaic rejecting lane-dim
reshapes below 128 in pass 1 ("(QT, 16, 64) max" shape cast). This probe
restructures pass 1 to compute the score block TRANSPOSED — (DT, QT) via
dot_general with contraction on the feature dim — so the 32-row grouping
is a *leading-dim* reshape + sublane reduction, which Mosaic supports.

Selection stays hierarchical and exact:
  1. m32 -> m128 by maxing groups of 4 sub-chunks (XLA, fused).
  2. top-k 128-chunks (the existing exactness argument).
  3. within those k chunks' 4k sub-chunks, top-k sub-chunks by sub-max:
     the k sub-maxes are k distinct scores, so the k-th largest is a lower
     bound on the k-th best overall (all true top-k live in the candidate
     set by step 2), and every true neighbour's sub-chunk clears it.
  4. rescore k sub-chunks of 32 rows (4x fewer bytes than 128-row chunks).

Run on the real TPU: python benchmarks/knn_sub32_probe.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from batchelor_tpu.ops.knn_pallas import (
    CHUNK, DT, QT, _pad_axis, _prep_pass1, query_knn_tpu,
)
from batchelor_tpu.ops.topk_pallas import topk_rows

SUB = 32


def _chunkmax32_kernel(q_ref, d_ref, dn_ref, m_ref):
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # transposed scores: (DT, QT) = 2 d.q^T - ||d||^2 column
    s_t = 2.0 * lax.dot_general(
        d_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ) - dn_ref[:]
    m_ref[:] = jnp.max(s_t.reshape(DT // SUB, SUB, QT), axis=1)


@functools.partial(jax.jit, static_argnames=())
def chunk_max32(query, data, dn_col):
    nq, d = query.shape
    nd = data.shape[0]
    grid = (nq // QT, nd // DT)
    return pl.pallas_call(
        _chunkmax32_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QT, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DT, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DT, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((DT // SUB, QT), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nd // SUB, nq), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * nd * d,
            bytes_accessed=(nq * d + nd * d + nq * (nd // SUB)) * 4,
            transcendentals=0,
        ),
    )(query, data, dn_col)


@jax.jit
def _prep32(query, data, data_valid):
    nq, d0 = query.shape
    dpad = 64 if d0 <= 64 else -(-d0 // 128) * 128
    q = _pad_axis(_pad_axis(query.astype(jnp.float32), QT, 0), dpad, 1)
    x = _pad_axis(_pad_axis(data.astype(jnp.float32), DT, 0), dpad, 1)
    dn = jnp.sum(jnp.square(x), axis=1)
    valid = _pad_axis(data_valid, DT, 0, value=False)
    dn = jnp.where(valid, dn, jnp.inf)
    m_t = chunk_max32(q, x, dn[:, None])  # (C32, nq_pad)
    return m_t.T[:nq]


@functools.partial(jax.jit, static_argnames=("k",))
def _select32(m32, k: int):
    nq, c32 = m32.shape
    m128 = jnp.max(m32.reshape(nq, c32 // 4, 4), axis=2)
    _, top_chunks = topk_rows(m128, k)                       # (nq, k)
    sub = jnp.take_along_axis(
        m32.reshape(nq, c32 // 4, 4), top_chunks[:, :, None], axis=1
    )                                                        # (nq, k, 4)
    sub_ids = (top_chunks[:, :, None] * 4
               + jnp.arange(4, dtype=jnp.int32)[None, None, :]).reshape(nq, 4 * k)
    _, pos = topk_rows(sub.reshape(nq, 4 * k), k)
    return jnp.take_along_axis(sub_ids, pos, axis=1)         # (nq, k)


@jax.jit
def _chunked_view32(data, data_valid):
    d0 = data.shape[1]
    dpad = 64 if d0 <= 64 else -(-d0 // 128) * 128
    x = _pad_axis(_pad_axis(data.astype(jnp.float32), DT, 0), dpad, 1)
    dn = jnp.sum(jnp.square(x), axis=1)
    valid = _pad_axis(data_valid, DT, 0, value=False)
    dn = jnp.where(valid, dn, jnp.inf)
    return x.reshape(-1, SUB, dpad), dn.reshape(-1, SUB)


RESCORE_TILE = 512


@functools.partial(jax.jit, static_argnames=("k",))
def _rescore32(query, data3, dn2, top_sub, k: int):
    nq, d0 = query.shape
    dpad = data3.shape[2]
    kc = top_sub.shape[1]
    q = _pad_axis(query.astype(jnp.float32), dpad, 1)
    qn = jnp.sum(jnp.square(q), axis=1)
    nq_pad = -(-nq // RESCORE_TILE) * RESCORE_TILE
    qp = _pad_axis(q, RESCORE_TILE, 0)
    tcp = _pad_axis(top_sub, RESCORE_TILE, 0)
    ntiles = nq_pad // RESCORE_TILE
    offs = jnp.arange(SUB, dtype=jnp.int32)

    def rescore(args):
        qt, ct = args
        gx = data3[ct]                              # (T, kc, 32, dpad)
        gdn = dn2[ct]
        s = 2.0 * jnp.einsum(
            "td,tkcd->tkc", qt, gx, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) - gdn
        s = s.reshape(qt.shape[0], kc * SUB)
        cols = (ct[:, :, None] * SUB + offs[None, None, :]).reshape(
            qt.shape[0], kc * SUB
        )
        vals, pos = lax.top_k(s, k)
        idx = jnp.take_along_axis(cols, pos, axis=1)
        return idx, vals

    idx, vals = lax.map(
        rescore,
        (qp.reshape(ntiles, RESCORE_TILE, dpad),
         tcp.reshape(ntiles, RESCORE_TILE, kc)),
    )
    idx = idx.reshape(-1, k)[:nq]
    vals = vals.reshape(-1, k)[:nq]
    sq = jnp.maximum(qn[:, None] - vals, 0.0)
    return idx, sq


def knn32(query, data, k, valid):
    m32 = _prep32(query, data, valid)
    top_sub = _select32(m32, k)
    data3, dn2 = _chunked_view32(data, valid)
    return _rescore32(query, data3, dn2, top_sub, k)


def timeit(fn, n=4, warmup=1):
    for _ in range(warmup):
        r = fn()
        jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    K = 20

    # --- correctness at 8192 ---
    n = 8192
    d = 50
    q = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    valid = jnp.ones((n,), dtype=bool)

    m32 = np.asarray(_prep32(q, x, valid))
    m128_ref = np.asarray(_prep_pass1(q, x, valid))
    m128_new = m32.reshape(n, -1, 4).max(axis=2)
    print("m128 reconstruction max |diff|:",
          np.abs(m128_new - m128_ref[:, : m128_new.shape[1]]).max(), flush=True)

    idx32, sq32 = knn32(q, x, K, valid)
    ref = query_knn_tpu(q, x, K, squared=True)
    d_new = np.sort(np.asarray(sq32), axis=1)
    d_ref = np.sort(np.asarray(ref.distances), axis=1)
    print("sorted sq-dist max |diff| vs chunked:",
          np.abs(d_new - d_ref).max(), flush=True)

    # --- timing at 98304 ---
    n = 98304
    q = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    valid = jnp.ones((n,), dtype=bool)

    t = timeit(lambda: _prep32(q, x, valid))
    print(f"pass1 (32-granular, transposed): {t*1e3:7.1f} ms", flush=True)
    m32 = _prep32(q, x, valid)
    t = timeit(lambda: _select32(m32, K))
    print(f"hierarchical select:             {t*1e3:7.1f} ms", flush=True)
    top_sub = _select32(m32, K)
    data3, dn2 = _chunked_view32(x, valid)
    t = timeit(lambda: _rescore32(q, data3, dn2, top_sub, K))
    print(f"rescore (SUB=32):                {t*1e3:7.1f} ms", flush=True)
    t = timeit(lambda: knn32(q, x, K, valid))
    print(f"TOTAL knn32:                     {t*1e3:7.1f} ms", flush=True)
    t = timeit(lambda: query_knn_tpu(q, x, K, squared=True))
    print(f"TOTAL current chunked:           {t*1e3:7.1f} ms", flush=True)

    idx32, sq32 = knn32(q, x, K, valid)
    ref = query_knn_tpu(q, x, K, squared=True)
    d_new = np.sort(np.asarray(sq32), axis=1)
    d_ref = np.sort(np.asarray(ref.distances), axis=1)
    print("98k sorted sq-dist max |diff|:",
          np.abs(d_new - d_ref).max(), flush=True)


if __name__ == "__main__":
    main()
