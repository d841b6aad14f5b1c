"""Probe: union-gather rescore — dedupe sub-chunk gathers across queries.

The landed rescore (ops/knn_pallas.py:_rescore_chunks) gathers k (SUB, d)
blocks PER QUERY: nq*k slices. NOTES' granularity study showed slice count,
not bytes, limits the gather (8 KB: 194 ms / 84 GB/s vs 32 KB: 277 ms /
196 GB/s at 98304^2). Queries from the same cluster select heavily
overlapping sub-chunks, so grouping queries (sorted by their best
sub-chunk id) and gathering each group's DISTINCT union once should cut
the slice count by the sharing factor.

Exactness: each query's own k sub-chunks are in its group's union, and the
union is distinct, so per-query top-k over the union superset returns the
true top-k (an extra row beating the true k-th would itself be a true
top-k row, which selection already placed in the query's own sub-chunks).

Measures: union-size distribution over groups, old vs new rescore time,
and recall of the new path vs the landed one.

RESULT (98304^2, d=50, k=20, 4-cluster data, v5e): NEGATIVE. Union sizes
p50=424 / max=748 of 1280 slices/group — only ~1.7x dedup — while every
query must now score cap*SUB = 24576 candidates instead of 640 (38x
top_k width). Measured 4200 ms vs 311 ms per-query rescore (0.07x), exact
results identical. The sharing factor never beats the compute
amplification at any group size, so the per-query gather stays the landed
design; this file retains the full implementation for the record.

Usage: python benchmarks/knn_union_rescore_probe.py [N] [GROUP]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/batchelor_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import functools

import jax.numpy as jnp

from batchelor_tpu.ops import knn_pallas as kp

UNION_GROUP = 64     # queries per union-rescore group
SUB, RATIO, RESCORE_TILE = kp.SUB, kp.RATIO, kp.RESCORE_TILE
_pad_axis = kp._pad_axis
lax = jax.lax
functools = __import__("functools")


@functools.partial(jax.jit, static_argnames=("group",))
def _union_counts(top_sub, group: int):
    """Distinct sub-chunk count per group of ``group`` queries, after
    sorting queries by their best sub-chunk id. Sizes the union cap."""
    nq, kc = top_sub.shape
    order = jnp.argsort(top_sub[:, 0])
    ts = top_sub[order]
    npad = -(-nq // group) * group
    ts = jnp.pad(ts, ((0, npad - nq), (0, 0)), constant_values=2**30)
    gs = jnp.sort(ts.reshape(npad // group, group * kc), axis=1)
    fresh = jnp.concatenate(
        [jnp.ones((gs.shape[0], 1), bool), gs[:, 1:] != gs[:, :-1]], axis=1
    )
    return jnp.max(jnp.sum(fresh & (gs < 2**30), axis=1))


@functools.partial(jax.jit, static_argnames=("k", "cap", "group"))
def _rescore_union(query, data3, dn2, top_sub, k: int, cap: int, group: int):
    """Rescore via per-GROUP deduplicated sub-chunk unions.

    The per-query gather moves nq*k slices; slice count, not bytes, limits
    it (NOTES roofline: 8 KB slices 84 GB/s vs 32 KB 196 GB/s). Queries
    sorted by their best sub-chunk id share most of their candidates, so
    each group of ``group`` queries gathers its DISTINCT union (<= ``cap``
    ids) once and all of them rescore against it on the MXU.

    Exact: every query's own k sub-chunks are in its group's union (caller
    guarantees cap >= the true max distinct count via _union_counts), the
    union is duplicate-free, and any extra row outscoring a query's true
    k-th neighbour would itself be a true top-k row — which selection
    already placed in the query's own sub-chunks.
    """
    acc = jnp.float32
    nq, d0 = query.shape
    dpad = data3.shape[2]
    kc = top_sub.shape[1]
    sentinel = 2**30

    # one all-masked filler block: union padding gathers it, scores -inf
    filler = data3.shape[0]
    data3x = jnp.concatenate(
        [data3, jnp.zeros((1,) + data3.shape[1:], data3.dtype)], axis=0
    )
    dn2x = jnp.concatenate(
        [dn2, jnp.full((1, dn2.shape[1]), jnp.inf, dn2.dtype)], axis=0
    )

    order = jnp.argsort(top_sub[:, 0])
    q = _pad_axis(query.astype(acc), dpad, 1)[order]
    qn = jnp.sum(jnp.square(q), axis=1)
    ts = top_sub[order]

    npad = -(-nq // group) * group
    ngroups = npad // group
    qp = _pad_axis(q, group, 0).reshape(ngroups, group, dpad)
    ts = jnp.pad(ts, ((0, npad - nq), (0, 0)), constant_values=sentinel)

    # per-group distinct union, padded with the filler id
    gs = jnp.sort(ts.reshape(ngroups, group * kc), axis=1)
    fresh = jnp.concatenate(
        [jnp.ones((ngroups, 1), bool), gs[:, 1:] != gs[:, :-1]], axis=1
    )
    u = jnp.sort(jnp.where(fresh, gs, sentinel), axis=1)[:, :cap]
    u = jnp.where(u >= sentinel, filler, u)            # (ngroups, cap)

    offs = jnp.arange(SUB, dtype=jnp.int32)
    gtile = max(1, RESCORE_TILE // group)
    gpad = -(-ngroups // gtile) * gtile
    qp = jnp.pad(qp, ((0, gpad - ngroups), (0, 0), (0, 0)))
    up = jnp.pad(u, ((0, gpad - ngroups), (0, 0)), constant_values=filler)

    def rescore(args):
        qt, ut = args                               # (T, group, dpad), (T, cap)
        gx = data3x[ut]                             # (T, cap, SUB, dpad)
        gdn = dn2x[ut]                              # (T, cap, SUB)
        s = 2.0 * jnp.einsum(
            "tgd,tucd->tguc", qt, gx, preferred_element_type=acc,
            precision=jax.lax.Precision.HIGHEST,
        ) - gdn[:, None]                            # (T, group, cap, SUB)
        s = s.reshape(qt.shape[0], group, cap * SUB)
        cols = (ut[:, :, None] * SUB + offs[None, None, :]).reshape(
            qt.shape[0], 1, cap * SUB
        )
        vals, pos = lax.top_k(s, k)
        idx = jnp.take_along_axis(
            jnp.broadcast_to(cols, s.shape), pos, axis=2
        )
        return idx, vals

    idx, vals = lax.map(
        rescore,
        (
            qp.reshape(gpad // gtile, gtile, group, dpad),
            up.reshape(gpad // gtile, gtile, cap),
        ),
    )
    idx = idx.reshape(-1, k)[:nq]
    vals = vals.reshape(-1, k)[:nq]
    sq = jnp.maximum(qn[:, None] - vals, 0.0)
    # undo the query sort
    inv_idx = jnp.zeros((nq, k), idx.dtype).at[order].set(idx)
    inv_sq = jnp.zeros((nq, k), sq.dtype).at[order].set(sq)
    return inv_idx, inv_sq



N = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
GROUP = int(sys.argv[2]) if len(sys.argv) > 2 else 64
D = 50
K = 20


def force(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)[..., :1]))


def timeit(fn, reps=3):
    out = fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


@functools.partial(jax.jit, static_argnames=("group",))
def union_stats(top_sub, group: int):
    """Per-group distinct-sub-chunk counts (after sorting queries by their
    best sub-chunk id)."""
    nq, k = top_sub.shape
    order = jnp.argsort(top_sub[:, 0])
    ts = top_sub[order]
    npad = -(-nq // group) * group
    ts = jnp.pad(ts, ((0, npad - nq), (0, 0)), constant_values=2**30)
    g = ts.reshape(npad // group, group * k)
    gs = jnp.sort(g, axis=1)
    fresh = jnp.concatenate(
        [jnp.ones((gs.shape[0], 1), bool), gs[:, 1:] != gs[:, :-1]], axis=1
    )
    fresh = fresh & (gs < 2**30)
    return jnp.sum(fresh, axis=1)


def main():
    rng = np.random.default_rng(42)
    means = rng.normal(size=(4, D)).astype(np.float32)
    a1, a2 = rng.integers(0, 4, N), rng.integers(0, 4, N)
    q = jnp.asarray(means[a1] + rng.normal(size=(N, D)).astype(np.float32) * 0.5)
    x = jnp.asarray(
        means[a2]
        + rng.normal(size=(N, D)).astype(np.float32) * 0.5
        + (rng.normal(size=(1, D)) * 0.8).astype(np.float32)
    )
    valid = jnp.ones((N,), bool)

    m_t = kp._prep_pass1(q, x, valid)
    top_sub = kp._select_subchunks(m_t, K)[:N]
    _ = force(top_sub)

    counts = np.asarray(union_stats(top_sub, GROUP))
    print(
        f"N={N} group={GROUP}: union sizes min={counts.min()} "
        f"p50={np.percentile(counts, 50):.0f} p90={np.percentile(counts, 90):.0f} "
        f"max={counts.max()} (vs {GROUP * K} slices/group now, "
        f"{K} needed per query)",
        flush=True,
    )

    data3, dn2 = kp._chunked_view(x, valid)
    t_old, (idx_old, sq_old) = timeit(
        lambda: (force(kp._rescore_chunks(q, data3, dn2, top_sub, K)[1]),
                 kp._rescore_chunks(q, data3, dn2, top_sub, K))[1]
    )
    print(f"old per-query rescore: {t_old * 1e3:.1f} ms", flush=True)

    if True:
        cap = int(np.max(counts))
        cap = -(-cap // 128) * 128
        t_new, (idx_new, sq_new) = timeit(
            lambda: (force(_rescore_union(q, data3, dn2, top_sub, K, cap, GROUP)[1]),
                     _rescore_union(q, data3, dn2, top_sub, K, cap, GROUP))[1]
        )
        print(f"union rescore (cap={cap}): {t_new * 1e3:.1f} ms "
              f"({t_old / t_new:.2f}x)", flush=True)
        so, sn = np.asarray(sq_old), np.asarray(sq_new)
        io_, in_ = np.asarray(idx_old), np.asarray(idx_new)
        dist_match = np.mean(np.isclose(np.sort(so, 1), np.sort(sn, 1),
                                        rtol=1e-5, atol=1e-5))
        idx_match = np.mean(np.sort(io_, 1) == np.sort(in_, 1))
        print(f"distance match {dist_match:.6f}  index match {idx_match:.6f}",
              flush=True)


if __name__ == "__main__":
    main()
