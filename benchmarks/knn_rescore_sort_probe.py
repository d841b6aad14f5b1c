"""Probe: does sorting each query's selected sub-chunk ids speed the
rescore gather?

The rescore gathers k (SUB, dpad) blocks per query in top-k order
(descending sub-max score = effectively random addresses). Sorting the
ids ascending per row makes each query's k gathers walk HBM in address
order, which could help the gather engine's prefetch. Costs one
(nq, k) int sort.

Run: python benchmarks/knn_rescore_sort_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from batchelor_tpu.ops.knn_pallas import (
    _chunked_view, _prep_pass1, _rescore_chunks, _select_subchunks,
)

N = 98304
D0 = 50
K = 20


def bench(fn, *args, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(out[1]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[1]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, D0)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(N, D0)).astype(np.float32))
    valid = jnp.ones((N,), dtype=bool)

    m_t = _prep_pass1(q, x, valid, False, False)
    top_sub = jax.block_until_ready(_select_subchunks(m_t, K)[:, :N])
    data3, dn2 = _chunked_view(x, valid)
    top_sorted = jax.block_until_ready(jnp.sort(top_sub, axis=0))

    t_plain = bench(_rescore_chunks, q, data3, dn2, top_sub, K)
    print(f"rescore, top-k order ids: {t_plain*1e3:.1f} ms", flush=True)
    t_sorted = bench(_rescore_chunks, q, data3, dn2, top_sorted, K)
    print(f"rescore, sorted ids:      {t_sorted*1e3:.1f} ms", flush=True)

    sort_jit = jax.jit(lambda t: jnp.sort(t, axis=0))
    t0 = time.perf_counter()
    _ = jax.block_until_ready(sort_jit(top_sub))
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.block_until_ready(sort_jit(top_sub))
    t_sort = time.perf_counter() - t0
    print(f"(nq, k) id sort itself:   {t_sort*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
