"""Measure XLA chunk-gather throughput vs slice size on the real TPU.

The exact-kNN rescore gathers (kc, SUB, 64) fp32 blocks per query row.
At SUB=128 (32 KB slices) the measured rate is ~234 GB/s independent of
index locality. If smaller slices hold their rate, selecting chunks at
finer granularity cuts rescore bytes proportionally: the top-k-chunks
exactness argument is granularity-independent (any chunk whose min
distance beats the k-th best contains a true neighbour, and there are at
most k of those at ANY chunk size), so SUB=32 rescores 4x fewer bytes.

Run: python benchmarks/knn_gather_granularity.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 98304
D = 64
K = 20


def timeit(fn, *args, n=4, warmup=1):
    for _ in range(warmup):
        float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    for sub in (256, 128, 64, 32, 16):
        c = N // sub
        data3 = data.reshape(c, sub, D)
        # same TOTAL bytes for every granularity: kc slices such that
        # kc * sub == K * 128 candidate rows per query
        kc = K * 128 // sub
        ids = jnp.asarray(rng.integers(0, c, size=(N, kc)).astype(np.int32))

        @jax.jit
        def gather_reduce(tc, data3=data3):
            def f(t):
                return jnp.sum(data3[t], axis=(1, 2, 3))
            return lax.map(f, tc.reshape(-1, 4096, tc.shape[1])).reshape(-1)

        t = timeit(gather_reduce, ids)
        gb = N * kc * sub * D * 4 / 1e9
        print(
            f"SUB={sub:4d} ({sub*D*4//1024:3d} KB slices, kc={kc:3d}): "
            f"{t*1e3:7.1f} ms  {gb/t:6.0f} GB/s eff",
            flush=True,
        )

        # and the exact-work variant: kc = K chunks at every granularity
        # (what the finer-granularity rescore would actually move)
        ids_k = jnp.asarray(rng.integers(0, c, size=(N, K)).astype(np.int32))
        t2 = timeit(gather_reduce, ids_k)
        gb2 = N * K * sub * D * 4 / 1e9
        print(
            f"          kc={K} (true workload)    : "
            f"{t2*1e3:7.1f} ms  {gb2/t2:6.0f} GB/s eff",
            flush=True,
        )


if __name__ == "__main__":
    main()
