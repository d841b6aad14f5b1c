"""Probe: rescore-gather chunk size for the exact two-pass kNN.

The pass-2 rescore gathers kc=k whole (CHUNK, d) data blocks per query row
(~64 GB at 98304^2, k=20, d=64-padded) and runs at ~200 GB/s effective.
Halving CHUNK halves the gathered bytes but also halves the slice size
(32 KB -> 16 KB), which the TPU memory system may punish. This probe times
query_knn_tpu at a given KNN_CHUNK (env, default 128) in a fresh process.

Usage: KNN_CHUNK=64 python benchmarks/knn_chunk_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("KNN_N", 98304))
D = int(os.environ.get("KNN_D", 50))
K = int(os.environ.get("KNN_K", 20))
CHUNK = int(os.environ.get("KNN_CHUNK", 128))


def main():
    import jax
    import jax.numpy as jnp

    from batchelor_tpu.ops import knn_pallas

    knn_pallas.CHUNK = CHUNK  # must happen before any trace in this process

    rng = np.random.default_rng(0)
    q = jax.device_put(jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)))
    x = jax.device_put(jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)))

    def run():
        res = knn_pallas.query_knn_tpu(q, x, K, squared=True)
        return float(jnp.sum(res.distances) + jnp.sum(res.indices))

    t0 = time.perf_counter()
    chk = run()
    print(f"CHUNK={CHUNK}: warmup+compile {time.perf_counter()-t0:.1f}s checksum={chk:.6g}", flush=True)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(f"CHUNK={CHUNK}: N={N} d={D} k={K} best {best*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
