"""Probe the exact-kNN pass-2 rescore bottleneck on the real TPU.

Current exact two-pass at 98304^2, d=50, k=20: pass1 ~121 ms, chunk top-k
~34 ms, rescore ~270-330 ms. The rescore gathers (kc=20) whole (128, 64)
fp32 chunks per query row = 64 GB of 32 KB slices at ~196 GB/s effective.

Questions:
  1. Is the gather bandwidth-bound or slice-overhead bound?
     (compare random vs sorted vs sequential chunk ids)
  2. How fast is the segment-matmul alternative (sort pairs by chunk,
     data-stationary MXU matmul, scatter scores back)?

Run: python benchmarks/knn_rescore_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batchelor_tpu.ops import knn_pallas as kp

N = 98304
D = 50
K = 20
CHUNK = 128
C = N // CHUNK


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _force(out)
    return (time.perf_counter() - t0) / n


def _force(out):
    if isinstance(out, (tuple, list)):
        for o in out:
            _force(o)
    else:
        float(jnp.sum(out.astype(jnp.float32)))


def main():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    query = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    valid = jnp.ones((N,), bool)

    # pass 1 + chunk top-k (reuse library)
    m = kp._prep_pass1(query, data, valid)
    from batchelor_tpu.ops.topk_pallas import topk_rows
    _, top_chunks = topk_rows(m, K)
    top_chunks = jax.block_until_ready(top_chunks)
    data3, dn2 = kp._chunked_view(data, valid)

    t_p1 = timeit(lambda: kp._prep_pass1(query, data, valid))
    t_tk = timeit(lambda: topk_rows(m, K)[1])
    print(f"pass1 chunk-max: {t_p1*1e3:.1f} ms "
          f"({2*N*N*64/t_p1/1e12:.1f} TFLOP/s fp32-HIGHEST)", flush=True)
    print(f"chunk top-k:     {t_tk*1e3:.1f} ms", flush=True)

    # baseline rescore
    t_rs = timeit(lambda: kp._rescore_chunks(query, data3, dn2, top_chunks, K))
    gb = N * K * CHUNK * 64 * 4 / 1e9
    print(f"rescore (random ids):    {t_rs*1e3:.1f} ms ({gb/t_rs:.0f} GB/s eff)",
          flush=True)

    # 1. sorted chunk ids
    tc_sorted = jnp.sort(top_chunks, axis=1)
    t_rs_s = timeit(lambda: kp._rescore_chunks(query, data3, dn2, tc_sorted, K))
    print(f"rescore (sorted ids):    {t_rs_s*1e3:.1f} ms ({gb/t_rs_s:.0f} GB/s eff)",
          flush=True)

    # 2. sequential ids (best-case locality)
    tc_seq = jnp.tile(jnp.arange(K, dtype=top_chunks.dtype)[None, :], (N, 1))
    t_rs_q = timeit(lambda: kp._rescore_chunks(query, data3, dn2, tc_seq, K))
    print(f"rescore (sequential ids):{t_rs_q*1e3:.1f} ms ({gb/t_rs_q:.0f} GB/s eff)",
          flush=True)

    # 3. raw gather alone (no compute): how much is the gather itself?
    @jax.jit
    def gather_only(tc):
        return data3[tc]  # (N, K, 128, 64)

    # can't materialize 64 GB — gather per tile and reduce
    @jax.jit
    def gather_reduce(tc):
        def f(args):
            (t,) = args
            return jnp.sum(data3[t], axis=(1, 2, 3))
        return lax.map(f, (tc.reshape(-1, 4096, K),)).reshape(-1)

    t_g = timeit(lambda: gather_reduce(top_chunks))
    print(f"gather+reduce only:      {t_g*1e3:.1f} ms ({gb/t_g:.0f} GB/s eff)",
          flush=True)

    t_gs = timeit(lambda: gather_reduce(tc_sorted))
    print(f"gather+reduce sorted:    {t_gs*1e3:.1f} ms ({gb/t_gs:.0f} GB/s eff)",
          flush=True)


if __name__ == "__main__":
    main()
