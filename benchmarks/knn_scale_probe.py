"""Bisection probe: query_knn at asymmetric (nq, nd) scales.

The (5M, 5M) kNN kernel-faults the axon worker (step-14 probe) while
(2.5M, 2.5M) runs clean. This drives query_knn alone at arbitrary
(nq, nd) with synthetic on-device data to find which side (data-scale
pass-1/selection vs query-scale scan piecing) carries the fault.

Usage: python benchmarks/knn_scale_probe.py nq nd [method] [k]
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/batchelor_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from batchelor_tpu.ops.knn import query_knn


def main():
    nq = int(sys.argv[1])
    nd = int(sys.argv[2])
    method = sys.argv[3] if len(sys.argv) > 3 else "bf16"
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    d = 50
    print(f"backend={jax.default_backend()} knn probe: nq={nq} nd={nd} "
          f"d={d} k={k} method={method} "
          f"MT_BUDGET={os.environ.get('BT_KNN_MT_BUDGET', 'default')}",
          flush=True)
    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    q = jax.random.normal(kq, (nq, d), jnp.float32)
    x = jax.random.normal(kd, (nd, d), jnp.float32)
    _ = float(jnp.sum(q[0, :1]) + jnp.sum(x[0, :1]))
    print("inputs on device", flush=True)
    t0 = time.perf_counter()
    idx, dist = query_knn(q, x, k, method=method)
    _ = float(jnp.sum(idx[:1, :1])) + float(jnp.sum(dist[:1, :1]))
    print(f"KNN OK in {time.perf_counter() - t0:.1f}s "
          f"(first idx {int(idx[0, 0])})", flush=True)


if __name__ == "__main__":
    main()
