"""1M-cell atlas demonstration: 8 batches x 125k cells on one chip.

Single-chip scale demo for BASELINE config 4/5: distributed_fast_mnn on a
1-device mesh with shape-bucketed padding (compile reuse across the 7 merge
steps). Prints per-step diagnostics and the end-to-end wall time.

Usage: python benchmarks/atlas_1m.py [knn_method] [cells_per_batch]
(defaults: bf16, 125000). Timing materializes a device-side scalar
(NOTES.md measurement discipline).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

# persistent compile cache: reruns of the same shapes skip XLA entirely
jax.config.update("jax_compilation_cache_dir", "/tmp/batchelor_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from batchelor_tpu.parallel.driver import distributed_fast_mnn
from batchelor_tpu.parallel.mesh import make_cells_mesh


def main():
    method = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 125_000
    nb = 8
    d = 50
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} {nb}x{n} cells, d={d}, "
          f"knn_method={method}", flush=True)

    # clustered toy atlas: shared cell types + per-batch shift
    means = rng.normal(size=(10, d)).astype(np.float32) * 2.0
    batches = []
    for b in range(nb):
        assign = rng.integers(0, 10, n)
        x = means[assign] + rng.normal(size=(n, d)).astype(np.float32) * 0.6
        x += rng.normal(size=(1, d)).astype(np.float32) * 0.5
        batches.append(jnp.asarray(x))

    mesh = make_cells_mesh(1)
    t0 = time.perf_counter()
    res = distributed_fast_mnn(
        batches, mesh, k=20, knn_method=method, pad_buckets=True,
        collect_pairs=False, progress=True,
    )
    # force: device-side scalar
    _ = float(jnp.sum(jnp.asarray(res.corrected[:1, :1])))
    elapsed = time.perf_counter() - t0
    for i, info in enumerate(res.merge_info):
        print(f"step {i}: left={info.left} right={info.right} "
              f"batch_size={info.batch_size:.3f} skipped={info.skipped}",
              flush=True)
    total = nb * n
    print(f"total: {elapsed:.1f} s  ({total/elapsed/1e3:.1f}k cells/s/chip, "
          f"{total} cells)", flush=True)


if __name__ == "__main__":
    main()
