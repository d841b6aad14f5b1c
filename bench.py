"""Benchmark harness: fastMNN merge throughput on one chip.

Runs BASELINE.json config 1 (two-batch fastMNN, 2 x 5k simulated cells,
d=50, k=20) end to end — cosine norm, Gram-matrix multi-batch PCA, and the
fused on-device merge step — and reports cells/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the north-star anchor derived from BASELINE.json ("10M cells,
16 batches, <2 min on v5e-64"): 10e6 cells / 120 s / 64 chips
~= 1302 cells/sec/chip.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PER_BATCH = int(os.environ.get("BENCH_CELLS", 5000))
N_GENES = int(os.environ.get("BENCH_GENES", 2000))
D = 50
K = 20
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))
NORTH_STAR_CELLS_PER_SEC_PER_CHIP = 10e6 / 120.0 / 64.0


def main():
    import jax
    import jax.numpy as jnp

    from batchelor_tpu.correct.fused import fused_merge_step
    from batchelor_tpu.ops.cosine_norm import apply_cosine_norm, l2_norms
    from batchelor_tpu.ops.pca import multi_batch_pca

    rng = np.random.default_rng(42)
    means = rng.normal(size=(4, N_GENES)).astype(np.float32)
    assign1 = rng.integers(0, 4, N_PER_BATCH)
    assign2 = rng.integers(0, 4, N_PER_BATCH)
    b1 = (means[assign1] + rng.normal(size=(N_PER_BATCH, N_GENES)) * 0.5).astype(np.float32)
    b2 = (
        means[assign2]
        + rng.normal(size=(N_PER_BATCH, N_GENES)) * 0.5
        + rng.normal(size=(1, N_GENES)) * 0.8
    ).astype(np.float32)

    db1 = jax.device_put(jnp.asarray(b1))
    db2 = jax.device_put(jnp.asarray(b2))

    @jax.jit
    def pipeline(x1, x2):
        n1 = apply_cosine_norm(x1, l2_norms(x1))
        n2 = apply_cosine_norm(x2, l2_norms(x2))
        pca = multi_batch_pca([n1, n2], d=D, method="randomized")
        out = fused_merge_step(pca.components[0], pca.components[1], K, K)
        # scalar checksum: forces full execution with a tiny host transfer
        # (block_until_ready is unreliable over the axon tunnel)
        return jnp.sum(out.right) + out.n_pairs.astype(jnp.float32)

    _ = float(pipeline(db1, db2))  # warmup/compile

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(pipeline(db1, db2))
        times.append(time.perf_counter() - t0)

    elapsed = min(times)
    total_cells = 2 * N_PER_BATCH
    cells_per_sec = total_cells / elapsed
    print(
        json.dumps(
            {
                "metric": "fastmnn_cells_per_sec_per_chip",
                "value": round(cells_per_sec, 1),
                "unit": "cells/s/chip (2x%dk cells, %d genes, d=%d, k=%d)"
                % (N_PER_BATCH // 1000, N_GENES, D, K),
                "vs_baseline": round(cells_per_sec / NORTH_STAR_CELLS_PER_SEC_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
