"""Per-stage roofline probe of the exact two-pass kNN on the real TPU.

Times each stage of ops/knn_pallas.py's SUB=32 pipeline at 98304^2, d=50,
k=20 and reports achieved bandwidth/FLOP rates against v5e ceilings:
HBM ~819 GB/s, MXU ~197 TFLOP/s bf16 (fp32 Precision.HIGHEST runs the MXU
in multi-pass mode; its effective ceiling is ~1/6 of bf16, ~33 TFLOP/s).

Run: python benchmarks/knn_rescore_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batchelor_tpu.ops import knn_pallas as kp

N = 98304
D = 50
K = 20

HBM_PEAK = 819e9          # v5e bytes/s
MXU_BF16 = 197e12         # v5e FLOP/s
MXU_FP32 = MXU_BF16 / 6   # Precision.HIGHEST multi-pass


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        _force(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn())
        best = min(best, time.perf_counter() - t0)
    return best


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
    dpad = 64

    m32 = jax.block_until_ready(kp._prep_pass1(query, data, valid))
    top_sub = jax.block_until_ready(kp._select_subchunks(m32, K)[:, :N])
    data3, dn2 = kp._chunked_view(data, valid)

    # pass 1: matmul FLOPs dominate (2 N^2 dpad fp32-HIGHEST)
    t = timeit(lambda: kp._prep_pass1(query, data, valid))
    fl = 2 * N * N * dpad
    print(f"pass1 sub-chunk max : {t*1e3:7.1f} ms  "
          f"{fl/t/1e12:5.1f} TFLOP/s fp32-HIGHEST "
          f"({fl/t/MXU_FP32*100:4.1f}% of fp32 MXU ceiling)", flush=True)

    # selection: topk over (N, C128) + (N, 4k); traffic ~ m32 + m128 reads
    t = timeit(lambda: kp._select_subchunks(m32, K))
    by = (m32.size + m32.size // 4) * 4 * 2
    print(f"hierarchical select : {t*1e3:7.1f} ms  "
          f"{by/t/1e9:5.0f} GB/s ({by/t/HBM_PEAK*100:4.1f}% of HBM peak)",
          flush=True)

    # rescore: gathers N*K (SUB, dpad) fp32 blocks + writes (N, k) outputs
    t = timeit(lambda: kp._rescore_chunks(query, data3, dn2, top_sub, K))
    by = N * K * kp.SUB * dpad * 4
    print(f"rescore (SUB=32)    : {t*1e3:7.1f} ms  "
          f"{by/t/1e9:5.0f} GB/s gather ({by/t/HBM_PEAK*100:4.1f}% of HBM peak)",
          flush=True)

    t = timeit(lambda: kp.query_knn_tpu(query, data, K, squared=True).distances)
    print(f"TOTAL exact 98k^2   : {t*1e3:7.1f} ms  "
          f"({N/t/1e3:.0f}k queries/s)", flush=True)

    t = timeit(
        lambda: kp.query_knn_tpu(query, data, K, squared=True, bf16=True).distances
    )
    print(f"TOTAL bf16-select   : {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
