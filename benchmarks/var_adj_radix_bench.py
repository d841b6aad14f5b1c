"""adjust_shift_variance at scale on the real chip: radix vs sort quantile.

VERDICT r4 #3: record the weighted-quantile timing at 100k-400k cells.
Reference semantics: src/adjust_shift_variance.cpp:51-161. Inputs are
device-resident before timing (a fresh jnp.asarray per call times the
host->device transfer, not the kernel — that mistake produced the noisy
first-round numbers).

MEASURED (v5e, G=100, recorded in NOTES round-5): radix and sort time
identically (3.7/14.6/22.6/53.8 s at 100k/200k/250k/400k) — the kernel is
bound by its O(N^2 G) weight-matrix construction, so the exact sort is the
production default and the radix descent is opt-in
(quantile_method="radix").

Usage: python benchmarks/var_adj_radix_bench.py [N ...]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/batchelor_jax_cache")

import jax.numpy as jnp

from batchelor_tpu.ops.shift_variance import adjust_shift_variance

G = 100  # the reference vignette's classic-mode HVG count


def run(n, method):
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.normal(size=(n, G)).astype(np.float32))
    d2 = jnp.asarray((rng.normal(size=(n, G)) + 0.5).astype(np.float32))
    corr = jnp.asarray(rng.normal(size=(n, G)).astype(np.float32))
    out = adjust_shift_variance(d1, d2, corr, 0.5, quantile_method=method)
    float(jnp.sum(out[:1, :1]))          # warm-up/compile
    t0 = time.perf_counter()
    out = adjust_shift_variance(d1, d2, corr, 0.5, quantile_method=method)
    float(jnp.sum(out[:1, :1]))
    return time.perf_counter() - t0


def main():
    ns = [int(a) for a in sys.argv[1:]] or [100_000, 200_000, 250_000]
    print(f"backend={jax.default_backend()}", flush=True)
    for n in ns:
        for method in ("radix", "sort"):
            dt = run(n, method)
            print(json.dumps({
                "metric": f"var_adj_{method}_{n}", "value": round(dt, 2),
                "unit": "s",
            }), flush=True)


if __name__ == "__main__":
    main()
