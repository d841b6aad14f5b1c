"""Replay the 10M run's final (5M x 5M) phased merge step with synthetic
on-device data and hard per-phase synchronization (BT_PHASE_DEBUG).

The full config-5 pipeline crashes the axon TPU worker somewhere inside
step 14; with async dispatch the pipeline run cannot localize which phase
faults (the error surfaces at whatever call the host has reached when the
worker death is noticed). This probe builds the exact step inputs
synthetically on device (no multi-GB tunnel transfers), then drives the
phased `stepped` with a completion barrier after every phase, so the
faulting program is the one named by the last log line.

Usage: python benchmarks/step14_probe.py [n_per_side] [knn_method]
Defaults: 5_000_000 bf16 (the exact step-14 shape).
"""
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("BT_PHASE_DEBUG", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/batchelor_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from batchelor_tpu.parallel import driver as drv
from batchelor_tpu.parallel.mesh import make_cells_mesh


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    method = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    nb = 16
    d = 50
    emax = nb - 1
    print(f"backend={jax.default_backend()} step14 probe: {n} x {n}, d={d}, "
          f"knn_method={method}", flush=True)

    mesh = make_cells_mesh(1)
    step = drv._jitted_step(
        mesh, 20, 20, 20, 3.0, 0.0, method, "gather", nb, "phases"
    )

    key = jax.random.PRNGKey(0)
    kl, kr = jax.random.split(key)
    # clustered structure so the MNN phases do real work
    gen = jax.jit(
        lambda k, shift: (
            jax.random.normal(k, (n, d), jnp.float32)
            + shift * jnp.ones((1, d), jnp.float32)
        )
    )
    ldata = gen(kl, 0.0)
    rdata = gen(kr, 1.0)
    ones = jnp.ones((n,), bool)
    lorig = jnp.zeros((n,), jnp.int32)
    rorig = jnp.ones((n,), jnp.int32)
    lex = jnp.zeros((emax, d), jnp.float32)
    rex = jnp.zeros((emax, d), jnp.float32)
    _ = float(jnp.sum(ldata[0, :1]) + jnp.sum(rdata[0, :1]))
    print("inputs materialized on device", flush=True)

    t0 = time.perf_counter()
    out = step(ldata, rdata, ones, ones, ones, ones, lorig, rorig, lex, rex)
    mag = float(out[3])
    npairs = int(out[4])
    print(
        f"STEP OK in {time.perf_counter() - t0:.1f}s: magnitude={mag:.4f} "
        f"pairs={npairs}",
        flush=True,
    )


if __name__ == "__main__":
    main()
