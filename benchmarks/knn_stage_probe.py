"""Stage-level bisection of the query_knn fault at large nq.

Replicates _knn_two_pass stage by stage with a hard sync between stages
(pass-1 scan + selection | chunked view | rescore) so the axon worker
fault localizes to one stage.

Usage: python benchmarks/knn_stage_probe.py nq nd [method]
"""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/batchelor_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from batchelor_tpu.ops import knn_pallas as kp


def sync(tag, x, t0):
    _ = float(jnp.sum(x[:1, :1] if x.ndim >= 2 else x[:1]))
    print(f"{tag}: +{time.perf_counter() - t0:.1f}s", flush=True)
    return time.perf_counter()


def main():
    nq = int(sys.argv[1])
    nd = int(sys.argv[2])
    method = sys.argv[3] if len(sys.argv) > 3 else "bf16"
    k, d = 20, 50
    bf16 = method == "bf16"
    print(f"backend={jax.default_backend()} stage probe: nq={nq} nd={nd} "
          f"MT_BUDGET={kp.MT_BUDGET}", flush=True)
    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    query = jax.random.normal(kq, (nq, d), jnp.float32)
    data = jax.random.normal(kd, (nd, d), jnp.float32)
    valid = jnp.ones((nd,), bool)
    t0 = sync("inputs", query, time.perf_counter())

    ndp = -(-nd // kp.DT) * kp.DT
    nqp = -(-nq // kp.QT) * kp.QT
    npieces = max(1, -(-(4 * (ndp // kp.SUB) * nqp) // kp.MT_BUDGET))
    qchunk = kp.QT * (-(-(-(-nq // npieces)) // kp.QT))
    npieces = -(-nq // qchunk)
    print(f"npieces={npieces} qchunk={qchunk} "
          f"m_t piece bytes={4 * (ndp // kp.SUB) * qchunk:,}", flush=True)
    qs_stack = jnp.pad(
        query, ((0, npieces * qchunk - nq), (0, 0))
    ).reshape(npieces, qchunk, d)
    t0 = sync("qs_stack", qs_stack, t0)

    def piece(carry, qs):
        m_t = kp._prep_pass1(qs, data, valid, False, bf16, False)
        return carry, kp._select_subchunks(m_t, k, False)

    _, tops = jax.lax.scan(piece, 0, qs_stack)
    t0 = sync("pass1+select scan", tops, t0)
    top_sub = tops.reshape(npieces * qchunk, -1)[:nq]
    data3, dn2 = kp._chunked_view(data, valid)
    t0 = sync("chunked view", data3, t0)
    idx, sq = kp._rescore_chunks(query, data3, dn2, top_sub, k)
    t0 = sync("rescore", idx, t0)
    print(f"ALL OK (first idx {int(idx[0, 0])})", flush=True)


if __name__ == "__main__":
    main()
