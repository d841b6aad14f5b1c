"""Probe: pass-1 selection precision for the SUB=32 exact kNN.

The pass-1 sub-chunk-max matmul currently runs Precision.HIGHEST on fp32
inputs = 6 bf16 MXU passes (exact fp32 emulation). Precision.HIGH = 3
passes (~2x the matmul rate) with error ~2^-21 relative — far tighter
than the bf16 mode's ~2^-8 but not bit-exact. Since pass 2 rescores the
selected sub-chunks in exact fp32, HIGH selection can only miss a true
neighbour when an approximate sub-chunk max drops a sub-chunk out of the
top-k *and* the true k-th score sits within ~1e-6 relative of the cut —
i.e. near-exact ties.

This probe measures, at 98304^2 d=50 k=20 on one v5e chip:
  1. pass-1 kernel time: HIGHEST vs HIGH vs bf16.
  2. full-pipeline recall of HIGH selection vs HIGHEST selection.

Run: python benchmarks/knn_pass1_precision_probe.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from batchelor_tpu.ops.knn_pallas import (
    CHUNK, DT, QT, SUB, _knn_two_pass, _pad_axis, _prep_pass1,
    _select_subchunks, _chunked_view, _rescore_chunks,
)

N = 98304
D0 = 50
K = 20


def make_kernel(precision):
    dn = (((1,), (1,)), ((), ()))

    def kern(q_ref, d_ref, dn_ref, m_ref):
        if precision == "high3":
            # manual 3-pass bf16 (what Precision.HIGH lowers to on XLA:TPU;
            # Mosaic rejects HIGH directly): a = hi + lo with hi = bf16(a),
            # then a.b ~= hi_a.hi_b + hi_a.lo_b + lo_a.hi_b (drop lo.lo,
            # ~2^-16 relative). Error ~2^-21 relative vs bf16's ~2^-8.
            q = q_ref[:]
            d = d_ref[:]
            qh = q.astype(jnp.bfloat16)
            dh = d.astype(jnp.bfloat16)
            ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
            dl = (d - dh.astype(jnp.float32)).astype(jnp.bfloat16)
            dot = lambda a, b: lax.dot_general(
                a, b, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            s = dot(dh, qh) + dot(dh, ql) + dot(dl, qh)
        else:
            s = lax.dot_general(
                d_ref[:], q_ref[:], dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        s_t = 2.0 * s - dn_ref[:]
        m_ref[:] = jnp.max(s_t.reshape(DT // SUB, SUB, QT), axis=1)
    return kern


@functools.partial(jax.jit, static_argnames=("precision",))
def pass1(query, data, data_valid, precision):
    nq, d0 = query.shape
    dpad = 64 if d0 <= 64 else -(-d0 // 128) * 128
    q = _pad_axis(_pad_axis(query.astype(jnp.float32), QT, 0), dpad, 1)
    x = _pad_axis(_pad_axis(data.astype(jnp.float32), DT, 0), dpad, 1)
    dn = jnp.sum(jnp.square(x), axis=1)
    valid = _pad_axis(data_valid, DT, 0, value=False)
    dn = jnp.where(valid, dn, jnp.inf)
    nqp, nd = q.shape[0], x.shape[0]
    grid = (nqp // QT, nd // DT)
    return pl.pallas_call(
        make_kernel(precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((QT, dpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DT, dpad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DT, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((DT // SUB, QT), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nd // SUB, nqp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nqp * nd * dpad,
            bytes_accessed=(nqp * dpad + nd * dpad + nqp * (nd // SUB)) * 4,
            transcendentals=0,
        ),
    )(q, x, dn[:, None])


def bench(fn, *args, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, D0)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(N, D0)).astype(np.float32))
    valid = jnp.ones((N,), dtype=bool)

    t_hi = bench(pass1, q, x, valid, lax.Precision.HIGHEST)
    print(f"pass1 HIGHEST: {t_hi*1e3:.1f} ms", flush=True)
    t_h = bench(pass1, q, x, valid, "high3")
    print(f"pass1 high3:   {t_h*1e3:.1f} ms", flush=True)

    # recall: select with each precision, rescore exactly, compare indices
    def full(precision):
        m_t = pass1(q, x, valid, precision)
        top_sub = _select_subchunks(m_t, K)[:N]
        data3, dn2 = _chunked_view(x, valid)
        idx, sq = _rescore_chunks(q, data3, dn2, top_sub, K)
        return np.asarray(idx), np.asarray(sq)

    idx_ref, sq_ref = full(lax.Precision.HIGHEST)
    idx_high, sq_high = full("high3")
    # set-recall per row
    rec = np.mean([
        len(set(idx_ref[i]) & set(idx_high[i])) / K
        for i in range(0, N, 97)
    ])
    dmax = float(np.max(np.abs(np.sqrt(sq_ref) - np.sqrt(sq_high))))
    print(f"HIGH vs HIGHEST selection: recall={rec:.6f}  max |d| gap={dmax:.3e}",
          flush=True)

    # end-to-end comparison through the library pipeline
    def e2e(bf16):
        idx, sq = _knn_two_pass(q, x, K, valid, False, bf16)
        return float(jnp.sum(sq))

    t0 = time.perf_counter(); e2e(False); t_exact = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter(); e2e(False)
        t_exact = min(t_exact, time.perf_counter() - t0)
    print(f"library exact two-pass total: {t_exact*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
