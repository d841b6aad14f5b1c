"""Probe: Pallas DMA sub-chunk gather vs the XLA gather for kNN rescore.

Rescore is the dominant stage of the exact two-pass kNN (167-193 ms of
237 ms at 98304^2; NOTES roofline): per-query gathers of k (32, 64) fp32
sub-chunk blocks move 8 KB slices at ~84 GB/s — slice-COUNT-bound (32 KB
slices ran 4x the bytes at ~196 GB/s). Hypothesis (roadmap #2): explicit
DMA issue from a Pallas kernel with a deep in-flight window can sustain a
higher slice rate than XLA's gather loop.

The kernel is pure DMA orchestration: for each (query, k) pair, one
HBM->HBM copy of the selected sub-chunk — stored flattened as a
(C32, SUB*DPAD) row (Mosaic requires 128-lane-aligned slices, so rows are
copied whole) — into a contiguous (QR*k, SUB*DPAD) buffer, with a
WINDOW-deep semaphore ring keeping copies in flight; XLA then rescores
from the contiguous buffer (sequential reads at full bandwidth).

Run on TPU:  python benchmarks/knn_dma_rescore_probe.py [nq] [nd]
Add "cpu" as a trailing arg to force interpret mode (correctness only).
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 32
DPAD = 64
ROW = SUB * DPAD   # one sub-chunk = an (8, 256) tile-aligned block
RS, RL = 8, 256    # sublane/lane shape of a flattened sub-chunk
WINDOW = 16        # in-flight DMA window


def _gather_kernel(ids_ref, data_ref, out_ref, sems, *, kc: int, qr: int):
    """ids_ref: SMEM (qr, kc) int32; data_ref: ANY (C32, RS, RL);
    out_ref: ANY (qr*kc, RS, RL). One DMA per (query, k) with WINDOW
    outstanding (Mosaic requires (8, 128k)-aligned slice tails, hence the
    (8, 256) block shape)."""
    total = qr * kc

    def make_copy(i):
        cid = ids_ref[i // kc, i % kc]
        return pltpu.make_async_copy(
            data_ref.at[pl.ds(cid, 1)],
            out_ref.at[pl.ds(i, 1)],
            sems.at[i % WINDOW],
        )

    def body(i, _):
        make_copy(i).start()

        @pl.when(i >= WINDOW - 1)
        def _():
            make_copy(i - (WINDOW - 1)).wait()

        return 0

    jax.lax.fori_loop(0, total, body, 0)

    def tail(i, _):
        make_copy(total - (WINDOW - 1) + i).wait()
        return 0

    jax.lax.fori_loop(0, WINDOW - 1, tail, 0)


@functools.partial(jax.jit, static_argnames=("kc", "interpret"))
def dma_gather(ids, data2d, kc: int, interpret: bool = False):
    qr = ids.shape[0]
    out = pl.pallas_call(
        functools.partial(_gather_kernel, kc=kc, qr=qr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((qr * kc, RS, RL), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((WINDOW,))],
        interpret=interpret,
    )(ids, data2d)
    return out.reshape(qr, kc, SUB, DPAD)


@jax.jit
def xla_gather(ids, data3):
    return data3[ids]          # (qr, kc, SUB, DPAD)


def force(x):
    return float(jnp.sum(x[:1, :1, :1, :1]))


def main():
    interpret = jax.default_backend() != "tpu"
    nq = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1] != "cpu" else (
        98304 if not interpret else 256
    )
    nd = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2] != "cpu" else (
        98304 if not interpret else 4096
    )
    kc = 20
    qtile = 1024 if not interpret else 128
    rng = np.random.default_rng(0)
    c32 = nd // SUB
    data3 = jnp.asarray(rng.normal(size=(c32, SUB, DPAD)).astype(np.float32))
    data2d = data3.reshape(c32, RS, RL)
    ids = jnp.asarray(rng.integers(0, c32, size=(nq, kc)).astype(np.int32))
    print(f"backend={jax.default_backend()} nq={nq} nd={nd} kc={kc} "
          f"window={WINDOW} qtile={qtile}", flush=True)

    got = dma_gather(ids[:qtile], data2d, kc, interpret)
    want = xla_gather(ids[:qtile], data3)
    ok = bool(jnp.array_equal(got, want))
    print("gather equality:", ok, flush=True)
    if not ok:
        sys.exit(1)
    if interpret:
        print("interpret mode: correctness only", flush=True)
        return

    for name, fn in (
        ("xla", lambda t: xla_gather(ids[t : t + qtile], data3)),
        ("dma", lambda t: dma_gather(ids[t : t + qtile], data2d, kc)),
    ):
        _ = force(fn(0))  # compile
        t0 = time.perf_counter()
        live = []
        acc = 0.0
        for t in range(0, nq, qtile):   # keep 8 tiles in flight (HBM-bounded)
            live.append(fn(t))
            if len(live) > 8:
                acc += force(live.pop(0))
        acc += sum(force(o) for o in live)
        dt = time.perf_counter() - t0
        bytes_moved = nq * kc * ROW * 4
        print(f"{name} gather: {dt*1e3:.1f} ms  "
              f"{bytes_moved/dt/2**30:.1f} GiB/s  "
              f"{nq*kc/dt/1e6:.2f} Mslices/s", flush=True)


if __name__ == "__main__":
    main()
