"""Pallas fused distance-tile kNN for TPU — the speed-of-light path.

The XLA path in knn.py materializes each (query_tile x N_data) score block
in HBM and runs top_k over it: HBM traffic ~ 2 * N_q * N_d * 4 bytes, which
dominates (e.g. ~77 GB for 100k x 100k). This module replaces it with a
two-pass exact algorithm:

Pass 1 (Pallas kernel, MXU-bound): for each (query_tile, data_tile) block,
  compute scores TRANSPOSED — (DT, QT) = 2 d.q^T - ||d||^2 via dot_general
  with contraction on the feature dim — on the MXU **in VMEM**, and reduce
  each 32-row data sub-chunk to its max (a leading-dim reshape + sublane
  reduction, which Mosaic supports; the straight (QT, 16, 64)-style lane
  reshape below 128 is rejected). Only the (N_d/32 x N_q) sub-chunk-max
  matrix ever reaches HBM — 32x less traffic than the score matrix.

Pass 2 (XLA): hierarchical exact selection + fine-grained rescore.
  1. Sub-maxes are maxed in groups of CHUNK/SUB = 4 to recover 128-chunk
     maxima.
  2. Top-k 128-chunks per query: the k-th largest chunk-max is a *lower
     bound* on the k-th best score (the k chunk maxima are themselves k
     distinct scores), so the top-k chunks contain every true top-k
     neighbour.
  3. Within those k chunks' 4k sub-chunks, top-k sub-chunks by sub-max:
     again the k selected sub-maxes are k distinct scores, so the k-th
     largest bounds the k-th best overall from below, and every true
     neighbour's sub-chunk clears it. (Both selections use topk_pallas.
     topk_rows, whose iterative masked extraction returns k *distinct*
     positions even under ties — required for the k-distinct-scores
     argument.)
  4. Gather the k sub-chunks as whole (32, d) blocks (8 KB contiguous
     slices) and rescore exactly on the MXU. 32-row granularity moves 4x
     fewer bytes than 128-row chunks for the same k gathers per query
     (measured 194 vs 277 ms at 98304^2, d=50, k=20; per-row gathers are
     ~14x slower still).

Exact up to tie-breaking: equal-score neighbours may resolve to different
indices than the reference XLA path (which is index-stable), and pass-1
candidate selection carries ~2^-21 relative score error (3-pass bf16
split — see _chunkmax_kernel) vs the ~2^-23 rounding of a full-fp32
score, so neighbours within that resolution of the k-th best count as
ties. Reported distances are always full-fp32 rescores.

Masking: invalid data rows are excluded by setting their ||x||^2 to +inf
(score -inf), so restriction masks are free.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chunk_max_scores", "query_knn_tpu"]

CHUNK = 128          # selection chunk (exactness granularity of step 2)
SUB = 32             # data rows per sub-chunk (gather/rescore granularity)
RATIO = CHUNK // SUB
QT = 512             # query rows per kernel block
DT = 1024            # data rows per kernel block
RESCORE_TILE = 512   # query rows per rescore block


def _chunkmax_kernel(q_ref, d_ref, m_ref, *, six_pass: bool = False):
    """One (QT x DT) score block -> per-SUB-row sub-chunk max, transposed.

    Scores are computed as (DT, QT) so the 32-row grouping is a leading-dim
    reshape + sublane reduction (Mosaic-supported; the lane-dim sub-128
    reshape of the (QT, DT) orientation is not). The within-chunk argmax is
    NOT computed here: pass 2 rescoring recovers exact indices.
    """
    # fp32 inputs: manual 3-pass bf16 split (hi = bf16(a), lo = bf16(a-hi);
    # a.b ~= hi.hi + hi.lo + lo.hi — what Precision.HIGH lowers to on
    # XLA:TPU, but Mosaic rejects HIGH so we write the split out). Relative
    # error ~2^-21 vs the ~2^-23 rounding a full-fp32 (HIGHEST, 6-pass)
    # score already carries — i.e. only ~2 bits looser than "exact" fp32
    # selection, for 1.57x the pass-1 rate (66 vs 104 ms at 98304^2,
    # benchmarks/knn_pass1_precision_probe.py; recall 1.0, max reported-
    # distance gap 1e-5 at d=50). Selection only prunes: pass 2 rescores
    # the selected sub-chunks in full fp32, so a deviation needs a true
    # neighbour within ~2^-21 relative of the k-th sub-chunk max — inside
    # the tie resolution the "exact up to tie-breaking" contract already
    # excludes. ``six_pass`` upgrades to the HIGHEST-equivalent three-way
    # split (a ~= a1+a2+a3 in bf16; dropped cross terms O(2^-42) relative)
    # for callers whose raw-scale scores make ~2^-21-of-magnitude matter
    # (query_knn(exact_selection=True)). bf16 inputs: single MXU pass with
    # fp32 accumulation (the fast candidate-selection mode, ~2^-8 error).
    dims = (((1,), (1,)), ((), ()))
    if q_ref.dtype == jnp.float32:
        q = q_ref[:]
        d = d_ref[:]
        dot = lambda a, b: lax.dot_general(
            a, b, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        qh = q.astype(jnp.bfloat16)
        dh = d.astype(jnp.bfloat16)
        qr = q - qh.astype(jnp.float32)
        dr = d - dh.astype(jnp.float32)
        if six_pass:
            qm = qr.astype(jnp.bfloat16)
            dm = dr.astype(jnp.bfloat16)
            ql = (qr - qm.astype(jnp.float32)).astype(jnp.bfloat16)
            dl = (dr - dm.astype(jnp.float32)).astype(jnp.bfloat16)
            s = (
                dot(dh, qh)
                + (dot(dh, qm) + dot(dm, qh))
                + (dot(dh, ql) + dot(dm, qm) + dot(dl, qh))
            )
        else:
            ql = qr.astype(jnp.bfloat16)
            dl = dr.astype(jnp.bfloat16)
            s = dot(dh, qh) + dot(dh, ql) + dot(dl, qh)
    else:
        s = lax.dot_general(
            d_ref[:], q_ref[:], dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    # data norms ride in two folded feature columns (see _prep_pass1), so
    # s already equals q.x - dn/2 and no (N, 1) side input exists — an
    # (N, 1) fp32 pallas input materializes in T(8,128) tiled layout at
    # 128x padding (2.38 GB at a 5M-row step; the config-5 OOM).
    s_t = 2.0 * s                                   # (DT, QT)
    m_ref[:] = jnp.max(s_t.reshape(DT // SUB, SUB, QT), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "six_pass"))
def chunk_max_scores(
    query: jnp.ndarray, data: jnp.ndarray,
    interpret: bool = False, six_pass: bool = False,
):
    """(N_d/SUB, N_q) transposed sub-chunk maxima of the score matrix.

    ``query``/``data`` must be padded: N_q % QT == 0, N_d % DT == 0, and the
    feature dim padded to a multiple of 128 (or exactly 64) WITH the data
    norms folded into two feature columns (see _prep_pass1: x carries
    (dn_hi, dn_lo), q carries (-0.5, -0.5), so q.x = raw_q.raw_x - dn/2
    and the kernel's 2*s is the chunk score directly). fp32 inputs select
    at ~2^-21 relative score precision (3-pass bf16 split; ``six_pass``
    buys full-fp32-equivalent selection for ~1.6x pass-1 cost); bf16
    inputs trade ~3 decimal digits for a single-pass MXU matmul.
    """
    nq, d = query.shape
    nd = data.shape[0]
    grid = (nq // QT, nd // DT)
    return pl.pallas_call(
        functools.partial(_chunkmax_kernel, six_pass=six_pass),
        grid=grid,
        in_specs=[
            pl.BlockSpec((QT, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DT, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((DT // SUB, QT), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nd // SUB, nq), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * nd * d,
            bytes_accessed=(nq * d + nd * d + nq * (nd // SUB)) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(query, data)


def _pad_axis(x, multiple, axis, value=0.0):
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - n)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret", "bf16", "six_pass"))
def _prep_pass1(query, data, data_valid, interpret: bool = False,
                bf16: bool = False, six_pass: bool = False):
    """Pad, compute data norms, run the sub-chunk-max kernel; returns the
    (nq, C32) sub-chunk-max matrix. With ``bf16`` the matmul inputs are cast
    to bfloat16 (fp32 accumulation; norms stay fp32) for a single-pass MXU
    matmul — candidate selection only, pass 2 rescores exactly."""
    nq, d0 = query.shape
    acc = jnp.float32
    # two spare pad columns carry the folded data norms (dn_hi, dn_lo)
    dpad = 64 if d0 <= 62 else -(-(d0 + 2) // 128) * 128
    q = _pad_axis(_pad_axis(query.astype(acc), QT, 0), dpad, 1)
    x = _pad_axis(_pad_axis(data.astype(acc), DT, 0), dpad, 1)
    dn = jnp.sum(jnp.square(x), axis=1)
    valid = _pad_axis(data_valid, DT, 0, value=False)
    # finite sentinel, not inf: the hi/lo bf16 split of inf is inf + NaN
    dn = jnp.where(valid, dn, jnp.asarray(1e30, acc))
    # Fold ||x||^2 into the matmul as two feature columns so no (N, 1)
    # side input exists (its T(8,128) tiled layout pads 128x — 2.38 GB at
    # a 5M-row merge step, the config-5 compile OOM). x gets (dn_hi,
    # dn_lo) with q = (-0.5, -0.5): q.x accumulates -dn/2 exactly like the
    # old fp32 subtraction up to the hi/lo split error ~2^-24 of dn —
    # below the 3-pass path's documented ~2^-21 selection error (dn_hi is
    # bf16-exact by construction, so every split mode reproduces it; only
    # dn_lo, itself 2^-8 of dn, is subject to further bf16 rounding).
    dn_hi = dn.astype(jnp.bfloat16).astype(acc)
    dn_lo = dn - dn_hi
    x = x.at[:, dpad - 2].set(dn_hi).at[:, dpad - 1].set(dn_lo)
    q = q.at[:, dpad - 2].set(-0.5).at[:, dpad - 1].set(-0.5)
    if bf16:
        q = q.astype(jnp.bfloat16)
        x = x.astype(jnp.bfloat16)
    # stays TRANSPOSED (C32, nq_pad): transposing the full matrix here costs
    # a second m32-sized HBM buffer (7.9 GB at 500k x 126k — the 1M-atlas
    # OOM); _select_subchunks transposes per query tile instead.
    return chunk_max_scores(q, x, interpret, six_pass)


SELECT_TILE = 16384       # query rows selected per tile (bounds HBM temps)
SINGLE_LEVEL_MAX = 8192   # C32 up to which one flat top-k beats the hierarchy


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _select_subchunks(m_t, k: int, interpret: bool = False):
    """Exact selection: (C32, nq) TRANSPOSED sub-maxes (as pass 1 emits
    them) -> (ks, nq) TRANSPOSED top sub-chunk ids (ks = min(k, candidate
    count)). The output stays transposed deliberately: an (nq, ks) int32
    result tiles its ks<128 minor dim up to 128 lanes — 25.6x padding —
    and the stacked lax.map carrier crosses the TPU runtime's 2^31-byte
    buffer limit at nq >= ~4.2M rows (kernel fault; see _knn_two_pass).
    (ks, nq) keeps the 128-aligned query dim minor: ~5 MB per million
    queries of padding instead of ~500 MB.

    Two regimes. C32 <= SINGLE_LEVEL_MAX: one flat topk_rows over the
    sub-maxes (the k selected maxima are k distinct true scores, so the
    k-th bounds the k-th best from below — same exactness argument as the
    hierarchy, module docstring step 2-3 — without the 3-D gather or the
    second top-k). Larger C32: the 128-chunk -> sub-chunk hierarchy, whose
    first top-k runs over a RATIO-fold narrower input.

    Runs in query tiles: the (tile, c128p, RATIO) fp32 working set is
    16 B/(query x chunk) and materializing it for every query at once
    OOMs at scale (observed 2 x 7.63 GB HLO temps at 500k x 126k in the
    1M-cell atlas)."""
    def _topk(x, kk):
        if not interpret and kk <= 64:
            from .topk_pallas import topk_rows

            return topk_rows(x, kk)                  # distinct-index ties
        return lax.top_k(x, kk)

    c32, nq = m_t.shape
    c128 = c32 // RATIO
    # pad the chunk count to a 128-multiple: the (tile, c128, RATIO)
    # take_along_axis below crashes the TPU runtime at unaligned chunk
    # counts (kernel fault observed at c128=72; fine at 768), and -inf pad
    # chunks are never selected while real candidates remain (topk_rows
    # resolves ties to the lower index). The 16-byte-slice 3-D gather is
    # ~2x faster than the equivalent flat per-scalar gather (90 vs 170 ms
    # select at 98304^2).
    c128p = max(-(-c128 // 128) * 128, 128)
    kc = min(k, c128)
    ks = min(k, RATIO * kc)

    # tile must divide nq exactly (nq is QT-padded upstream) so the output
    # is a plain reshape; worst case falls back to QT-sized tiles.
    tile = nq
    for m in range(min(SELECT_TILE, nq) // QT, 0, -1):
        if nq % (QT * m) == 0:
            tile = QT * m
            break

    single = c32 <= SINGLE_LEVEL_MAX

    def body(i):
        mt = lax.dynamic_slice(m_t, (0, i * tile), (c32, tile))
        m32 = mt.T                                   # (tile, C32)
        if single:
            _, top = _topk(m32, ks)                  # flat, one pass
            return top.T                             # (ks, tile)
        if c128p != c128:
            m32 = jnp.pad(m32, ((0, 0), (0, (c128p - c128) * RATIO)),
                          constant_values=-jnp.inf)
        m128 = jnp.max(m32.reshape(tile, c128p, RATIO), axis=2)
        _, top_chunks = _topk(m128, kc)              # (tile, kc)
        sub = jnp.take_along_axis(
            m32.reshape(tile, c128p, RATIO), top_chunks[:, :, None], axis=1
        )                                            # (tile, kc, RATIO)
        sub_ids = (
            top_chunks[:, :, None] * RATIO
            + jnp.arange(RATIO, dtype=jnp.int32)[None, None, :]
        ).reshape(tile, RATIO * kc)
        _, pos = _topk(sub.reshape(tile, RATIO * kc), ks)
        return jnp.take_along_axis(sub_ids, pos, axis=1).T  # (ks, tile)

    if tile == nq:
        return body(0)
    out = lax.map(body, jnp.arange(nq // tile))     # (nblk, ks, tile)
    return jnp.swapaxes(out, 0, 1).reshape(ks, nq)


@jax.jit
def _chunked_view(data, data_valid):
    """Materialize the padded data as (C32, SUB, dpad) blocks + per-sub-chunk
    norms, in a jit of their own so the arrays land in XLA's default
    layout. Feeding the rescore from pass 1's padded intermediates instead
    pins a pallas-chosen layout on them and doubles the gather time
    (651 ms vs 329 ms measured at 98304^2).

    The gathered blocks stay fp32: storing them in bfloat16 was measured
    SLOWER (481 vs 366 ms at 98304^2) — the halved bytes don't pay for the
    smaller slices and the bf16 einsum relayout."""
    d0 = data.shape[1]
    dpad = 64 if d0 <= 64 else -(-d0 // 128) * 128
    x = _pad_axis(_pad_axis(data.astype(jnp.float32), DT, 0), dpad, 1)
    dn = jnp.sum(jnp.square(x), axis=1)
    valid = _pad_axis(data_valid, DT, 0, value=False)
    dn = jnp.where(valid, dn, jnp.inf)
    return x.reshape(-1, SUB, dpad), dn.reshape(-1, SUB)


@functools.partial(jax.jit, static_argnames=("k", "with_scores"))
def _rescore_chunks(query, data3, dn2, top_sub_t, k: int,
                    with_scores: bool = True):
    """Gather the selected sub-chunks as whole (SUB, dpad) blocks and
    rescore exactly on the MXU. ``top_sub_t`` is TRANSPOSED (kc, nq), as
    _select_subchunks emits it.

    Sub-chunk-granular gathers move 8 KB contiguous slices — 4x fewer bytes
    than 128-row chunks for the same k gathers per query (194 vs 277 ms at
    98304^2, d=50, k=20); per-row gathers are ~14x slower than 128-row
    (4583 ms).

    The lax.map carriers are stacked TRANSPOSED — (ntiles, dpad, T) and
    (ntiles, kc, T) with the 128-aligned tile dim minor — because an
    (ntiles, T, small) stack tiles its sub-128 minor dim up to 128 lanes
    and crosses the TPU runtime's 2^31-byte buffer limit at ~4-8M query
    rows, which kernel-faults the worker when the loop dynamic-slices it
    (the 10M config-5 fault; see _knn_two_pass). The per-tile transposes
    inside the map body are VMEM-local relayouts, invisible next to the
    gather+einsum. ``with_scores=False`` skips the squared-distance
    output: at a (5M, k=20) result that buffer tiles k up to 128 lanes —
    2.56 GB of HBM — and the MNN membership test never reads it."""
    acc = jnp.float32
    nq, d0 = query.shape
    dpad = data3.shape[2]
    kc = top_sub_t.shape[0]
    # qn and the tile stack are built from the TRANSPOSED query so the
    # padded (nq, dpad) intermediate (1.28 GB at 5M rows) never exists
    qt_all = _pad_axis(query.astype(acc).T, dpad, 0)   # (dpad, nq)
    qn = jnp.sum(jnp.square(qt_all), axis=0)

    nq_pad = -(-nq // RESCORE_TILE) * RESCORE_TILE
    ntiles = nq_pad // RESCORE_TILE
    qp_t = jnp.swapaxes(
        _pad_axis(qt_all, RESCORE_TILE * ntiles, 1).reshape(
            dpad, ntiles, RESCORE_TILE
        ), 0, 1,
    )                                               # (ntiles, dpad, T)
    tcp_t = jnp.swapaxes(
        _pad_axis(top_sub_t, RESCORE_TILE * ntiles, 1).reshape(
            kc, ntiles, RESCORE_TILE
        ), 0, 1,
    )                                               # (ntiles, kc, T)
    offs = jnp.arange(SUB, dtype=jnp.int32)

    def rescore(args):
        qt_t, ct_t = args                           # (dpad, T), (kc, T)
        qt = qt_t.T                                 # (T, dpad)
        ct = ct_t.T                                 # (T, kc)
        gx = data3[ct]                              # (T, kc, SUB, dpad)
        gdn = dn2[ct]                               # (T, kc, SUB)
        s = 2.0 * jnp.einsum(
            "td,tkcd->tkc", qt, gx, preferred_element_type=acc,
            precision=jax.lax.Precision.HIGHEST,
        ) - gdn
        s = s.reshape(qt.shape[0], kc * SUB)
        cols = (ct[:, :, None] * SUB + offs[None, None, :]).reshape(
            qt.shape[0], kc * SUB
        )
        vals, pos = lax.top_k(s, k)
        idx = jnp.take_along_axis(cols, pos, axis=1)
        return idx.T, vals.T                        # (k, T)

    idx_t, vals_t = lax.map(rescore, (qp_t, tcp_t))
    idx = jnp.swapaxes(idx_t, 0, 1).reshape(k, -1)[:, :nq].T
    if not with_scores:
        return idx, None
    vals = jnp.swapaxes(vals_t, 0, 1).reshape(k, -1)[:, :nq].T
    sq = jnp.maximum(qn[:, None] - vals, 0.0)
    return idx, sq


import os as _os

# max bytes for one pass-1 sub-chunk-max buffer. 2 GB (not 4): at 10M-pad
# merge steps the step program already holds ~8-10 GB of long-lived data
# (shards, corrected outputs, chunk views, top_sub), and a 4 GB m_t piece
# tipped the v5e's 16 GB over (observed RESOURCE_EXHAUSTED in the config-5
# run). Override via BT_KNN_MT_BUDGET (bytes) for other HBM sizes.
MT_BUDGET = int(_os.environ.get("BT_KNN_MT_BUDGET", 2 << 30))


# max query rows processed by ONE pass-1 scan program / ONE rescore call.
# Every stacked loop carrier is transposed so its minor dim is the
# 128-aligned query-row dim (see _rescore_chunks), which keeps carriers
# ~5x smaller than the naive orientation — but each individual buffer must
# still stay under the TPU runtime's 2^31-byte limit (a dynamic-slice into
# a larger buffer kernel-faults the axon worker: measured clean at 2.5M
# query rows, faulting at 5M, in the 10M config-5 bisection). 4M rows caps
# the transposed f32 stack at 4M * 56 * 4 = 0.9 GB and the rescore's qp_t
# at 4M * 64 * 4 = 1.0 GB. Host-side grouping above the cap costs one
# extra program invocation per 4M rows — negligible next to the search.
GROUP_ROWS = int(_os.environ.get("BT_KNN_GROUP_ROWS", 1 << 22))

# max pass-1 scores (query rows x data rows) per scan-group PROGRAM. The
# axon worker kills long-running programs as a kernel fault: measured on
# the 10M config-5 bisection, a single pass1+select program computing
# 2.1e13 scores (~90-120 s) dies while 1.6e13 (the 87 s split-search
# programs) and below run clean. 8e12 keeps each group program at ~45 s
# (measured at 5M x 5M: 4 groups x 45.8 s), well under the wall, for one
# extra dispatch per group (~0.5 s). Override via BT_KNN_GROUP_SCORES.
GROUP_SCORES = int(_os.environ.get("BT_KNN_GROUP_SCORES", 8_000_000_000_000))


def _stage_sync(tag, x):
    """BT_KNN_STAGE_DEBUG=1: hard completion barrier + timing print after
    each eager kNN stage, so an axon worker fault localizes to the stage
    that caused it (async dispatch otherwise surfaces it at an arbitrary
    later call). No-op unless the env var is set."""
    if not _os.environ.get("BT_KNN_STAGE_DEBUG"):
        return
    import time as _t

    t0 = _t.perf_counter()
    _ = float(jnp.sum(x[..., :1, :1] if x.ndim >= 2 else x[..., :1]))
    print(f"[knn] {tag}: +{_t.perf_counter() - t0:.2f}s", flush=True)


def _knn_two_pass(query, data, k: int, data_valid, interpret: bool = False,
                  bf16: bool = False, six_pass: bool = False,
                  with_scores: bool = True):
    """Stage orchestrator. Stages are separately jitted so each gets its
    own input layouts (see _rescore_chunks); when this function is itself
    traced inside a larger jit the stages inline and behave as one
    program.

    Queries are processed in pieces whenever one (N_d/32, N_q) pass-1
    buffer would exceed MT_BUDGET: m_t is the only O(N_q * N_d) HBM object
    left in the pipeline, so piecing the queries bounds device memory for
    arbitrarily large merge steps (a 1M x 126k step would otherwise need a
    15.7 GB buffer — over the whole v5e HBM). Above GROUP_ROWS query rows
    the piece scan and the rescore additionally run in host-level groups
    so no loop carrier crosses the 2^31-byte buffer limit."""
    nq = query.shape[0]
    d = query.shape[1]
    ndp = -(-data.shape[0] // DT) * DT
    nqp = -(-nq // QT) * QT
    npieces = max(1, -(-(4 * (ndp // SUB) * nqp) // MT_BUDGET))
    if npieces == 1 and nq <= GROUP_ROWS:
        m_t = _prep_pass1(query, data, data_valid, interpret, bf16, six_pass)
        top_sub_t = _select_subchunks(m_t, k, interpret)[:, :nq]
    else:
        # scan over equal-size query pieces: one m_t buffer is live at a
        # time AND the trace holds ONE piece body — a Python loop here
        # unrolls hundreds of pallas calls at 10M-scale steps and blows
        # the compile (the round-3 "never unroll device loops" lesson)
        qchunk = QT * (-(-(-(-nq // npieces)) // QT))
        npieces = -(-nq // qchunk)
        gpieces = max(1, min(GROUP_ROWS // qchunk,
                             int(GROUP_SCORES // (qchunk * ndp))))
        ngroups = -(-npieces // gpieces)
        npieces = ngroups * gpieces               # pad to equal groups
        # the piece stack is built TRANSPOSED — (npieces, d, qchunk) with
        # the 128-aligned qchunk minor — because (npieces, qchunk, d)
        # tiles d (e.g. 50) up to 128 lanes and crosses 2^31 bytes at
        # >= ~4.2M rows, kernel-faulting the scan's dynamic-slice.
        qs_t = jnp.swapaxes(
            _pad_axis(query.T, npieces * qchunk, 1).reshape(
                d, npieces, qchunk
            ), 0, 1,
        )                                          # (npieces, d, qchunk)

        def piece(carry, qs_t_i):
            m_t = _prep_pass1(
                qs_t_i.T, data, data_valid, interpret, bf16, six_pass
            )
            return carry, _select_subchunks(m_t, k, interpret)

        _stage_sync("qs_t stack", qs_t)
        tops = []
        for g in range(ngroups):
            _, tg = jax.lax.scan(
                piece, 0, lax.slice_in_dim(qs_t, g * gpieces,
                                           (g + 1) * gpieces, axis=0)
            )
            _stage_sync(f"pass1+select group {g}/{ngroups}", tg)
            tops.append(tg)                        # (gpieces, ks, qchunk)
        tops = tops[0] if ngroups == 1 else jnp.concatenate(tops, axis=0)
        top_sub_t = jnp.swapaxes(tops, 0, 1).reshape(
            tops.shape[1], npieces * qchunk
        )[:, :nq]                                  # (ks, nq)
        # the piece stack and the per-group selections are dead now; at a
        # 5M-row search they hold ~2.7 GB the rescore needs back
        del qs_t, tops
        _stage_sync("top_sub_t", top_sub_t)
    data3, dn2 = _chunked_view(data, data_valid)
    _stage_sync("chunked view", data3)
    if nq <= GROUP_ROWS:
        return _rescore_chunks(query, data3, dn2, top_sub_t, k,
                               with_scores=with_scores)
    grows = -(-GROUP_ROWS // RESCORE_TILE) * RESCORE_TILE
    idxs, sqs = [], []
    for g0 in range(0, nq, grows):
        g1 = min(g0 + grows, nq)
        ig, sg = _rescore_chunks(
            query[g0:g1], data3, dn2, top_sub_t[:, g0:g1], k,
            with_scores=with_scores,
        )
        _stage_sync(f"rescore rows {g0}-{g1}", ig)
        idxs.append(ig)
        sqs.append(sg)
    idx = jnp.concatenate(idxs, axis=0)
    if not with_scores:
        return idx, None
    return idx, jnp.concatenate(sqs, axis=0)


def query_knn_tpu(
    query: jnp.ndarray,
    data: jnp.ndarray,
    k: int,
    *,
    n_data_valid: Optional[int] = None,
    data_mask: Optional[jnp.ndarray] = None,
    squared: bool = False,
    bf16: bool = False,
    exact_selection: bool = False,
    indices_only: bool = False,
):
    """Exact kNN via the fused sub-chunk-max kernel + hierarchical rescore.

    Same contract as knn.query_knn; requires N_d/128 >= k chunks (smaller
    inputs should use the XLA path). ``bf16`` selects candidate chunks
    with a bf16 matmul (recall slightly below 1 near score ties; reported
    distances stay exact fp32). ``exact_selection`` upgrades fp32 candidate
    selection to the HIGHEST-equivalent 6-pass split (see _chunkmax_kernel)
    for raw-scale inputs where ~2^-21-of-score-magnitude can span genuine
    neighbour gaps.
    """
    from .knn import KNNResult

    query = jnp.asarray(query)
    data = jnp.asarray(data)
    nd = data.shape[0]
    if data_mask is not None:
        valid = jnp.asarray(data_mask, dtype=bool)
    elif n_data_valid is not None:
        valid = jnp.arange(nd) < n_data_valid
    else:
        valid = jnp.ones((nd,), dtype=bool)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    idx, sq = _knn_two_pass(query, data, k, valid, interpret, bf16,
                            exact_selection and not bf16,
                            with_scores=not indices_only)
    if indices_only:
        return KNNResult(idx, None)
    dist = sq if squared else jnp.sqrt(sq)
    return KNNResult(idx, dist)
