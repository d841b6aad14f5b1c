"""Out-of-core fastMNN: the full quickCorrect pipeline over CSR stores.

The atlas-scale path: counts never densify beyond one streaming block.
Mirrors quickCorrect (reference R/quickCorrect.R:66-120 — intersect genes,
multiBatchNorm, HVG modelling, fastMNN) with every gene-space stage
expressed as streamed block statistics:

1. size factors     — CSR row sums (native C++ runtime);
2. median-ratio rescaling to the lowest-coverage batch
                    — per-gene averages of sf-normalized counts accumulated
                      block-by-block on device (reference
                      R/multiBatchNorm.R:237-280 semantics via
                      ops.normalization.rescale_size_factors);
3. HVG modelling    — per-gene mean/variance of log-normalized expression
                      accumulated block-by-block, then the loess-style
                      trend (ops.stats.fit_trend_var);
4. log-normalize + cosine-norm as a *value transform on the CSR buffers*:
   with pseudo_count=1, log(x/sf + 1) maps zeros to zeros and per-cell L2
   scaling preserves the pattern, so the HVG-subset logcounts stay sparse
   at rest (the reference reaches the same goal through DelayedArray
   deferred ops, R/multiBatchPCA.R:288-301);
5. multi_batch_pca_csr (streamed Gram PCA) -> reduced_mnn on the (N, d)
   coordinates with any kNN backend.

Peak host memory: O(nnz of the HVG subset); peak device memory:
O(block_rows x G) + O(N x d).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..io.csr import CSRCells, dense_blocks
from ..ops.normalization import rescale_size_factors
from ..ops.pca_outofcore import multi_batch_pca_csr
from ..ops.stats import GeneVarResult, combine_var, fit_trend_var, get_top_hvgs
from .fast_mnn import MNNResult, reduced_mnn
from .experiments import QuickCorrectResult

__all__ = ["quick_correct_csr"]


@jax.jit
def _block_avg_acc(block, sf, n_valid):
    """Per-gene sum of sf-normalized counts for one padded block."""
    mask = jnp.arange(block.shape[0]) < n_valid
    x = jnp.where(mask[:, None], block / sf[:, None], 0.0)
    return jnp.sum(x, axis=0)


@jax.jit
def _block_log_moments(block, sf, n_valid, log_base):
    """Per-gene (sum, sum of squares) of log-normalized expression for one
    padded block (pseudo_count=1)."""
    mask = jnp.arange(block.shape[0]) < n_valid
    lg = jnp.log1p(block / sf[:, None]) / jnp.log(log_base)
    lg = jnp.where(mask[:, None], lg, 0.0)
    return jnp.sum(lg, axis=0), jnp.sum(jnp.square(lg), axis=0)


def _stream_stats(store: CSRCells, sf: np.ndarray, log_base: float,
                  block_rows: int):
    """One pass: per-gene average of sf-normalized counts + log-expression
    moments."""
    g = store.n_genes
    avg = jnp.zeros((g,), jnp.float32)
    s1 = jnp.zeros((g,), jnp.float32)
    s2 = jnp.zeros((g,), jnp.float32)
    offset = 0
    lb = jnp.asarray(log_base, jnp.float32)
    for block, n_valid in dense_blocks(store, block_rows=block_rows):
        sfb = np.ones(block.shape[0], np.float32)
        sfb[:n_valid] = sf[offset:offset + n_valid]
        b = jnp.asarray(block)
        sfj = jnp.asarray(sfb)
        avg = avg + _block_avg_acc(b, sfj, n_valid)
        a, b2 = _block_log_moments(b, sfj, n_valid, lb)
        s1 = s1 + a
        s2 = s2 + b2
        offset += n_valid
    n = store.n_cells
    mean = np.asarray(s1) / n
    var = (np.asarray(s2) - n * mean**2) / max(n - 1, 1)
    return np.asarray(avg) / n, mean, np.maximum(var, 0.0)


def _lognorm_cosine_csr(store: CSRCells, sf: np.ndarray, log_base: float,
                        cos_norm: bool) -> CSRCells:
    """Value transform: v -> log(v/sf + 1)/log(base), then per-cell L2
    normalization — zeros stay zero so the CSR pattern is unchanged
    (cosineNorm zero guard: reference R/cosineNorm.R:80)."""
    counts = np.diff(store.indptr)
    row_sf = np.repeat(sf.astype(np.float64), counts)
    vals = np.log1p(store.data.astype(np.float64) / row_sf) / np.log(log_base)
    if cos_norm:
        sq = np.zeros(store.n_cells, np.float64)
        nz = counts > 0
        starts = store.indptr[:-1][nz]
        seg = np.add.reduceat(vals * vals, starts) if starts.size else np.zeros(0)
        sq[nz] = seg
        l2 = np.maximum(np.sqrt(sq), 1e-8)
        vals = vals / np.repeat(l2, counts)
    return CSRCells(
        data=vals.astype(np.float32),
        indices=store.indices,
        indptr=store.indptr,
        n_genes=store.n_genes,
        gene_names=store.gene_names,
    )


def quick_correct_csr(
    stores: Sequence[CSRCells],
    *,
    hvg_n: int = 5000,
    d: int = 50,
    k: int = 20,
    prop_k: Optional[float] = None,
    knn_method: str = "auto",
    merge_order=None,
    auto_merge: bool = False,
    min_batch_skip: Optional[float] = 0.0,
    ndist: float = 3.0,
    min_mean: float = 1.0,
    log_base: float = 2.0,
    cos_norm: bool = True,
    span: float = 0.3,
    block_rows: int = 8192,
    weights=None,
    batch_names: Optional[Sequence[str]] = None,
) -> QuickCorrectResult:
    """quickCorrect over out-of-core CSR stores (counts, cells in rows).

    Streaming equivalent of ``quick_correct`` (reference
    R/quickCorrect.R:66-120) — see the module docstring for the stage map.
    Restricted to pseudo_count=1 (the default), which is what keeps the
    log transform sparsity-preserving. Returns the same QuickCorrectResult
    (variance decomposition, HVG indices, MNNResult with rotation/centers).
    """
    if len(stores) < 2:
        raise ValueError("at least two batches must be specified")
    g = stores[0].n_genes
    names0 = stores[0].gene_names
    for s in stores[1:]:
        if s.n_genes != g:
            raise ValueError(
                "number of features is not the same across batches"
            )
        if (s.gene_names is None) != (names0 is None) or (
            names0 is not None and list(s.gene_names) != list(names0)
        ):
            raise ValueError(
                "gene names differ across stores; align them with "
                "CSRCells.select_genes first"
            )

    # stage 1-3: one streamed pass per batch
    sfs: List[np.ndarray] = []
    avgs: List[np.ndarray] = []
    decs: List[GeneVarResult] = []
    for store in stores:
        lib = store.row_sums()
        if not np.all(lib > 0):
            raise ValueError("all cells must have positive library sizes")
        sf = (lib / lib.mean()).astype(np.float32)
        sfs.append(sf)
        avg, mean, var = _stream_stats(store, sf, log_base, block_rows)
        avgs.append(avg)
        trend = fit_trend_var(mean, var, span=span)
        tech = trend(mean)
        decs.append(GeneVarResult(mean=mean, total=var, tech=tech,
                                  bio=var - tech))

    rescaled = rescale_size_factors(
        [jnp.asarray(a) for a in avgs], [jnp.asarray(s) for s in sfs],
        min_mean=min_mean,
    )
    rescaled = [np.asarray(r, np.float32) for r in rescaled]

    # HVG stats must reflect the *rescaled* normalization; the mean shifts
    # by a per-batch constant under sf scaling only approximately, so we
    # recompute moments when any rescaling factor differs materially.
    decs2: List[GeneVarResult] = []
    for store, sf0, sf1, dec in zip(stores, sfs, rescaled, decs):
        if np.allclose(sf0, sf1, rtol=1e-6):
            decs2.append(dec)
            continue
        _, mean, var = _stream_stats(store, sf1, log_base, block_rows)
        trend = fit_trend_var(mean, var, span=span)
        tech = trend(mean)
        decs2.append(GeneVarResult(mean=mean, total=var, tech=tech,
                                   bio=var - tech))
    dec = combine_var(decs2)
    hvgs = get_top_hvgs(dec, n=hvg_n)

    # stage 4: sparse value transform on the HVG subset
    transformed = [
        _lognorm_cosine_csr(store.select_genes(hvgs), sf, log_base, cos_norm)
        for store, sf in zip(stores, rescaled)
    ]

    # stage 5: streamed Gram PCA + MNN on coordinates
    pca = multi_batch_pca_csr(
        transformed, d=d, weights=weights, block_rows=block_rows,
        batch_names=batch_names,
    )
    res = reduced_mnn(
        [jnp.asarray(c) for c in pca.components],
        k=k, prop_k=prop_k, ndist=ndist, merge_order=merge_order,
        auto_merge=auto_merge, min_batch_skip=min_batch_skip,
        batch_names=batch_names, knn_method=knn_method,
    )
    res = MNNResult(
        corrected=res.corrected,
        batch=res.batch,
        merge_info=res.merge_info,
        rotation=pca.rotation,
        centers=pca.centers,
        var_explained=getattr(pca, "var_explained", None),
        var_total=getattr(pca, "var_total", None),
        batch_names=res.batch_names,
    )
    return QuickCorrectResult(dec=dec, hvgs=hvgs, corrected=res)
