"""Naive numpy reference implementations (oracles) of the algorithms.

Each function re-implements the reference semantics directly and simply
(dense loops, no tiling, float64), mirroring the reference's own test
strategy of checking kernels against inline naive re-implementations
(reference tests/testthat/test-fast-mnn.R:7-92, test-mnn-correct.R:29-174).
These are deliberately written independently of batchelor_tpu's device code.
Cells are rows, indices 0-based.
"""
from __future__ import annotations

import math

import numpy as np


def cosine_norm(x: np.ndarray) -> np.ndarray:
    l2 = np.sqrt((x**2).sum(axis=1))
    return x / np.maximum(l2, 1e-8)[:, None]


def knn(query: np.ndarray, data: np.ndarray, k: int):
    """Exact kNN, ties to lower index. Returns (idx (Nq,k), dist)."""
    d2 = ((query[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    dist = np.sqrt(np.take_along_axis(d2, idx, axis=1))
    return idx, dist


def find_mutual_nn(left: np.ndarray, right: np.ndarray, k1: int, k2: int):
    """k1 = neighbours searched in `left`; k2 = in `right`.

    Pairs ordered by left cell then neighbour rank
    (reference src/find_mutual_nns.cpp:7-41)."""
    nn_l2r, _ = knn(left, right, k2)
    nn_r2l, _ = knn(right, left, k1)
    r2l_sets = [set(row.tolist()) for row in nn_r2l]
    first, second = [], []
    for i in range(left.shape[0]):
        for j in nn_l2r[i]:
            if i in r2l_sets[j]:
                first.append(i)
                second.append(int(j))
    return np.array(first, dtype=np.int64), np.array(second, dtype=np.int64)


def average_correction(refdata, mnn1, curdata, mnn2):
    """Per-right-cell averaged correction vectors, groups ascending."""
    uniq = np.unique(mnn2)
    avg = np.zeros((uniq.shape[0], refdata.shape[1]))
    for r, j in enumerate(uniq):
        sel = mnn2 == j
        avg[r] = (refdata[mnn1[sel]] - curdata[j]).mean(axis=0)
    return avg, uniq


def batch_magnitude(correction):
    ave = correction.mean(axis=0)
    denom = (correction**2).mean(axis=0).sum()
    if denom == 0:
        return 0.0
    return math.sqrt((ave**2).sum() / denom)


def center_along_batch_vector(mat, vec, restrict=None):
    v = vec / np.sqrt((vec**2).sum())
    loc = mat @ v
    central = loc.mean() if restrict is None else loc[restrict].mean()
    return mat + np.outer(central - loc, v)


def per_batch_var(data, index, origin):
    out = np.zeros(len(index))
    for i, b in enumerate(index):
        rows = data[origin == b]
        out[i] = rows.var(axis=0, ddof=1).sum() if rows.shape[0] > 1 else 0.0
    return out


def tricube_average(vals, indices, distances, ndist=3.0):
    """Explicit per-row loop (reference test-fast-mnn.R:54-92 style)."""
    n, k = indices.shape
    out = np.zeros((n, vals.shape[1]))
    middle = math.ceil(k / 2) - 1
    for c in range(n):
        bw = max(distances[c, middle] * ndist, 1e-8)
        rel = np.minimum(distances[c] / bw, 1.0)
        tri = (1 - rel**3) ** 3
        w = tri / tri.sum()
        for p in range(k):
            out[c] += vals[indices[c, p]] * w[p]
    return out


def multi_batch_pca(mats, d, weights=None):
    """Weighted PCA oracle via full SVD; returns (components, rotation, centers)."""
    nb = len(mats)
    if weights is None:
        weights = np.ones(nb)
    weights = np.asarray(weights, dtype=float)
    means = [m.mean(axis=0) for m in mats]
    centers = sum(mu * w for mu, w in zip(means, weights)) / weights.sum()
    centered = [m - centers for m in mats]
    scaled = np.concatenate(
        [c / math.sqrt(m.shape[0] / w) for c, m, w in zip(centered, mats, weights)]
    )
    u, s, vt = np.linalg.svd(scaled, full_matrices=False)
    v = vt[:d].T
    comps = [c @ v for c in centered]
    return comps, v, centers


def smooth_gaussian_kernel(averaged, index, data, sigma2):
    """Dense-formula oracle of the classic smoothing kernel.

    averaged: (M, G) per-MNN-group correction vectors (cells in rows here;
    the reference kernel is genes x mnn). index: (M,) positions of the MNN
    cells among ``data`` rows. data: (N, Gd) coordinates used for distances.
    Weight of MNN i at cell c: exp(-d2(i,c)/sigma2) / density_i, normalized
    over i (reference src/smooth_gaussian_kernel.cpp:10-118,
    test-mnn-correct.R:29-92).
    """
    mnn_pos = data[index]  # (M, Gd)
    d2 = ((mnn_pos[:, None, :] - data[None, :, :]) ** 2).sum(-1)  # (M, N)
    logw = -d2 / sigma2
    # density over MNN locations
    dens = np.zeros(logw.shape[0])
    for i in range(logw.shape[0]):
        dens[i] = _logsumexp(logw[i, index])
    logw = logw - dens[:, None]
    w = np.exp(logw - logw.max(axis=0, keepdims=True))
    w = w / w.sum(axis=0, keepdims=True)
    return w.T @ averaged  # (N, G)


def _logsumexp(v):
    m = np.max(v)
    return m + math.log(np.exp(v - m).sum())


def adjust_shift_variance(data1, data2, correction, sigma2, restrict1=None, restrict2=None):
    """O(N^2) quantile-matching oracle (reference test-mnn-correct.R:95-174,
    src/adjust_shift_variance.cpp:29-164). Cells in rows.
    Returns the per-cell scaling (before the >=1 clamp)."""
    n2 = data2.shape[0]
    if restrict1 is None:
        restrict1 = np.arange(data1.shape[0])
    if restrict2 is None:
        restrict2 = np.arange(n2)
    out = np.zeros(n2)
    for c in range(n2):
        grad = correction[c].copy()
        l2 = np.sqrt((grad**2).sum())
        if l2:
            grad = grad / l2
        cur = data2[c]
        curproj = grad @ cur

        def dist_to_line(point):
            diff = cur - point
            scale = diff @ grad
            return ((diff - scale * grad) ** 2).sum()

        # cumulative prob within own batch
        probs, total = [], []
        for s in restrict2:
            if s == c:
                lp = 0.0
                add = True
            else:
                sp = grad @ data2[s]
                lp = -dist_to_line(data2[s]) / sigma2
                add = sp <= curproj
            total.append(lp)
            if add:
                probs.append(lp)
        # empty numerator: the C++ leaves prob2 at its initial 0 (log-prob 0)
        num = _logsumexp(np.array(probs)) if probs else 0.0
        prob2 = num - _logsumexp(np.array(total))

        # reference batch weighted ECDF
        proj1 = np.array([grad @ data1[o] for o in restrict1])
        lw1 = np.array([-dist_to_line(data1[o]) / sigma2 for o in restrict1])
        order = np.argsort(proj1, kind="stable")
        total1 = _logsumexp(lw1)
        target = prob2 + total1
        ref_quan = proj1[order][-1]
        cum = -np.inf
        for o in order:
            cum = np.logaddexp(cum, lw1[o])
            if cum >= target:
                ref_quan = proj1[o]
                break
        out[c] = (ref_quan - curproj) / l2 if l2 else np.nan
    return out
