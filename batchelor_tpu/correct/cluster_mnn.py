"""clusterMNN: cluster-level MNN correction with per-cell propagation.

TPU-native rebuild of clusterMNN (reference R/clusterMNN.R:101-312):
per-batch cluster centroids -> full-rank multi-batch PCA of centroids ->
reducedMNN with k=1 on the centroids -> per-cell propagation via a
variable-bandwidth Gaussian kernel -> meta-clusters as connected components
of the centroid MNN-pair graph.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cosine_norm import apply_cosine_norm, cosine_norm
from ..ops.knn import query_knn
from ..ops.pca import MultiBatchPCAResult, multi_batch_pca
from ..utils.batching import check_batch_consistency, check_restrictions, divide_into_batches
from .fast_mnn import MNNResult, reduced_mnn

__all__ = ["cluster_mnn", "kmeans_clusters", "ClusterMNNResult"]


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("n_clusters", "n_iter", "seed"))
def _kmeans_jit(x: jnp.ndarray, n_clusters: int, n_iter: int, seed: int):
    key = jax.random.PRNGKey(seed)
    n = x.shape[0]
    xsq = jnp.sum(jnp.square(x), axis=1)

    # k-means++ seeding, fully traced
    idx0 = jax.random.randint(key, (), 0, n)
    centers0 = jnp.zeros((n_clusters, x.shape[1]), x.dtype).at[0].set(x[idx0])

    def seed_body(i, carry):
        centers, key = carry
        csq = jnp.sum(jnp.square(centers), axis=1)
        d2 = xsq[:, None] - 2 * x @ centers.T + csq[None, :]
        mask = jnp.arange(n_clusters) < i
        d2 = jnp.min(jnp.where(mask[None, :], d2, jnp.inf), axis=1)
        d2 = jnp.maximum(d2, 0.0)
        key, sub = jax.random.split(key)
        pick = jax.random.categorical(sub, jnp.log(d2 / jnp.sum(d2) + 1e-30))
        return centers.at[i].set(x[pick]), key

    centers, _ = jax.lax.fori_loop(1, n_clusters, seed_body, (centers0, key))

    def step(c, _):
        d2 = xsq[:, None] - 2 * x @ c.T + jnp.sum(jnp.square(c), axis=1)[None, :]
        assign = jnp.argmin(d2, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=n_clusters)
        counts = jax.ops.segment_sum(
            jnp.ones(n, x.dtype), assign, num_segments=n_clusters
        )
        newc = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None], c)
        return newc, None

    c, _ = jax.lax.scan(step, centers, None, length=n_iter)
    d2 = xsq[:, None] - 2 * x @ c.T + jnp.sum(jnp.square(c), axis=1)[None, :]
    return jnp.argmin(d2, axis=1)


def kmeans_clusters(x: jnp.ndarray, n_clusters: int, n_iter: int = 50, seed: int = 0):
    """Deterministic k-means (k-means++ init), one jit call, for the
    auto-clustering path (reference's BlusterParam option,
    R/clusterMNN.R:200-218)."""
    return np.asarray(_kmeans_jit(jnp.asarray(x), n_clusters, n_iter, seed))


def _union_find(n: int, edges: np.ndarray) -> np.ndarray:
    """Connected components; mirrors igraph::components usage at
    reference R/clusterMNN.R:162-165. Dispatches to the native C++ runtime
    when available."""
    from ..native import bindings as nat

    if nat.get_lib() is not None:
        return nat.union_find(n, np.asarray(edges))
    return _union_find_py(n, edges)


def _union_find_py(n: int, edges: np.ndarray) -> np.ndarray:
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for u, v in edges:
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    roots = np.array([find(i) for i in range(n)])
    # relabel components in first-appearance order (igraph membership style)
    labels = {}
    out = np.empty(n, dtype=np.int64)
    for i, r in enumerate(roots):
        if r not in labels:
            labels[r] = len(labels)
        out[i] = labels[r]
    return out


@dataclass
class ClusterMNNResult:
    """clusterMNN outputs.

    corrected: (N_total, d) per-cell corrected coordinates (input order).
    batch: per-cell batch label; cluster: per-cell cluster label.
    cluster_meta: per-centroid table (cluster label, batch, meta component).
    centroid_result: the underlying reducedMNN result on centroids.
    rotation/centers: PCA metadata for low-rank reconstruction.
    """

    corrected: jnp.ndarray
    batch: np.ndarray
    cluster: np.ndarray
    cluster_meta: dict
    centroid_result: MNNResult
    rotation: Optional[jnp.ndarray] = None
    centers: Optional[jnp.ndarray] = None

    def reconstructed(self):
        """Lazy low-rank per-gene values (cf. MNNResult.reconstructed)."""
        from ..ops.lowrank import LowRankOp

        return LowRankOp(self.rotation, self.corrected)


def _compute_centroids(batches, clusters, restrict):
    """Per-batch, per-cluster mean profiles over restricted cells
    (reference .compute_centroids, R/clusterMNN.R:228-242).
    Returns (centers list [(C_b, G)], level lists)."""
    centers, levels = [], []
    for i, (b, cl) in enumerate(zip(batches, clusters)):
        cl = np.asarray(cl)
        bsel = b
        if restrict is not None and restrict[i] is not None:
            ridx = np.asarray(restrict[i])
            cl = cl[ridx]
            bsel = b[jnp.asarray(ridx)]
        lv = sorted(set(cl.tolist()))
        lookup = {v: j for j, v in enumerate(lv)}
        assign = np.array([lookup[v] for v in cl.tolist()])
        sums = jax.ops.segment_sum(bsel, jnp.asarray(assign), num_segments=len(lv))
        counts = np.bincount(assign, minlength=len(lv)).astype(np.float64)
        centers.append(sums / jnp.asarray(counts)[:, None])
        levels.append(lv)
    return centers, levels


def cluster_mnn(
    batches_or_single,
    batch: Optional[Sequence] = None,
    *,
    clusters,
    restrict=None,
    cos_norm: bool = True,
    merge_order=None,
    auto_merge: bool = False,
    min_batch_skip: Optional[float] = 0.0,
    subset_row: Optional[np.ndarray] = None,
    correct_all: bool = False,
    batch_names: Optional[Sequence[str]] = None,
) -> ClusterMNNResult:
    """Cluster-level MNN correction (reference clusterMNN, R/clusterMNN.R:101-176).

    ``clusters``: list of per-batch cluster label vectors (or a single vector
    for single-matrix input), or an int K to auto-cluster each batch with
    k-means on its top-50 PCs.
    """
    single = not isinstance(batches_or_single, (list, tuple))
    if single:
        x = jnp.asarray(batches_or_single)
        if batch is None:
            raise ValueError("'batch' must be specified for a single input matrix")
        divided = divide_into_batches(
            np.arange(x.shape[0]), batch, cells_in_rows=True, restrict=restrict
        )
        batches = [x[jnp.asarray(idx)] for idx in divided.batches]
        restrict = divided.restricted
        if batch_names is None:
            batch_names = [str(n) for n in divided.names]
        if not isinstance(clusters, int):
            cl = np.asarray(clusters)
            clusters = [cl[idx] for idx in divided.batches]
    else:
        batches = [jnp.asarray(b) for b in batches_or_single]
        check_batch_consistency(batches, cells_in_rows=True)
        restrict = check_restrictions(batches, restrict, cells_in_rows=True)

    nb = len(batches)
    if isinstance(clusters, int):
        kk = clusters
        clusters = []
        for b in batches:
            sub = b if subset_row is None else b[:, jnp.asarray(np.asarray(subset_row))]
            pcs = multi_batch_pca([sub], d=min(50, sub.shape[0] - 1, sub.shape[1])).components[0]
            clusters.append(kmeans_clusters(pcs, kk))
    if len(clusters) != nb:
        raise ValueError("'clusters' should have one entry per batch")

    if cos_norm:
        l2s = [cosine_norm(b, mode="l2norm", subset_row=subset_row) for b in batches]
        batches_n = [apply_cosine_norm(b, l2) for b, l2 in zip(batches, l2s)]
    else:
        batches_n = batches

    centers, levels = _compute_centroids(batches_n, clusters, restrict)

    # full-rank PCA of the centroids (reference .full_rank_pca,
    # R/clusterMNN.R:174-184): d = total#centroids - 1, exact.
    total_centroids = sum(c.shape[0] for c in centers)
    # "gram" picks the smaller-side cross-product: with few centroids this
    # is a tiny (n_centroids x n_centroids) eigh. (jnp.linalg.svd compiles
    # pathologically slowly on TPU, so avoid "direct" here.)
    pca = multi_batch_pca(
        centers,
        d=total_centroids - 1,
        subset_row=subset_row,
        get_all_genes=correct_all and subset_row is not None,
        method="gram",
        batch_names=batch_names,
    )

    merge_out = reduced_mnn(
        [jnp.asarray(c) for c in pca.components],
        k=1,
        merge_order=merge_order,
        auto_merge=auto_merge,
        min_batch_skip=min_batch_skip,
        batch_names=batch_names,
    )

    # Per-cell propagation (reference .propagate_to_cells,
    # R/clusterMNN.R:250-312).
    rotation = pca.rotation
    centers_vec = pca.centers
    if correct_all and subset_row is not None:
        s = jnp.asarray(np.asarray(subset_row))
        rotation = rotation[s]
        centers_vec = centers_vec[s]
    adj = centers_vec @ rotation

    corrected_blocks = []
    cluster_labels = []
    last = 0
    merged_corrected = merge_out.corrected
    for i in range(nb):
        b = batches_n[i]
        sub = b if subset_row is None else b[:, jnp.asarray(np.asarray(subset_row))]
        proj = sub @ rotation - adj[None, :]
        cent = pca.components[i]
        ncent = cent.shape[0]
        idx = jnp.arange(last, last + ncent)
        last += ncent
        corrected_cent = merged_corrected[idx]
        delta = corrected_cent - cent
        # sigma: median distance of (restricted) cells to nearest centroid
        q = proj
        if restrict is not None and restrict[i] is not None:
            q = proj[jnp.asarray(np.asarray(restrict[i]))]
        _, dist = query_knn(q, cent, 1)
        sigma = jnp.median(dist[:, 0])
        # softmax-weighted delta (reference .smooth_gaussian_from_centroids)
        d2 = (
            jnp.sum(jnp.square(proj), axis=1)[:, None]
            - 2 * proj @ cent.T
            + jnp.sum(jnp.square(cent), axis=1)[None, :]
        )
        w = jax.nn.softmax(-d2 / jnp.square(sigma), axis=1)
        corrected_blocks.append(proj + w @ delta)
        cluster_labels.append(np.asarray(clusters[i]))

    corrected = jnp.concatenate(corrected_blocks, axis=0)
    cluster = np.concatenate(cluster_labels)
    origin = np.repeat(np.arange(nb), [b.shape[0] for b in batches])
    labels = (
        np.asarray(batch_names)[origin] if batch_names is not None else origin
    )

    # Meta-clusters: connected components of the centroid pair graph
    # (reference R/clusterMNN.R:162-165).
    all_pairs = np.concatenate(
        [info.pairs for info in merge_out.merge_info]
    ) if merge_out.merge_info else np.empty((0, 2), dtype=np.int64)
    meta = _union_find(total_centroids, all_pairs)
    centroid_batches = np.repeat(np.arange(nb), [len(lv) for lv in levels])
    cluster_meta = {
        "cluster": np.concatenate([np.asarray(lv) for lv in levels]),
        "batch": (
            np.asarray(batch_names)[centroid_batches]
            if batch_names is not None
            else centroid_batches
        ),
        "meta": meta,
    }

    if single:
        reo = divided.reorder
        corrected = corrected[jnp.asarray(reo)]
        labels = labels[reo]
        cluster = cluster[reo]

    return ClusterMNNResult(
        corrected=corrected,
        batch=labels,
        cluster=cluster,
        cluster_meta=cluster_meta,
        centroid_result=merge_out,
        rotation=pca.rotation,
        centers=pca.centers,
    )
