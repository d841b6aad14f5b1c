"""Classic mnnCorrect: gene-space MNN correction with Gaussian smoothing.

TPU-native rebuild of mnnCorrect (reference R/mnnCorrect.R:125-538): MNN
pairs in (cosine-normalized) gene space, per-cell correction vectors from
Gaussian-kernel smoothing of per-MNN averages, optional biological-subspace
removal (svd_dim) and quantile-matching variance adjustment (var_adj).

Returns per-gene corrected values, unlike fastMNN's low-dimensional output.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.correction import average_correction
from ..ops.cosine_norm import apply_cosine_norm, cosine_norm
from ..ops.gaussian_kernel import smooth_gaussian_kernel
from ..ops.mutual_nn import restricted_mnn
from ..ops.shift_variance import adjust_shift_variance
from ..ops.svd import get_bio_span, subtract_bio
from ..utils.batching import (
    check_batch_consistency,
    check_restrictions,
    combine_restrict,
    divide_into_batches,
    reindex_pairings,
    restore_original_order,
)
from ..utils.trees import MergeNode, create_tree_predefined, get_next_merge, update_tree
from .fast_mnn import MergeStepInfo, MNNResult, _init_auto_search, _pick_best_merge

__all__ = ["mnn_correct"]


def _compute_correction_vectors(data1, data2, s1, s2, dist_data, sigma):
    """Smoothed per-cell correction vectors (reference
    .compute_correction_vectors, R/mnnCorrect.R:451-460): average the pair
    differences per involved right cell, then Gaussian-smooth over all right
    cells using distances in ``dist_data`` space."""
    averaged, uniq = average_correction(data1, s1, data2, s2)
    return smooth_gaussian_kernel(averaged, uniq, dist_data, sigma)


def _prepare_input_data(batches, cos_norm_in, cos_norm_out, subset_row, correct_all):
    """in/out matrix preparation (reference .prepare_input_data,
    R/mnnCorrect.R:398-442). Returns (in_batches, out_batches, subset, same_set)."""
    nb = len(batches)
    in_batches = list(batches)
    out_batches = list(batches)
    same_set = True

    if subset_row is not None:
        subset_row = np.asarray(subset_row)
        if np.array_equal(subset_row, np.arange(batches[0].shape[1])):
            subset_row = None
        else:
            in_batches = [b[:, jnp.asarray(subset_row)] for b in in_batches]
            if correct_all:
                same_set = False
            else:
                out_batches = list(in_batches)

    norm_scaling = None
    if cos_norm_in:
        normed, norm_scaling = [], []
        for b in in_batches:
            mat, l2 = cosine_norm(b, mode="all")
            normed.append(mat)
            norm_scaling.append(l2)
        in_batches = normed
    if cos_norm_out:
        if not cos_norm_in:
            norm_scaling = [cosine_norm(b, mode="l2norm") for b in in_batches]
        out_batches = [
            apply_cosine_norm(o, l2) for o, l2 in zip(out_batches, norm_scaling)
        ]
    if cos_norm_out != cos_norm_in:
        same_set = False

    return in_batches, out_batches, subset_row, same_set


def mnn_correct(
    batches_or_single,
    batch: Optional[Sequence] = None,
    *,
    k: int = 20,
    prop_k: Optional[float] = None,
    sigma: float = 0.1,
    cos_norm_in: bool = True,
    cos_norm_out: bool = True,
    svd_dim: int = 0,
    var_adj: bool = True,
    subset_row: Optional[np.ndarray] = None,
    correct_all: bool = False,
    restrict=None,
    merge_order=None,
    auto_merge: bool = False,
    batch_names: Optional[Sequence[str]] = None,
    knn_method: str = "exact",
    cell_names=None,
    gene_names=None,
) -> MNNResult:
    """Classic MNN correction (reference mnnCorrect, R/mnnCorrect.R:125-168).

    Input: list of (N_b, G) matrices (cells in rows) or a single matrix plus
    ``batch``. Output ``corrected`` is (N_total, G_out) per-gene values in
    input cell order (G_out = subset size unless correct_all).
    ``cell_names``/``gene_names`` propagate to the result like the
    reference's .rename_output (R/utils_multibatch.R:3-33).
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
    else:
        batches = [jnp.asarray(b) for b in batches_or_single]
        if len(batches) < 2:
            raise ValueError("at least two batches must be specified")
        check_batch_consistency(batches, cells_in_rows=True)
        restrict = check_restrictions(batches, restrict, cells_in_rows=True)

    nb = len(batches)
    in_b, out_b, subset_row, same_set = _prepare_input_data(
        batches, cos_norm_in, cos_norm_out, subset_row, correct_all
    )
    if restrict is None:
        restrict = [None] * nb

    def leaf_extras(i):
        return [None] if same_set else [out_b[i]]

    if not auto_merge:
        tree = create_tree_predefined(
            in_b, restrict, merge_order, batch_names, leaf_extras=leaf_extras
        )
        remainders = stats = None
    else:
        remainders = [
            MergeNode.leaf(i, in_b[i], restrict[i], extras=leaf_extras(i))
            for i in range(nb)
        ]
        stats = _init_auto_search(remainders, k, prop_k, orthogonalize=False)
        tree = None

    nmerges = nb - 1
    left_sets: List[list] = [None] * nmerges
    right_sets: List[list] = [None] * nmerges
    raw_pairs: List[np.ndarray] = [None] * nmerges
    final_node = None

    for mdx in range(nmerges):
        if not auto_merge:
            left, right, path = get_next_merge(tree)
        else:
            li, ri = _pick_best_merge(stats)
            left, right = remainders[li], remainders[ri]

        left_sets[mdx] = list(left.index)
        right_sets[mdx] = list(right.index)
        left_out = left.extras[0]
        right_out = right.extras[0]

        pairs = restricted_mnn(
            left.data, left.restrict, right.data, right.restrict,
            k=k, prop_k=prop_k, method=knn_method,
        )
        if pairs.first.shape[0] == 0:
            raise ValueError(f"no MNN pairs found at merge step {mdx}")
        s1, s2 = pairs.first, pairs.second
        raw_pairs[mdx] = np.stack([s1, s2], axis=1)

        corr_in = _compute_correction_vectors(
            left.data, right.data, s1, s2, right.data, sigma
        )
        if not same_set:
            # distances intentionally come from the "in" coordinates so the
            # kernel scale matches sigma (reference R/mnnCorrect.R:299-304).
            corr_out = _compute_correction_vectors(
                left_out, right_out, s1, s2, right.data, sigma
            )

        if svd_dim > 0:
            u1 = np.unique(s1)
            u2 = np.unique(s2)
            span1 = get_bio_span(left.data[jnp.asarray(u1)], svd_dim)
            span2 = get_bio_span(right.data[jnp.asarray(u2)], svd_dim)
            corr_in = subtract_bio(corr_in, span1, span2)
            if not same_set:
                ospan1 = get_bio_span(
                    left_out[jnp.asarray(u1)], svd_dim, subset_row=subset_row
                )
                ospan2 = get_bio_span(
                    right_out[jnp.asarray(u2)], svd_dim, subset_row=subset_row
                )
                corr_out = subtract_bio(corr_out, ospan1, ospan2, subset_row=subset_row)

        if var_adj:
            corr_in = adjust_shift_variance(
                left.data, right.data, corr_in, sigma,
                restrict1=left.restrict, restrict2=right.restrict,
            )
            if not same_set:
                corr_out = adjust_shift_variance(
                    left_out, right_out, corr_out, sigma,
                    restrict1=left.restrict, restrict2=right.restrict,
                    subset_row=subset_row,
                )

        right_data = right.data + corr_in
        if not same_set:
            right_out = right_out + corr_out

        merged = MergeNode(
            index=list(left.index) + list(right.index),
            data=jnp.concatenate([left.data, right_data], axis=0),
            restrict=combine_restrict(
                left.data.shape[0], left.restrict, right_data.shape[0], right.restrict
            ),
            origin=np.concatenate([left.origin, right.origin]),
            extras=[
                None
                if same_set
                else jnp.concatenate([left_out, right_out], axis=0)
            ],
        )

        if not auto_merge:
            tree = update_tree(tree, path, merged)
            if not isinstance(tree, list):
                final_node = tree
        else:
            keep = [x for t, x in enumerate(remainders) if t not in (li, ri)]
            kept_idx = [t for t in range(len(remainders)) if t not in (li, ri)]
            old = stats[np.ix_(kept_idx, kept_idx)]
            new_counts = [
                _count_pairs_noorth(merged, other, k, prop_k) for other in keep
            ]
            n_new = len(keep) + 1
            stats = np.zeros((n_new, n_new), dtype=np.int64)
            stats[: len(keep), : len(keep)] = old
            stats[len(keep), : len(keep)] = np.asarray(new_counts, dtype=np.int64)
            remainders = keep + [merged]
            if len(remainders) == 1:
                final_node = merged

    assert final_node is not None
    full_data = final_node.data if same_set else final_node.extras[0]
    full_order = final_node.index
    full_origin = final_node.origin

    pairings = []
    origin_list = full_origin.tolist()
    for mdx in range(nmerges):
        p = raw_pairs[mdx].copy()
        p[:, 0] += origin_list.index(left_sets[mdx][0])
        p[:, 1] += origin_list.index(right_sets[mdx][0])
        pairings.append(p)

    if any(full_order[i] > full_order[i + 1] for i in range(len(full_order) - 1)):
        ncells = np.bincount(full_origin, minlength=nb)
        ordering = restore_original_order(full_order, ncells)
        full_data = full_data[jnp.asarray(ordering)]
        full_origin = full_origin[ordering]
        pairings = reindex_pairings(pairings, ordering)

    merge_info = [
        MergeStepInfo(
            left=left_sets[m],
            right=right_sets[m],
            pairs=pairings[m],
            batch_size=np.nan,
            skipped=False,
            lost_var=np.full(nb, np.nan),
        )
        for m in range(nmerges)
    ]

    batch_labels = full_origin
    if batch_names is not None:
        names = np.asarray(batch_names)
        if len(set(batch_names)) != len(batch_names):
            raise ValueError("names of batches should be unique")
        batch_labels = names[full_origin]
        for info in merge_info:
            info.left = [batch_names[i] for i in info.left]
            info.right = [batch_names[i] for i in info.right]

    out = MNNResult(
        corrected=full_data,
        batch=batch_labels,
        merge_info=merge_info,
        batch_names=list(batch_names) if batch_names is not None else None,
    )
    if single:
        reo = divided.reorder
        out.corrected = out.corrected[jnp.asarray(reo)]
        out.batch = out.batch[reo]
        new_pairs = reindex_pairings([i.pairs for i in out.merge_info], reo)
        for info, p in zip(out.merge_info, new_pairs):
            info.pairs = p
    if cell_names is not None:
        if single:
            out.cell_names = np.asarray(cell_names, dtype=object)
        else:
            from ..utils.batching import generate_cell_names

            out.cell_names = generate_cell_names(
                cell_names, [b.shape[0] for b in batches]
            )
    if gene_names is not None:
        gn = np.asarray(gene_names, dtype=object)
        if subset_row is not None and not correct_all:
            gn = gn[np.asarray(subset_row)]
        out.gene_names = gn
    return out


def _count_pairs_noorth(left: MergeNode, right: MergeNode, k, prop_k) -> int:
    pairs = restricted_mnn(
        left.data, left.restrict, right.data, right.restrict, k=k, prop_k=prop_k
    )
    return int(pairs.first.shape[0])
