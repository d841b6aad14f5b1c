"""Dataset container + high-level pipelines.

TPU-native analogs of the reference's SingleCellExperiment-level layer:
  * SingleCellDataset — a minimal AnnData/SCE-like container (assays keyed
    by name, per-cell/per-gene metadata, reduced dims, alternative
    experiments);
  * correct_experiments — run batch_correct and graft the uncorrected
    assays/metadata back on (reference R/correctExperiments.R:72-227);
  * quick_correct — intersect -> multiBatchNorm -> HVG modelling ->
    batch_correct (reference R/quickCorrect.R:66-120);
  * apply_multi — apply a correction over main + alternative experiments
    (reference R/applyMultiSCE.R:115-213).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.normalization import multi_batch_norm
from ..ops.stats import combine_var, get_top_hvgs, model_gene_var
from ..utils.batching import intersect_rows
from .dispatch import BatchelorParams, FastMNNParams, batch_correct
from .fast_mnn import MNNResult

__all__ = [
    "SingleCellDataset",
    "correct_experiments",
    "quick_correct",
    "apply_multi",
    "QuickCorrectResult",
]


@dataclass
class SingleCellDataset:
    """Minimal single-cell container: cells in rows.

    assays: name -> (N, G) matrix; gene_names: length G; cell_names: length N.
    cell_meta/gene_meta: column name -> length-N / length-G arrays.
    reduced: name -> (N, d) matrices. alts: name -> nested datasets.
    """

    assays: Dict[str, Any]
    gene_names: Optional[List[str]] = None
    cell_names: Optional[List[str]] = None
    cell_meta: Dict[str, np.ndarray] = field(default_factory=dict)
    gene_meta: Dict[str, Any] = field(default_factory=dict)
    reduced: Dict[str, Any] = field(default_factory=dict)
    alts: Dict[str, "SingleCellDataset"] = field(default_factory=dict)
    metadata: Dict[str, Any] = field(default_factory=dict)

    @property
    def n_cells(self) -> int:
        return next(iter(self.assays.values())).shape[0]

    @property
    def n_genes(self) -> int:
        return next(iter(self.assays.values())).shape[1]

    def assay(self, name: str = "logcounts"):
        return self.assays[name]


def _as_matrices(inputs, assay_type):
    out = []
    for x in inputs:
        if isinstance(x, SingleCellDataset):
            out.append(jnp.asarray(x.assay(assay_type)))
        else:
            out.append(jnp.asarray(x))
    return out


def correct_experiments(
    inputs: Sequence,
    batch: Optional[Sequence] = None,
    *,
    restrict=None,
    subset_row=None,
    correct_all: bool = False,
    assay_type: str = "logcounts",
    params: Optional[BatchelorParams] = None,
    batch_names: Optional[Sequence[str]] = None,
) -> SingleCellDataset:
    """Run batch_correct and graft the original (uncorrected) assays,
    cell metadata and gene metadata onto the merged result
    (reference correctExperiments, R/correctExperiments.R:72-227).
    """
    mats = _as_matrices(inputs, assay_type)
    res = batch_correct(
        mats if len(mats) > 1 else mats[0],
        batch,
        restrict=restrict,
        subset_row=subset_row,
        correct_all=correct_all,
        params=params,
        batch_names=batch_names,
    )

    keep_genes = None
    if subset_row is not None and not correct_all:
        keep_genes = np.asarray(subset_row)

    assays: Dict[str, Any] = {}
    corrected = res.corrected
    if isinstance(res, MNNResult) and res.rotation is not None:
        assays["reconstructed"] = (res.rotation @ corrected.T).T
        reduced = {"corrected": corrected}
    else:
        assays["corrected"] = corrected
        reduced = {}

    # graft original assays (cbind across inputs, subsetting genes to match)
    ds_inputs = [x for x in inputs if isinstance(x, SingleCellDataset)]
    if len(ds_inputs) == len(inputs) and len(inputs) > 1:
        names = set(inputs[0].assays)
        for other in inputs[1:]:
            names &= set(other.assays)
        for nm in sorted(names):
            stacked = jnp.concatenate([jnp.asarray(x.assays[nm]) for x in inputs], axis=0)
            if keep_genes is not None:
                stacked = stacked[:, jnp.asarray(keep_genes)]
            assays[nm] = stacked

    cell_meta: Dict[str, np.ndarray] = {"batch": np.asarray(res.batch)}
    if ds_inputs and len(ds_inputs) == len(inputs) and len(inputs) > 1:
        common = set(inputs[0].cell_meta)
        for other in inputs[1:]:
            common &= set(other.cell_meta)
        for nm in sorted(common):
            if nm == "batch":
                continue  # the corrected batch column wins (reference :147)
            cell_meta[nm] = np.concatenate([np.asarray(x.cell_meta[nm]) for x in inputs])

    gene_names = None
    if ds_inputs and inputs[0].gene_names is not None:
        gene_names = list(inputs[0].gene_names)
        if keep_genes is not None:
            gene_names = [gene_names[i] for i in keep_genes]

    gene_meta: Dict[str, Any] = {}
    if isinstance(res, MNNResult) and res.rotation is not None:
        gene_meta["rotation"] = res.rotation

    meta: Dict[str, Any] = {}
    if isinstance(res, MNNResult):
        meta["merge_info"] = res.merge_info
        meta["pca_info"] = {
            "centers": res.centers,
            "var_explained": res.var_explained,
            "var_total": res.var_total,
        }

    return SingleCellDataset(
        assays=assays,
        gene_names=gene_names,
        cell_meta=cell_meta,
        gene_meta=gene_meta,
        reduced=reduced,
        metadata=meta,
    )


@dataclass
class QuickCorrectResult:
    """quick_correct outputs: variance decomposition, chosen HVGs, and the
    corrected result (reference R/quickCorrect.R return value)."""

    dec: Any
    hvgs: np.ndarray
    corrected: Any


def quick_correct(
    inputs: Sequence,
    batch: Optional[Sequence] = None,
    *,
    restrict=None,
    correct_all: bool = True,
    assay_type: str = "counts",
    params: Optional[BatchelorParams] = None,
    precomputed=None,
    hvg_n: int = 5000,
    min_mean: float = 1.0,
    gene_names: Optional[Sequence[Sequence[str]]] = None,
    batch_names: Optional[Sequence[str]] = None,
) -> QuickCorrectResult:
    """End-to-end pipeline: intersect genes -> multi_batch_norm -> per-batch
    HVG modelling -> batch_correct on top HVGs
    (reference quickCorrect, R/quickCorrect.R:66-120)."""
    mats = _as_matrices(inputs, assay_type)
    if gene_names is not None:
        mats, _ = intersect_rows(mats, gene_names)

    single = len(mats) == 1
    if single:
        if batch is None:
            raise ValueError("'batch' must be specified with a single input")
        batch = np.asarray(batch)
        split = [np.nonzero(batch == b)[0] for b in sorted(set(batch.tolist()))]
        per_batch = [mats[0][jnp.asarray(i)] for i in split]
    else:
        per_batch = mats

    norm = multi_batch_norm(per_batch, min_mean=min_mean)
    logs = norm.logcounts

    if precomputed is None:
        decs = [model_gene_var(lg) for lg in logs]
        dec = combine_var(decs) if len(decs) > 1 else decs[0]
    else:
        dec = combine_var(list(precomputed)) if len(mats) > 1 else precomputed[0]

    hvgs = get_top_hvgs(dec, n=hvg_n)

    if single:
        # stitch normalized per-batch blocks back into input order
        order = np.concatenate(split)
        inv = np.empty_like(order)
        inv[order] = np.arange(order.shape[0])
        stacked = jnp.concatenate(logs, axis=0)[jnp.asarray(inv)]
        corrected = batch_correct(
            stacked, batch, restrict=restrict, subset_row=hvgs,
            correct_all=correct_all, params=params, batch_names=batch_names,
        )
    else:
        corrected = batch_correct(
            logs, restrict=restrict, subset_row=hvgs,
            correct_all=correct_all, params=params, batch_names=batch_names,
        )
    return QuickCorrectResult(dec=dec, hvgs=hvgs, corrected=corrected)


def apply_multi(
    inputs: Sequence[SingleCellDataset],
    fn: Callable[..., Any],
    *,
    which_alts: Optional[Sequence[str]] = None,
    **kwargs,
) -> Dict[str, Any]:
    """Apply a correction over the main and alternative experiments of
    multiple datasets (reference applyMultiSCE, R/applyMultiSCE.R:115-213).

    Returns {"main": result, "<alt name>": result, ...}; alternative
    experiments present in every input are processed (or ``which_alts``).
    """
    out = {"main": fn(list(inputs), **kwargs)}
    if which_alts is None:
        common = set(inputs[0].alts)
        for other in inputs[1:]:
            common &= set(other.alts)
        which_alts = sorted(common)
    for nm in which_alts:
        out[nm] = fn([x.alts[nm] for x in inputs], **kwargs)
    return out
