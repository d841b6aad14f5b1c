"""correctExperiments/applyMultiSCE parity + lazy low-rank + dimnames.

Mirrors reference scenarios from tests/testthat/test-correct-exps.R
(conflicting assay/colData names, rowData accumulation, add.single
round-trip) and test-apply-multi.R (simplify-back), plus the LowRankMatrix
laziness contract (R/convertPCsToSCE.R:50-72) and .rename_output dimname
propagation (R/utils_multibatch.R:3-33).
"""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from batchelor_tpu import (
    FastMNNParams,
    LowRankOp,
    NoCorrectParams,
    SingleCellDataset,
    apply_multi,
    batch_correct,
    correct_experiments,
    fast_mnn,
    no_correct,
    rescale_batches,
)


def _mkds(rng, n, g=20, prefix="c", extra_meta=None, gene_meta=None):
    gm = {"symbol": np.array([f"s{i}" for i in range(g)], dtype=object)}
    if gene_meta:
        gm.update(gene_meta)
    cm = {"label": np.arange(n) % 3}
    if extra_meta:
        cm.update(extra_meta)
    return SingleCellDataset(
        assays={
            "logcounts": jnp.asarray(rng.normal(size=(n, g))),
            "counts": jnp.asarray(rng.poisson(3, size=(n, g)).astype(float)),
        },
        gene_names=[f"g{i}" for i in range(g)],
        cell_names=[f"{prefix}{i}" for i in range(n)],
        cell_meta=cm,
        gene_meta=gm,
    )


# ---------------------------------------------------------------- LowRankOp


def test_lowrank_op_matches_dense(rng):
    rot = jnp.asarray(rng.normal(size=(30, 5)))
    cor = jnp.asarray(rng.normal(size=(40, 5)))
    op = LowRankOp(rot, cor)
    dense = np.asarray(rot @ cor.T)
    assert op.shape == (30, 40)
    assert np.allclose(np.asarray(op.materialize()), dense)
    assert np.allclose(np.asarray(op.block([0, 3], [1, 2])), dense[[0, 3]][:, [1, 2]])
    assert np.allclose(np.asarray(op[2]), dense[2])
    assert np.allclose(np.asarray(op.T[1, :]), dense[:, 1])
    assert op.T.shape == (40, 30)
    # matmul fuses through the factors
    v = rng.normal(size=(40, 3))
    assert np.allclose(np.asarray(op @ v), dense @ v)
    assert np.allclose(np.asarray(v.T @ op.T), v.T @ dense.T)
    assert np.allclose(np.asarray(op.row_sums()), dense.sum(axis=1))
    assert np.allclose(np.asarray(op.col_sums()), dense.sum(axis=0))
    assert np.allclose(np.asarray(op), dense)  # __array__


def test_reconstructed_is_lazy(rng):
    b = [rng.normal(size=(50, 25)), rng.normal(size=(60, 25))]
    res = fast_mnn(b, d=8)
    rec = res.reconstructed()
    assert isinstance(rec, LowRankOp)
    assert rec.shape == (25, 110)
    # blockwise materialization matches the dense product
    dense = np.asarray(res.rotation @ res.corrected.T)
    blk = res.reconstructed(rows=[1, 2], cols=np.arange(10))
    assert np.allclose(np.asarray(blk), dense[[1, 2]][:, :10])


# ------------------------------------------------- correctExperiments parity


def test_correct_experiments_warns_on_conflicts(rng):
    # conflicting cell_meta name 'batch' + gene_meta name 'rotation'
    d1 = _mkds(rng, 40, prefix="x",
               extra_meta={"batch": np.zeros(40)},
               gene_meta={"rotation": np.zeros(20)})
    d2 = _mkds(rng, 50, prefix="y",
               extra_meta={"batch": np.ones(50)},
               gene_meta={"rotation": np.zeros(20)})
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = correct_experiments([d1, d2], params=FastMNNParams(d=5))
    msgs = [str(w.message) for w in rec]
    assert any("cell_meta" in m for m in msgs)
    assert any("gene_meta" in m for m in msgs)
    # the correction's own batch column wins (reference :147)
    assert set(np.asarray(out.cell_meta["batch"]).tolist()) == {0, 1}
    # non-conflicting fields survive
    assert "label" in out.cell_meta
    assert "symbol" in out.gene_meta


def test_correct_experiments_gene_meta_accumulation(rng):
    # non-identical same-named gene_meta across inputs is dropped with warning
    # (reference .accumulate_rowdata, R/correctExperiments.R:154-199)
    d1 = _mkds(rng, 40, gene_meta={"flaky": np.arange(20)})
    d2 = _mkds(rng, 50, gene_meta={"flaky": np.arange(20) + 1})
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = correct_experiments([d1, d2], params=FastMNNParams(d=5))
    assert any("flaky" in str(w.message) for w in rec)
    assert "flaky" not in out.gene_meta
    assert "symbol" in out.gene_meta  # identical across inputs: kept


def test_correct_experiments_add_single_roundtrip(rng):
    # single input + batch vector: output prepends corrected fields onto the
    # original dataset, alts and all (reference .add.single_sce)
    ds = _mkds(rng, 80, prefix="z")
    ds.alts["adt"] = _mkds(rng, 80, g=5)
    ds.metadata["note"] = "hello"
    batch = np.repeat([0, 1], 40)
    out = correct_experiments([ds], batch=batch, params=FastMNNParams(d=6))
    assert "reconstructed" in out.assays
    assert "logcounts" in out.assays and "counts" in out.assays
    assert out.assays["logcounts"].shape == (80, 20)
    assert "adt" in out.alts                      # original alts kept
    assert out.metadata["note"] == "hello"        # original metadata kept
    assert "merge_info" in out.metadata           # merged metadata kept
    assert out.cell_names == [f"z{i}" for i in range(80)]
    assert list(out.cell_meta["label"]) == list(np.arange(80) % 3)


def test_correct_experiments_add_single_subset(rng):
    ds = _mkds(rng, 60)
    batch = np.repeat([0, 1], 30)
    sub = np.arange(10)
    out = correct_experiments(
        [ds], batch=batch, subset_row=sub, params=FastMNNParams(d=4),
        add_single=True,
    )
    # original assays are subset to the corrected gene universe
    assert out.assays["logcounts"].shape == (60, 10)
    assert out.gene_names == [f"g{i}" for i in range(10)]
    assert list(out.gene_meta["symbol"]) == [f"s{i}" for i in range(10)]


def test_correct_experiments_add_single_false(rng):
    ds = _mkds(rng, 60)
    batch = np.repeat([0, 1], 30)
    out = correct_experiments(
        [ds], batch=batch, params=FastMNNParams(d=4), add_single=False
    )
    # fresh dataset: no grafted original assays (single non-list input path)
    assert "logcounts" not in out.assays
    assert "reconstructed" in out.assays


def test_correct_experiments_cell_names_mixed(rng):
    # GENERATE_NAMES: unnamed batches contribute empty strings
    d1 = _mkds(rng, 30, prefix="a")
    d2 = _mkds(rng, 40, prefix="b")
    d2.cell_names = None
    out = correct_experiments([d1, d2], params=FastMNNParams(d=4))
    assert out.cell_names[:30] == [f"a{i}" for i in range(30)]
    assert out.cell_names[30:] == [""] * 40


# ------------------------------------------------------- apply_multi parity


def test_apply_multi_simplify(rng):
    def make(n, prefix):
        ds = _mkds(rng, n, prefix=prefix)
        ds.alts["spike"] = _mkds(rng, n, g=6)
        return ds

    d1, d2 = make(40, "p"), make(50, "q")
    out = apply_multi([d1, d2], correct_experiments, params=FastMNNParams(d=4))
    assert isinstance(out, SingleCellDataset)
    assert out.n_cells == 90
    assert "spike" in out.alts
    assert out.alts["spike"].n_cells == 90


def test_apply_multi_unsimplifiable_warns(rng):
    # non-dataset results cannot simplify -> plain dict, no crash
    d1, d2 = _mkds(rng, 30), _mkds(rng, 35)
    d1.alts["s"] = _mkds(rng, 30, g=4)
    d2.alts["s"] = _mkds(rng, 35, g=4)
    out = apply_multi(
        [d1, d2],
        lambda inputs: batch_correct(
            [x.assay("logcounts") for x in inputs], params=FastMNNParams(d=3)
        ),
    )
    assert set(out) == {"main", "s"}


def test_apply_multi_skip_main_and_alt_args(rng):
    d1, d2 = _mkds(rng, 30), _mkds(rng, 35)
    d1.alts["s"] = _mkds(rng, 30, g=4)
    d2.alts["s"] = _mkds(rng, 35, g=4)
    calls = {}

    def fn(inputs, **kw):
        calls.setdefault("args", []).append(kw)
        return no_correct([x.assay("logcounts") for x in inputs])

    out = apply_multi(
        [d1, d2], fn, main_args=None, alt_args={"s": {"marker": 1}},
        simplify=False,
    )
    assert set(out) == {"s"}
    assert calls["args"] == [{"marker": 1}]


def test_apply_multi_error_context(rng):
    d1, d2 = _mkds(rng, 30), _mkds(rng, 35)

    def boom(inputs):
        raise ValueError("inner")

    with pytest.raises(RuntimeError, match="main experiments"):
        apply_multi([d1, d2], boom)


# ----------------------------------------------------- dimnames propagation


def test_fast_mnn_name_propagation_single_matrix(rng):
    x = rng.normal(size=(50, 15))
    batch = np.array([0, 1] * 25)
    names = [f"cell{i}" for i in range(50)]
    res = fast_mnn(x, batch, d=4, cell_names=names)
    # single input: output order == input order, names pass through
    assert list(res.cell_names) == names


def test_linear_names(rng):
    b1, b2 = rng.normal(size=(20, 10)), rng.normal(size=(25, 10))
    res = rescale_batches(
        [jnp.asarray(b1), jnp.asarray(b2)],
        cell_names=[[f"a{i}" for i in range(20)], [f"b{i}" for i in range(25)]],
        gene_names=[f"g{i}" for i in range(10)],
        subset_row=np.arange(4),
    )
    assert res.corrected.shape == (45, 4)
    assert list(res.gene_names) == [f"g{i}" for i in range(4)]
    assert res.cell_names[0] == "a0" and res.cell_names[20] == "b0"


def test_batch_correct_forwards_names(rng):
    b1, b2 = rng.normal(size=(20, 10)), rng.normal(size=(25, 10))
    res = batch_correct(
        [jnp.asarray(b1), jnp.asarray(b2)],
        params=NoCorrectParams(),
        cell_names=[[f"a{i}" for i in range(20)], None],
        gene_names=[f"g{i}" for i in range(10)],
    )
    assert res.cell_names[0] == "a0" and res.cell_names[20] == ""
    assert list(res.gene_names) == [f"g{i}" for i in range(10)]


# --------------------------------------------------- batch_size always there


def test_batch_size_reported_without_skip(rng):
    b = [rng.normal(size=(40, 12)), rng.normal(size=(45, 12)) + 2.0]
    res = fast_mnn(b, d=5, min_batch_skip=None)
    assert np.isfinite(res.merge_info[0].batch_size)
    assert res.merge_info[0].batch_size > 0
