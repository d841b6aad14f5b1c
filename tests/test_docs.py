"""Docs stay honest: every API name and keyword the guides in docs/ use
must exist with the claimed signature. Pure introspection — execution of
the heavier snippets is covered by the functional test modules."""
import inspect
import os
import re

import batchelor_tpu as bt

DOCS = os.path.join(os.path.dirname(__file__), os.pardir, "docs")


def test_guides_exist():
    for name in ("correction.md", "extension.md"):
        assert os.path.exists(os.path.join(DOCS, name)), name


def _kwargs_of(fn):
    return set(inspect.signature(fn).parameters)


def test_correction_guide_names():
    # top-level functions the tour calls
    for name in (
        "fast_mnn", "reduced_mnn", "mnn_correct", "cluster_mnn",
        "rescale_batches", "regress_batches", "no_correct", "batch_correct",
        "multi_batch_norm", "multi_batch_pca", "quick_correct",
        "quick_correct_csr", "mnn_delta_variance", "cluster_abundance_test",
        "cluster_abundance_var",
    ):
        assert callable(getattr(bt, name)), name

    # keyword arguments the prose promises
    assert {"k", "prop_k", "ndist", "d", "min_batch_skip", "get_variance",
            "merge_order", "auto_merge", "subset_row", "correct_all",
            "restrict", "batch"} <= _kwargs_of(bt.fast_mnn)
    assert {"sigma", "svd_dim", "var_adj"} <= _kwargs_of(bt.mnn_correct)
    assert {"clusters"} <= _kwargs_of(bt.cluster_mnn)
    assert {"design", "keep", "d"} <= _kwargs_of(bt.regress_batches)
    assert {"weights", "method", "get_variance"} <= _kwargs_of(bt.multi_batch_pca)
    assert {"gene_names", "hvg_n", "precomputed"} <= _kwargs_of(bt.quick_correct)
    assert {"pairs"} <= _kwargs_of(bt.mnn_delta_variance)

    # result attributes referenced in the guide
    mnn_fields = {f.name for f in bt.MNNResult.__dataclass_fields__.values()}
    assert {"corrected", "batch", "merge_info", "rotation"} <= mnn_fields
    assert callable(bt.MNNResult.reconstructed)
    step_fields = set(bt.MergeStepInfo.__dataclass_fields__)
    assert {"pairs", "batch_size", "lost_var"} <= step_fields
    assert {"corrected", "cluster_meta"} <= set(
        bt.ClusterMNNResult.__dataclass_fields__
    )
    from batchelor_tpu.ops.normalization import MultiBatchNormResult
    assert {"logcounts", "size_factors"} <= set(
        MultiBatchNormResult.__dataclass_fields__
    )
    assert {"components", "rotation", "centers", "var_explained"} <= set(
        bt.MultiBatchPCAResult.__dataclass_fields__
    )

    # the scale-out entry points the guide imports
    from batchelor_tpu.parallel import make_cells_mesh, distributed_fast_mnn

    assert {"k", "knn_method", "memory"} <= _kwargs_of(distributed_fast_mnn)
    assert callable(make_cells_mesh)


def test_extension_guide_contract():
    from batchelor_tpu import BatchelorParams, register_correction
    from batchelor_tpu.correct.linear import LinearCorrectionResult

    assert {"corrected", "batch"} <= set(
        LinearCorrectionResult.__dataclass_fields__
    )
    assert {"restrict", "subset_row", "correct_all", "params"} <= _kwargs_of(
        bt.batch_correct
    )
    assert callable(register_correction)
    assert isinstance(bt.FastMNNParams(), BatchelorParams)


def test_doc_code_blocks_reference_real_attributes():
    """Every ``bt.<name>`` / ``res.<attr>``-style token inside fenced code
    blocks of the guides resolves against the package or a result class."""
    known_attrs = set()
    for cls in (bt.MNNResult, bt.MergeStepInfo, bt.ClusterMNNResult,
                bt.MultiBatchPCAResult):
        known_attrs |= set(cls.__dataclass_fields__)
        known_attrs |= {n for n, _ in inspect.getmembers(cls)}
    text = open(os.path.join(DOCS, "correction.md")).read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    for block in blocks:
        for name in re.findall(r"\bbt\.(\w+)", block):
            assert hasattr(bt, name), f"docs use bt.{name}, not exported"
