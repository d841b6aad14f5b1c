"""Sparse gene-space corrections over CSR stores vs the dense pipeline.

VERDICT r1 item 6: rescaleBatches' sparsity preservation
(reference R/rescaleBatches.R:150-182), lazy regress residuals
(R/regressBatches.R:148), and classic mnnCorrect fed from CSR stores.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from batchelor_tpu import (
    CSRCells,
    mnn_correct,
    mnn_correct_csr,
    regress_batches,
    regress_batches_csr,
    rescale_batches,
    rescale_batches_csr,
)


def _sparse_logcounts(rng, n, g, density=0.3, scale=1.0):
    x = rng.poisson(scale, size=(n, g)).astype(np.float64)
    x *= rng.uniform(size=(n, g)) < density
    return np.log2(x + 1)


def test_rescale_batches_csr_matches_dense(rng):
    b1 = _sparse_logcounts(rng, 60, 40, scale=3.0)
    b2 = _sparse_logcounts(rng, 80, 40, scale=6.0)
    stores = [CSRCells.from_dense(b1.astype(np.float32)),
              CSRCells.from_dense(b2.astype(np.float32))]
    dense = rescale_batches([jnp.asarray(b1, jnp.float32),
                             jnp.asarray(b2, jnp.float32)])
    out = rescale_batches_csr(stores)
    d = np.asarray(dense.corrected)
    got = np.vstack([s.to_dense() for s in out])
    assert np.allclose(got, d, atol=1e-5)
    # sparsity pattern unchanged
    for s_in, s_out in zip(stores, out):
        assert np.array_equal(s_in.indices, s_out.indices)
        assert np.array_equal(s_in.indptr, s_out.indptr)


def test_rescale_batches_csr_restrict_and_subset(rng):
    b1 = _sparse_logcounts(rng, 50, 30, scale=3.0)
    b2 = _sparse_logcounts(rng, 70, 30, scale=5.0)
    res = [np.arange(0, 50, 2), None]
    sub = np.arange(10)
    stores = [CSRCells.from_dense(b1.astype(np.float32)),
              CSRCells.from_dense(b2.astype(np.float32))]
    dense = rescale_batches(
        [jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)],
        restrict=res, subset_row=sub,
    )
    out = rescale_batches_csr(stores, restrict=res, subset_row=sub)
    got = np.vstack([s.to_dense() for s in out])
    assert got.shape[1] == 10
    assert np.allclose(got, np.asarray(dense.corrected), atol=1e-5)
    with pytest.raises(ValueError, match="pseudo_count"):
        rescale_batches_csr(stores, pseudo_count=2.0)


def test_regress_batches_csr_matches_dense(rng):
    b1 = _sparse_logcounts(rng, 40, 25)
    b2 = _sparse_logcounts(rng, 50, 25)
    stores = [CSRCells.from_dense(b1.astype(np.float32)),
              CSRCells.from_dense(b2.astype(np.float32))]
    dense = regress_batches([jnp.asarray(b1, jnp.float32),
                             jnp.asarray(b2, jnp.float32)])
    op = regress_batches_csr(stores, block_rows=16)
    assert op.shape == (90, 25)
    assert np.allclose(op.materialize(), np.asarray(dense.corrected), atol=1e-4)
    # blockwise access matches the full materialization
    full = op.materialize()
    assert np.allclose(op.block(10, 30), full[10:30])
    blocks = [blk for blk, _ in op.blocks(block_rows=13)]
    assert np.allclose(np.vstack(blocks), full)


def test_regress_batches_csr_restrict_keep(rng):
    b1 = _sparse_logcounts(rng, 40, 20)
    b2 = _sparse_logcounts(rng, 50, 20)
    res = [np.arange(0, 40, 2), np.arange(25)]
    stores = [CSRCells.from_dense(b1.astype(np.float32)),
              CSRCells.from_dense(b2.astype(np.float32))]
    dense = regress_batches(
        [jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)],
        restrict=res, keep=[0],
    )
    op = regress_batches_csr(stores, restrict=res, keep=[0], block_rows=16)
    assert np.allclose(op.materialize(), np.asarray(dense.corrected), atol=1e-4)


def test_mnn_correct_csr_matches_dense(rng):
    b1 = (_sparse_logcounts(rng, 50, 30, density=0.6) + 0.0).astype(np.float32)
    b2 = (_sparse_logcounts(rng, 60, 30, density=0.6) + 0.5).astype(np.float32)
    stores = [CSRCells.from_dense(b1), CSRCells.from_dense(b2)]
    sub = np.arange(15)
    dense = mnn_correct(
        [jnp.asarray(b1), jnp.asarray(b2)], subset_row=sub, var_adj=False,
    )
    out = mnn_correct_csr(stores, subset_row=sub, var_adj=False)
    assert np.allclose(
        np.asarray(out.corrected), np.asarray(dense.corrected), atol=1e-5
    )
    # correct_all keeps the full gene set as the working set
    out_all = mnn_correct_csr(stores, subset_row=sub, correct_all=True,
                              var_adj=False)
    dense_all = mnn_correct(
        [jnp.asarray(b1), jnp.asarray(b2)], subset_row=sub, correct_all=True,
        var_adj=False,
    )
    assert np.allclose(
        np.asarray(out_all.corrected), np.asarray(dense_all.corrected),
        atol=1e-5,
    )


def test_quick_correct_csr_mesh_matches_single(rng):
    """CSR store -> sharded Gram PCA -> distributed merge equals the
    single-device quick_correct_csr (round-2 verdict missing #2: the
    composed out-of-core + distributed route)."""
    from batchelor_tpu import quick_correct_csr
    from batchelor_tpu.parallel.mesh import make_cells_mesh

    counts1 = rng.poisson(4.0, size=(90, 50)).astype(np.float32) + (
        rng.uniform(size=(90, 50)) < 0.5
    ).astype(np.float32)
    counts2 = 2.0 * rng.poisson(4.0, size=(110, 50)).astype(np.float32) + (
        rng.uniform(size=(110, 50)) < 0.5
    ).astype(np.float32)
    stores = [CSRCells.from_dense(counts1), CSRCells.from_dense(counts2)]

    ref = quick_correct_csr(stores, hvg_n=30, d=8, k=10, block_rows=32)
    mesh = make_cells_mesh(8)
    out = quick_correct_csr(
        stores, hvg_n=30, d=8, k=10, block_rows=32, mesh=mesh
    )
    assert np.array_equal(ref.hvgs, out.hvgs)
    assert np.allclose(
        np.asarray(ref.corrected.corrected),
        np.asarray(out.corrected.corrected),
        atol=1e-4,
    )
    ri, oi = ref.corrected.merge_info[0], out.corrected.merge_info[0]
    assert set(map(tuple, ri.pairs.tolist())) == set(map(tuple, oi.pairs.tolist()))
    assert np.isclose(ri.batch_size, oi.batch_size, atol=1e-5)
    assert np.allclose(ri.lost_var, oi.lost_var, atol=1e-5)
    # ring memory mode takes the same route
    ring = quick_correct_csr(
        stores, hvg_n=30, d=8, k=10, block_rows=32, mesh=mesh, memory="ring"
    )
    assert np.allclose(
        np.asarray(ref.corrected.corrected),
        np.asarray(ring.corrected.corrected),
        atol=1e-4,
    )
