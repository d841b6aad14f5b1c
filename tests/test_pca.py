"""multiBatchPCA tests (reference test-multi-pca.R).

Comparisons are sign-invariant per component, like the reference's
expect_equal_besides_sign (test-multi-pca.R:6-10).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from batchelor_tpu.ops.pca import construct_weight_vector, multi_batch_pca


def assert_equal_besides_sign(a, b, atol=1e-8):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape
    for j in range(a.shape[1]):
        same = np.allclose(a[:, j], b[:, j], atol=atol)
        flip = np.allclose(a[:, j], -b[:, j], atol=atol)
        assert same or flip, f"component {j} differs beyond sign"


def test_weight_vector_modes():
    assert np.allclose(construct_weight_vector([10, 20], None), [1, 1])
    assert np.allclose(construct_weight_vector([10, 20], True), [1, 1])
    assert np.allclose(construct_weight_vector([10, 20], False), [10, 20])
    assert np.allclose(construct_weight_vector([10, 20], [2.0, 3.0]), [2, 3])
    assert np.allclose(construct_weight_vector([10, 20, 5], [0, [1, 2]]), [0.5, 0.25, 0.25])


@pytest.mark.parametrize("method", ["gram", "direct"])
def test_pca_matches_oracle(rng, method):
    mats = [rng.normal(size=(50, 30)), rng.normal(size=(80, 30)) + 1.0]
    res = multi_batch_pca([jnp.asarray(m) for m in mats], d=10, method=method)
    ocomps, orot, ocent = oracle.multi_batch_pca(mats, 10)
    assert np.allclose(np.asarray(res.centers), ocent, atol=1e-10)
    assert_equal_besides_sign(res.rotation, orot, atol=1e-6)
    for mine, theirs in zip(res.components, ocomps):
        assert_equal_besides_sign(mine, theirs, atol=1e-6)


def test_pca_randomized_subspace(rng):
    # The randomized path (reference RandomParam analog) matches the exact
    # subspace and singular values, but not per-component vectors on flat
    # spectra — the reference's own tests force ExactParam for the same
    # reason (test-fast-mnn.R:130). Give the data a decaying spectrum.
    base = rng.normal(size=(120, 40)) * (np.linspace(4, 0.1, 40)[None, :])
    mats = [base[:60], base[60:] + 1.0]
    res = multi_batch_pca([jnp.asarray(m) for m in mats], d=8, method="randomized")
    ref = multi_batch_pca([jnp.asarray(m) for m in mats], d=8, method="direct")
    # same projector onto the top-8 subspace
    p1 = np.asarray(res.rotation) @ np.asarray(res.rotation).T
    p2 = np.asarray(ref.rotation) @ np.asarray(ref.rotation).T
    assert np.allclose(p1, p2, atol=1e-5)


def test_pca_equal_batches_equiv_plain_pca(rng):
    # For equal-size batches, multiBatchPCA == PCA on rbind with grand-mean
    # centering (reference test-multi-pca.R:33-37).
    a = rng.normal(size=(60, 25))
    b = rng.normal(size=(60, 25))
    res = multi_batch_pca([jnp.asarray(a), jnp.asarray(b)], d=8)
    stacked = np.concatenate([a, b])
    centered = stacked - stacked.mean(axis=0)
    u, s, vt = np.linalg.svd(centered, full_matrices=False)
    ref = centered @ vt[:8].T
    ours = np.concatenate([np.asarray(c) for c in res.components])
    assert_equal_besides_sign(ours, ref, atol=1e-6)


def test_pca_full_rank_preserves_distances(rng):
    # Full-rank projection preserves pairwise distances
    # (reference test-multi-pca.R:39-51).
    a = rng.normal(size=(20, 12))
    b = rng.normal(size=(25, 12))
    res = multi_batch_pca([jnp.asarray(a), jnp.asarray(b)], d=12)
    all_in = np.concatenate([a, b])
    all_out = np.concatenate([np.asarray(c) for c in res.components])
    din = np.linalg.norm(all_in[:, None] - all_in[None, :], axis=-1)
    dout = np.linalg.norm(all_out[:, None] - all_out[None, :], axis=-1)
    assert np.allclose(din, dout, atol=1e-6)


def test_pca_weights_mimic_replication(rng):
    # Doubling a batch's weight ~ supplying it twice (covariance-level
    # equivalence; reference weighting semantics R/multiBatchPCA.R:49-69).
    a = rng.normal(size=(40, 15))
    b = rng.normal(size=(30, 15)) + 0.5
    w_res = multi_batch_pca([jnp.asarray(a), jnp.asarray(b)], d=5, weights=[2.0, 1.0])
    dup_res = multi_batch_pca(
        [jnp.asarray(a), jnp.asarray(a), jnp.asarray(b)], d=5
    )
    assert np.allclose(np.asarray(w_res.centers), np.asarray(dup_res.centers), atol=1e-10)
    assert_equal_besides_sign(w_res.rotation, dup_res.rotation, atol=1e-6)


def test_pca_subset_and_all_genes(rng):
    mats = [rng.normal(size=(40, 20)), rng.normal(size=(35, 20))]
    subset = np.arange(0, 20, 2)
    res_sub = multi_batch_pca([jnp.asarray(m) for m in mats], d=6, subset_row=subset)
    assert res_sub.rotation.shape == (10, 6)
    pre = multi_batch_pca([jnp.asarray(m[:, subset]) for m in mats], d=6)
    assert_equal_besides_sign(res_sub.rotation, pre.rotation)
    for x, y in zip(res_sub.components, pre.components):
        assert_equal_besides_sign(x, y)

    res_all = multi_batch_pca(
        [jnp.asarray(m) for m in mats], d=6, subset_row=subset, get_all_genes=True
    )
    assert res_all.rotation.shape == (20, 6)
    # rows at subset positions match (up to shared sign)
    for j in range(6):
        col_sub = np.asarray(res_sub.rotation)[:, j]
        col_all = np.asarray(res_all.rotation)[subset, j]
        assert np.allclose(col_sub, col_all, atol=1e-8) or np.allclose(
            col_sub, -col_all, atol=1e-8
        )
    # components unchanged by get_all_genes
    for x, y in zip(res_all.components, res_sub.components):
        assert_equal_besides_sign(x, y)


def test_pca_d_none_passthrough(rng):
    mats = [rng.normal(size=(20, 8)), rng.normal(size=(30, 8))]
    res = multi_batch_pca([jnp.asarray(m) for m in mats], d=None, get_variance=True)
    # centered matrices returned directly
    w = np.ones(2)
    means = [m.mean(axis=0) for m in mats]
    centers = (means[0] + means[1]) / 2
    for m, c in zip(mats, res.components):
        assert np.allclose(np.asarray(c), m - centers, atol=1e-10)
    # identity rotation, zero reported centers (reference .make_fake_metadata)
    assert np.allclose(np.asarray(res.rotation), np.eye(8))
    assert np.allclose(np.asarray(res.centers), 0.0)
    assert res.var_explained.shape == (8,)
    assert np.isclose(res.var_total, res.var_explained.sum())


def test_pca_variance_reporting(rng):
    mats = [rng.normal(size=(50, 10)), rng.normal(size=(50, 10))]
    res = multi_batch_pca([jnp.asarray(m) for m in mats], d=10, get_variance=True)
    # with full rank, sum(var.explained) == var.total
    assert np.isclose(np.sum(res.var_explained), res.var_total, rtol=1e-8)
    assert np.all(np.diff(res.var_explained) <= 1e-9)
