"""kNN + mutual-NN oracle tests (reference test strategy SURVEY.md 4.2)."""
import numpy as np
import jax.numpy as jnp

import oracle
from batchelor_tpu.ops.knn import query_knn
from batchelor_tpu.ops.mutual_nn import choose_k, find_mutual_nn, restricted_mnn


def test_query_knn_matches_oracle(rng):
    q = rng.normal(size=(57, 8))
    x = rng.normal(size=(203, 8))
    idx, dist = query_knn(jnp.asarray(q), jnp.asarray(x), 7)
    oidx, odist = oracle.knn(q, x, 7)
    assert np.array_equal(np.asarray(idx), oidx)
    assert np.allclose(np.asarray(dist), odist, atol=1e-10)


def test_query_knn_self(rng):
    x = rng.normal(size=(40, 5))
    idx, dist = query_knn(jnp.asarray(x), jnp.asarray(x), 1)
    assert np.array_equal(np.asarray(idx)[:, 0], np.arange(40))
    assert np.allclose(np.asarray(dist), 0.0, atol=1e-12)


def test_query_knn_masked(rng):
    q = rng.normal(size=(20, 4))
    x = rng.normal(size=(60, 4))
    idx_full, _ = query_knn(jnp.asarray(q), jnp.asarray(x[:30]), 5)
    idx_mask, _ = query_knn(jnp.asarray(q), jnp.asarray(x), 5, n_data_valid=30)
    assert np.array_equal(np.asarray(idx_full), np.asarray(idx_mask))


def test_query_knn_crosses_tiles(rng):
    # data larger than one data tile exercises the running top-k merge
    q = rng.normal(size=(11, 3))
    x = rng.normal(size=(9000, 3))
    idx, dist = query_knn(jnp.asarray(q), jnp.asarray(x), 4)
    oidx, odist = oracle.knn(q, x, 4)
    assert np.array_equal(np.asarray(idx), oidx)
    assert np.allclose(np.asarray(dist), odist, atol=1e-10)


def test_find_mutual_nn_matches_oracle(rng):
    left = rng.normal(size=(80, 6))
    right = rng.normal(size=(120, 6)) + 0.5
    pairs = find_mutual_nn(left, right, k1=10, k2=15)
    of, os_ = oracle.find_mutual_nn(left, right, 10, 15)
    # same pair set
    ours = set(zip(pairs.first.tolist(), pairs.second.tolist()))
    theirs = set(zip(of.tolist(), os_.tolist()))
    assert ours == theirs
    # ordering: by left cell ascending (then by neighbour rank)
    assert np.all(np.diff(pairs.first) >= 0)


def test_mutual_nn_symmetric(rng):
    a = rng.normal(size=(50, 4))
    b = rng.normal(size=(60, 4))
    p_ab = find_mutual_nn(a, b, 8, 8)
    p_ba = find_mutual_nn(b, a, 8, 8)
    s1 = set(zip(p_ab.first.tolist(), p_ab.second.tolist()))
    s2 = set(zip(p_ba.second.tolist(), p_ba.first.tolist()))
    assert s1 == s2


def test_choose_k():
    assert choose_k(20, None, 1000) == 20
    assert choose_k(20, 0.05, 1000) == 50
    assert choose_k(20, 0.05, 100) == 20  # max(k, 5)
    assert choose_k(20, 0.5, 10) == 10    # min(N, ...)


def test_restricted_mnn_maps_back(rng):
    left = rng.normal(size=(40, 5))
    right = rng.normal(size=(40, 5))
    lres = np.arange(0, 40, 2)
    rres = np.arange(1, 40, 2)
    pairs = restricted_mnn(left, lres, right, rres, k=5)
    # all pair members must come from the restricted sets
    assert set(pairs.first.tolist()) <= set(lres.tolist())
    assert set(pairs.second.tolist()) <= set(rres.tolist())
    # equals the search on subsetted inputs, mapped
    sub = find_mutual_nn(left[lres], right[rres], 5, 5)
    assert np.array_equal(pairs.first, lres[sub.first])
    assert np.array_equal(pairs.second, rres[sub.second])
