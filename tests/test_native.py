"""Native C++ runtime tests (fallback paths tested alongside)."""
import numpy as np
import pytest

from batchelor_tpu.native import bindings as nat


def test_native_builds():
    lib = nat.get_lib()
    assert lib is not None, "native library should build in this environment"
    assert lib.bt_version() >= 2


def test_mutual_nn_pairs_matches_oracle(rng):
    import oracle

    left = rng.normal(size=(60, 5))
    right = rng.normal(size=(80, 5))
    oidx_l2r, _ = oracle.knn(left, right, 12)
    oidx_r2l, _ = oracle.knn(right, left, 9)
    first, second = nat.mutual_nn_pairs(oidx_l2r, oidx_r2l)
    of, os_ = oracle.find_mutual_nn(left, right, 9, 12)
    assert np.array_equal(first, of)
    assert np.array_equal(second, os_)


def test_union_find_native():
    edges = np.array([[0, 1], [2, 3], [1, 2], [5, 6]])
    lab = nat.union_find(7, edges)
    assert lab[0] == lab[1] == lab[2] == lab[3]
    assert lab[5] == lab[6]
    assert len({int(lab[0]), int(lab[4]), int(lab[5])}) == 3
    # first-appearance labelling
    assert lab[0] == 0


@pytest.fixture
def csr(rng):
    dense = (rng.random((30, 15)) < 0.3) * rng.random((30, 15))
    dense = dense.astype(np.float32)
    indptr = [0]
    indices, data = [], []
    for row in dense:
        nz = np.nonzero(row)[0]
        indices.extend(nz.tolist())
        data.extend(row[nz].tolist())
        indptr.append(len(indices))
    return (
        np.asarray(data, np.float32),
        np.asarray(indices, np.int32),
        np.asarray(indptr, np.int64),
        dense,
    )


def test_csr_densify(csr):
    data, indices, indptr, dense = csr
    block = nat.csr_densify(data, indices, indptr, 5, 20, dense.shape[1])
    assert np.allclose(block, dense[5:20])


def test_csr_row_sums(csr):
    data, indices, indptr, dense = csr
    sums = nat.csr_row_sums(data, indptr, dense.shape[0])
    assert np.allclose(sums, dense.sum(axis=1), atol=1e-5)


def test_csr_select_columns(csr):
    data, indices, indptr, dense = csr
    keep = np.arange(0, 15, 2)
    col_map = np.full(15, -1, dtype=np.int32)
    col_map[keep] = np.arange(keep.shape[0])
    d2, i2, p2 = nat.csr_select_columns(data, indices, indptr, col_map)
    out = nat.csr_densify(d2, i2, p2, 0, dense.shape[0], keep.shape[0])
    assert np.allclose(out, dense[:, keep])


def test_native_csr_value_transforms_match_numpy(rng):
    """Threaded lognorm/cosine, unlog colsums and rescale vs the numpy
    fallbacks (round-2 verdict weak #4)."""
    from batchelor_tpu.native import bindings as nb

    n, g = 200, 50
    dense = rng.poisson(2.0, size=(n, g)).astype(np.float32)
    dense *= rng.uniform(size=(n, g)) < 0.4
    from batchelor_tpu.io.csr import CSRCells

    s = CSRCells.from_dense(dense)
    sf = rng.uniform(0.5, 2.0, n).astype(np.float32)

    lib = nb.get_lib()
    assert lib is not None
    for cos in (False, True):
        fast = nb.csr_lognorm_cosine(s.data, s.indptr, sf, 2.0, cos)
        nb._lib = None  # force fallback
        nb._tried = True
        slow = nb.csr_lognorm_cosine(s.data, s.indptr, sf, 2.0, cos)
        nb._lib, nb._tried = lib, True
        assert np.allclose(fast, slow, atol=1e-6)

    logged = np.log2(dense + 1.0).astype(np.float32)
    sl = CSRCells.from_dense(logged)
    fast = nb.csr_unlog_colsums(sl.data, sl.indices, g, 2.0)
    assert np.allclose(fast, dense.astype(np.float64).sum(0), atol=1e-3)
    scale = rng.uniform(0.1, 1.0, g)
    fastr = nb.csr_rescale_values(sl.data, sl.indices, scale, 2.0)
    ref = np.log1p((2.0 ** sl.data.astype(np.float64) - 1) * scale[sl.indices]) / np.log(2.0)
    assert np.allclose(fastr, ref, atol=1e-6)


def test_csr_gene_stats_native_matches_fallback_and_dense(rng):
    """Threaded O(nnz) per-gene stats (quickCorrect stages 1-3 substrate)
    vs the numpy bincount fallback and a dense oracle."""
    from batchelor_tpu.io.csr import CSRCells
    from batchelor_tpu.native import bindings as nb

    n, g = 300, 40
    dense = rng.poisson(3.0, size=(n, g)).astype(np.float32)
    dense *= rng.uniform(size=(n, g)) < 0.3
    s = CSRCells.from_dense(dense)
    sf = rng.uniform(0.5, 2.0, n).astype(np.float32)

    lib = nb.get_lib()
    assert lib is not None
    fast = nb.csr_gene_stats(s.data, s.indices, s.indptr, sf, g, 2.0)
    nb._lib = None
    nb._tried = True
    slow = nb.csr_gene_stats(s.data, s.indices, s.indptr, sf, g, 2.0)
    nb._lib, nb._tried = lib, True
    for a, b in zip(fast, slow):
        assert np.allclose(a, b, atol=1e-9)

    norm = dense.astype(np.float64) / sf[:, None].astype(np.float64)
    lg = np.log1p(norm) / np.log(2.0)
    assert np.allclose(fast[0], norm.sum(0), atol=1e-6)
    assert np.allclose(fast[1], lg.sum(0), atol=1e-6)
    assert np.allclose(fast[2], (lg * lg).sum(0), atol=1e-6)
