"""fastMNN / reducedMNN end-to-end tests.

Mirrors the reference's metamorphic suite (tests/testthat/test-fast-mnn.R,
test-reduced-mnn.R): pairing invariants, merge-order semantics, cell-order
invariance, no-batch-effect skipping, restriction contract, exact geometric
toys.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from batchelor_tpu.correct.fast_mnn import fast_mnn, reduced_mnn
from batchelor_tpu.ops.pca import multi_batch_pca


def check_pairings(res):
    """Structural invariants of merge.info (reference test-fast-mnn.R:94-121)."""
    origin = np.asarray(res.batch)
    for info in res.merge_info:
        assert len(set(info.left) & set(info.right)) == 0
        p = info.pairs
        assert p.shape[0] > 0
        left_cells = np.isin(origin[p[:, 0]], info.left)
        right_cells = np.isin(origin[p[:, 1]], info.right)
        assert left_cells.all()
        assert right_cells.all()


def test_fast_mnn_basic(rng):
    b1 = rng.normal(size=(100, 50)) - 1
    b2 = rng.normal(size=(200, 50)) + 1
    res = fast_mnn([jnp.asarray(b1), jnp.asarray(b2)], d=20, k=20)
    assert res.corrected.shape == (300, 20)
    assert np.array_equal(np.asarray(res.batch), np.repeat([0, 1], [100, 200]))
    assert len(res.merge_info) == 1
    info = res.merge_info[0]
    assert info.left == [0] and info.right == [1]
    assert not info.skipped
    assert info.lost_var.shape == (2,)
    assert (info.lost_var >= 0).all() and (info.lost_var < 1).all()
    assert res.rotation.shape == (50, 20)
    check_pairings(res)
    # batches end up closer after correction
    c1 = np.asarray(res.corrected[:100]).mean(axis=0)
    c2 = np.asarray(res.corrected[100:]).mean(axis=0)
    raw = multi_batch_pca([jnp.asarray(b1), jnp.asarray(b2)], d=20)
    r1 = np.asarray(raw.components[0]).mean(axis=0)
    r2 = np.asarray(raw.components[1]).mean(axis=0)
    assert np.linalg.norm(c1 - c2) < 0.25 * np.linalg.norm(r1 - r2)


def test_reduced_mnn_single_vs_multi(rng):
    # reference test-reduced-mnn.R:61-78
    pcd = [
        rng.normal(size=(200, 50)),
        rng.normal(size=(400, 50)) + 1,
        rng.normal(size=(300, 50)) + 2,
    ]
    com = np.concatenate(pcd)
    batches = np.repeat([1, 2, 3], [200, 400, 300])
    shuffle = rng.permutation(900)
    out = reduced_mnn(com[shuffle], batch=batches[shuffle])
    ref = reduced_mnn([jnp.asarray(p) for p in pcd])
    assert np.allclose(np.asarray(out.corrected), np.asarray(ref.corrected)[shuffle], atol=1e-8)
    # single-matrix labels are the batch levels ("1","2","3"); the list path
    # uses positional indices (0,1,2) — map before comparing.
    level_names = np.array(["1", "2", "3"])
    assert np.array_equal(
        np.asarray(out.batch), level_names[np.asarray(ref.batch)][shuffle]
    )


def test_exact_orthogonalization_toys():
    # reference test-reduced-mnn.R:81-105
    core = np.stack(
        [np.repeat(np.arange(1, 11), 10), np.tile(np.arange(1, 11), 10)], axis=1
    ).astype(np.float64)
    b1 = core.copy()
    b1[:, 0] += 20
    b2 = core.copy()
    b2[:, 1] += 20

    out1 = reduced_mnn([jnp.asarray(core), jnp.asarray(b1)], k=1)
    c = np.asarray(out1.corrected)
    assert np.allclose(c[:, 0], 5.5, atol=1e-8)
    assert np.allclose(c[:, 1], np.concatenate([core[:, 1], b1[:, 1]]), atol=1e-8)

    out2 = reduced_mnn([jnp.asarray(core), jnp.asarray(b1), jnp.asarray(b2)], k=1)
    c = np.asarray(out2.corrected)
    assert np.allclose(c[:, 0], 5.5, atol=1e-8)
    assert np.allclose(c[:, 1], 5.5, atol=1e-8)

    outY = reduced_mnn([jnp.asarray(core + 10), jnp.asarray(b2 + 10)], k=1)
    c = np.asarray(outY.corrected)
    assert np.allclose(c[:, 0], np.concatenate([core[:, 0], b2[:, 0]]) + 10, atol=1e-8)
    assert np.allclose(c[:, 1], 15.5, atol=1e-8)

    outZ = reduced_mnn(
        [jnp.asarray(core), jnp.asarray(b1), jnp.asarray(core + 10), jnp.asarray(b2 + 10)],
        k=1,
        merge_order=[[0, 1], [2, 3]],
    )
    c = np.asarray(outZ.corrected)
    assert np.allclose(c[:, 0], 5.5, atol=1e-8)
    assert np.allclose(c[:, 1], 5.5, atol=1e-8)


def test_merge_order_equals_input_reorder(rng):
    # merge.order permutations give the same result as physically reordering
    # inputs (reference test-fast-mnn.R:268-310), on reduced data (no PCA).
    b1 = rng.normal(size=(150, 20))
    b2 = rng.normal(size=(180, 20)) + 1
    b3 = rng.normal(size=(120, 20)) + 2
    out_order = reduced_mnn(
        [jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(b3)], merge_order=[2, 1, 0]
    )
    out_phys = reduced_mnn([jnp.asarray(b3), jnp.asarray(b2), jnp.asarray(b1)])
    # reorder physical output (b3,b2,b1 blocks) back to (b1,b2,b3)
    sizes = [120, 180, 150]
    starts = np.cumsum([0] + sizes)
    phys = np.asarray(out_phys.corrected)
    reordered = np.concatenate(
        [phys[starts[2] : starts[2] + 150], phys[starts[1] : starts[1] + 180], phys[starts[0] : starts[0] + 120]]
    )
    assert np.allclose(np.asarray(out_order.corrected), reordered, atol=1e-8)


def test_min_batch_skip(rng):
    # no batch effect -> batch.size ~ 0, correction skipped, lost.var == 0
    # (reference test-fast-mnn.R:410-457)
    b1 = rng.normal(size=(150, 30))
    b2 = rng.normal(size=(150, 30))
    res = reduced_mnn([jnp.asarray(b1), jnp.asarray(b2)], min_batch_skip=0.5)
    info = res.merge_info[0]
    assert info.skipped
    assert info.batch_size < 0.5
    assert np.allclose(info.lost_var, 0.0, atol=1e-12)
    assert np.allclose(np.asarray(res.corrected), np.concatenate([b1, b2]), atol=1e-10)

    res2 = reduced_mnn([jnp.asarray(b1), jnp.asarray(b2)], min_batch_skip=0.0)
    assert not res2.merge_info[0].skipped


def test_restriction_contract_reduced(rng):
    # duplicated cells get extrapolated corrections; restricted run equals
    # unrestricted run on the originals (reference test-reduced-mnn.R:108-145)
    B1 = rng.normal(size=(120, 10))
    B2 = rng.normal(size=(200, 10)) + 1
    B3 = rng.normal(size=(80, 10)) + 2
    ref = reduced_mnn([jnp.asarray(B1), jnp.asarray(B2), jnp.asarray(B3)])

    i1 = np.arange(99, 49, -1)
    i2 = np.arange(0, 20)
    i3 = np.arange(49, 80)
    C1 = np.concatenate([B1, B1[i1]])
    C2 = np.concatenate([B2, B2[i2]])
    C3 = np.concatenate([B3, B3[i3]])
    keeps = [np.arange(120), np.arange(200), np.arange(80)]
    out = reduced_mnn(
        [jnp.asarray(C1), jnp.asarray(C2), jnp.asarray(C3)], restrict=keeps
    )

    refc = np.asarray(ref.corrected)
    outc = np.asarray(out.corrected)
    ro = np.asarray(ref.batch)
    oo = np.asarray(out.batch)
    for b, keep, dup in [(0, keeps[0], i1), (1, keeps[1], i2), (2, keeps[2], i3)]:
        mine = outc[oo == b]
        theirs = refc[ro == b]
        assert np.allclose(mine[: keep.shape[0]], theirs, atol=1e-8)
        assert np.allclose(mine[keep.shape[0] :], theirs[dup], atol=1e-8)
    for info in out.merge_info:
        # MNN pairs only form among restricted cells
        p = info.pairs
        for side, col in ((info.left, 0), (info.right, 1)):
            cells = p[:, col]
            for b in side:
                sel = cells[oo[cells] == b]
                # position within batch must be < n_original
                block_start = np.nonzero(oo == b)[0][0]
                assert np.all(sel - block_start < keeps[b].shape[0])


def test_fast_mnn_single_vs_multi(rng):
    # reference test-fast-mnn.R:472-533
    b1 = rng.normal(size=(80, 60)) - 1
    b2 = rng.normal(size=(120, 60)) + 1
    combined = np.concatenate([b1, b2])
    batch = np.repeat([0, 1], [80, 120])
    shuffle = rng.permutation(200)
    ref = fast_mnn([jnp.asarray(b1), jnp.asarray(b2)], d=15)
    out = fast_mnn(combined[shuffle], batch=batch[shuffle], d=15)
    assert np.allclose(
        np.asarray(out.corrected), np.asarray(ref.corrected)[shuffle], atol=1e-8
    )
    check_pairings(ref)


def test_fast_mnn_correct_all(rng):
    # correct.all does not change corrected coords nor subset rotation rows
    # (reference test-fast-mnn.R:150-168)
    b1 = rng.normal(size=(90, 40))
    b2 = rng.normal(size=(110, 40)) + 1
    subset = np.arange(0, 40, 2)
    res_sub = fast_mnn([jnp.asarray(b1), jnp.asarray(b2)], d=10, subset_row=subset)
    res_all = fast_mnn(
        [jnp.asarray(b1), jnp.asarray(b2)], d=10, subset_row=subset, correct_all=True
    )
    assert np.allclose(
        np.asarray(res_sub.corrected), np.asarray(res_all.corrected), atol=1e-10
    )
    assert res_sub.rotation.shape == (20, 10)
    assert res_all.rotation.shape == (40, 10)
    assert np.allclose(
        np.asarray(res_all.rotation)[subset], np.asarray(res_sub.rotation), atol=1e-10
    )
    # equals run on pre-subsetted input
    pre = fast_mnn([jnp.asarray(b1[:, subset]), jnp.asarray(b2[:, subset])], d=10)
    assert np.allclose(
        np.asarray(res_sub.corrected), np.asarray(pre.corrected), atol=1e-8
    )


def test_auto_merge_matches_explicit(rng):
    # auto.merge == explicitly passing the discovered order
    # (reference test-fast-mnn.R:313-335)
    b1 = rng.normal(size=(100, 20))
    b2 = rng.normal(size=(100, 20)) + 0.3
    b3 = rng.normal(size=(150, 20)) + 0.35
    auto = reduced_mnn([jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(b3)], auto_merge=True)
    # discover the order: first merge's left/right then remaining
    first = auto.merge_info[0]
    order = list(first.left) + list(first.right) + list(auto.merge_info[1].right)
    # left of second step should be the merged pair
    explicit = reduced_mnn(
        [jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(b3)], merge_order=order
    )
    assert np.allclose(
        np.asarray(auto.corrected), np.asarray(explicit.corrected), atol=1e-8
    )


def test_fast_mnn_names(rng):
    b1 = rng.normal(size=(50, 30))
    b2 = rng.normal(size=(60, 30)) + 1
    res = fast_mnn(
        [jnp.asarray(b1), jnp.asarray(b2)], d=10, batch_names=["first", "second"]
    )
    assert set(np.asarray(res.batch)) == {"first", "second"}
    assert res.merge_info[0].left == ["first"]
    assert res.merge_info[0].right == ["second"]
    with pytest.raises(ValueError):
        fast_mnn([jnp.asarray(b1), jnp.asarray(b2)], d=10, batch_names=["x", "x"])


def test_fast_mnn_d_none(rng):
    # d=None skips the PCA; correction runs on centered input
    # (reference R/fastMNN.R:163-164, multiBatchPCA d=NA mode)
    b1 = rng.normal(size=(60, 15))
    b2 = rng.normal(size=(70, 15)) + 1
    res = fast_mnn([jnp.asarray(b1), jnp.asarray(b2)], d=None, cos_norm=False)
    assert res.corrected.shape == (130, 15)
    assert np.allclose(np.asarray(res.rotation), np.eye(15))
    # equals reduced_mnn on the grand-mean-centered inputs
    centers = (b1.mean(0) + b2.mean(0)) / 2
    ref = reduced_mnn([jnp.asarray(b1 - centers), jnp.asarray(b2 - centers)])
    assert np.allclose(np.asarray(res.corrected), np.asarray(ref.corrected), atol=1e-8)


def test_fast_mnn_get_variance(rng):
    b1 = rng.normal(size=(50, 20))
    b2 = rng.normal(size=(50, 20)) + 1
    res = fast_mnn([jnp.asarray(b1), jnp.asarray(b2)], d=10, get_variance=True)
    assert res.var_explained.shape == (10,)
    assert res.var_total > 0
    assert np.sum(res.var_explained) <= res.var_total * (1 + 1e-8)


def test_fast_mnn_prop_k(rng):
    # prop.k adapts k to batch size at each merge (reference R/MNN_tree.R:140-146)
    b1 = rng.normal(size=(100, 25))
    b2 = rng.normal(size=(300, 25)) + 1
    res = fast_mnn([jnp.asarray(b1), jnp.asarray(b2)], d=10, k=5, prop_k=0.1)
    # k in batch2 becomes 30 (>5): more pairs than with plain k=5
    res_k5 = fast_mnn([jnp.asarray(b1), jnp.asarray(b2)], d=10, k=5)
    assert res.merge_info[0].pairs.shape[0] > res_k5.merge_info[0].pairs.shape[0]
