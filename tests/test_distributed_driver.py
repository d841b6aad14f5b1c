"""Distributed full fastMNN driver vs the host reference engine."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from batchelor_tpu.correct.fast_mnn import reduced_mnn
from batchelor_tpu.parallel.driver import distributed_fast_mnn
from batchelor_tpu.parallel.mesh import make_cells_mesh


@pytest.fixture(scope="module")
def mesh8():
    return make_cells_mesh(8)


def test_driver_three_batches_matches_host(rng, mesh8):
    b1 = rng.normal(size=(120, 14))
    b2 = rng.normal(size=(150, 14)) + 1
    b3 = rng.normal(size=(90, 14)) + 2
    mats = [jnp.asarray(b) for b in (b1, b2, b3)]
    dist = distributed_fast_mnn(mats, mesh8)
    ref = reduced_mnn(mats)
    assert np.allclose(np.asarray(dist.corrected), np.asarray(ref.corrected), atol=1e-8)
    assert np.array_equal(dist.batch, np.asarray(ref.batch))
    for a, b in zip(dist.merge_info, ref.merge_info):
        assert a.left == b.left and a.right == b.right
        assert set(map(tuple, a.pairs.tolist())) == set(map(tuple, b.pairs.tolist()))
        assert np.isclose(a.batch_size, b.batch_size, atol=1e-6)


def test_driver_merge_order_and_restrict(rng, mesh8):
    b1 = rng.normal(size=(100, 10))
    b2 = rng.normal(size=(110, 10)) + 1
    b3 = rng.normal(size=(95, 10)) + 2
    res = [np.arange(0, 100, 2), None, np.arange(50)]
    mats = [jnp.asarray(b) for b in (b1, b2, b3)]
    dist = distributed_fast_mnn(mats, mesh8, merge_order=[2, 0, 1], restrict=res)
    ref = reduced_mnn(mats, merge_order=[2, 0, 1], restrict=res)
    assert np.allclose(np.asarray(dist.corrected), np.asarray(ref.corrected), atol=1e-8)
    for a, b in zip(dist.merge_info, ref.merge_info):
        assert set(map(tuple, a.pairs.tolist())) == set(map(tuple, b.pairs.tolist()))


def test_driver_tree_order(rng, mesh8):
    mats = [
        jnp.asarray(rng.normal(size=(80, 8)) + i) for i in range(4)
    ]
    dist = distributed_fast_mnn(mats, mesh8, merge_order=[[0, 1], [2, 3]])
    ref = reduced_mnn(list(mats), merge_order=[[0, 1], [2, 3]])
    assert np.allclose(np.asarray(dist.corrected), np.asarray(ref.corrected), atol=1e-8)


def test_driver_min_batch_skip(rng, mesh8):
    b1 = rng.normal(size=(100, 10))
    b2 = rng.normal(size=(100, 10))
    dist = distributed_fast_mnn(
        [jnp.asarray(b1), jnp.asarray(b2)], mesh8, min_batch_skip=0.5
    )
    assert dist.merge_info[0].skipped
    assert np.allclose(
        np.asarray(dist.corrected), np.concatenate([b1, b2]), atol=1e-10
    )


def test_driver_ring_memory_matches_gather(rng, mesh8):
    """memory='ring' (constant per-device memory) reproduces the all-gather
    path: same MNN pairs, same corrected coordinates up to reduction
    order."""
    b1 = rng.normal(size=(120, 14))
    b2 = rng.normal(size=(150, 14)) + 1
    b3 = rng.normal(size=(90, 14)) + 2
    mats = [jnp.asarray(b) for b in (b1, b2, b3)]
    ring = distributed_fast_mnn(mats, mesh8, memory="ring")
    gather = distributed_fast_mnn(mats, mesh8, memory="gather")
    assert np.allclose(
        np.asarray(ring.corrected), np.asarray(gather.corrected), atol=1e-8
    )
    assert np.array_equal(ring.batch, gather.batch)
    for a, b in zip(ring.merge_info, gather.merge_info):
        assert set(map(tuple, a.pairs.tolist())) == set(map(tuple, b.pairs.tolist()))
        assert np.isclose(a.batch_size, b.batch_size, atol=1e-8)


def test_driver_ring_memory_restrict(rng, mesh8):
    b1 = rng.normal(size=(100, 10))
    b2 = rng.normal(size=(110, 10)) + 1
    res = [np.arange(0, 100, 2), None]
    mats = [jnp.asarray(b) for b in (b1, b2)]
    ring = distributed_fast_mnn(mats, mesh8, restrict=res, memory="ring")
    ref = reduced_mnn(mats, restrict=res)
    assert np.allclose(
        np.asarray(ring.corrected), np.asarray(ref.corrected), atol=1e-8
    )
    for a, b in zip(ring.merge_info, ref.merge_info):
        assert set(map(tuple, a.pairs.tolist())) == set(map(tuple, b.pairs.tolist()))
