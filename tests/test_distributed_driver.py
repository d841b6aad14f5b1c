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


def test_driver_lost_var_matches_host(rng, mesh8):
    """lost.var is computed on the scale path too (reference
    R/fastMNN.R:500-501 computes it unconditionally; VERDICT r1 item 2)."""
    b1 = rng.normal(size=(120, 14))
    b2 = rng.normal(size=(150, 14)) + 1
    b3 = rng.normal(size=(90, 14)) + 2
    mats = [jnp.asarray(b) for b in (b1, b2, b3)]
    dist = distributed_fast_mnn(mats, mesh8)
    ref = reduced_mnn(mats)
    for a, b in zip(dist.merge_info, ref.merge_info):
        assert np.allclose(a.lost_var, b.lost_var, atol=1e-6), (a.lost_var, b.lost_var)
    # sanity: lost variance is positive for merged batches, 0 for absent ones
    assert dist.merge_info[0].lost_var[0] > 0
    assert dist.merge_info[0].lost_var[2] == 0.0


def test_driver_lost_var_ring(rng, mesh8):
    b1 = rng.normal(size=(96, 10))
    b2 = rng.normal(size=(104, 10)) + 1
    mats = [jnp.asarray(b) for b in (b1, b2)]
    ring = distributed_fast_mnn(mats, mesh8, memory="ring")
    ref = reduced_mnn(mats)
    for a, b in zip(ring.merge_info, ref.merge_info):
        assert np.allclose(a.lost_var, b.lost_var, atol=1e-6)


def test_driver_auto_merge_matches_host(rng, mesh8):
    """auto_merge picks the same order and produces the same coordinates as
    the host engine (reference auto.merge, R/MNN_tree.R:154-226)."""
    b1 = rng.normal(size=(70, 10))
    b2 = rng.normal(size=(170, 10)) + 0.3   # largest pair counts with b3
    b3 = rng.normal(size=(160, 10)) + 0.35
    mats = [jnp.asarray(b) for b in (b1, b2, b3)]
    dist = distributed_fast_mnn(mats, mesh8, auto_merge=True)
    ref = reduced_mnn(mats, auto_merge=True)
    assert [i.left for i in dist.merge_info] == [i.left for i in ref.merge_info]
    assert [i.right for i in dist.merge_info] == [i.right for i in ref.merge_info]
    assert np.allclose(
        np.asarray(dist.corrected), np.asarray(ref.corrected), atol=1e-8
    )
    with pytest.raises(ValueError):
        distributed_fast_mnn(mats, mesh8, auto_merge=True, merge_order=[0, 1, 2])


def test_driver_checkpoint_resume_bit_identical(rng, mesh8, tmp_path):
    """Kill-and-resume: steps completed before the 'crash' are replayed from
    the store; the final output is bit-identical to an uninterrupted run."""
    b1 = rng.normal(size=(90, 10))
    b2 = rng.normal(size=(100, 10)) + 1
    b3 = rng.normal(size=(80, 10)) + 2
    b4 = rng.normal(size=(110, 10)) + 3
    mats = [jnp.asarray(b) for b in (b1, b2, b3, b4)]

    full = distributed_fast_mnn(mats, mesh8, checkpoint_dir=str(tmp_path / "full"))

    # simulate a crash after step 1 of 3: run fully, then rewind the store
    ckdir = tmp_path / "crash"
    distributed_fast_mnn(mats, mesh8, checkpoint_dir=str(ckdir))
    import json
    import os

    meta = json.load(open(ckdir / "merge_meta.json"))
    meta["completed"] = 2
    json.dump(meta, open(ckdir / "merge_meta.json", "w"))
    os.remove(ckdir / "step_0002.npz")

    resumed = distributed_fast_mnn(mats, mesh8, checkpoint_dir=str(ckdir))
    assert np.array_equal(np.asarray(resumed.corrected), np.asarray(full.corrected))
    for a, b in zip(resumed.merge_info, full.merge_info):
        assert a.left == b.left and a.right == b.right
        assert np.array_equal(a.pairs, b.pairs)
        assert np.allclose(a.lost_var, b.lost_var, atol=0)
        assert a.batch_size == b.batch_size


def test_driver_checkpoint_rejects_mismatched_tree(rng, mesh8, tmp_path):
    b1 = rng.normal(size=(60, 8))
    b2 = rng.normal(size=(70, 8)) + 1
    b3 = rng.normal(size=(50, 8)) + 2
    mats = [jnp.asarray(b) for b in (b1, b2, b3)]
    ckdir = str(tmp_path / "ck")
    distributed_fast_mnn(mats, mesh8, checkpoint_dir=ckdir)
    with pytest.raises(ValueError, match="does not match"):
        distributed_fast_mnn(mats, mesh8, merge_order=[2, 1, 0], checkpoint_dir=ckdir)


def test_driver_auto_merge_checkpoint_resume(rng, mesh8, tmp_path):
    b1 = rng.normal(size=(70, 8))
    b2 = rng.normal(size=(170, 8)) + 0.3
    b3 = rng.normal(size=(160, 8)) + 0.35
    mats = [jnp.asarray(b) for b in (b1, b2, b3)]
    ckdir = tmp_path / "auto"
    full = distributed_fast_mnn(mats, mesh8, auto_merge=True,
                                checkpoint_dir=str(ckdir))
    import json
    import os

    meta = json.load(open(ckdir / "merge_meta.json"))
    meta["completed"] = 1
    json.dump(meta, open(ckdir / "merge_meta.json", "w"))
    os.remove(ckdir / "step_0001.npz")
    resumed = distributed_fast_mnn(mats, mesh8, auto_merge=True,
                                   checkpoint_dir=str(ckdir))
    assert np.array_equal(np.asarray(resumed.corrected), np.asarray(full.corrected))


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


def test_driver_multi_device_split_step_matches_composed(rng, mesh8, monkeypatch):
    """The shape-gated two-program step split (search | correct as separate
    shard_map jits, VERDICT r4 #2) is equality-tested on the 8-device mesh:
    forcing the split threshold to 0 must reproduce the composed step
    bit-for-bit (same math, same collectives, only the jit boundary moves),
    including on restricted inputs and multi-step trees."""
    import batchelor_tpu.parallel.driver as drv

    b1 = rng.normal(size=(120, 12))
    b2 = rng.normal(size=(150, 12)) + 1
    b3 = rng.normal(size=(90, 12)) + 2
    res = [np.arange(0, 120, 2), None, None]
    mats = [jnp.asarray(b) for b in (b1, b2, b3)]
    composed = distributed_fast_mnn(mats, mesh8, restrict=res)
    monkeypatch.setattr(drv, "SPLIT_PAD_ROWS", 0)
    drv._jitted_step.cache_clear()
    split = distributed_fast_mnn(mats, mesh8, restrict=res)
    drv._jitted_step.cache_clear()
    assert np.array_equal(
        np.asarray(split.corrected), np.asarray(composed.corrected)
    )
    for a, b in zip(split.merge_info, composed.merge_info):
        assert np.array_equal(a.pairs, b.pairs)
        assert a.batch_size == b.batch_size
        assert np.array_equal(a.lost_var, b.lost_var)


def test_driver_phased_step_matches_split(rng, monkeypatch):
    """The fully-phased 1-device step (replay/membership/correct as small
    jits, kNNs eager through their stage jits — the >= PHASED_PAD_ROWS
    regime where one program's memory plan exceeds HBM) reproduces the
    two-program split path."""
    import batchelor_tpu.parallel.driver as drv

    b1 = rng.normal(size=(110, 12)).astype(np.float32)
    b2 = (rng.normal(size=(130, 12)) + 1).astype(np.float32)
    b3 = (rng.normal(size=(90, 12)) + 2).astype(np.float32)
    res = [np.arange(0, 110, 2), None, None]
    mats = [jnp.asarray(b) for b in (b1, b2, b3)]
    mesh1 = make_cells_mesh(1)
    ref = distributed_fast_mnn(mats, mesh1, restrict=res)
    monkeypatch.setattr(drv, "PHASED_PAD_ROWS", 0)
    drv._jitted_step.cache_clear()
    phased = distributed_fast_mnn(mats, mesh1, restrict=res)
    drv._jitted_step.cache_clear()
    assert np.allclose(
        np.asarray(phased.corrected), np.asarray(ref.corrected), atol=1e-6
    )
    for a, b in zip(phased.merge_info, ref.merge_info):
        assert np.array_equal(a.pairs, b.pairs)
        assert np.isclose(a.batch_size, b.batch_size, atol=1e-8)
        assert np.allclose(a.lost_var, b.lost_var, atol=1e-8)


def test_driver_one_device_plain_jit_matches_mesh(rng):
    """The 1-device gather-mode fast path (plain jit, no shard_map)
    matches the 8-device mesh run."""
    from batchelor_tpu.parallel.driver import distributed_fast_mnn
    from batchelor_tpu.parallel.mesh import make_cells_mesh

    b1 = rng.normal(size=(90, 10)).astype(np.float32)
    b2 = (rng.normal(size=(70, 10)) + 0.8).astype(np.float32)
    one = distributed_fast_mnn(
        [jnp.asarray(b1), jnp.asarray(b2)], make_cells_mesh(1), k=10
    )
    eight = distributed_fast_mnn(
        [jnp.asarray(b1), jnp.asarray(b2)], make_cells_mesh(8), k=10
    )
    assert np.allclose(
        np.asarray(one.corrected), np.asarray(eight.corrected), atol=1e-5
    )
    a, b = one.merge_info[0].pairs, eight.merge_info[0].pairs
    assert set(map(tuple, a.tolist())) == set(map(tuple, b.tolist()))
