"""Ring-rotated kNN vs the all-gather path (8-device CPU mesh)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
import pytest

from batchelor_tpu.ops.knn import query_knn
from batchelor_tpu.parallel.mesh import CELLS_AXIS, cells_sharding, make_cells_mesh
from batchelor_tpu.parallel.ring import ring_query_knn_local


@pytest.fixture(scope="module")
def mesh8():
    return make_cells_mesh(8)


def test_ring_knn_matches_allgather(rng, mesh8):
    nq, nd, d, k = 160, 320, 12, 9
    q = rng.normal(size=(nq, d)).astype(np.float32)
    x = rng.normal(size=(nd, d)).astype(np.float32)

    def body(qs, xs, xv):
        return ring_query_knn_local(qs, xs, xv, k, 8)

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh8,
            in_specs=(P(CELLS_AXIS, None), P(CELLS_AXIS, None), P(CELLS_AXIS)),
            out_specs=(P(CELLS_AXIS, None), P(CELLS_AXIS, None)),
            check_vma=False,
        )
    )
    sh = cells_sharding(mesh8)
    idx, dist = fn(
        jax.device_put(jnp.asarray(q), sh),
        jax.device_put(jnp.asarray(x), sh),
        jnp.ones((nd,), bool),
    )
    ref = query_knn(jnp.asarray(q), jnp.asarray(x), k)
    assert np.array_equal(np.asarray(idx), np.asarray(ref.indices))
    assert np.allclose(np.asarray(dist), np.asarray(ref.distances), atol=1e-5)


def test_ring_knn_masked(rng, mesh8):
    nq, nd, d, k = 80, 240, 8, 5
    q = rng.normal(size=(nq, d)).astype(np.float32)
    x = rng.normal(size=(nd, d)).astype(np.float32)
    valid = np.zeros(nd, dtype=bool)
    valid[:190] = True

    def body(qs, xs, xv):
        return ring_query_knn_local(qs, xs, xv, k, 8)

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh8,
            in_specs=(P(CELLS_AXIS, None), P(CELLS_AXIS, None), P(CELLS_AXIS)),
            out_specs=(P(CELLS_AXIS, None), P(CELLS_AXIS, None)),
            check_vma=False,
        )
    )
    sh = cells_sharding(mesh8)
    idx, dist = fn(
        jax.device_put(jnp.asarray(q), sh),
        jax.device_put(jnp.asarray(x), sh),
        jnp.asarray(valid),
    )
    ref = query_knn(jnp.asarray(q), jnp.asarray(x[:190]), k)
    assert np.array_equal(np.asarray(idx), np.asarray(ref.indices))
