"""fastMNN correction math vs naive oracles (reference test-fast-mnn.R:7-121)."""
import numpy as np
import jax.numpy as jnp

import oracle
from batchelor_tpu.ops.correction import (
    average_correction,
    batch_magnitude,
    center_along_batch_vector,
    per_batch_var,
    tricube_average,
    tricube_weighted_correction,
)
from batchelor_tpu.ops.knn import query_knn


def test_average_correction_matches_oracle(rng):
    ref = rng.normal(size=(100, 10))
    cur = rng.normal(size=(80, 10))
    mnn1 = rng.integers(0, 100, size=250)
    mnn2 = rng.integers(0, 80, size=250)
    avg, second = average_correction(jnp.asarray(ref), mnn1, jnp.asarray(cur), mnn2)
    oavg, ouniq = oracle.average_correction(ref, mnn1, cur, mnn2)
    assert np.array_equal(second, ouniq)
    assert np.allclose(np.asarray(avg), oavg, atol=1e-10)


def test_batch_magnitude(rng):
    c = rng.normal(size=(50, 8)) + 2.0
    assert np.isclose(float(batch_magnitude(jnp.asarray(c))), oracle.batch_magnitude(c))
    # all-identical vectors -> magnitude exactly 1
    same = np.tile(rng.normal(size=(1, 8)), (30, 1))
    assert np.isclose(float(batch_magnitude(jnp.asarray(same))), 1.0)
    zeros = np.zeros((10, 8))
    assert float(batch_magnitude(jnp.asarray(zeros))) == 0.0


def test_center_along_batch_vector(rng):
    m = rng.normal(size=(60, 12))
    v = rng.normal(size=12)
    ours = np.asarray(center_along_batch_vector(jnp.asarray(m), jnp.asarray(v)))
    theirs = oracle.center_along_batch_vector(m, v)
    assert np.allclose(ours, theirs, atol=1e-10)
    # after centering, the projection onto v has ~zero variance
    # (reference test-fast-mnn.R:35-51)
    proj = ours @ (v / np.linalg.norm(v))
    assert proj.std() < 1e-8

    res = np.arange(0, 60, 3)
    ours_r = np.asarray(center_along_batch_vector(jnp.asarray(m), jnp.asarray(v), res))
    theirs_r = oracle.center_along_batch_vector(m, v, res)
    assert np.allclose(ours_r, theirs_r, atol=1e-10)
    # restricted cells end up exactly at the restricted mean location
    projr = ours_r @ (v / np.linalg.norm(v))
    assert projr[res].std() < 1e-8


def test_per_batch_var(rng):
    data = rng.normal(size=(70, 6))
    origin = np.repeat([0, 1, 2], [20, 30, 20])
    ours = per_batch_var(jnp.asarray(data), [0, 1, 2], origin)
    theirs = oracle.per_batch_var(data, [0, 1, 2], origin)
    assert np.allclose(ours, theirs, atol=1e-10)


def test_tricube_matches_oracle(rng):
    vals = rng.normal(size=(40, 7))
    query = rng.normal(size=(90, 5))
    pts = rng.normal(size=(40, 5))
    idx, dist = query_knn(jnp.asarray(query), jnp.asarray(pts), 11)
    ours = np.asarray(tricube_average(jnp.asarray(vals), idx, dist, ndist=3.0))
    theirs = oracle.tricube_average(vals, np.asarray(idx), np.asarray(dist), 3.0)
    assert np.allclose(ours, theirs, atol=1e-10)


def test_tricube_zero_distance_degenerate(rng):
    # all-zero distances: bandwidth floors at 1e-8, weights equalize
    vals = rng.normal(size=(3, 4))
    idx = np.tile(np.arange(3), (5, 1))
    dist = np.zeros((5, 3))
    out = np.asarray(tricube_average(jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(dist)))
    assert np.allclose(out, vals.mean(axis=0))


def test_tricube_weighted_correction_shifts(rng):
    # cells exactly at MNN positions receive ~their averaged corrections
    cur = rng.normal(size=(30, 6))
    in_mnn = np.arange(0, 30, 2)
    corr = rng.normal(size=(15, 6))
    out = np.asarray(
        tricube_weighted_correction(jnp.asarray(cur), jnp.asarray(corr), in_mnn, k=3)
    )
    delta = out - cur
    assert delta.shape == cur.shape
    # the correction field is a convex combination of corr rows
    assert np.all(np.abs(delta) <= np.abs(corr).max() + 1e-8)
