"""multiBatchNorm + scuttle-equivalent tests (reference test-multi-norm.R)."""
import numpy as np
import jax.numpy as jnp

from batchelor_tpu.ops.normalization import (
    calculate_average,
    library_size_factors,
    log_norm_counts,
    multi_batch_norm,
    rescale_size_factors,
)


def _counts(rng, n, g, scale=1.0):
    return rng.poisson(lam=scale * rng.gamma(2.0, 1.0, size=(1, g)), size=(n, g)).astype(
        np.float64
    )


def test_library_size_factors(rng):
    x = _counts(rng, 30, 50)
    sf = np.asarray(library_size_factors(jnp.asarray(x)))
    libs = x.sum(axis=1)
    assert np.allclose(sf, libs / libs.mean())
    assert np.isclose(sf.mean(), 1.0)


def test_calculate_average(rng):
    x = _counts(rng, 20, 40)
    sf = np.linspace(0.5, 2.0, 20)
    ave = np.asarray(calculate_average(jnp.asarray(x), jnp.asarray(sf)))
    c = sf / sf.mean()
    assert np.allclose(ave, (x / c[:, None]).mean(axis=0))


def test_exact_scaling_recovery(rng):
    # X, 2X, 3X must produce identical logcounts
    # (reference test-multi-norm.R:15-46)
    x = _counts(rng, 50, 100, scale=5.0) + 1.0
    res = multi_batch_norm([jnp.asarray(x), jnp.asarray(2 * x), jnp.asarray(3 * x)],
                           min_mean=0.0)
    l0 = np.asarray(res.logcounts[0])
    assert np.allclose(l0, np.asarray(res.logcounts[1]), atol=1e-8)
    assert np.allclose(l0, np.asarray(res.logcounts[2]), atol=1e-8)
    # everything is rescaled DOWN to the lowest-coverage batch
    sf0 = np.asarray(res.size_factors[0])
    sf1 = np.asarray(res.size_factors[1])
    assert np.allclose(sf1, 2 * sf0, rtol=1e-8)


def test_rescale_order_invariance(rng):
    # rearranging batches gives identical per-batch factors
    a1 = jnp.asarray(_counts(rng, 30, 80, 2.0))
    a2 = jnp.asarray(_counts(rng, 40, 80, 5.0))
    a3 = jnp.asarray(_counts(rng, 20, 80, 1.0))
    r123 = multi_batch_norm([a1, a2, a3], min_mean=0.5)
    r321 = multi_batch_norm([a3, a2, a1], min_mean=0.5)
    assert np.allclose(
        np.asarray(r123.size_factors[0]), np.asarray(r321.size_factors[2]), rtol=1e-10
    )
    assert np.allclose(
        np.asarray(r123.size_factors[1]), np.asarray(r321.size_factors[1]), rtol=1e-10
    )


def test_min_mean_filter(rng):
    # adding tiny-mean genes changes nothing when min_mean filters them out
    x = _counts(rng, 30, 60, 5.0) + 1.0
    y = 2 * x
    tiny = rng.uniform(0, 0.01, size=(30, 10))
    xa = np.concatenate([x, tiny], axis=1)
    ya = np.concatenate([y, tiny * 5], axis=1)
    base = rescale_size_factors(
        [jnp.asarray(x.mean(0)), jnp.asarray(y.mean(0))],
        [jnp.ones(30), jnp.ones(30)],
        min_mean=1.0,
    )
    aug = rescale_size_factors(
        [jnp.asarray(xa.mean(0)), jnp.asarray(ya.mean(0))],
        [jnp.ones(30), jnp.ones(30)],
        min_mean=1.0,
    )
    assert np.allclose(np.asarray(base[0]), np.asarray(aug[0]), rtol=1e-10)
    assert np.allclose(np.asarray(base[1]), np.asarray(aug[1]), rtol=1e-10)


def test_log_norm_counts():
    x = jnp.asarray(np.array([[4.0, 8.0], [2.0, 2.0]]))
    sf = jnp.asarray(np.array([2.0, 1.0]))
    out = np.asarray(log_norm_counts(x, sf))
    assert np.allclose(out, np.log2(np.array([[2.0, 4.0], [2.0, 2.0]]) + 1))


def test_single_input_fragment_matches_list(rng):
    """Single matrix + batch factor with preserve_single=False fragments per
    level and matches the list call (reference test-multi-norm.R:148-170)."""
    x1 = _counts(rng, 40, 80, scale=5.0) + 1.0
    x2 = x1 * rng.uniform(1.5, 2.5, size=(1, 80))
    x3 = x1 * rng.uniform(2.5, 3.5, size=(1, 80))
    ref = multi_batch_norm([jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(x3)])
    combined = jnp.asarray(np.concatenate([x1, x2, x3], axis=0))
    batch = np.repeat([1, 2, 3], 40)
    alt = multi_batch_norm(combined, batch=batch, preserve_single=False)
    for r, a in zip(ref.logcounts, alt.logcounts):
        assert np.allclose(np.asarray(r), np.asarray(a), atol=1e-12)
    for r, a in zip(ref.size_factors, alt.size_factors):
        assert np.allclose(np.asarray(r), np.asarray(a), atol=1e-12)
    # reversed batch labels permute the output list (levels sorted)
    alt2 = multi_batch_norm(
        combined, batch=np.repeat([3, 2, 1], 40), preserve_single=False
    )
    for r, a in zip(ref.logcounts, alt2.logcounts[::-1]):
        assert np.allclose(np.asarray(r), np.asarray(a), atol=1e-12)


def test_single_input_preserve_single(rng):
    """preserve_single=True returns one matrix/vector in input cell order
    (reference test-multi-norm.R:182-200 and R/multiBatchNorm.R:57)."""
    x1 = _counts(rng, 30, 60, scale=5.0) + 1.0
    x2 = x1 * rng.uniform(1.5, 2.5, size=(1, 60))
    combined = np.concatenate([x1, x2], axis=0)
    # interleave cells so input order != batch-block order
    perm = rng.permutation(60)
    batch = np.repeat([1, 2], 30)[perm]
    shuffled = jnp.asarray(combined[perm])
    single = multi_batch_norm(shuffled, batch=batch)
    frags = multi_batch_norm(shuffled, batch=batch, preserve_single=False)
    assert single.logcounts.shape == (60, 60)
    stacked = np.concatenate([np.asarray(m) for m in frags.logcounts])
    order = np.concatenate(
        [np.nonzero(batch == b)[0] for b in (1, 2)]
    )
    inv = np.empty_like(order)
    inv[order] = np.arange(60)
    assert np.allclose(np.asarray(single.logcounts), stacked[inv], atol=1e-12)
    # subsetting: subset first then normalize == normalize with subset_row
    a = multi_batch_norm(shuffled[:, :20], batch=batch)
    b = multi_batch_norm(shuffled, batch=batch, subset_row=np.arange(20))
    assert np.allclose(np.asarray(a.logcounts), np.asarray(b.logcounts), atol=1e-12)


def test_single_input_requires_batch(rng):
    x = _counts(rng, 10, 20)
    try:
        multi_batch_norm(jnp.asarray(x))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "batch" in str(e)
