"""Linear baselines (reference test-rescale-batch.R, test-regress-batch.R,
test-no-correct.R)."""
import numpy as np
import jax.numpy as jnp
import pytest

from batchelor_tpu.correct.linear import no_correct, regress_batches, rescale_batches
from batchelor_tpu.ops.residual import ResidualOp, one_hot_design


def test_rescale_batches_basic(rng):
    b1 = np.log2(rng.poisson(5.0, size=(40, 30)) + 1.0)
    b2 = np.log2(rng.poisson(10.0, size=(50, 30)) + 1.0)
    res = rescale_batches([jnp.asarray(b1), jnp.asarray(b2)])
    out = np.asarray(res.corrected)
    # oracle: unlog, scale to min average, relog
    u1, u2 = 2.0**b1 - 1, 2.0**b2 - 1
    a1, a2 = u1.mean(0), u2.mean(0)
    ref = np.minimum(a1, a2)
    with np.errstate(invalid="ignore"):
        e1 = np.log2(u1 * np.nan_to_num(ref / a1) + 1)
        e2 = np.log2(u2 * np.nan_to_num(ref / a2) + 1)
    assert np.allclose(out[:40], e1, atol=1e-10)
    assert np.allclose(out[40:], e2, atol=1e-10)
    # per-gene batch averages now equal
    assert np.allclose(
        (2.0 ** out[:40] - 1).mean(0), (2.0 ** out[40:] - 1).mean(0), atol=1e-8
    )


def test_rescale_batches_single_matches_multi(rng):
    b1 = np.abs(rng.normal(size=(30, 20)))
    b2 = np.abs(rng.normal(size=(35, 20)))
    ref = rescale_batches([jnp.asarray(b1), jnp.asarray(b2)])
    combined = np.concatenate([b1, b2])
    batch = np.repeat([0, 1], [30, 35])
    shuffle = rng.permutation(65)
    out = rescale_batches(combined[shuffle], batch=batch[shuffle])
    assert np.allclose(
        np.asarray(out.corrected), np.asarray(ref.corrected)[shuffle], atol=1e-10
    )


def test_regress_batches_removes_batch_means(rng):
    b1 = rng.normal(size=(40, 25)) + 5
    b2 = rng.normal(size=(60, 25)) - 3
    res = regress_batches([jnp.asarray(b1), jnp.asarray(b2)])
    out = np.asarray(res.corrected)
    # one-way design -> residuals are batch-mean-centred values
    assert np.allclose(out[:40], b1 - b1.mean(0), atol=1e-8)
    assert np.allclose(out[40:], b2 - b2.mean(0), atol=1e-8)


def test_regress_batches_restrict(rng):
    b1 = rng.normal(size=(40, 10))
    b2 = rng.normal(size=(40, 10)) + 2
    r1 = np.arange(20)
    r2 = np.arange(20, 40)
    res = regress_batches(
        [jnp.asarray(b1), jnp.asarray(b2)], restrict=[r1, r2]
    )
    out = np.asarray(res.corrected)
    # coefficients fitted on restricted cells only
    assert np.allclose(out[:40], b1 - b1[r1].mean(0), atol=1e-8)
    assert np.allclose(out[40:], b2 - b2[r2].mean(0), atol=1e-8)


def test_regress_batches_keep(rng):
    b1 = rng.normal(size=(30, 8)) + 1
    b2 = rng.normal(size=(30, 8)) + 4
    res = regress_batches([jnp.asarray(b1), jnp.asarray(b2)], keep=[0])
    out = np.asarray(res.corrected)
    # batch 0's coefficient is kept: batch-0 cells unchanged
    assert np.allclose(out[:30], b1, atol=1e-8)
    assert np.allclose(out[30:], b2 - b2.mean(0), atol=1e-8)


def test_regress_batches_custom_design_and_pca(rng):
    b = rng.normal(size=(50, 12))
    batch = np.repeat([0, 1], 25)
    design = np.asarray(one_hot_design(batch))
    res = regress_batches(
        np.asarray(b), batch=batch, design=jnp.asarray(design), d=4
    )
    assert res.corrected_pcs.shape == (50, 4)


def test_residual_op_lazy_matmul(rng):
    x = rng.normal(size=(40, 15))
    batch = np.repeat([0, 1], 20)
    op = ResidualOp.fit(jnp.asarray(x), one_hot_design(batch))
    v = rng.normal(size=(15, 3))
    dense = np.asarray(op.materialize())
    assert np.allclose(np.asarray(op.matmul(jnp.asarray(v))), dense @ v, atol=1e-8)
    u = rng.normal(size=(5, 40))
    assert np.allclose(np.asarray(op.rmatmul(jnp.asarray(u))), u @ dense, atol=1e-8)


def test_no_correct(rng):
    b1 = rng.normal(size=(10, 5))
    b2 = rng.normal(size=(12, 5))
    res = no_correct([jnp.asarray(b1), jnp.asarray(b2)], batch_names=["a", "b"])
    assert np.allclose(np.asarray(res.corrected), np.concatenate([b1, b2]))
    assert list(res.batch) == ["a"] * 10 + ["b"] * 12
