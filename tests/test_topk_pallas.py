"""Pallas k-extraction top-k (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
from jax import lax

from batchelor_tpu.ops.topk_pallas import topk_rows


def test_matches_lax_topk(rng):
    x = jnp.asarray(rng.normal(size=(300, 512)).astype(np.float32))
    v1, i1 = topk_rows(x, 13, interpret=True)
    v2, i2 = lax.top_k(x, 13)
    assert np.allclose(np.asarray(v1), np.asarray(v2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def test_tie_stability(rng):
    x = jnp.asarray(np.zeros((16, 256), np.float32))
    v, i = topk_rows(x, 5, interpret=True)
    ref_v, ref_i = lax.top_k(x, 5)
    assert np.array_equal(np.asarray(i), np.asarray(ref_i))
    # duplicated max values: both instances selected
    y = np.zeros((4, 128), np.float32)
    y[:, 10] = 7.0
    y[:, 90] = 7.0
    v, i = topk_rows(jnp.asarray(y), 3, interpret=True)
    assert np.array_equal(np.asarray(i)[:, :2], np.tile([10, 90], (4, 1)))


def test_uneven_rows(rng):
    x = jnp.asarray(rng.normal(size=(77, 384)).astype(np.float32))
    v1, i1 = topk_rows(x, 9, interpret=True)
    v2, i2 = lax.top_k(x, 9)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
