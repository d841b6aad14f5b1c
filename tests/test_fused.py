"""Fused on-device merge step vs the host-orchestrated reference path."""
import numpy as np
import jax.numpy as jnp

from batchelor_tpu.correct.fast_mnn import reduced_mnn
from batchelor_tpu.correct.fused import fused_merge_step


def test_fused_matches_host_path(rng):
    b1 = rng.normal(size=(300, 20))
    b2 = rng.normal(size=(250, 20)) + 1
    ref = reduced_mnn([jnp.asarray(b1), jnp.asarray(b2)], k=20)
    out = fused_merge_step(jnp.asarray(b1), jnp.asarray(b2), 20, 20)
    fused = np.concatenate([np.asarray(out.left), np.asarray(out.right)])
    assert np.allclose(fused, np.asarray(ref.corrected), atol=1e-8)
    assert int(out.n_pairs) == ref.merge_info[0].pairs.shape[0]
    assert np.isclose(float(out.batch_size), ref.merge_info[0].batch_size, atol=1e-10)
    # pair sets agree
    mask = np.asarray(out.pair_mask)
    tgt = np.asarray(out.pair_targets)
    rows, cols = np.nonzero(mask)
    ours = set(zip(rows.tolist(), tgt[rows, cols].tolist()))
    theirs = set(map(tuple, ref.merge_info[0].pairs.tolist()))
    theirs0 = {(l, r - 300) for l, r in theirs}
    assert ours == theirs0


def test_fused_skip_behaviour(rng):
    b1 = rng.normal(size=(200, 10))
    b2 = rng.normal(size=(200, 10))
    out = fused_merge_step(
        jnp.asarray(b1), jnp.asarray(b2), 20, 20, min_batch_skip=0.5
    )
    assert float(out.batch_size) < 0.5
    assert np.allclose(np.asarray(out.left), b1, atol=1e-12)
    assert np.allclose(np.asarray(out.right), b2, atol=1e-12)
