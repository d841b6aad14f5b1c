"""Pluggable kNN backend tests (chunked Pallas path runs interpreted on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from batchelor_tpu.ops.knn import query_knn


def test_chunked_matches_exact_small(rng):
    # interpreted Pallas on CPU; keep sizes tiny (one padded block)
    q = rng.normal(size=(40, 10))
    x = rng.normal(size=(300, 10))
    ref = query_knn(jnp.asarray(q), jnp.asarray(x), 5, method="exact")
    out = query_knn(jnp.asarray(q), jnp.asarray(x), 5, method="chunked")
    assert np.array_equal(np.asarray(ref.indices), np.asarray(out.indices))
    assert np.allclose(np.asarray(ref.distances), np.asarray(out.distances), atol=1e-5)


def test_chunked_respects_mask(rng):
    q = rng.normal(size=(16, 6))
    x = rng.normal(size=(256, 6))
    mask = np.zeros(256, dtype=bool)
    mask[:150] = True
    ref = query_knn(jnp.asarray(q), jnp.asarray(x[:150]), 4, method="exact")
    out = query_knn(jnp.asarray(q), jnp.asarray(x), 4, data_mask=jnp.asarray(mask),
                    method="chunked")
    assert np.array_equal(np.asarray(ref.indices), np.asarray(out.indices))


def test_chunked_hierarchical_exact(rng):
    """Recall-1.0 vs the exact XLA oracle with enough data for the full
    hierarchical selection (C128 > k: real chunk top-k + sub-chunk top-k).

    The SUB=32 exactness argument (knn_pallas.py module docstring) promises
    the candidate set always contains every true neighbour; indices must
    therefore match the oracle exactly away from ties."""
    q = jnp.asarray(rng.normal(size=(300, 24)))
    x = jnp.asarray(rng.normal(size=(4000, 24)))
    ref = query_knn(q, x, 20, method="exact")
    out = query_knn(q, x, 20, method="chunked")
    assert np.array_equal(np.asarray(ref.indices), np.asarray(out.indices))
    assert np.allclose(np.asarray(ref.distances), np.asarray(out.distances),
                       atol=1e-5)


def test_chunked_fewer_chunks_than_k(rng):
    """Degenerate kc < k: fewer 128-chunks than k — all chunks become
    candidates and the sub-chunk top-k still covers every true neighbour."""
    q = jnp.asarray(rng.normal(size=(64, 8)))
    x = jnp.asarray(rng.normal(size=(1200, 8)))
    ref = query_knn(q, x, 20, method="exact")
    out = query_knn(q, x, 20, method="chunked")
    assert np.array_equal(np.asarray(ref.indices), np.asarray(out.indices))


def test_approx_high_recall(rng):
    q = rng.normal(size=(200, 12))
    x = rng.normal(size=(2000, 12))
    ref = query_knn(jnp.asarray(q), jnp.asarray(x), 10, method="exact")
    out = query_knn(jnp.asarray(q), jnp.asarray(x), 10, method="approx")
    ref_sets = [set(r) for r in np.asarray(ref.indices).tolist()]
    out_sets = [set(r) for r in np.asarray(out.indices).tolist()]
    recall = np.mean([len(a & b) / 10 for a, b in zip(ref_sets, out_sets)])
    assert recall > 0.95


def test_bf16_high_recall(rng):
    """bf16 candidate selection: near-perfect recall, exact fp32 distances
    for the neighbours it does return."""
    q = rng.normal(size=(64, 8)).astype(np.float32)
    x = rng.normal(size=(2048, 8)).astype(np.float32)
    ref = query_knn(jnp.asarray(q), jnp.asarray(x), 8, method="exact")
    out = query_knn(jnp.asarray(q), jnp.asarray(x), 8, method="bf16")
    ref_i = np.asarray(ref.indices)
    out_i = np.asarray(out.indices)
    recall = np.mean([
        len(set(a) & set(b)) / 8 for a, b in zip(ref_i.tolist(), out_i.tolist())
    ])
    assert recall > 0.9
    # where the selection agrees, distances must agree to fp32 exactness
    agree = ref_i == out_i
    assert np.allclose(
        np.asarray(ref.distances)[agree], np.asarray(out.distances)[agree],
        atol=1e-5,
    )


def test_auto_dispatch(rng):
    """'auto' picks exact for small problems (index-stable result)."""
    q = rng.normal(size=(50, 6))
    x = rng.normal(size=(300, 6))
    ref = query_knn(jnp.asarray(q), jnp.asarray(x), 5, method="exact")
    out = query_knn(jnp.asarray(q), jnp.asarray(x), 5, method="auto")
    assert np.array_equal(np.asarray(ref.indices), np.asarray(out.indices))


def test_chunked_selection_precision(rng):
    """Adversarial near-tie geometry pinning the 3-pass bf16 split.

    Data rows sit on a ray at radii 10 + i*1e-3 with the query at radius 9:
    squared-score gaps between rank-adjacent neighbours are ~2e-3 while the
    score magnitude is ~100, so a single-pass bf16 selection (abs error
    ~100 * 2^-8 ~ 0.4) scrambles the ranking but the chunked path's 3-pass
    hi/lo split (abs error ~100 * 2^-21 ~ 5e-5, knn_pallas._chunkmax_kernel)
    must still match the exact oracle."""
    d = 8
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    radii = 10.0 + 1e-3 * rng.permutation(1024)
    x = (radii[:, None] * u[None, :]).astype(np.float32)
    q = np.tile((9.0 * u).astype(np.float32), (16, 1))
    ref = query_knn(jnp.asarray(q), jnp.asarray(x), 4, method="exact")
    out = query_knn(jnp.asarray(q), jnp.asarray(x), 4, method="chunked")
    assert np.array_equal(np.asarray(ref.indices), np.asarray(out.indices))
    assert np.allclose(np.asarray(ref.distances), np.asarray(out.distances),
                       atol=1e-5)


def test_chunked_exact_selection_six_pass(rng):
    """query_knn(exact_selection=True) routes the chunked path through the
    HIGHEST-equivalent 6-pass split (knn_pallas._chunkmax_kernel six_pass)
    and still matches the exact oracle on the adversarial near-tie
    geometry — the opt-in for raw-scale standalone queries whose score
    magnitudes dwarf neighbour gaps."""
    d = 8
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    radii = 10.0 + 1e-3 * rng.permutation(1024)
    x = (radii[:, None] * u[None, :]).astype(np.float32)
    q = np.tile((9.0 * u).astype(np.float32), (16, 1))
    ref = query_knn(jnp.asarray(q), jnp.asarray(x), 4, method="exact")
    out = query_knn(jnp.asarray(q), jnp.asarray(x), 4, method="chunked",
                    exact_selection=True)
    assert np.array_equal(np.asarray(ref.indices), np.asarray(out.indices))
    assert np.allclose(np.asarray(ref.distances), np.asarray(out.distances),
                       atol=1e-5)


def test_chunked_query_piecing_scan(rng, monkeypatch):
    """The MT_BUDGET query-piecing path (lax.scan over equal pieces) is
    exact vs the single-piece path."""
    from batchelor_tpu.ops import knn_pallas as kp

    q = rng.normal(size=(1200, 8)).astype(np.float32)
    x = rng.normal(size=(2600, 8)).astype(np.float32)
    ref = query_knn(jnp.asarray(q), jnp.asarray(x), 5, method="chunked")
    # force ~3 pieces
    monkeypatch.setattr(kp, "MT_BUDGET", 4 * (2600 // 32 + 32) * 512)
    out = query_knn(jnp.asarray(q), jnp.asarray(x), 5, method="chunked")
    assert np.array_equal(np.asarray(ref.indices), np.asarray(out.indices))
    assert np.allclose(np.asarray(ref.distances), np.asarray(out.distances))


def test_chunked_group_loop_matches_single(rng, monkeypatch):
    """The GROUP_ROWS host-level grouping (multiple scan programs + grouped
    rescore calls, the >= ~4.2M-row regime where one stacked loop carrier
    would cross the TPU runtime's 2^31-byte limit) is exact vs the
    ungrouped path, including the uneven final rescore group."""
    from batchelor_tpu.ops import knn_pallas as kp

    q = rng.normal(size=(3100, 8)).astype(np.float32)
    x = rng.normal(size=(2600, 8)).astype(np.float32)
    ref = query_knn(jnp.asarray(q), jnp.asarray(x), 5, method="chunked")
    # force ~3 scan pieces grouped 1-per-group and 1024-row rescore groups
    monkeypatch.setattr(kp, "MT_BUDGET", 4 * (2600 // 32 + 32) * 512)
    monkeypatch.setattr(kp, "GROUP_ROWS", 1024)
    out = query_knn(jnp.asarray(q), jnp.asarray(x), 5, method="chunked")
    assert np.array_equal(np.asarray(ref.indices), np.asarray(out.indices))
    assert np.allclose(np.asarray(ref.distances), np.asarray(out.distances))


def test_membership_rows_chunked_matches_flat(rng):
    """membership_rows' transposed block-map (the 2^31-byte-safe carrier
    layout) matches a flat numpy membership oracle across block splits."""
    from batchelor_tpu.ops.mutual_nn import membership_rows

    n1, n2, k1, k2 = 337, 251, 4, 5
    l2r = rng.integers(0, n2, size=(n1, k2)).astype(np.int32)
    r2l = rng.integers(0, n1, size=(n2, k1)).astype(np.int32)
    ids = np.arange(n1, dtype=np.int32)
    want = np.zeros((n1, k2), dtype=bool)
    for i in range(n1):
        for p in range(k2):
            want[i, p] = i in r2l[l2r[i, p]]
    for chunk in (64, 128, n1):
        got = np.asarray(membership_rows(
            jnp.asarray(l2r), jnp.asarray(r2l), jnp.asarray(ids),
            chunk=chunk,
        ))
        assert np.array_equal(got, want)
