"""Telemetry + cosine norm unit tests (reference test-cos-norm.R analog)."""
import numpy as np
import jax.numpy as jnp

import oracle
from batchelor_tpu.correct.fast_mnn import reduced_mnn
from batchelor_tpu.ops.cosine_norm import apply_cosine_norm, cosine_norm
from batchelor_tpu.utils.telemetry import MetricsRecorder, trace_span


def test_cosine_norm_modes(rng):
    x = rng.normal(size=(30, 12))
    mat = np.asarray(cosine_norm(jnp.asarray(x)))
    assert np.allclose(mat, oracle.cosine_norm(x), atol=1e-12)
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0)
    l2 = np.asarray(cosine_norm(jnp.asarray(x), mode="l2norm"))
    assert np.allclose(l2, np.linalg.norm(x, axis=1))
    m2, l22 = cosine_norm(jnp.asarray(x), mode="all")
    assert np.allclose(np.asarray(m2), mat)
    assert np.allclose(np.asarray(l22), l2)


def test_cosine_norm_zero_guard():
    x = jnp.asarray(np.zeros((3, 4)))
    out = np.asarray(cosine_norm(x))
    assert np.isfinite(out).all()
    assert np.allclose(out, 0.0)


def test_cosine_norm_subset(rng):
    x = rng.normal(size=(20, 10))
    sub = np.arange(0, 10, 2)
    l2 = np.asarray(cosine_norm(jnp.asarray(x), mode="l2norm", subset_row=sub))
    assert np.allclose(l2, np.linalg.norm(x[:, sub], axis=1))
    # subset L2 applied to the full matrix (fastMNN pattern)
    full = np.asarray(apply_cosine_norm(jnp.asarray(x), jnp.asarray(l2)))
    assert np.allclose(full, x / np.maximum(l2, 1e-8)[:, None])


def test_metrics_recorder_captures_merge(rng):
    rec = MetricsRecorder()
    b1 = rng.normal(size=(60, 8))
    b2 = rng.normal(size=(70, 8)) + 1
    with rec.activate():
        reduced_mnn([jnp.asarray(b1), jnp.asarray(b2)])
    assert rec.counters["merge_steps"] == 1
    assert rec.counters["mnn_pairs"] > 0
    assert rec.counters["cells_merged"] == 130
    summary = rec.summary()
    assert "fastmnn/mnn_search" in summary["spans"]
    assert "fastmnn/correct" in summary["spans"]
    assert rec.dump_json()


def test_trace_span_without_recorder():
    with trace_span("noop"):
        pass  # must not raise when no recorder is active
