"""Exact SVD helpers: biological-subspace estimation and removal.

TPU-native equivalents of the reference's bio-span machinery
(.get_bio_span / .subtract_bio, R/mnnCorrect.R:487-538), using exact
jnp.linalg.svd instead of BiocSingular's IRLBA.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["get_bio_span", "get_bio_span_pair", "subtract_bio"]


@functools.partial(jax.jit, static_argnames=("transpose",))
def _centered_gram(x: jnp.ndarray, transpose: bool):
    centered = x - jnp.mean(x, axis=0, keepdims=True)
    gram = centered.T @ centered if transpose else centered @ centered.T
    return centered, gram


@functools.partial(jax.jit, static_argnames=("ndim", "transpose"))
def _span_project(centered, evals, evecs, ndim: int, transpose: bool):
    tiny = jnp.finfo(centered.dtype).tiny
    s = jnp.sqrt(jnp.maximum(evals[::-1][:ndim], 0.0))
    vec = evecs[:, ::-1][:, :ndim]
    if transpose:
        u = (centered @ vec) / jnp.maximum(s, tiny)[None, :]
        return vec, s, u
    v = (centered.T @ vec) / jnp.maximum(s, tiny)[None, :]
    return v, s, vec


def _span(x: jnp.ndarray, ndim: int):
    """Top-ndim (V, s, U) of the column-centred matrix via the smaller-side
    cross-product eigh (jnp.linalg.svd compiles pathologically slowly on
    TPU; an exact eigh of the small Gram is equivalent). The eigh itself
    goes through ops.pca.full_eigh — host LAPACK on TPU backends, where
    the device eigh costs minutes of compile PER SHAPE and bio-span shapes
    vary every merge step."""
    from .pca import full_eigh

    n, g = x.shape
    transpose = n > g
    centered, gram = _centered_gram(x, transpose)
    evals, evecs = full_eigh(gram)
    return _span_project(centered, evals, evecs, ndim, transpose)


def _span_prepare(x, ndim: int, subset_row: Optional[np.ndarray]):
    """Gram-construction phase of get_bio_span: returns (state, gram) so
    several spans' eighs can batch into one host round trip
    (full_eigh_many)."""
    x = jnp.asarray(x)
    g_all = x.shape[1]
    if subset_row is None:
        sub = x
        subset_row_np = None
    else:
        subset_row_np = np.asarray(subset_row)
        sub = x[:, jnp.asarray(subset_row_np)]
    ndim = int(min(ndim, sub.shape[0], sub.shape[1]))
    transpose = sub.shape[0] > sub.shape[1]
    centered, gram = _centered_gram(sub, transpose)
    return (x, centered, ndim, transpose, g_all, subset_row_np), gram


def _span_finish(state, eig) -> jnp.ndarray:
    x, centered, ndim, transpose, g_all, subset_row = state
    evals, evecs = eig
    v, s, u = _span_project(centered, evals, evecs, ndim, transpose)
    if subset_row is None:
        return v
    keep = np.zeros(g_all, dtype=bool)
    keep[subset_row] = True
    leftover_idx = np.nonzero(~keep)[0]
    # leftover rows: project unused genes into the same cell space
    left = x[:, jnp.asarray(leftover_idx)]
    left_centered = left - jnp.mean(left, axis=0, keepdims=True)
    safe_s = jnp.maximum(s, jnp.finfo(x.dtype).tiny)
    left_v = (left_centered.T @ u) / safe_s[None, :]
    out = jnp.zeros((g_all, ndim), x.dtype)
    out = out.at[jnp.asarray(subset_row)].set(v)
    out = out.at[jnp.asarray(leftover_idx)].set(left_v)
    return out


def get_bio_span(
    x: jnp.ndarray,
    ndim: int,
    subset_row: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Gene-space basis of the biological subspace of ``x`` (cells x genes).

    Columns are centred per gene; the top ``ndim`` right singular vectors
    span the "biology". With ``subset_row``, the SVD runs on the subset and
    the basis rows for leftover genes are back-projected
    (reference .get_bio_span, R/mnnCorrect.R:487-521).
    """
    from .pca import full_eigh

    state, gram = _span_prepare(x, ndim, subset_row)
    return _span_finish(state, full_eigh(gram))


def get_bio_span_pair(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    ndim: int,
    subset_row: Optional[np.ndarray] = None,
):
    """Both sides' bio spans with ONE host eigh round trip.

    The classic merge loop solves two (or with correct_all four) bio-span
    eighs per step; on a tunneled TPU each full_eigh call is a separate
    Gram fetch + push. Same-shaped Grams (the common case: more MNN cells
    than genes on both sides, so both Grams are (G, G)) are stacked, moved
    once, and solved by one batched LAPACK call (ops.pca.full_eigh_many);
    mismatched shapes fall back to two independent solves. Results are
    identical to two get_bio_span calls.
    """
    from .pca import full_eigh_many

    st1, g1 = _span_prepare(x1, ndim, subset_row)
    st2, g2 = _span_prepare(x2, ndim, subset_row)
    e1, e2 = full_eigh_many([g1, g2])
    return _span_finish(st1, e1), _span_finish(st2, e2)


def subtract_bio(
    correction: jnp.ndarray,
    span1: jnp.ndarray,
    span2: jnp.ndarray,
    subset_row: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Remove the components of ``correction`` parallel to two bio bases.

    Sequentially projects out span1 then span2 (order irrelevant per the
    reference comment). With ``subset_row``, magnitudes are computed on the
    subset only (reference .subtract_bio, R/mnnCorrect.R:523-538).
    """
    correction = jnp.asarray(correction)
    for span in (span1, span2):
        span = jnp.asarray(span)
        if subset_row is None:
            mag = correction @ span
        else:
            s = jnp.asarray(np.asarray(subset_row))
            mag = correction[:, s] @ span[s]
        correction = correction - mag @ span.T
    return correction
