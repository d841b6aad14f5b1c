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

__all__ = ["get_bio_span", "subtract_bio"]


@functools.partial(jax.jit, static_argnames=("ndim",))
def _span(x: jnp.ndarray, ndim: int):
    """Top-ndim (V, s, U) of the column-centred matrix via the smaller-side
    cross-product eigh (jnp.linalg.svd compiles pathologically slowly on
    TPU; an exact eigh of the small Gram is equivalent)."""
    centered = x - jnp.mean(x, axis=0, keepdims=True)
    n, g = centered.shape
    tiny = jnp.finfo(x.dtype).tiny
    if n <= g:
        k = centered @ centered.T
        evals, evecs = jnp.linalg.eigh(k)
        s = jnp.sqrt(jnp.maximum(evals[::-1][:ndim], 0.0))
        u = evecs[:, ::-1][:, :ndim]
        v = (centered.T @ u) / jnp.maximum(s, tiny)[None, :]
        return v, s, u
    c = centered.T @ centered
    evals, evecs = jnp.linalg.eigh(c)
    s = jnp.sqrt(jnp.maximum(evals[::-1][:ndim], 0.0))
    v = evecs[:, ::-1][:, :ndim]
    u = (centered @ v) / jnp.maximum(s, tiny)[None, :]
    return v, s, u


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
    x = jnp.asarray(x)
    g_all = x.shape[1]
    if subset_row is None:
        ndim = int(min(ndim, x.shape[0], x.shape[1]))
        v, _, _ = _span(x, ndim)
        return v

    subset_row = np.asarray(subset_row)
    keep = np.zeros(g_all, dtype=bool)
    keep[subset_row] = True
    leftover_idx = np.nonzero(~keep)[0]
    sub = x[:, jnp.asarray(subset_row)]
    ndim = int(min(ndim, sub.shape[0], sub.shape[1]))
    v, s, u = _span(sub, ndim)
    # leftover rows: project unused genes into the same cell space
    left = x[:, jnp.asarray(leftover_idx)]
    left_centered = left - jnp.mean(left, axis=0, keepdims=True)
    safe_s = jnp.maximum(s, jnp.finfo(x.dtype).tiny)
    left_v = (left_centered.T @ u) / safe_s[None, :]
    out = jnp.zeros((g_all, ndim), x.dtype)
    out = out.at[jnp.asarray(subset_row)].set(v)
    out = out.at[jnp.asarray(leftover_idx)].set(left_v)
    return out


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
