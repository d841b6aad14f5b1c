"""Pallas row-wise top-k by iterative masked argmax.

lax.top_k on TPU is sort-based with poor constants (341 ms for a
(98304, 768) fp32 selection — NOTES.md); for the small k this framework
needs (k <= 64) an iterative extract-max loop in VMEM is far cheaper:
k passes of (max, argmax, mask-selected-position) over rows held entirely
on-chip.

Tie behaviour matches lax.top_k: equal values resolve to the lower column
index (argmax picks the first maximum; only the selected position is
masked, so duplicated values elsewhere remain candidates).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["topk_rows"]

_ROWS_PER_BLOCK = 256


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, kpad: int):
    s = x_ref[:].astype(jnp.float32)            # (R, W)
    r, w = s.shape
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    out_slot = jax.lax.broadcasted_iota(jnp.int32, (r, kpad), 1)

    def body(t, carry):
        s, vals, idx = carry
        m = jnp.max(s, axis=1, keepdims=True)   # (R, 1)
        # first column attaining the max (stable ties like lax.top_k);
        # min-index formulation — the argmax primitive and dynamic
        # lane-indexed ref stores both compile pathologically in Mosaic.
        am = jnp.min(jnp.where(s == m, col_ids, w), axis=1, keepdims=True)
        hit = out_slot == t
        vals = jnp.where(hit, m, vals)
        idx = jnp.where(hit, am, idx)
        s = jnp.where(col_ids == am, neg_inf, s)
        return s, vals, idx

    init = (
        s,
        jnp.full((r, kpad), neg_inf, jnp.float32),
        jnp.zeros((r, kpad), jnp.int32),
    )
    _, vals, idx = jax.lax.fori_loop(0, k, body, init)
    vals_ref[:] = vals
    idx_ref[:] = idx


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_rows(x: jnp.ndarray, k: int, interpret: bool = False):
    """(values, indices) of the k largest entries per row, descending.

    Drop-in for lax.top_k on 2-D fp32/int inputs with k <= 64 and
    modest row width (the full row block must fit VMEM: W <= ~16k fp32).
    """
    n, w = x.shape
    # lane-align the width: Mosaic faults on sub-128 (or unaligned) lane
    # dims. -inf pad columns sit at higher indices than every real column,
    # so ties resolve to the real column and they are never selected while
    # any real candidate remains.
    wpad = max(-(-w // 128) * 128, 128)
    # VMEM-bounded rows per block: the kernel holds ~3 copies of the
    # (rows, W) block (scores + loop carry) plus outputs.
    budget = 10 * 1024 * 1024
    r = _ROWS_PER_BLOCK
    while r > 8 and 3 * r * wpad * 4 > budget:
        r //= 2
    npad = -(-n // r) * r
    xp = jnp.pad(x.astype(jnp.float32), ((0, npad - n), (0, wpad - w)),
                 constant_values=-jnp.inf)
    kpad = max(-(-k // 128) * 128, 128)  # output lane padding

    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, kpad=kpad),
        grid=(npad // r,),
        in_specs=[pl.BlockSpec((r, wpad), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((r, kpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, kpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, kpad), jnp.float32),
            jax.ShapeDtypeStruct((npad, kpad), jnp.int32),
        ),
        interpret=interpret,
    )(xp)
    return vals[:n, :k], idx[:n, :k]
