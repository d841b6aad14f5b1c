"""Bisect the sub32 kernel failure: try each suspect construct alone."""
import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT, DT, SUB = 512, 1024, 32
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(QT, 64)).astype(np.float32))
x = jnp.asarray(rng.normal(size=(DT, 64)).astype(np.float32))
dnc = jnp.sum(jnp.square(x), axis=1)[:, None]


def run(name, kernel, out_shape, specs, args):
    try:
        out = pl.pallas_call(
            kernel, grid=(1,),
            in_specs=specs,
            out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*args)
        print(f"{name}: OK  sum={float(jnp.sum(out)):.3f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


# 1. transposed dot_general alone -> (DT, QT)
def k1(q_ref, d_ref, o_ref):
    o_ref[:] = lax.dot_general(
        d_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

run("dot_general (DT,QT)", k1, (DT, QT),
    [pl.BlockSpec((QT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
     pl.BlockSpec((DT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM)],
    (q, x))


# 2. + (DT,1) column subtract
def k2(q_ref, d_ref, dn_ref, o_ref):
    s = lax.dot_general(
        d_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o_ref[:] = s - dn_ref[:]

run("+ dn (DT,1) col", k2, (DT, QT),
    [pl.BlockSpec((QT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
     pl.BlockSpec((DT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
     pl.BlockSpec((DT, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
    (q, x, dnc))


# 3. + leading-dim reshape + sublane max
def k3(q_ref, d_ref, dn_ref, o_ref):
    s = lax.dot_general(
        d_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) - dn_ref[:]
    o_ref[:] = jnp.max(s.reshape(DT // SUB, SUB, QT), axis=1)

run("+ reshape/sublane max", k3, (DT // SUB, QT),
    [pl.BlockSpec((QT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
     pl.BlockSpec((DT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
     pl.BlockSpec((DT, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
    (q, x, dnc))


# 4. reshape/max only, no dn
def k4(q_ref, d_ref, o_ref):
    s = lax.dot_general(
        d_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o_ref[:] = jnp.max(s.reshape(DT // SUB, SUB, QT), axis=1)

run("reshape/max no dn", k4, (DT // SUB, QT),
    [pl.BlockSpec((QT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
     pl.BlockSpec((DT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM)],
    (q, x))

# oracle check for k3 result
out = pl.pallas_call(
    k3, grid=(1,),
    in_specs=[pl.BlockSpec((QT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((DT, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((DT, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((DT // SUB, QT), lambda i: (0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((DT // SUB, QT), jnp.float32),
)(q, x, dnc)
ref = (np.asarray(x) @ np.asarray(q).T - np.asarray(dnc)).reshape(
    DT // SUB, SUB, QT).max(axis=1)
print("k3 vs numpy max |diff|:", np.abs(np.asarray(out) - ref).max(), flush=True)
