"""Pallas TPU kernel: batched pivot-free Cholesky log-determinant.

The production hot op behind the MCMC coordinate density (see ops/logdet.py
for the math and why not slogdet).  Kernel design:

  * layout (m, m, LANES): the batch lives in the lane dimension, so every
    elimination step is an (m, m)-shaped VPU op applied to 128 walkers at
    once; the matrix dimension m (= 2n electrons for dim=2) sits in
    sublanes.
  * each grid step DMAs one (m, m, 128) block HBM->VMEM, runs all m
    elimination steps on the VMEM-resident block, and writes back only the
    (128,) log-determinants — one HBM pass total, where the XLA LU path
    re-touches HBM every column step.
  * the elimination is a ``fori_loop`` updating the block in-place in the
    ref, so at most two (m, m, 128) copies are live (~2.5 MB at m=26,
    ~9.8 MB at m=98) — bounded VMEM independent of m's loop length.  Each
    step is a masked rank-1 update: no pivot search, no data-dependent
    control flow, value-independent runtime.
  * non-positive pivots are deflated (log(PIVOT_FLOOR) contribution, column
    zeroed) so near-singular walkers produce a large negative log-det, never
    NaN/Inf — required by the Metropolis accept rule.

Matrices with m > MAX_PALLAS_M exceed the scoped-VMEM budget and fall back
to the pure-jnp reference (ops/logdet.chol_logdet_ref) automatically.

Differentially tested against jnp.linalg.slogdet and the pure-jnp reference
in tests/test_logdet.py (interpret mode on CPU, real kernel on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .logdet import PIVOT_FLOOR, chol_logdet_ref

__all__ = ["chol_logdet_pallas", "MAX_PALLAS_M"]

LANES = 128

# two live (m, m, LANES) f32 copies must fit the ~16 MB scoped-VMEM budget
MAX_PALLAS_M = 104


def _chol_logdet_kernel(a_ref, out_ref, *, m: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
    dtype = a_ref.dtype
    floor = jnp.asarray(PIVOT_FLOOR, dtype)
    log_floor = jnp.log(floor)

    def step(k, ld):
        d = a_ref[pl.ds(k, 1), pl.ds(k, 1), :]  # (1, 1, LANES)
        bad = d < floor
        d_use = jnp.where(bad, jnp.ones_like(d), d)
        ld = ld + jnp.where(bad, log_floor, jnp.log(d_use))
        col = a_ref[:, pl.ds(k, 1), :] / d_use  # (m, 1, LANES)
        colm = jnp.where((rows > k) & ~bad, col, 0.0)
        # rank-1 update A -= col d col^T, batched over lanes
        a_ref[:] = a_ref[:] - colm * (colm.transpose(1, 0, 2) * d_use)
        return ld

    ld = jax.lax.fori_loop(0, m, step, jnp.zeros((1, 1, LANES), dtype))
    out_ref[0, :] = ld[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_logdet_pallas(A, interpret: bool = False):
    """log det for (batch, m, m) f32 SPD matrices via the Pallas kernel.

    Accepts any batch size (pads the lane-blocked batch with identity
    matrices, whose log det is 0 and which never trip the deflation path).
    Falls back to the jnp reference when m exceeds the VMEM budget.
    """
    batch, m, _ = A.shape
    if m > MAX_PALLAS_M:
        return chol_logdet_ref(A)
    nblocks = pl.cdiv(batch, LANES)
    padded = nblocks * LANES
    At = jnp.moveaxis(A, 0, -1)  # (m, m, batch)
    if padded != batch:
        eye_pad = jnp.broadcast_to(
            jnp.eye(m, dtype=A.dtype)[:, :, None], (m, m, padded - batch)
        )
        At = jnp.concatenate([At, eye_pad], axis=-1)

    out = pl.pallas_call(
        functools.partial(_chol_logdet_kernel, m=m),
        out_shape=jax.ShapeDtypeStruct((1, padded), A.dtype),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((m, m, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At)
    return out[0, :batch]
