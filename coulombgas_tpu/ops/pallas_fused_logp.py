"""Pallas TPU kernel: fused plane-wave/Jacobian Gram log-determinant tail.

The MCMC coordinate density logp = 2 Re log Psi decomposes as

    logp = 2 Re log det D + log |det J|
         = log det (D^H D) + 1/2 log det (J^T J)

with D_im = L^(-dim/2) exp(i k_m . u_i), u = flow(x), J = d flow / dx.
The jnp composition of this tail (angles -> cos/sin -> two Gram matmuls ->
real 2n x 2n embedding -> concatenate -> batch-to-lane transpose -> Cholesky
kernel) re-touches HBM at every seam and measured ~9 ms per Metropolis sweep
at n=13, batch 8192 — several times the arithmetic cost.  This kernel fuses
the entire tail per 128-walker lane block:

  * inputs arrive batch-last ((n, dim, B) coordinates/momenta and
    (nd, nd, B) Jacobians), one HBM read each, nothing else is materialized;
  * the angle matrix, cos/sin, the complex Hermitian Gram H = D^H D and the
    real Gram G = J^T J are built in VMEM with statically unrolled
    outer-product accumulation over the (small) particle index;
  * H gets a complex pivot-free Cholesky (n steps on (n, n, 128) blocks —
    4x cheaper than the real 2n x 2n embedding the jnp path used), G the
    real one (nd steps); both deflate non-positive pivots to
    log(PIVOT_FLOOR) so near-singular walkers yield a large negative logp
    (Metropolis rejection), never NaN;
  * only the (B,) logp leaves the kernel.

Differentially tested against the jnp slogdet assembly in interpret mode on
CPU and on the real TPU (tests/test_fused_logp.py).  Falls back to the jnp
composition for matrices beyond the VMEM budget (see fast_logp.py).

Reference analogue: none — the reference recomputes logp with generic AD +
LU slogdet inside every Metropolis step (src/MCMC.py:22-37,
src/logpsi.py:22-31).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .logdet import PIVOT_FLOOR

__all__ = ["fused_logp_pallas", "MAX_FUSED_N", "fused_vmem_bytes", "fused_fits"]

LANES = 128

# VMEM per block ~ (n^2*3 + nd^2*2) * LANES * 4 B; n=57 (dim=2) is ~13 MB.
# Kept for backward compatibility; the real gate is ``fused_fits`` below,
# which is dim-aware (VMEM scales with nd^2 = (n*dim)^2, so dim=3 hits the
# 64 MB wall well before n=57).
MAX_FUSED_N = 57

VMEM_BUDGET_BYTES = 40 * 1024 * 1024  # leave headroom under the ~64 MB/core


def fused_vmem_bytes(n: int, dim: int) -> int:
    """Estimated peak VMEM of one lane block of the fused kernel.

    Counts the (double-buffered) inputs (J^T (nd,nd,LANES), u/k (n,dim,LANES))
    plus the scratch Grams (h_r, h_i, g_s) and the ang/cos/sin pipeline.
    """
    nd = n * dim
    inputs = 2 * (nd * nd + 2 * n * dim)  # double-buffered across grid blocks
    scratch = nd * nd + 5 * n * n
    return 4 * LANES * (inputs + scratch)


def fused_fits(n: int, dim: int) -> bool:
    return fused_vmem_bytes(n, dim) <= VMEM_BUDGET_BYTES


def _fused_logp_kernel(ut_ref, kt_ref, jt_ref, out_ref, h_r, h_i, g_s,
                       *, n: int, dim: int, c: float):
    nd = n * dim
    dtype = ut_ref.dtype
    floor = jnp.asarray(PIVOT_FLOOR, dtype)
    log_floor = jnp.log(floor)

    # ---- D = c * exp(i ang), ang[i, m] = sum_d u[i, d] k[m, d] ------------
    ang = jnp.zeros((n, n, LANES), dtype)
    for d in range(dim):
        ang = ang + ut_ref[:, d, :][:, None, :] * kt_ref[:, d, :][None, :, :]
    Dr = c * jnp.cos(ang)
    Di = c * jnp.sin(ang)

    # ---- Hermitian Gram H = D^H D, unrolled over the particle index ------
    Hr = jnp.zeros((n, n, LANES), dtype)
    Hi = jnp.zeros((n, n, LANES), dtype)
    for i in range(n):
        dr, di = Dr[i], Di[i]  # (n, LANES)
        Hr = Hr + dr[:, None] * dr[None, :] + di[:, None] * di[None, :]
        Hi = Hi + dr[:, None] * di[None, :] - di[:, None] * dr[None, :]
    h_r[:] = Hr
    h_i[:] = Hi

    # ---- real Gram G = J^T J ----------------------------------------------
    G = jnp.zeros((nd, nd, LANES), dtype)
    for j in range(nd):
        row = jt_ref[j]  # (nd, LANES)
        G = G + row[:, None] * row[None, :]
    g_s[:] = G

    # ---- complex pivot-free Cholesky of H: log det H = sum log d_k --------
    rows_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    def hstep(k, ld):
        d = h_r[pl.ds(k, 1), pl.ds(k, 1), :]  # (1, 1, LANES), real diagonal
        bad = d < floor
        d_use = jnp.where(bad, jnp.ones_like(d), d)
        ld = ld + jnp.where(bad, log_floor, jnp.log(d_use))
        keep = (rows_n > k) & ~bad
        cr = jnp.where(keep, h_r[:, pl.ds(k, 1), :], 0.0)  # (n, 1, LANES)
        ci = jnp.where(keep, h_i[:, pl.ds(k, 1), :], 0.0)
        # H -= col col^H / d  (col = H[:, k]); Hermitian outer product
        crr = cr.transpose(1, 0, 2)
        cir = ci.transpose(1, 0, 2)
        inv = 1.0 / d_use
        h_r[:] = h_r[:] - (cr * crr + ci * cir) * inv
        h_i[:] = h_i[:] - (ci * crr - cr * cir) * inv
        return ld

    ld_h = jax.lax.fori_loop(0, n, hstep, jnp.zeros((1, 1, LANES), dtype))

    # ---- real pivot-free Cholesky of G ------------------------------------
    rows_nd = jax.lax.broadcasted_iota(jnp.int32, (nd, 1, 1), 0)

    def gstep(k, ld):
        d = g_s[pl.ds(k, 1), pl.ds(k, 1), :]
        bad = d < floor
        d_use = jnp.where(bad, jnp.ones_like(d), d)
        ld = ld + jnp.where(bad, log_floor, jnp.log(d_use))
        col = jnp.where((rows_nd > k) & ~bad, g_s[:, pl.ds(k, 1), :], 0.0)
        g_s[:] = g_s[:] - col * (col.transpose(1, 0, 2) / d_use)
        return ld

    ld_g = jax.lax.fori_loop(0, nd, gstep, jnp.zeros((1, 1, LANES), dtype))

    out_ref[0, :] = ld_h[0, 0] + 0.5 * ld_g[0, 0]


@functools.partial(jax.jit, static_argnames=("L", "interpret", "batch_last"))
def fused_logp_pallas(u, kvec, J, L: float, interpret: bool = False,
                      batch_last: bool = False):
    """logp = log det(D^H D) + 1/2 log det(J^T J) for a walker batch.

    Args:
      u: (B, n, dim) flow outputs.
      kvec: (B, n, dim) momentum vectors of the occupied orbitals.
      J: (B, nd, nd) flow coordinate Jacobians.
      L: box size (static).
      batch_last: inputs already transposed — u (n, dim, B), kvec (n, dim, B),
        J (nd, nd, B), as produced by ops/pallas_flow_jac.py — skip the
        moveaxis.
    Returns: (B,) logp, f32.
    """
    if batch_last:
        ut, kt, jt = u, kvec, J
        n, dim, B = u.shape
    else:
        ut = jnp.moveaxis(u, 0, -1)  # (n, dim, B)
        kt = jnp.moveaxis(kvec, 0, -1)
        jt = jnp.moveaxis(J, 0, -1)  # (nd, nd, B)
        B, n, dim = u.shape
    nd = n * dim
    c = float(L) ** (-dim / 2)
    nblocks = pl.cdiv(B, LANES)
    padded = nblocks * LANES
    if padded != B:
        pad = padded - B
        # pad with copies of walker 0 (a real walker, so D stays PD) and
        # identity Jacobians; the padded lanes are sliced away on return and
        # at worst hit the Cholesky deflation floor (never NaN).
        ut = jnp.concatenate(
            [ut, jnp.broadcast_to(ut[:, :, :1], (n, dim, pad))], axis=-1
        )
        kt = jnp.concatenate(
            [kt, jnp.broadcast_to(kt[:, :, :1], (n, dim, pad))], axis=-1
        )
        eye_pad = jnp.broadcast_to(
            jnp.eye(nd, dtype=jt.dtype)[:, :, None], (nd, nd, pad)
        )
        jt = jnp.concatenate([jt, eye_pad], axis=-1)

    out = pl.pallas_call(
        functools.partial(_fused_logp_kernel, n=n, dim=dim, c=c),
        out_shape=jax.ShapeDtypeStruct((1, padded), u.dtype),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((n, dim, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, dim, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, nd, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), u.dtype),
            pltpu.VMEM((n, n, LANES), u.dtype),
            pltpu.VMEM((nd, nd, LANES), u.dtype),
        ],
        # n=49 needs ~18 MB of scoped VMEM (J block + G scratch at 4.9 MB
        # each); the 16 MB default is the only binding limit, the chip has
        # 128 MB.  Leave headroom up to n=57 (~25 MB).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ut, kt, jt)
    return out[0, :B]
