"""Pallas TPU kernel: FermiNet forward + analytic coordinate Jacobian.

The Metropolis hot loop evaluates flow(x) and J = d flow / dx for the whole
walker batch at every sweep.  The jnp formulation (models/ferminet_jac.py)
is algebraically optimal — O(n^2 * features) pair-local propagation — but its
tensors put tiny feature axes (C = 2*dim+1, S = spsize) in the TPU lane
dimension, so XLA's (8, 128)-tiled vector ops run mostly on padding and the
einsums are too small for the MXU: measured ~8 ms per sweep at n=13, batch
8192, far off the VPU roofline.

This kernel flips the layout: the BATCH lives in the lane dimension (one
lane-block of walkers per grid step), features sit in sublanes, and the
entire per-layer state — pair features, the pair-derivative block A (the
conjugate block is exactly -A, see ferminet_jac.py), the single-particle
Jacobian Jsp — stays VMEM-resident across all layers.  Feature-space
contractions unroll over the (static, small) feature index as full-width
vector multiply-adds, which is exactly the VPU's shape.

Mosaic layout rules shape the implementation: values never gain axes after
their tiled (last two) dimensions, so the identity masks are passed in as
tiny constant operands, the layer-0 pair features/derivatives are kept as
per-block arrays instead of concatenated along a sublane axis, and weights
arrive pre-transposed (s, q) so contraction slices are 2-D column reads.

Outputs: u as (n, dim, B) — the input layout of the fused log-det tail
kernel (ops/pallas_fused_logp.py) — and the Jacobian as (n, n, dim, dimout,
B) in [i, l, a, b] order; the wrapper reorders it to (nd, nd, B) rows=(i,b),
cols=(l,a) with one XLA transpose (bandwidth-trivial) and adds the identity.

Used by the MCMC path only (no AD runs through it); differentially tested
against ferminet_apply_and_jac in interpret mode on CPU and on TPU
(tests/test_flow_jac_pallas.py).  Reference analogue: none — the reference
runs jax.jacfwd of the haiku flow inside every Metropolis step
(src/MCMC.py:22-37, src/logpsi.py:22-31).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.ferminet import FermiNetConfig

__all__ = ["flow_u_jac_pallas", "flow_jac_lanes", "MAX_FLOW_N"]

# Mosaic requires lane blocks of exactly 128, and the per-block VMEM
# footprint scales as n^2 * S * LANES (three live (n, n, dim, S, 128) tiles
# ~ 40 MB each at n=49): n <= 32 fits the ~100 MB scoped budget.  Larger n
# falls back to the XLA jnp path in fast_logp.py (still served by the fused
# log-det tail kernel); an S-streamed variant that fits n=57 is future work.
MAX_FLOW_N = 32


def flow_jac_lanes(n: int) -> int:
    """Lane-block size (Mosaic only supports full 128-lane blocks)."""
    return 128


def _contract(T, wT, col0: int = 0):
    """(..., q, LANES) x wT (s, Q) cols [col0, col0+q) -> (..., s, LANES).

    Unrolled over q; every step is one fused multiply-add over a full
    (..., s, LANES) tile.  ``wT`` is the TRANSPOSED weight matrix so each
    slice wT[:, k:k+1] is a legal 2-D column read (no value reshapes).
    """
    q = T.shape[-2]
    out = T[..., 0:1, :] * wT[:, col0 : col0 + 1]
    for k in range(1, q):
        out = out + T[..., k : k + 1, :] * wT[:, col0 + k : col0 + k + 1]
    return out


def _contract_blocks(blocks, wT, col0: int = 0):
    """Contract a list of feature blocks against consecutive wT columns."""
    out = None
    off = col0
    for blk in blocks:
        part = _contract(blk, wT, off)
        off += blk.shape[-2]
        out = part if out is None else out + part
    return out


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _flow_jac_kernel(x_ref, eye4_ref, eye5_ref, eyed5_ref, *refs, n, dim, depth, L, lanes):
    C = 2 * dim + 1
    params = refs[:-2]
    u_ref, j_ref = refs[-2:]
    dtype = x_ref.dtype

    def layer_params(i):
        # flat order: (sp_wT, sp_b) per layer, then (tp_wT, tp_b) for
        # i < depth-1, then final_wT, final_b — see flow_u_jac_pallas.
        sp_w = params[2 * i][:]
        sp_b = params[2 * i + 1][:]
        if i < depth - 1:
            tp_w = params[2 * depth + 2 * i][:]
            tp_b = params[2 * depth + 2 * i + 1][:]
        else:
            tp_w = tp_b = None
        return sp_w, sp_b, tp_w, tp_b

    final_wT = params[-2][:]  # (dimout, S)
    final_b = params[-1][:]  # (dimout, 1)

    eye4 = eye4_ref[:]  # (n, n, 1, 1) identity over (i, j)
    off4 = 1.0 - eye4
    eye5 = eye5_ref[:]  # (n, n, 1, 1, 1) — passed in: values must not gain
    off5 = 1.0 - eye5  # axes after their tiled dims (Mosaic layout rule)
    eyed5 = eyed5_ref[:]  # (1, 1, dim, dim, 1) identity over (d, c)

    x = x_ref[:]  # (n, dim, LANES)
    rij = x[:, None] - x[None, :]  # (n, n, dim, LANES)
    k2, k1 = 2 * jnp.pi / L, jnp.pi / L
    c2, s2 = jnp.cos(k2 * rij), jnp.sin(k2 * rij)
    s1 = jnp.sin(k1 * rij)

    dij = jnp.sqrt(((s1 + eye4) ** 2).sum(axis=2, keepdims=True)) * off4
    # layer-0 pair features as blocks [c2 (dim), s2 (dim), dij (1)]
    tp_blocks = [c2, s2, dij]
    tp_mean_blocks = [b.mean(axis=1) for b in tp_blocks]  # (n, c_k, LANES)

    # A[i,j,d,c] = d tp0[i,j,c] / d x[i,d] as matching blocks (B = -A).
    safe_d = jnp.where(dij > 0, dij, 1.0)
    g_cos = -k2 * s2[:, :, None, :, :] * eyed5
    g_sin = k2 * c2[:, :, None, :, :] * eyed5
    # d-indexed vector in the d slot with a size-1 feature slot: route the
    # values through the (d, c) identity and reduce c (no post-tile expand).
    v5 = (k1 * s1 * jnp.cos(k1 * rij) / safe_d)[:, :, None, :, :]
    g_d = (v5 * eyed5).sum(axis=3, keepdims=True)  # (n, n, dim, 1, LANES)
    A_blocks = [g_cos * off5, g_sin * off5, g_d * off5]

    sp = jnp.zeros((n, dim, lanes), dtype)
    Jsp = jnp.zeros((n, n, dim, dim, lanes), dtype)  # [i, l, d, s]

    def sp_step(sp_w, sp_b, sp_in, tp_m, Jsp, A_bl):
        """One single-particle layer; tp_m = mean_j tp blocks, A_bl = A blocks."""
        S_in = sp_in.shape[1]
        # f = [sp, mean sp, mean_j tp] contracted blockwise (no concat)
        pre = _contract(sp_in, sp_w, 0)
        spmean = jnp.broadcast_to(sp_in.mean(axis=0, keepdims=True), sp_in.shape)
        pre = pre + _contract(spmean, sp_w, S_in)
        pre = pre + _contract_blocks(tp_m, sp_w, 2 * S_in) + sp_b
        sig = jax.lax.logistic(pre)  # (n, S', LANES)
        act = _softplus(pre)

        JfW = _contract(Jsp, sp_w, 0)
        JfW = JfW + _contract(Jsp.mean(axis=0), sp_w, S_in)[None]
        AW = _contract_blocks(A_bl, sp_w, 2 * S_in)  # (n, n, dim, S', LANES)
        JfW = JfW + (eye5 * AW.sum(axis=1)[:, None] - AW) / n
        Jact = sig[:, None, None, :, :] * JfW
        return act, Jact

    tp = None  # merged (n, n, C', LANES) after layer 0
    A = None
    for i in range(depth - 1):
        sp_w, sp_b, tp_w, tp_b = layer_params(i)
        tp_m = tp_mean_blocks if i == 0 else [tp.mean(axis=1)]
        A_bl = A_blocks if i == 0 else [A]
        sp_new, Jsp_new = sp_step(sp_w, sp_b, sp, tp_m, Jsp, A_bl)

        pre_tp = _contract_blocks(tp_blocks if i == 0 else [tp], tp_w) + tp_b
        sig_tp = jax.lax.logistic(pre_tp)  # (n, n, C', LANES)
        A_new = sig_tp[:, :, None, :, :] * _contract_blocks(A_bl, tp_w)
        tp_new = _softplus(pre_tp)

        if i == 0:  # first layer replaces the streams (reference src/flow.py:44-49)
            sp, Jsp, tp, A = sp_new, Jsp_new, tp_new, A_new
        else:
            sp, Jsp = sp + sp_new, Jsp + Jsp_new
            tp, A = tp + tp_new, A + A_new

    sp_w, sp_b, _, _ = layer_params(depth - 1)
    tp_m = tp_mean_blocks if depth == 1 else [tp.mean(axis=1)]
    A_bl = A_blocks if depth == 1 else [A]
    sp_new, Jsp_new = sp_step(sp_w, sp_b, sp, tp_m, Jsp, A_bl)
    sp, Jsp = sp + sp_new, Jsp + Jsp_new

    u_ref[:] = x + _contract(sp, final_wT) + final_b

    # J[i, l, a, b] = sum_s Jsp[i, l, a, s] Wf[s, b]; identity and the
    # (i,b)x(l,a) reordering are applied by the wrapper in XLA.
    j_ref[:] = _contract(Jsp, final_wT)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def flow_u_jac_pallas(params, cfg: FermiNetConfig, x, interpret: bool = False):
    """Batch-last flow forward + Jacobian: x (B, n, dim) -> u (n, dim, B),
    J (nd, nd, B) — the input layout of ``fused_logp_pallas``.

    ``params`` is the pytree from ``init_ferminet_params``.  The lane-padded
    tail of the batch is filled with copies of walker 0 (values discarded).
    """
    B, n, dim = x.shape
    nd = n * dim
    lanes = flow_jac_lanes(n)
    nblocks = pl.cdiv(B, lanes)
    padded = nblocks * lanes

    xt = jnp.moveaxis(x, 0, -1)  # (n, dim, B)
    if padded != B:
        xt = jnp.concatenate(
            [xt, jnp.broadcast_to(xt[:, :, :1], (n, dim, padded - B))], axis=-1
        )

    depth = cfg.depth
    flat_params = []
    for i in range(depth):
        flat_params += [params["sp"][i]["w"].T, params["sp"][i]["b"][:, None]]
    for i in range(depth - 1):
        flat_params += [params["tp"][i]["w"].T, params["tp"][i]["b"][:, None]]
    flat_params += [params["final"]["w"].T, params["final"]["b"][:, None]]

    eye4 = np.eye(n, dtype=np.float32)[:, :, None, None]
    eye5 = np.eye(n, dtype=np.float32)[:, :, None, None, None]
    eyed5 = np.eye(dim, dtype=np.float32)[None, None, :, :, None]

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    u, J5 = pl.pallas_call(
        functools.partial(
            _flow_jac_kernel, n=n, dim=dim, depth=depth, L=float(cfg.L),
            lanes=lanes,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, dim, padded), x.dtype),
            jax.ShapeDtypeStruct((n, n, dim, dim, padded), x.dtype),
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((n, dim, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            full(eye4), full(eye5), full(eyed5),
        ] + [full(a) for a in flat_params],
        out_specs=(
            pl.BlockSpec((n, dim, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, dim, dim, lanes), lambda i: (0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xt, eye4, eye5, eyed5, *flat_params)

    # [i, l, a, b] -> rows (i, b), cols (l, a); plus the identity d u/d x part.
    J = J5.transpose(0, 3, 1, 2, 4).reshape(nd, nd, padded)
    J = J + jnp.eye(nd, dtype=x.dtype)[:, :, None]
    return u[:, :, :B], J[:, :, :B]
