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

__all__ = ["flow_u_jac_pallas", "flow_u_jac_pallas_large",
           "flow_u_jac_pallas_d2", "flow_u_jac_lap_pallas_d2",
           "flow_jac_lanes",
           "MAX_FLOW_N", "MAX_FLOW_N_LARGE", "MAX_FLOW_N_D2"]

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


# ---------------------------------------------------------------------------
# Large-n path: per-layer kernels with particle-row chunking.
#
# For n > 32 the whole-network kernel's VMEM footprint (three live
# (n, n, dim, S, 128) tiles) exceeds the chip budget.  But the layer
# recurrence couples particle ROWS i only through two means (mean_i sp and
# mean_i Jsp), so each layer splits into an embarrassingly-parallel kernel
# over (i-chunk, lane-block) grid cells, with the means computed between
# kernels by two cheap XLA reductions over the HBM-resident state.  HBM
# traffic is a handful of passes over the (n, n, dim, S, B) Jacobian state
# per sweep — bandwidth-trivial next to the layout-padded XLA alternative.
# Depth-2 flows only (the production configuration); other depths fall back
# to the XLA path.
# ---------------------------------------------------------------------------


def _layer0_kernel(xc_ref, xf_ref, eyec_ref, eyed5_ref,
                   spw_ref, spb_ref, tpw_ref, tpb_ref,
                   sp_ref, jsp_ref, tp_ref, a_ref, *, n, dim, L, lanes, ic):
    """First flow layer (stream replacement) for rows i in one chunk."""
    k2, k1 = 2 * jnp.pi / L, jnp.pi / L
    xc = xc_ref[:]  # (ic, dim, LANES)
    xf = xf_ref[:]  # (n, dim, LANES)
    eyec = eyec_ref[:]  # (ic, n, 1, 1): delta_{i in chunk, j}
    offc = 1.0 - eyec
    eyed5 = eyed5_ref[:]
    spw, spb = spw_ref[:], spb_ref[:]
    tpw, tpb = tpw_ref[:], tpb_ref[:]

    rij = xc[:, None] - xf[None, :]  # (ic, n, dim, LANES)
    c2, s2 = jnp.cos(k2 * rij), jnp.sin(k2 * rij)
    s1 = jnp.sin(k1 * rij)
    dij = jnp.sqrt(((s1 + eyec) ** 2).sum(axis=2, keepdims=True)) * offc
    tp_blocks = [c2, s2, dij]

    safe_d = jnp.where(dij > 0, dij, 1.0)
    g_cos = -k2 * s2[:, :, None, :, :] * eyed5
    g_sin = k2 * c2[:, :, None, :, :] * eyed5
    v5 = (k1 * s1 * jnp.cos(k1 * rij) / safe_d)[:, :, None, :, :]
    g_d = (v5 * eyed5).sum(axis=3, keepdims=True)
    off5 = (1.0 - eyec)[..., None]
    A_blocks = [g_cos * off5, g_sin * off5, g_d * off5]

    # sp stream: layer-0 sp and mean(sp) are zero; only the tp-mean block of
    # the feature vector contributes (weight rows [2*dim, 2*dim + C)).
    tp_m = [b.mean(axis=1) for b in tp_blocks]
    pre = _contract_blocks(tp_m, spw, 2 * dim) + spb
    sig = jax.lax.logistic(pre)
    sp_ref[:] = _softplus(pre)

    AW = _contract_blocks(A_blocks, spw, 2 * dim)  # (ic, n, dim, S', LANES)
    eyec5 = eyec[..., None]
    JfW = (eyec5 * AW.sum(axis=1)[:, None] - AW) / n
    jsp_ref[:] = sig[:, None, None, :, :] * JfW

    pre_tp = _contract_blocks(tp_blocks, tpw) + tpb
    sig_tp = jax.lax.logistic(pre_tp)
    tp_ref[:] = _softplus(pre_tp)
    a_ref[:] = sig_tp[:, :, None, :, :] * _contract_blocks(A_blocks, tpw)


def _final_layer_kernel(xc_ref, spc_ref, tpc_ref, ac_ref, jspc_ref,
                        spmean_ref, jmean_ref, eyec_ref,
                        spw_ref, spb_ref, fw_ref, fb_ref,
                        u_ref, j_ref, *, n, dim, L, lanes, ic):
    """Last sp layer (residual) + final linear head for one row chunk."""
    xc = xc_ref[:]
    sp_in = spc_ref[:]  # (ic, S, LANES)
    tp_in = tpc_ref[:]  # (ic, n, C', LANES)
    A_in = ac_ref[:]  # (ic, n, dim, C', LANES)
    Jsp_in = jspc_ref[:]  # (ic, n, dim, S, LANES)
    spmean = spmean_ref[:]  # (S, LANES)
    jmean = jmean_ref[:]  # (n, dim, S, LANES)
    eyec = eyec_ref[:]
    spw, spb = spw_ref[:], spb_ref[:]
    fw, fb = fw_ref[:], fb_ref[:]

    S_in = sp_in.shape[1]
    pre = _contract(sp_in, spw, 0)
    pre = pre + _contract(spmean[None], spw, S_in)
    pre = pre + _contract(tp_in.mean(axis=1), spw, 2 * S_in) + spb
    sig = jax.lax.logistic(pre)
    sp = sp_in + _softplus(pre)

    JfW = _contract(Jsp_in, spw, 0)
    JfW = JfW + _contract(jmean, spw, S_in)[None]
    AW = _contract(A_in, spw, 2 * S_in)
    eyec5 = eyec[..., None]
    JfW = JfW + (eyec5 * AW.sum(axis=1)[:, None] - AW) / n
    Jsp = Jsp_in + sig[:, None, None, :, :] * JfW

    u_ref[:] = xc + _contract(sp, fw) + fb
    j_ref[:] = _contract(Jsp, fw)  # (ic, n, dim, dimout, LANES)


def _large_ichunk(n: int) -> int:
    for ic in (8, 7, 6, 5, 4, 3, 2):
        if n % ic == 0:
            return ic
    return 1


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def flow_u_jac_pallas_large(params, cfg: FermiNetConfig, x,
                            interpret: bool = False):
    """Row-chunked two-kernel flow fwd+jac for 32 < n <= MAX_FLOW_N_LARGE.

    Same contract as ``flow_u_jac_pallas``: x (B, n, dim) -> u (n, dim, B),
    J (nd, nd, B).  Depth-2 flows only.
    """
    B, n, dim = x.shape
    nd = n * dim
    if cfg.depth != 2:  # not assert: must survive python -O (wrong-Jacobian risk)
        raise ValueError("large-n Pallas path supports depth-2 flows only, "
                         "got depth=%d" % cfg.depth)
    lanes = 128
    nblocks = pl.cdiv(B, lanes)
    padded = nblocks * lanes
    ic = _large_ichunk(n)
    nchunks = n // ic
    S, C2 = cfg.spsize, cfg.tpsize
    dtype = x.dtype

    xt = jnp.moveaxis(x, 0, -1)
    if padded != B:
        xt = jnp.concatenate(
            [xt, jnp.broadcast_to(xt[:, :, :1], (n, dim, padded - B))], axis=-1
        )

    eye4 = np.eye(n, dtype=np.float32)[:, :, None, None]
    eyed5 = np.eye(dim, dtype=np.float32)[None, None, :, :, None]
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    full = lambda a: pl.BlockSpec(a.shape, lambda i, b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    w0T = params["sp"][0]["w"].T
    b0 = params["sp"][0]["b"][:, None]
    t0T = params["tp"][0]["w"].T
    tb0 = params["tp"][0]["b"][:, None]

    sp1, Jsp1, tp1, A1 = pl.pallas_call(
        functools.partial(_layer0_kernel, n=n, dim=dim, L=float(cfg.L),
                          lanes=lanes, ic=ic),
        out_shape=(
            jax.ShapeDtypeStruct((n, S, padded), dtype),
            jax.ShapeDtypeStruct((n, n, dim, S, padded), dtype),
            jax.ShapeDtypeStruct((n, n, C2, padded), dtype),
            jax.ShapeDtypeStruct((n, n, dim, C2, padded), dtype),
        ),
        grid=(nchunks, nblocks),
        in_specs=[
            pl.BlockSpec((ic, dim, lanes), lambda i, b: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, dim, lanes), lambda i, b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, n, 1, 1), lambda i, b: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(eyed5), full(w0T), full(b0), full(t0T), full(tb0),
        ],
        out_specs=(
            pl.BlockSpec((ic, S, lanes), lambda i, b: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, n, dim, S, lanes), lambda i, b: (i, 0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, n, C2, lanes), lambda i, b: (i, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, n, dim, C2, lanes), lambda i, b: (i, 0, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=cparams,
        interpret=interpret,
    )(xt, xt, eye4, eyed5, w0T, b0, t0T, tb0)

    # cross-row coupling of the next layer: two reductions over rows.
    spmean = sp1.mean(axis=0)  # (S, B)
    jmean = Jsp1.mean(axis=0)  # (n, dim, S, B)

    w1T = params["sp"][1]["w"].T
    b1 = params["sp"][1]["b"][:, None]
    fwT = params["final"]["w"].T
    fb = params["final"]["b"][:, None]

    u, J5 = pl.pallas_call(
        functools.partial(_final_layer_kernel, n=n, dim=dim, L=float(cfg.L),
                          lanes=lanes, ic=ic),
        out_shape=(
            jax.ShapeDtypeStruct((n, dim, padded), dtype),
            jax.ShapeDtypeStruct((n, n, dim, dim, padded), dtype),
        ),
        grid=(nchunks, nblocks),
        in_specs=[
            pl.BlockSpec((ic, dim, lanes), lambda i, b: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, S, lanes), lambda i, b: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, n, C2, lanes), lambda i, b: (i, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, n, dim, C2, lanes), lambda i, b: (i, 0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, n, dim, S, lanes), lambda i, b: (i, 0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, lanes), lambda i, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, dim, S, lanes), lambda i, b: (0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, n, 1, 1), lambda i, b: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(w1T), full(b1), full(fwT), full(fb),
        ],
        out_specs=(
            pl.BlockSpec((ic, dim, lanes), lambda i, b: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, n, dim, dim, lanes), lambda i, b: (i, 0, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=cparams,
        interpret=interpret,
    )(xt, sp1, tp1, A1, Jsp1, spmean, jmean, eye4, w1T, b1, fwT, fb)

    J = J5.transpose(0, 3, 1, 2, 4).reshape(nd, nd, padded)
    J = J + jnp.eye(nd, dtype=dtype)[:, :, None]
    return u[:, :, :B], J[:, :, :B]


MAX_FLOW_N_LARGE = 57


# ---------------------------------------------------------------------------
# Depth-2 structured-closure kernel: the large-n path without the state.
#
# Both large-n attempts above move Jacobian STATE through HBM every sweep —
# the carried (n, n, dim, S, B) tensor is ~2.5 GB at n=49/batch 8192 and its
# several per-layer passes are the measured sampling wall (PERF.md), whether
# XLA or the row-chunked kernels move it.  The depth-2 algebraic closure
# (models/ferminet_jac.py:ferminet_apply_and_jac_d2) has NO carried state:
#
#     J_il = delta_il (D_i M_i - SumA1_i N_i)      [diagonal blocks]
#          + A0_il K_i + A1_il N_i                 [pair contractions]
#          + G_l R_i                               [rank-S mean term]
#
# and every pair tensor on the right is a cheap elementwise function of the
# layer-0 features, so ONE kernel evaluates the whole thing per 128-walker
# lane block with feature-chunked streaming: the (n, n, dim, S)-sized
# transients (A0 W, A1) are built 8 feature columns at a time, reduced or
# folded into the (n, n, dim, dim) Jacobian accumulator, and never reach
# HBM.  Per sweep the only HBM traffic is x in, (u, J) out.  As jnp, the
# same closure LOST to the carried path (PERF.md round-2 negative result:
# XLA lays the small pair contractions out badly); the batch-in-lanes layout
# is exactly what removes that problem, the same way flow_u_jac_pallas did
# for the carried form at n <= 32.
#
# Exactly equal (to roundoff) to ferminet_apply_and_jac_d2; differentially
# tested in tests/test_flow_jac_pallas.py.  Depth-2 flows only (the
# reference's only production configuration, /root/reference/run/submit.py).
#
# HARDWARE STATUS (round-4 chip probe, scripts/repro_d2_gather.py): at n=13
# both kernels compile and match the XLA oracle (4.8e-7 / 4.4e-11 / 8.7e-11);
# at n=57 Mosaic's register allocator OOMs VMEM with ~340 MB of spill slots.
# Cause: the Python-level schunk/cchunk/lchunk streaming loops fully unroll,
# so every ~27 MB (n, n, dim, chunk, 128) transient is live simultaneously —
# the "streaming" exists in the source, not in the lowering.  PARKED,
# measured-negative at n >= 49 (PERF.md round-4).  The fix, if revisited, is
# structural: move the chunk axes into the pallas grid as accumulating
# ("arbitrary") reduction dimensions so each grid step's live set is one
# chunk — the flow_u_jac_pallas_large two-kernel pattern above.
# ---------------------------------------------------------------------------


def _d2_kernel(x_ref, eye4_ref, eye5_ref, eyed5_ref,
               w30T_ref, w30_ref, b0_ref, wtT_ref, bt_ref,
               w1fT_ref, W1_ref, W2_ref, W3_ref, b1f_ref,
               wfT_ref, wfE_ref, bf_ref, W1t_ref, W2t_ref, W3t_ref,
               *out_refs, n, dim, L, lanes, S, C1, schunk, cchunk, lchunk,
               emit_lap):
    u_ref, j_ref = out_refs[0], out_refs[1]
    lap_ref = out_refs[2] if emit_lap else None
    dtype = x_ref.dtype
    eye4 = eye4_ref[:]          # (n, n, 1, 1)
    off4 = 1.0 - eye4
    eye5 = eye5_ref[:]          # (n, n, 1, 1, 1)
    off5 = 1.0 - eye5
    eyed5 = eyed5_ref[:]        # (1, 1, dim, dim, 1)
    w30T = w30T_ref[:]          # (S, C0)   rows=out s, cols=in c
    w30 = w30_ref[:]            # (C0, S)   rows=out c, cols=in s
    b0 = b0_ref[:]              # (S, 1)
    wtT = wtT_ref[:]            # (C1, C0)
    bt = bt_ref[:]              # (C1, 1)
    w1fT = w1fT_ref[:]          # (S', 2S + C1)
    W1 = W1_ref[:]              # (S, S')
    W2 = W2_ref[:]              # (S, S')
    W3 = W3_ref[:]              # (C1, S')
    b1f = b1f_ref[:]            # (S', 1)
    wfT = wfT_ref[:]            # (dim, S')
    wfE = wfE_ref[:]            # (S', dim)
    bf = bf_ref[:]              # (dim, 1)
    if emit_lap:
        W1t = W1t_ref[:]        # (S', S)  — lap path only
        W2t = W2t_ref[:]        # (S', S)
        W3t = W3t_ref[:]        # (S', C1)

    # ---- layer-0 pair features and their x_i-derivatives (B = -A) --------
    x = x_ref[:]                                    # (n, dim, LANES)
    rij = x[:, None] - x[None, :]                   # (n, n, dim, LANES)
    k2, k1 = 2 * jnp.pi / L, jnp.pi / L
    c2, s2 = jnp.cos(k2 * rij), jnp.sin(k2 * rij)
    s1 = jnp.sin(k1 * rij)
    dij = jnp.sqrt(((s1 + eye4) ** 2).sum(axis=2, keepdims=True)) * off4
    tp_blocks = [c2, s2, dij]                       # C0 = 2*dim + 1 features

    safe_d = jnp.where(dij > 0, dij, 1.0)
    c1 = jnp.cos(k1 * rij)
    g_cos = -k2 * s2[:, :, None, :, :] * eyed5
    g_sin = k2 * c2[:, :, None, :, :] * eyed5
    v5 = (k1 * s1 * c1 / safe_d)[:, :, None, :, :]
    g_d = (v5 * eyed5).sum(axis=3, keepdims=True)
    A_blocks = [g_cos * off5, g_sin * off5, g_d * off5]  # (n, n, dim, c_k, L)

    Lt_blocks = None
    if emit_lap:
        # Ltp0 = 2 * sum_a d^2 tp0 / d r_a^2 (models/ferminet_jac.py
        # _pair_feature_lap), as feature blocks matching tp_blocks.
        sp_ = k1 * c1                                   # d|s1|-chain pieces
        spp = -(k1 * k1) * s1
        h_d = ((sp_**2 + s1 * spp) / safe_d
               - (s1 * sp_) ** 2 / safe_d**3).sum(axis=2, keepdims=True)
        Lt_blocks = [
            2.0 * (-(k2 * k2) * c2) * off4,
            2.0 * (-(k2 * k2) * s2) * off4,
            2.0 * h_d * off4,
        ]

    # ---- layer 0 (sp stream enters as zeros: only the tp-mean rows) ------
    tpm = [b.mean(axis=1) for b in tp_blocks]       # (n, c_k, LANES)
    pre0 = _contract_blocks(tpm, w30T) + b0         # (n, S, LANES)
    sig0 = jax.lax.logistic(pre0)
    sp1 = _softplus(pre0)

    # D_i = (1/n) sig0_i * (SumA0_i W3_0): diagonal part of the layer-0 Jsp
    sumA0 = [a.sum(axis=1) for a in A_blocks]       # (n, dim, c_k, LANES)
    sumAW0 = _contract_blocks(sumA0, w30T)          # (n, dim, S, LANES)
    D = sig0[:, None, :, :] * sumAW0 / n            # (n, dim, S, LANES)
    sumsq0 = (sumAW0**2).sum(axis=1) if emit_lap else None  # (n, S, LANES)

    # G_l = D_l + SP_l,  SP_l = -(1/n) sum_k sig0_k * (A0_{kl} W3_0):
    # streamed over s-chunks so the (n, n, dim, S, L) transient never exists.
    G_chunks, sq0_chunks = [], []
    for s0 in range(0, S, schunk):
        sc = min(schunk, S - s0)
        AW0_c = _contract_blocks(A_blocks, w30T[s0 : s0 + sc])  # (n,n,dim,sc,L)
        sig0_c = sig0[:, s0 : s0 + sc, :]  # slice, THEN newaxis: a mixed
        # None+bounded-slice getitem lowers via gather, which Mosaic
        # rejects beyond 2D (round-4 chip A/B failure)
        SP_c = -(sig0_c[:, None, None] * AW0_c).sum(axis=0) / n
        G_chunks.append(D[:, :, s0 : s0 + sc, :] + SP_c)        # (n,dim,sc,L)
        if emit_lap:
            # sq0 = [(sum_l AW0_il)^2 + sum_l AW0_il^2]_d-summed / n^2
            sq0_chunks.append(
                (sumsq0[:, s0 : s0 + sc, :] + (AW0_c**2).sum(axis=(1, 2)))
                / (n * n)
            )

    Lsp1_chunks = None
    if emit_lap:
        # Lsp1 = sig0 * (mean_j Ltp0 @ W3_0) + sig0 (1 - sig0) sq0
        Lpre0 = _contract_blocks([b.mean(axis=1) for b in Lt_blocks], w30T)
        Lsp1_chunks = []
        for ci, sq0_c in enumerate(sq0_chunks):
            s0 = ci * schunk
            sc = sq0_c.shape[-2]
            sg = sig0[:, s0 : s0 + sc, :]
            Lsp1_chunks.append(
                sg * Lpre0[:, s0 : s0 + sc, :] + sg * (1.0 - sg) * sq0_c
            )

    # ---- tp layer pass 1: only the row means of tp1 (for the sp features) -
    tp1m = []
    for c0 in range(0, C1, cchunk):
        cc = min(cchunk, C1 - c0)
        pre_c = _contract_blocks(tp_blocks, wtT[c0 : c0 + cc]) + bt[c0 : c0 + cc]
        tp1m.append(_softplus(pre_c).mean(axis=1))  # (n, cc, LANES)

    # ---- final sp layer ---------------------------------------------------
    sp1mean = jnp.broadcast_to(sp1.mean(axis=0, keepdims=True), sp1.shape)
    pre1 = _contract(sp1, w1fT, 0) + _contract(sp1mean, w1fT, S) + b1f
    off = 2 * S
    for t in tp1m:
        pre1 = pre1 + _contract(t, w1fT, off)
        off += t.shape[-2]
    sig1 = jax.lax.logistic(pre1)                   # (n, S', LANES)
    spf = sp1 + _softplus(pre1)

    u_ref[:] = x + _contract(spf, wfT) + bf

    Lpre1 = T = V = None
    if emit_lap:
        # Lf1 @ w1f accumulated blockwise: [Lsp1, mean_i Lsp1, mean_j Ltp1];
        # the Ltp1 rows land inside the pass-2 c-chunk loop below.
        Lpre1 = jnp.zeros((n, S, lanes), dtype)
        for ci, Ls_c in enumerate(Lsp1_chunks):
            s0 = ci * schunk
            Lpre1 = Lpre1 + _contract(Ls_c, w1fT, s0)
            Lm = jnp.broadcast_to(Ls_c.mean(axis=0, keepdims=True), Ls_c.shape)
            Lpre1 = Lpre1 + _contract(Lm, w1fT, S + s0)
        # structured blocks of JfW1 = delta_il T_i + U_il + V_l
        # (models/ferminet_jac.py ferminet_apply_jac_lap_d2 docstring):
        # T = D @ W1 + (SumA1 @ W3)/n — the c-chunk part accumulates below.
        T = _contract(D, W1t)                       # (n, dim, S', LANES)
        for ci, g_c in enumerate(G_chunks):         # V = (G @ W2)/n
            part = _contract(g_c, W2t, ci * schunk) / n
            V = part if V is None else V + part

    # ---- per-row contraction matrices, per output coordinate b -----------
    # M_b = wf[:, b] + W1 diag(sig1_i) wf[:, b];  K_b = -(1/n) w3_0 (sig0*M_b);
    # N_b = -(1/n) W3 (sig1*wf[:, b]);            R_b = (1/n) W2 (sig1*wf[:, b]).
    Ms, Ks, Ns, Rs = [], [], [], []
    for b in range(dim):
        wfE_b = wfE[:, b : b + 1][None]             # slice, then newaxis
        Q_b = sig1 * wfE_b                          # (n, S', LANES)
        M_b = wfE_b + _contract(Q_b, W1)
        Ms.append(M_b)
        Ks.append(-_contract(sig0 * M_b, w30) / n)  # (n, C0, LANES)
        Ns.append(-_contract(Q_b, W3) / n)          # (n, C1, LANES)
        Rs.append(_contract(Q_b, W2) / n)           # (n, S, LANES)

    # ---- Jacobian assembly: J5[i, l, d, b] (identity added by the wrapper).
    # Every contraction is chunk-level: multiply on FULL-sublane tiles, then
    # reduce the feature axis in-register (sum over the sublane axis) — no
    # per-column 1-sublane products.
    Jb = [jnp.zeros((n, n, dim, 1, lanes), dtype) for _ in range(dim)]
    diag = [jnp.zeros((n, dim, 1, lanes), dtype) for _ in range(dim)]

    # pair term A0_{ildc} K_{icb} over the three layer-0 feature blocks
    for b in range(dim):
        coff = 0
        for blk in A_blocks:
            ck = blk.shape[-2]
            k_ch = Ks[b][:, coff : coff + ck, :][:, None, None]  # (n,1,1,ck,L)
            Jb[b] = Jb[b] + (blk * k_ch).sum(axis=-2, keepdims=True)
            coff += ck

    # mean term G_{lds} R_{isb} and diagonal D_{ids} M_{isb}, s-chunked
    for ci, g_c in enumerate(G_chunks):
        s0, sc = ci * schunk, g_c.shape[-2]
        g_ch = g_c[None]                              # (1, n, dim, sc, LANES)
        d_ch = D[:, :, s0 : s0 + sc, :]               # (n, dim, sc, LANES)
        for b in range(dim):
            r_ch = Rs[b][:, s0 : s0 + sc, :][:, None, None]
            Jb[b] = Jb[b] + (g_ch * r_ch).sum(axis=-2, keepdims=True)
            m_ch = Ms[b][:, s0 : s0 + sc, :][:, None]
            diag[b] = diag[b] + (d_ch * m_ch).sum(axis=-2, keepdims=True)

    # tp layer pass 2: A1_{ildc} N_{icb} pair term and the SumA1 diagonal,
    # streamed over c1-chunks (pre_tp recomputed — cheaper than storing tp1)
    for c0 in range(0, C1, cchunk):
        cc = min(cchunk, C1 - c0)
        pre_c = _contract_blocks(tp_blocks, wtT[c0 : c0 + cc]) + bt[c0 : c0 + cc]
        sig_c = jax.lax.logistic(pre_c)             # (n, n, cc, LANES)
        AWt_c = _contract_blocks(A_blocks, wtT[c0 : c0 + cc])
        A1_c = sig_c[:, :, None, :, :] * AWt_c      # (n, n, dim, cc, LANES)
        sumA1_c = A1_c.sum(axis=1)                  # (n, dim, cc, LANES)
        for b in range(dim):
            n_ch = Ns[b][:, c0 : c0 + cc, :][:, None, None]
            Jb[b] = Jb[b] + (A1_c * n_ch).sum(axis=-2, keepdims=True)
            diag[b] = diag[b] - (
                sumA1_c * Ns[b][:, c0 : c0 + cc, :][:, None]
            ).sum(axis=-2, keepdims=True)
        if emit_lap:
            T = T + _contract(sumA1_c, W3t, c0) / n
            # Ltp1 = sigt (Ltp0 @ wt) + sigt (1 - sigt) 2 sum_d (AWt)^2;
            # only its j-mean enters Lf1.
            Ltpre_c = _contract_blocks(Lt_blocks, wtT[c0 : c0 + cc])
            Ltp1_c = sig_c * Ltpre_c + sig_c * (1.0 - sig_c) * (
                2.0 * (AWt_c**2).sum(axis=2)
            )
            Lpre1 = Lpre1 + _contract(Ltp1_c.mean(axis=1), w1fT, 2 * S + c0)

    # tile-aligned store: scatter the per-b accumulators into the output's
    # b sublane via one-hot masks (no sub-tile stores).  eyed5 is the
    # (1, 1, dim, dim, 1) coordinate identity, so eyed5[:, :, b:b+1] is the
    # one-hot row delta_{qb} in shape (1, 1, 1, dim, 1).
    out = None
    for b in range(dim):
        contrib = Jb[b] + eye5 * diag[b][:, None]   # (n, n, dim, 1, LANES)
        term = contrib * eyed5[:, :, b : b + 1]
        out = term if out is None else out + term
    j_ref[:] = out

    if emit_lap:
        # U_il = -((sig0_i ⊙ AW0_il) W1 + A1_il W3)/n, streamed over l-chunks
        # (the only full-pair transient of the lap path); only
        # sum_{l,d} U^2 and sum_{l,d} U ⊙ V_l survive into sq1.
        squ = jnp.zeros((n, S, lanes), dtype)
        cross = jnp.zeros((n, S, lanes), dtype)
        for l0 in range(0, n, lchunk):
            lc = min(lchunk, n - l0)
            A_lc = [blk[:, l0 : l0 + lc] for blk in A_blocks]
            AW0_lc = _contract_blocks(A_lc, w30T)   # (n, lc, dim, S, LANES)
            U_lc = -_contract(sig0[:, None, None, :, :] * AW0_lc, W1t) / n
            tp_lc = [blk[:, l0 : l0 + lc] for blk in tp_blocks]
            pre_lc = _contract_blocks(tp_lc, wtT) + bt
            sig_lc = jax.lax.logistic(pre_lc)       # (n, lc, C1, LANES)
            AWt_lc = _contract_blocks(A_lc, wtT)    # (n, lc, dim, C1, LANES)
            A1_lc = sig_lc[:, :, None, :, :] * AWt_lc
            U_lc = U_lc - _contract(A1_lc, W3t) / n
            squ = squ + (U_lc**2).sum(axis=(1, 2))
            cross = cross + (U_lc * V[l0 : l0 + lc][None]).sum(axis=(1, 2))

        # sq1 = [(T+V_i)^2 - V_i^2]_d + sum U^2 + 2 sum U.V + sum_l V_l^2
        sq1 = (((T + V) ** 2 - V**2).sum(axis=1)
               + squ + 2.0 * cross
               + (V**2).sum(axis=(0, 1))[None])
        tail = sig1 * Lpre1 + sig1 * (1.0 - sig1) * sq1
        lap = _contract(tail, wfT)                  # (n, dim, LANES)
        for ci, Ls_c in enumerate(Lsp1_chunks):     # + Lsp1 @ wf (residual)
            lap = lap + _contract(Ls_c, wfT, ci * schunk)
        lap_ref[:] = lap


# Paper VMEM model: layer-0 pair blocks plus ONE streamed
# (n, n, dim, cchunk, LANES) transient, ~62 MB at n=57 with cchunk=8.  The
# lowering does NOT realize that model — the unrolled chunk loops keep every
# transient live and Mosaic spills ~340 MB at n=57 (see HARDWARE STATUS
# above).  Cap kept at 57 so the interpret-mode tests pin correctness at the
# production shape; on hardware the practical ceiling is n <= 13.
MAX_FLOW_N_D2 = 57
# Chip-validated ceiling for the COMPILED d2 kernels: n=13 ran exact on
# hardware; n >= 49 hard-crashes the remote compile helper (mono-kernel:
# Mosaic register-spill VMEM OOM; grid form: toolchain crash — PERF.md
# round 4).  The non-interpret entry points below refuse n above this so an
# opt-in user gets a clear error instead of an opaque compiler crash;
# interpret mode keeps the full MAX_FLOW_N_D2 for correctness tests.
MAX_FLOW_N_D2_HW = 13


# ---------------------------------------------------------------------------
# Grid-accumulation rewrite of the d2 fwd+jac path (round 4).
#
# Same closure, same math, different lowering: each streamed chunk axis of
# the mono-kernel above becomes a Pallas GRID dimension with "arbitrary"
# (sequential) semantics, so the live set of any grid step is ONE chunk's
# transients plus the recomputed layer-0 features — the sequential-loop
# semantics the mono-kernel's unrolled Python loops only pretended to have.
# The (n, n, ...)-sized pair tensors are recomputed from x inside every
# step (cheap VPU trig, ~1.7M elements) and never reach HBM; per MCMC sweep
# the HBM traffic stays x in, (u, J) out, exactly like the mono-kernel's
# paper budget.  Small (n, S, B)-sized intermediates (pre0, tp1m, G, D and
# the per-coordinate row matrices K/N/R/M) pass between kernels through HBM
# and are assembled in plain XLA — they are KB-scale per walker.
#
# HARDWARE STATUS (round-4 chip probe #2, scripts/probe_d2_grid.py,
# 2026-08-19): after the block-shape restructure (chunk axes pre-split into
# leading grid-step axes) n=13 compiles and is EXACT (u 4.8e-7, J 4.4e-11)
# but runs 6.03 ms vs the XLA carried path's 3.43 ms at batch 1024 — the
# multi-kernel pipeline's launch + feature-recompute overhead loses at small
# n, which was never the target.  At n=49/57 the axon remote compile helper
# hard-crashes (HTTP 500, subprocess exit 1, no Mosaic diagnostic) — the
# production sizes this rewrite was built for cannot even be compiled on the
# current toolchain.  PARKED, measured-negative: two kernel generations
# (mono + grid) both lose or fail on hardware; the XLA carried-state path
# stays the default at every n.  Interpret-mode tests remain as the
# correctness pin should a future toolchain make this worth re-probing.
#
#   P_tp: grid (batch, C1/cc)  -> tp1m chunks; emits pre0 on step 0
#   P_G:  grid (batch, S/sc)   -> SP chunks;   emits sumAW0 on step 0
#   XLA:  sig0/sp1, D, G, final sp layer, u, and K/N/R/M per coordinate
#   P_J:  grid (batch, jsteps) -> J5 accumulated across steps: the A1 pair
#         term per c-chunk, the G.R mean term + D.M/SumA1.N diagonal per
#         s-chunk, and the layer-0 A0.K pair term on step 0
#
# Worst-step VMEM at n=57 (f32, 128 lanes): features ~18 MB + A-blocks
# ~17 MB + one cc=2 A1 chain ~20 MB + one sc=4 G.R transient ~13 MB + the
# step-0 A0.K transient ~13 MB + the resident (n, n, dim, dim, 128) output
# ~7 MB  ==>  ~90 MB, against the ~340 MB the mono-kernel spilled.
# ---------------------------------------------------------------------------


def _d2_features(x, eye4, eyed5, L, need_A):
    """Layer-0 pair feature blocks (and their x_i-derivative blocks).

    Recomputed inside every grid step from the (n, dim, LANES) x block —
    identical math to the mono-kernel lines above.
    """
    off4 = 1.0 - eye4
    rij = x[:, None] - x[None, :]                   # (n, n, dim, LANES)
    k2, k1 = 2 * jnp.pi / L, jnp.pi / L
    c2, s2 = jnp.cos(k2 * rij), jnp.sin(k2 * rij)
    s1 = jnp.sin(k1 * rij)
    dij = jnp.sqrt(((s1 + eye4) ** 2).sum(axis=2, keepdims=True)) * off4
    tp_blocks = [c2, s2, dij]
    if not need_A:
        return tp_blocks, None
    safe_d = jnp.where(dij > 0, dij, 1.0)
    c1 = jnp.cos(k1 * rij)
    g_cos = -k2 * s2[:, :, None, :, :] * eyed5
    g_sin = k2 * c2[:, :, None, :, :] * eyed5
    v5 = (k1 * s1 * c1 / safe_d)[:, :, None, :, :]
    g_d = (v5 * eyed5).sum(axis=3, keepdims=True)
    off5 = (1.0 - eye4)[:, :, :, None, :]           # (n, n, 1, 1, 1) off-diag
    return tp_blocks, [g_cos * off5, g_sin * off5, g_d * off5]


def _d2_tp_kernel(x_ref, eye4_ref, w30T_ref, b0_ref, wtc_ref, btc_ref,
                  tp1m_ref, pre0_ref, *, n, dim, L, lanes):
    """One c-chunk of the tp pass-1 means; step 0 also emits pre0."""
    c = pl.program_id(1)
    tp_blocks, _ = _d2_features(x_ref[:], eye4_ref[:], None, L, need_A=False)
    pre_c = _contract_blocks(tp_blocks, wtc_ref[0]) + btc_ref[0]
    tp1m_ref[0] = _softplus(pre_c).mean(axis=1)     # (n, cc, LANES)

    @pl.when(c == 0)
    def _():
        tpm = [b.mean(axis=1) for b in tp_blocks]   # (n, c_k, LANES)
        pre0_ref[:] = _contract_blocks(tpm, w30T_ref[:]) + b0_ref[:]


def _d2_G_kernel(x_ref, eye4_ref, eyed5_ref, w30s_ref, w30T_ref,
                 sig0_ref, sp_ref, sumAW0_ref, *, n, dim, L, lanes):
    """One s-chunk of SP_l = -(1/n) sum_i sig0_i (A0 W3_0)_il; step 0 also
    emits sumAW0 = (sum_l A0_il) W3_0 for the diagonal D."""
    s = pl.program_id(1)
    _, A_blocks = _d2_features(x_ref[:], eye4_ref[:], eyed5_ref[:], L, True)
    AW0_c = _contract_blocks(A_blocks, w30s_ref[0])  # (n, n, dim, sc, LANES)
    sig0_c = sig0_ref[:]                             # (n, sc, LANES)
    sp_ref[:] = -(sig0_c[:, None, None] * AW0_c).sum(axis=0) / n

    @pl.when(s == 0)
    def _():
        sumA0 = [a.sum(axis=1) for a in A_blocks]    # (n, dim, c_k, LANES)
        sumAW0_ref[:] = _contract_blocks(sumA0, w30T_ref[:])


def _d2_J_kernel(x_ref, eye4_ref, eyed5_ref, wtc_ref, btc_ref,
                 K_ref, N_ref, R_ref, M_ref, G_ref, D_ref,
                 j_ref, diag_ref, *, n, dim, L, lanes, s_steps, c_steps):
    """One accumulation step of the Jacobian assembly (see section header)."""
    j = pl.program_id(1)
    dtype = x_ref.dtype
    eyed5 = eyed5_ref[:]                             # (1, 1, dim, dim, 1)
    tp_blocks, A_blocks = _d2_features(
        x_ref[:], eye4_ref[:], eyed5, L, need_A=True)
    one = jnp.ones((), dtype)
    cmask = jnp.where(j < c_steps, one, 0.0)
    smask = jnp.where(j < s_steps, one, 0.0)
    zmask = jnp.where(j == 0, one, 0.0)

    jacc = jnp.zeros((n, n, dim, dim, lanes), dtype)
    dacc = jnp.zeros((n, 1, dim, dim, lanes), dtype)

    # tp pass-2 A1 pair term + its diagonal, one c-chunk (mono lines: the
    # cchunk loop): A1 = sig_t . (A0 wt); J += A1.N; diag -= SumA1.N
    pre_c = _contract_blocks(tp_blocks, wtc_ref[0]) + btc_ref[0]
    sig_c = jax.lax.logistic(pre_c)                  # (n, n, cc, LANES)
    A1_c = sig_c[:, :, None, :, :] * _contract_blocks(A_blocks, wtc_ref[0])
    sumA1_c = A1_c.sum(axis=1)                       # (n, dim, cc, LANES)
    # chunked operands arrive with a leading length-1 step axis (their chunk
    # axes are pre-split outside the kernel so every block's last two dims
    # equal the array's own dims — the Mosaic block-shape rule)
    N_c, R_c, M_c = N_ref[0], R_ref[0], M_ref[0]
    G_c, D_c, K_full = G_ref[0], D_ref[0], K_ref[:]
    for b in range(dim):
        onehot = eyed5[:, :, b : b + 1]              # (1, 1, 1, dim, 1)
        n_b = N_c[b]                                 # (n, cc, LANES)
        pair1 = (A1_c * n_b[:, None, None]).sum(axis=-2, keepdims=True)
        jacc = jacc + cmask * pair1 * onehot
        dg1 = (sumA1_c * n_b[:, None]).sum(axis=-2, keepdims=True)
        dacc = dacc - cmask * dg1[:, None] * onehot

        # mean term G.R and diagonal D.M, one s-chunk (mono: schunk loop)
        r_b = R_c[b]                                 # (n, sc, LANES)
        mean = (G_c[None] * r_b[:, None, None]).sum(axis=-2, keepdims=True)
        jacc = jacc + smask * mean * onehot
        m_b = M_c[b]
        dg0 = (D_c * m_b[:, None]).sum(axis=-2, keepdims=True)
        dacc = dacc + smask * dg0[:, None] * onehot

        # layer-0 pair term A0.K, once (mono: the A_blocks loop)
        coff = 0
        acc0 = jnp.zeros((n, n, dim, 1, lanes), dtype)
        for blk in A_blocks:
            ck = blk.shape[-2]
            k_ch = K_full[b][:, coff : coff + ck, :][:, None, None]
            acc0 = acc0 + (blk * k_ch).sum(axis=-2, keepdims=True)
            coff += ck
        jacc = jacc + zmask * acc0 * onehot

    @pl.when(j == 0)
    def _():
        j_ref[:] = jacc
        diag_ref[:] = dacc

    @pl.when(j > 0)
    def _():
        j_ref[:] += jacc
        diag_ref[:] += dacc


def _pick_chunk(total: int, prefer) -> int:
    for c in prefer:
        if total % c == 0:
            return c
    return 1


def _d2_grid_call(params, cfg: FermiNetConfig, x, interpret: bool):
    """Multi-kernel grid-accumulation d2 fwd+jac: x (B, n, dim) ->
    u (n, dim, B), J (nd, nd, B).  Numerics identical to the mono-kernel."""
    B, n, dim = x.shape
    nd = n * dim
    if cfg.depth != 2:  # must survive python -O (wrong-Jacobian risk)
        raise ValueError("structured d2 kernel requires depth-2 flows, "
                         "got depth=%d" % cfg.depth)
    lanes = flow_jac_lanes(n)
    nblocks = pl.cdiv(B, lanes)
    padded = nblocks * lanes
    S, C1 = cfg.spsize, cfg.tpsize
    C0 = 2 * dim + 1
    L = float(cfg.L)
    dtype = x.dtype

    xt = jnp.moveaxis(x, 0, -1)
    if padded != B:
        xt = jnp.concatenate(
            [xt, jnp.broadcast_to(xt[:, :, :1], (n, dim, padded - B))], axis=-1
        )

    w0 = params["sp"][0]["w"]            # (2*dim + C0, S)
    w1f = params["sp"][1]["w"]           # (2S + C1, S')
    wt = params["tp"][0]["w"]            # (C0, C1)
    wf = params["final"]["w"]            # (S', dim)
    w30T = w0[2 * dim:].T                # (S, C0)
    b0 = params["sp"][0]["b"][:, None]   # (S, 1)
    wtT = wt.T                           # (C1, C0)
    bt = params["tp"][0]["b"][:, None]   # (C1, 1)
    b1f = params["sp"][1]["b"][:, None]  # (S', 1)
    W1, W2, W3 = w1f[:S], w1f[S : 2 * S], w1f[2 * S:]
    wfT = wf.T                           # (dim, S')
    bf = params["final"]["b"][:, None]   # (dim, 1)

    eye4 = np.eye(n, dtype=np.float32)[:, :, None, None]
    eye5 = np.eye(n, dtype=np.float32)[:, :, None, None, None]
    eyed5 = np.eye(dim, dtype=np.float32)[None, None, :, :, None]

    # chunk schedule: P_G streams s in sc_g-chunks; P_J pairs one sc_j
    # s-chunk with one cc c-chunk per grid step (worst-step VMEM budget in
    # the section header).  sc_g sits on a block's second-to-last dim, so it
    # must be a multiple of 8 or the full axis (Mosaic block-shape rule); the
    # other chunk axes are pre-split into leading grid-step axes below and
    # are unconstrained.
    sc_g = 8 if S % 8 == 0 else S
    sc_j = _pick_chunk(S, (4, 2))
    cc = _pick_chunk(C1, (2,))
    sg_steps, sj_steps, c_steps = S // sc_g, S // sc_j, C1 // cc
    jsteps = max(sj_steps, c_steps)

    w30s = w30T.reshape(S // sc_g, sc_g, C0)
    wtc = wtT.reshape(c_steps, cc, C0)
    btc = bt.reshape(c_steps, cc, 1)

    full = lambda a: pl.BlockSpec(
        jnp.shape(a), lambda b, s: (0,) * jnp.ndim(a), memory_space=pltpu.VMEM)
    vm = pltpu.VMEM
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=110 * 1024 * 1024,
    )

    # ---- P_tp: tp1m (c-chunked) + pre0 (step 0) ---------------------------
    # tp1m is emitted step-major (c_steps leading) so the block's last two
    # dims (cc, lanes) equal the array's own dims — Mosaic's block-shape rule
    # forbids blocking the middle of a trailing-two axis (cc=2 over C1=16).
    tp1m_s, pre0 = pl.pallas_call(
        functools.partial(_d2_tp_kernel, n=n, dim=dim, L=L, lanes=lanes),
        out_shape=(
            jax.ShapeDtypeStruct((c_steps, n, cc, padded), dtype),
            jax.ShapeDtypeStruct((n, S, padded), dtype),
        ),
        grid=(nblocks, c_steps),
        in_specs=[
            pl.BlockSpec((n, dim, lanes), lambda b, c: (0, 0, b), memory_space=vm),
            full(eye4),
            full(w30T),
            full(b0),
            pl.BlockSpec((1, cc, C0), lambda b, c: (c, 0, 0), memory_space=vm),
            pl.BlockSpec((1, cc, 1), lambda b, c: (c, 0, 0), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((1, n, cc, lanes), lambda b, c: (c, 0, 0, b),
                         memory_space=vm),
            pl.BlockSpec((n, S, lanes), lambda b, c: (0, 0, b), memory_space=vm),
        ),
        compiler_params=cparams,
        interpret=interpret,
    )(xt, eye4, w30T, b0, wtc, btc)
    tp1m = tp1m_s.transpose(1, 0, 2, 3).reshape(n, C1, padded)

    sig0 = jax.lax.logistic(pre0)                    # (n, S, padded)
    sp1 = jnp.logaddexp(pre0, 0.0)

    # ---- P_G: SP (s-chunked) + sumAW0 (step 0) ----------------------------
    SP, sumAW0 = pl.pallas_call(
        functools.partial(_d2_G_kernel, n=n, dim=dim, L=L, lanes=lanes),
        out_shape=(
            jax.ShapeDtypeStruct((n, dim, S, padded), dtype),
            jax.ShapeDtypeStruct((n, dim, S, padded), dtype),
        ),
        grid=(nblocks, sg_steps),
        in_specs=[
            pl.BlockSpec((n, dim, lanes), lambda b, s: (0, 0, b), memory_space=vm),
            full(eye4),
            full(eyed5),
            pl.BlockSpec((1, sc_g, C0), lambda b, s: (s, 0, 0), memory_space=vm),
            full(w30T),
            pl.BlockSpec((n, sc_g, lanes), lambda b, s: (0, s, b), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((n, dim, sc_g, lanes), lambda b, s: (0, 0, s, b),
                         memory_space=vm),
            pl.BlockSpec((n, dim, S, lanes), lambda b, s: (0, 0, 0, b),
                         memory_space=vm),
        ),
        compiler_params=cparams,
        interpret=interpret,
    )(xt, eye4, eyed5, w30s, w30T, sig0)

    D = sig0[:, None, :, :] * sumAW0 / n             # (n, dim, S, padded)
    G = D + SP

    # ---- XLA head: final sp layer, u, and the per-coordinate row matrices -
    pre1 = jnp.einsum("nql,sq->nsl", sp1, w1f.T[:, :S])
    sp1m = jnp.broadcast_to(sp1.mean(axis=0, keepdims=True), sp1.shape)
    pre1 = pre1 + jnp.einsum("nql,sq->nsl", sp1m, w1f.T[:, S : 2 * S])
    pre1 = pre1 + jnp.einsum("nql,sq->nsl", tp1m, w1f.T[:, 2 * S:]) + b1f
    sig1 = jax.lax.logistic(pre1)                    # (n, S', padded)
    spf = sp1 + jnp.logaddexp(pre1, 0.0)
    u = xt + jnp.einsum("nql,dq->ndl", spf, wfT) + bf

    Ks, Ns, Rs, Ms = [], [], [], []
    for b in range(dim):
        Q_b = sig1 * wf[None, :, b : b + 1]          # (n, S', padded)
        M_b = wf[None, :, b : b + 1] + jnp.einsum("nql,sq->nsl", Q_b, W1)
        Ms.append(M_b)
        Ks.append(-jnp.einsum("nql,cq->ncl", sig0 * M_b, w0[2 * dim:]) / n)
        Ns.append(-jnp.einsum("nql,cq->ncl", Q_b, W3) / n)
        Rs.append(jnp.einsum("nql,sq->nsl", Q_b, W2) / n)
    K = jnp.stack(Ks)                                # (dim, n, C0, padded)
    N = jnp.stack(Ns)                                # (dim, n, C1, padded)
    R = jnp.stack(Rs)                                # (dim, n, S, padded)
    M = jnp.stack(Ms)                                # (dim, n, S, padded)

    # Pre-split every chunk-streamed operand into a LEADING grid-step axis:
    # blocking the middle of a trailing-two axis (cc=2 of C1=16, sc_j=4 of
    # S=16) violates Mosaic's block-shape rule, but with the step axis
    # leading each block's last two dims equal the array's own dims.  The
    # kernel sees identical chunk layouts via ref[0].
    Ns_ = N.reshape(dim, n, c_steps, cc, padded).transpose(2, 0, 1, 3, 4)
    Rs_ = R.reshape(dim, n, sj_steps, sc_j, padded).transpose(2, 0, 1, 3, 4)
    Ms_ = M.reshape(dim, n, sj_steps, sc_j, padded).transpose(2, 0, 1, 3, 4)
    Gs_ = G.reshape(n, dim, sj_steps, sc_j, padded).transpose(2, 0, 1, 3, 4)
    Ds_ = D.reshape(n, dim, sj_steps, sc_j, padded).transpose(2, 0, 1, 3, 4)

    # ---- P_J: Jacobian assembly, accumulated over jsteps ------------------
    sj_cap, c_cap = sj_steps - 1, c_steps - 1
    j5, diag5 = pl.pallas_call(
        functools.partial(_d2_J_kernel, n=n, dim=dim, L=L, lanes=lanes,
                          s_steps=sj_steps, c_steps=c_steps),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, dim, dim, padded), dtype),
            jax.ShapeDtypeStruct((n, 1, dim, dim, padded), dtype),
        ),
        grid=(nblocks, jsteps),
        in_specs=[
            pl.BlockSpec((n, dim, lanes), lambda b, s: (0, 0, b), memory_space=vm),
            full(eye4),
            full(eyed5),
            pl.BlockSpec((1, cc, C0),
                         lambda b, s: (jnp.minimum(s, c_cap), 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, cc, 1),
                         lambda b, s: (jnp.minimum(s, c_cap), 0, 0),
                         memory_space=vm),
            pl.BlockSpec((dim, n, C0, lanes), lambda b, s: (0, 0, 0, b),
                         memory_space=vm),
            pl.BlockSpec((1, dim, n, cc, lanes),
                         lambda b, s: (jnp.minimum(s, c_cap), 0, 0, 0, b),
                         memory_space=vm),
            pl.BlockSpec((1, dim, n, sc_j, lanes),
                         lambda b, s: (jnp.minimum(s, sj_cap), 0, 0, 0, b),
                         memory_space=vm),
            pl.BlockSpec((1, dim, n, sc_j, lanes),
                         lambda b, s: (jnp.minimum(s, sj_cap), 0, 0, 0, b),
                         memory_space=vm),
            pl.BlockSpec((1, n, dim, sc_j, lanes),
                         lambda b, s: (jnp.minimum(s, sj_cap), 0, 0, 0, b),
                         memory_space=vm),
            pl.BlockSpec((1, n, dim, sc_j, lanes),
                         lambda b, s: (jnp.minimum(s, sj_cap), 0, 0, 0, b),
                         memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((n, n, dim, dim, lanes), lambda b, s: (0, 0, 0, 0, b),
                         memory_space=vm),
            pl.BlockSpec((n, 1, dim, dim, lanes), lambda b, s: (0, 0, 0, 0, b),
                         memory_space=vm),
        ),
        compiler_params=cparams,
        interpret=interpret,
    )(xt, eye4, eyed5, wtc, btc, K, Ns_, Rs_, Ms_, Gs_, Ds_)

    J5 = j5 + jnp.asarray(eye5, dtype) * diag5       # broadcast diag onto i==l
    J = J5.transpose(0, 3, 1, 2, 4).reshape(nd, nd, padded)
    J = J + jnp.eye(nd, dtype=dtype)[:, :, None]
    return u[:, :, :B], J[:, :, :B]


def _d2_call(params, cfg: FermiNetConfig, x, interpret: bool, emit_lap: bool):
    B, n, dim = x.shape
    nd = n * dim
    if cfg.depth != 2:  # not assert: must survive python -O (wrong-Jacobian risk)
        raise ValueError("structured d2 kernel requires depth-2 flows, "
                         "got depth=%d" % cfg.depth)
    lanes = flow_jac_lanes(n)
    nblocks = pl.cdiv(B, lanes)
    padded = nblocks * lanes
    S, C1 = cfg.spsize, cfg.tpsize

    xt = jnp.moveaxis(x, 0, -1)
    if padded != B:
        xt = jnp.concatenate(
            [xt, jnp.broadcast_to(xt[:, :, :1], (n, dim, padded - B))], axis=-1
        )

    w0 = params["sp"][0]["w"]
    w1f = params["sp"][1]["w"]
    wt = params["tp"][0]["w"]
    wf = params["final"]["w"]
    ops = [
        np.eye(n, dtype=np.float32)[:, :, None, None],
        np.eye(n, dtype=np.float32)[:, :, None, None, None],
        np.eye(dim, dtype=np.float32)[None, None, :, :, None],
        w0[2 * dim:].T,                 # w30T (S, C0)
        w0[2 * dim:],                   # w30  (C0, S)
        params["sp"][0]["b"][:, None],
        wt.T,                           # wtT (C1, C0)
        params["tp"][0]["b"][:, None],
        w1f.T,                          # w1fT (S', 2S + C1)
        w1f[:S],                        # W1 (S, S')
        w1f[S : 2 * S],                 # W2 (S, S')
        w1f[2 * S:],                    # W3 (C1, S')
        params["sp"][1]["b"][:, None],
        wf.T,                           # wfT (dim, S')
        wf,                             # wfE (S', dim)
        params["final"]["b"][:, None],
        w1f[:S].T,                      # W1t (S', S) — lap path
        w1f[S : 2 * S].T,               # W2t (S', S)
        w1f[2 * S:].T,                  # W3t (S', C1)
    ]

    out_shape = [
        jax.ShapeDtypeStruct((n, dim, padded), x.dtype),
        jax.ShapeDtypeStruct((n, n, dim, dim, padded), x.dtype),
    ]
    out_specs = [
        pl.BlockSpec((n, dim, lanes), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, n, dim, dim, lanes), lambda i: (0, 0, 0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    if emit_lap:
        out_shape.append(jax.ShapeDtypeStruct((n, dim, padded), x.dtype))
        out_specs.append(pl.BlockSpec((n, dim, lanes), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM))

    full = lambda a: pl.BlockSpec(jnp.shape(a), lambda i: (0,) * jnp.ndim(a),
                                  memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _d2_kernel, n=n, dim=dim, L=float(cfg.L), lanes=lanes,
            S=S, C1=C1, schunk=8, cchunk=8, lchunk=8, emit_lap=emit_lap,
        ),
        out_shape=tuple(out_shape),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((n, dim, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ] + [full(a) for a in ops],
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(xt, *ops)

    u, J5 = outs[0], outs[1]
    J = J5.transpose(0, 3, 1, 2, 4).reshape(nd, nd, padded)
    J = J + jnp.eye(nd, dtype=x.dtype)[:, :, None]
    if emit_lap:
        lap = outs[2].reshape(nd, padded)
        return u[:, :, :B], J[:, :, :B], lap[:, :B]
    return u[:, :, :B], J[:, :, :B]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def flow_u_jac_pallas_d2(params, cfg: FermiNetConfig, x, interpret: bool = False):
    """Depth-2 flow fwd+jac for n <= MAX_FLOW_N_D2 (grid-accumulation form).

    Same contract as ``flow_u_jac_pallas``: x (B, n, dim) -> u (n, dim, B),
    J (nd, nd, B) batch-last for the fused log-det tail.  Depth-2 only.
    Round 4 replaced the mono-kernel body (register-spill VMEM OOM at n=57,
    see HARDWARE STATUS above) with the multi-kernel grid-accumulation
    pipeline ``_d2_grid_call``; the mono-kernel remains behind the
    emit_lap=True path only.
    """
    _check_d2_hw_ceiling(x.shape[-2], interpret)
    return _d2_grid_call(params, cfg, x, interpret)


def _check_d2_hw_ceiling(n, interpret):
    if not interpret and n > MAX_FLOW_N_D2_HW:
        raise ValueError(
            "compiled d2 Pallas flow kernel is chip-validated only for "
            "n <= %d (n = %d crashes the TPU toolchain: Mosaic VMEM spill / "
            "compile-helper crash, PERF.md round 4); use the XLA carried-"
            "state path (--flow_jac carried / omit --mc_d2_kernel), or "
            "interpret=True for correctness tests" % (MAX_FLOW_N_D2_HW, n))


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def flow_u_jac_lap_pallas_d2(params, cfg: FermiNetConfig, x,
                             interpret: bool = False):
    """Depth-2 flow fwd + Jacobian + coordinate Laplacian in one kernel.

    x (B, n, dim) -> (u (n, dim, B), J (nd, nd, B), lap_u (nd, B)), exactly
    equal (to roundoff) to ``ferminet_apply_jac_lap_d2``
    (models/ferminet_jac.py) per walker.  Serves the accumulate phase's
    primal flow evaluation in wavefunction/fast_laplacian.py — that slot is
    consumed outside AD (the observables/gradients differentiate log Psi,
    not the flow geometry), so the whole batch rides one kernel launch
    instead of a vmapped jnp chain.  Reference analogue: none — the
    reference computes this with nested jvp fan-outs per walker
    (src/logpsi.py:86-134).
    """
    _check_d2_hw_ceiling(x.shape[-2], interpret)
    return _d2_call(params, cfg, x, interpret, emit_lap=True)
