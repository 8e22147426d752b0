"""Analytic coordinate Jacobian of the FermiNet flow — the TPU scaling path.

Generic forward-mode AD of J = d flow(x)/dx fans n*dim tangents through the
whole network, materializing O(n^2 * ndim) pair-feature tangents per walker
(~41 GB for n=49 at batch 8192) and costing O(n) more FLOPs than necessary.
The flow's structure closes the Jacobian analytically:

  * the two-particle stream is PAIR-LOCAL through every layer
    (tp'_ij = tp_ij + softplus(tp_ij W)), so its derivative lives entirely in
    ONE (n, n, dim, C) block A_ij = d tp_ij / d x_i — the conjugate block is
    B_ij = d tp_ij / d x_j = -A_ij exactly (pair features depend on x only
    through r_ij = x_i - x_j and the pair-local updates preserve the sign),
    so it is never materialized;
  * only the mean-field terms (mean_i sp, mean_j tp) couple particles, and
    their derivatives are rank-structured:  d(mean_j tp_ij)/dx_l =
    (1/n)(delta_{il} sum_j A_ij + B_il);
  * the single-particle stream's dense Jacobian Jsp (n, n, dim, S) updates by
    one matmul per layer.

All derivative tensors are laid out FEATURE-LAST, so every per-layer
contraction is a plain matmul on the trailing axis (lane dimension on TPU)
with no transposes, and the layer Jacobian Jf = [Jsp, mean Jsp, T] is never
concatenated: the weight matrix is split into its three row blocks instead
(JfW = Jsp@W1 + (mean Jsp)@W2 + T@W3, with the delta_{il} part of T applied
as a fused diagonal add).  This removes ~1.5 GB of HBM traffic per Metropolis
sweep at n=13, batch 8192, vs the naive concatenate-then-einsum form.

Total cost O(n^2 * features * dim) per walker — n-fold fewer FLOPs than the
jacfwd fan-out and no O(n^3)-sized intermediates.  Differentially tested
against jax.jacfwd of ferminet_apply (tests/test_ferminet_jac.py).

Used by the MCMC fast logp (wavefunction/fast_logp.py); reference analogue:
none — the reference evaluates this Jacobian with jax.jacfwd inside every
Metropolis step (src/logpsi.py:22-31, src/MCMC.py:22-37).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ferminet import FermiNetConfig, _sp_feature

__all__ = ["ferminet_apply_and_jac", "ferminet_apply_jac_lap",
           "ferminet_apply_and_jac_d2", "ferminet_apply_jac_lap_d2",
           "select_flow_jac"]


def select_flow_jac(cfg: FermiNetConfig, impl: str = "auto"):
    """Pick the flow fwd+Jacobian / fwd+Jac+Laplacian implementation pair.

    Returns ``(flow_jac, flow_jac_lap)`` closures of signature
    ``f(params, x)``.  Implementations:

      * ``"carried"`` — the layer-recursive form carrying the dense
        (n, n, dim, S) single-particle Jacobian state (any depth);
      * ``"d2"``      — the depth-2 closed form that never materializes that
        state (exact for cfg.depth == 2 only);
      * ``"auto"``    — measured-faster default.  The round-2 A/B on the
        production shapes (BENCH_r02 vs BENCH_r01, re-measured per-phase in
        round 3: scripts/bench_flow_jac_ab.py) found the d2 closure LOSES
        end-to-end at every benched config (n=13/49/57: +15-25% step time)
        despite ~4x fewer XLA-counted FLOPs — the closure's pair-tensor
        contractions fuse/tile worse than the carried-state matmul chain at
        these sizes — so "auto" resolves to "carried".
    """
    if impl == "auto":
        impl = "carried"
    if impl == "d2":
        if cfg.depth != 2:
            raise ValueError("flow_jac 'd2' requires depth == 2 (got %d)" % cfg.depth)
        return (
            lambda p, x: ferminet_apply_and_jac_d2(p, cfg, x),
            lambda p, x: ferminet_apply_jac_lap_d2(p, cfg, x),
        )
    if impl == "carried":
        return (
            lambda p, x: ferminet_apply_and_jac(p, cfg, x),
            lambda p, x: ferminet_apply_jac_lap(p, cfg, x),
        )
    raise ValueError("unknown flow_jac impl: %r" % (impl,))


def _pair_feature_grads(x, L):
    """d tp0_ij / d r_ij for the periodic pair features, plus tp0 itself.

    Returns (tp0 (n,n,C), g (n,n,dim,C)) with C = 2*dim+1 — derivative axis
    BEFORE the feature axis so downstream weight contractions are trailing-
    axis matmuls — and the diagonal (i == j) of g zeroed: r_ii is identically
    0, so tp0_ii is constant in x.
    """
    n, dim = x.shape
    rij = x[:, None, :] - x[None, :, :]
    c2, s2 = jnp.cos(2 * jnp.pi / L * rij), jnp.sin(2 * jnp.pi / L * rij)
    eye_n = jnp.eye(n, dtype=x.dtype)
    s1 = jnp.sin(jnp.pi / L * rij)
    dij = jnp.linalg.norm(s1 + eye_n[..., None], axis=-1) * (1.0 - eye_n)
    tp0 = jnp.concatenate([c2, s2, dij[..., None]], axis=-1)

    eye_d = jnp.eye(dim, dtype=x.dtype)
    # cos block: d cos(2pi/L r_c) / d r_d = -(2pi/L) sin(2pi/L r_c) delta_cd
    g_cos = -(2 * jnp.pi / L) * s2[..., None, :] * eye_d
    g_sin = (2 * jnp.pi / L) * c2[..., None, :] * eye_d
    # dij = |sin(pi/L r)| (off-diagonal): d/d r_d = (pi/L) s_d cos(pi/L r_d)/dij
    safe_d = jnp.where(dij > 0, dij, 1.0)
    g_d = (jnp.pi / L) * s1 * jnp.cos(jnp.pi / L * rij) / safe_d[..., None]
    g = jnp.concatenate([g_cos, g_sin, g_d[..., None]], axis=-1)  # (n,n,dim,C)
    off = (1.0 - eye_n)[..., None, None]
    return tp0, g * off


def _pair_feature_lap(x, L):
    """Sum_a d^2 tp0_ij / d r_a^2 for the periodic pair features.

    The coordinate Laplacian of tp0 is 2x this (tp0 depends on r = x_i - x_j,
    so d^2/dx_i^2 = d^2/dx_j^2 = d^2/dr^2).  Diagonal (i == j) zeroed.
    """
    n, dim = x.shape
    rij = x[:, None, :] - x[None, :, :]
    k2, k1 = 2 * jnp.pi / L, jnp.pi / L
    h_cos = -(k2**2) * jnp.cos(k2 * rij)  # (n, n, dim): per-component
    h_sin = -(k2**2) * jnp.sin(k2 * rij)
    eye_n = jnp.eye(n, dtype=x.dtype)
    s, c = jnp.sin(k1 * rij), jnp.cos(k1 * rij)
    d = jnp.linalg.norm(s + eye_n[..., None], axis=-1) * (1.0 - eye_n)
    safe_d = jnp.where(d > 0, d, 1.0)
    # d = |s|: d''_a = (s'_a^2 + s_a s''_a)/d - (s_a s'_a)^2 / d^3
    sp_, spp = k1 * c, -(k1**2) * s
    h_d = ((sp_**2 + s * spp) / safe_d[..., None]
           - (s * sp_) ** 2 / safe_d[..., None] ** 3).sum(axis=-1)
    h = jnp.concatenate([h_cos, h_sin, h_d[..., None]], axis=-1)  # (n, n, C)
    return h * (1.0 - eye_n)[..., None]


def _split_w(w, spsize):
    """Split the sp-layer weight rows by the feature blocks [sp, mean sp, tp]."""
    return w[:spsize], w[spsize : 2 * spsize], w[2 * spsize :]


def _jfw(Jsp, A, w, spsize, eye_n, n):
    """(d f / d x) @ W without materializing the concatenated Jf.

    Jsp (n,n,dim,S): d sp_{i,s} / d x_{l,d} stored [i,l,d,s];
    A (n,n,dim,C) = d tp_ij / d x_i.  The other pair block is B = -A exactly
    (the pair features depend on x only through r_ij = x_i - x_j, and the
    pair-local layer updates A' = sig*(A W) preserve the sign relation), so
    it is never materialized.  Returns (n,n,dim,S') =
    sum_q (d f_{i,q} / d x_{l,d}) W[q, :].
    """
    w1, w2, w3 = _split_w(w, spsize)
    out = Jsp @ w1
    out = out + (Jsp.mean(axis=0) @ w2)  # broadcast over i
    # d(mean_j tp_ij)/dx_l = (1/n)(delta_il sum_j A + B_il) with B = -A: the
    # delta part is a fused diagonal add (no (n,C,n,dim) tensor).
    AW = A @ w3
    out = out + (eye_n[:, :, None, None] * AW.sum(axis=1)[:, None] - AW) / n
    return out


def ferminet_apply_and_jac(params, cfg: FermiNetConfig, x):
    """Forward pass + analytic Jacobian: x (n, dim) -> (z (n, dim), J (nd, nd)).

    J[mu, alpha] = d z_flat[mu] / d x_flat[alpha], identical (to roundoff) to
    ``jax.jacfwd`` of ``ferminet_apply`` but with pair-local propagation.
    """
    n, dim = x.shape
    nd = n * dim
    eye_n = jnp.eye(n, dtype=x.dtype)

    tp, g = _pair_feature_grads(x, cfg.L)
    A = g  # d tp_ij / d x_i  (n,n,dim,C); d tp_ij / d x_j = -A throughout
    sp = jnp.zeros_like(x)
    Jsp = jnp.zeros((n, n, dim, dim), x.dtype)  # d sp_{i,s} / d x_{l,d} at [i,l,d,s]

    def sp_step(layer, sp_in, tp_in, Jsp, A):
        pre = _sp_feature(sp_in, tp_in) @ layer["w"] + layer["b"]
        act = jax.nn.softplus(pre)
        JfW = _jfw(Jsp, A, layer["w"], sp_in.shape[-1], eye_n, n)
        Jact = jax.nn.sigmoid(pre)[:, None, None, :] * JfW
        return act, Jact

    for i in range(cfg.depth - 1):
        sp_new, Jsp_new = sp_step(params["sp"][i], sp, tp, Jsp, A)

        w_tp = params["tp"][i]["w"]
        pre_tp = tp @ w_tp + params["tp"][i]["b"]
        sig_tp = jax.nn.sigmoid(pre_tp)[..., None, :]  # (n, n, 1, C')
        A_new = sig_tp * (A @ w_tp)
        tp_new = jax.nn.softplus(pre_tp)

        if i == 0:  # first layer replaces the streams (reference src/flow.py:44-49)
            sp, Jsp, tp, A = sp_new, Jsp_new, tp_new, A_new
        else:
            sp, Jsp = sp + sp_new, Jsp + Jsp_new
            tp, A = tp + tp_new, A + A_new

    sp_new, Jsp_new = sp_step(params["sp"][-1], sp, tp, Jsp, A)
    sp, Jsp = sp + sp_new, Jsp + Jsp_new

    z = x + (sp @ params["final"]["w"] + params["final"]["b"])
    J = (Jsp @ params["final"]["w"]).transpose(0, 3, 1, 2)  # (i,b,l,d)
    J = J + jnp.einsum("il,ba->ibla", eye_n, jnp.eye(dim, dtype=x.dtype))
    return z, J.reshape(nd, nd)


def ferminet_apply_and_jac_d2(params, cfg: FermiNetConfig, x):
    """Depth-2 flow Jacobian in closed STRUCTURED form — no Jsp state at all.

    ``ferminet_apply_and_jac`` carries the dense single-particle Jacobian
    state Jsp (n, n, dim, S) through the layers (~300 KB/walker at n=49,
    read+written several times per Metropolis sweep) — the measured wall for
    the n >= 49 sampling phase (PERF.md).  For the production depth-2 flow
    (the reference's only configuration, run/submit.py:33) the recursion is
    short enough to close algebraically: after layer 0,

        Jsp1_{il} = delta_il D_i + P_{il},   P_{il} = -(1/n) sig0_i ⊙ (A0_{il} W3_0)

    and the final-layer update only ever CONTRACTS Jsp1 with weight matrices
    and row-wise sigmoid factors, so the full coordinate Jacobian reduces to

        J_{il} = delta_il (I + D_i M_i - SumA1_i N_i)        [diagonal blocks]
               + A0_{il} K_i + A1_{il} N_i                   [pair terms]
               + G_l R_i                                     [rank-S mean term]

    with per-row (S x dim)-sized matrices M_i, K_i, N_i, R_i and a single
    (n, dim, S) mean-accumulator G.  Only the pair-derivative tensors
    A0 (n,n,dim,2*dim+1) and A1 (n,n,dim,tpsize) are ever materialized —
    the (n,n,dim,S) state and its multiple HBM passes disappear, and the
    FLOP count drops ~4x.  Exactly equal (to roundoff) to
    ``ferminet_apply_and_jac``; differentially tested in
    tests/test_ferminet_jac.py.
    """
    assert cfg.depth == 2, "structured Jacobian is specialized to depth 2"
    n, dim = x.shape
    nd = n * dim
    eye_n = jnp.eye(n, dtype=x.dtype)
    eye_d = jnp.eye(dim, dtype=x.dtype)

    tp0, A0 = _pair_feature_grads(x, cfg.L)  # (n,n,C0), (n,n,dim,C0)

    # ---- layer 0 (sp stream enters as zeros of width dim) -----------------
    w0, b0 = params["sp"][0]["w"], params["sp"][0]["b"]
    w3_0 = w0[2 * dim:]  # the only block reached by nonzero features/derivs
    pre0 = tp0.mean(axis=1) @ w3_0 + b0  # (n, S)
    sig0 = jax.nn.sigmoid(pre0)
    sp1 = jax.nn.softplus(pre0)
    # D_i = (1/n) sig0_i ⊙ (SumA0_i W3_0): diagonal part of Jsp1
    sumA0 = A0.sum(axis=1)  # (n, dim, C0)
    D = sig0[:, None, :] * (sumA0 @ w3_0) / n  # (n, dim, S)

    # ---- pair-local tp layer ---------------------------------------------
    wt, bt = params["tp"][0]["w"], params["tp"][0]["b"]
    pre_tp = tp0 @ wt + bt
    sigt = jax.nn.sigmoid(pre_tp)
    tp1 = jax.nn.softplus(pre_tp)
    A1 = sigt[..., None, :] * (A0 @ wt)  # (n, n, dim, C1)

    # ---- final sp layer ----------------------------------------------------
    S = sp1.shape[-1]
    w1f, b1f = params["sp"][1]["w"], params["sp"][1]["b"]
    W1, W2, W3 = w1f[:S], w1f[S:2 * S], w1f[2 * S:]
    f1 = _sp_feature(sp1, tp1)
    pre1 = f1 @ w1f + b1f
    sig1 = jax.nn.sigmoid(pre1)  # (n, S')
    sp_fin = sp1 + jax.nn.softplus(pre1)

    wf, bf = params["final"]["w"], params["final"]["b"]
    z = x + (sp_fin @ wf + bf)

    # ---- per-row contraction matrices ------------------------------------
    # M_i = (I + W1 diag(sig1_i)) wf : (n, S, dim)
    M = wf[None] + jnp.einsum("st,it,tb->isb", W1, sig1, wf)
    # K_i = -(1/n) W3_0 diag(sig0_i) M_i : (n, C0, dim)
    K = -jnp.einsum("cs,is,isb->icb", w3_0, sig0, M) / n
    # N_i = -(1/n) W3 diag(sig1_i) wf : (n, C1, dim)
    N = -jnp.einsum("ct,it,tb->icb", W3, sig1, wf) / n
    # R_i = (1/n) W2 diag(sig1_i) wf : (n, S, dim)
    R = jnp.einsum("st,it,tb->isb", W2, sig1, wf) / n

    # ---- mean accumulator G_l = sum_k Jsp1_{kl} = D_l + sum_k P_{kl} ------
    # sum_k P_{kl} = -(1/n) sum_k sig0_k ⊙ (A0_{kl} W3_0)
    SP = -jnp.einsum("klds,ks->lds", A0 @ w3_0, sig0) / n
    G = D + SP  # (n, dim, S)

    # ---- assemble J -------------------------------------------------------
    # pair terms: A0_{il} K_i + A1_{il} N_i ; mean term: G_l R_i
    Jblk = (jnp.einsum("ildc,icb->ibld", A0, K)
            + jnp.einsum("ildc,icb->ibld", A1, N)
            + jnp.einsum("lds,isb->ibld", G, R))
    # diagonal blocks: I + D_i M_i - SumA1_i N_i
    diag = (eye_d[None]
            + jnp.einsum("ids,isb->ibd", D, M)
            - jnp.einsum("idc,icb->ibd", A1.sum(axis=1), N))
    Jblk = Jblk + jnp.einsum("il,ibd->ibld", eye_n, diag)
    return z, Jblk.reshape(nd, nd)


def ferminet_apply_jac_lap(params, cfg: FermiNetConfig, x):
    """Forward + analytic Jacobian + analytic coordinate Laplacian.

    Returns (z (n, dim), J (nd, nd), lap_z (nd,)) with
    lap_z[mu] = sum_alpha d^2 z_flat[mu] / d x_flat[alpha]^2 — the quantity
    the kinetic-energy engine otherwise evaluates with an nd-wide
    jvp-of-jvp fan-out (O(n^3 * features) per walker); here it propagates
    through the layers in closed form alongside the Jacobian state:

        softplus(pre):  L_out = sigmoid(pre) * (L_in W)
                              + sigmoid'(pre) * sum_{l,a} (d pre / d x_la)^2

    where the squared-first-derivative sums come from the Jacobian blocks
    already being carried (Jf W for the single-particle stream; the
    pair-local A W / B W blocks for the two-particle stream).
    Differentially tested against forward-over-forward AD of ferminet_apply.
    """
    n, dim = x.shape
    nd = n * dim
    eye_n = jnp.eye(n, dtype=x.dtype)

    tp, g = _pair_feature_grads(x, cfg.L)
    A = g  # d tp_ij / d x_j = -A throughout (see ferminet_apply_and_jac)
    Ltp = 2.0 * _pair_feature_lap(x, cfg.L)  # (n, n, C)
    sp = jnp.zeros_like(x)
    Jsp = jnp.zeros((n, n, dim, dim), x.dtype)
    Lsp = jnp.zeros((n, dim), x.dtype)

    def lap_of_f(Lsp, Ltp):
        Lmean = jnp.broadcast_to(Lsp.mean(axis=0, keepdims=True), Lsp.shape)
        return jnp.concatenate([Lsp, Lmean, Ltp.mean(axis=1)], axis=-1)

    def sp_step(layer, sp_in, tp_in, Jsp, A, Lf):
        pre = _sp_feature(sp_in, tp_in) @ layer["w"] + layer["b"]
        sig = jax.nn.sigmoid(pre)
        JfW = _jfw(Jsp, A, layer["w"], sp_in.shape[-1], eye_n, n)
        act = jax.nn.softplus(pre)
        Jact = sig[:, None, None, :] * JfW
        Lact = sig * (Lf @ layer["w"]) + (sig * (1 - sig)) * (JfW**2).sum(axis=(1, 2))
        return act, Jact, Lact

    for i in range(cfg.depth - 1):
        Lf = lap_of_f(Lsp, Ltp)
        sp_new, Jsp_new, Lsp_new = sp_step(params["sp"][i], sp, tp, Jsp, A, Lf)

        w_tp = params["tp"][i]["w"]
        pre_tp = tp @ w_tp + params["tp"][i]["b"]
        sig_tp = jax.nn.sigmoid(pre_tp)
        AW = A @ w_tp  # (n, n, dim, C'); BW = -AW, so (BW^2) = (AW^2)
        A_new = sig_tp[..., None, :] * AW
        Ltp_new = sig_tp * (Ltp @ w_tp) + (sig_tp * (1 - sig_tp)) * (
            2.0 * (AW**2).sum(axis=-2)
        )
        tp_new = jax.nn.softplus(pre_tp)

        if i == 0:  # first layer replaces the streams (reference src/flow.py:44-49)
            sp, Jsp, Lsp = sp_new, Jsp_new, Lsp_new
            tp, A, Ltp = tp_new, A_new, Ltp_new
        else:
            sp, Jsp, Lsp = sp + sp_new, Jsp + Jsp_new, Lsp + Lsp_new
            tp, A, Ltp = tp + tp_new, A + A_new, Ltp + Ltp_new

    Lf = lap_of_f(Lsp, Ltp)
    sp_new, Jsp_new, Lsp_new = sp_step(params["sp"][-1], sp, tp, Jsp, A, Lf)
    sp, Jsp, Lsp = sp + sp_new, Jsp + Jsp_new, Lsp + Lsp_new

    z = x + (sp @ params["final"]["w"] + params["final"]["b"])
    J = (Jsp @ params["final"]["w"]).transpose(0, 3, 1, 2)
    J = J + jnp.einsum("il,ba->ibla", eye_n, jnp.eye(dim, dtype=x.dtype))
    lap_z = Lsp @ params["final"]["w"]  # (n, dim); x-term is linear
    return z, J.reshape(nd, nd), lap_z.reshape(nd)


def ferminet_apply_jac_lap_d2(params, cfg: FermiNetConfig, x):
    """Depth-2 forward + Jacobian + coordinate Laplacian, structured form.

    Same closure as ``ferminet_apply_and_jac_d2`` extended with the analytic
    Laplacian propagation of ``ferminet_apply_jac_lap``: the carried
    (n,n,dim,S) Jacobian state disappears; the squared-first-derivative sums
    the softplus chain rule needs decompose over the SAME structured blocks

        JfW1_{il} = delta_il T_i + U_il + V_l

    (T diagonal, U pair-transient, V mean), so
    sum_{l,d} JfW1^2 = [(T+V_i)^2 - V_i^2]_d-sum + sum U^2 + 2 sum_l U.V_l
    + sum_l V_l^2 with only single-pass pair transients.  Exactly equal to
    ``ferminet_apply_jac_lap`` (differentially tested).
    """
    assert cfg.depth == 2, "structured Jacobian is specialized to depth 2"
    n, dim = x.shape
    nd = n * dim
    eye_n = jnp.eye(n, dtype=x.dtype)
    eye_d = jnp.eye(dim, dtype=x.dtype)

    tp0, A0 = _pair_feature_grads(x, cfg.L)
    Ltp0 = 2.0 * _pair_feature_lap(x, cfg.L)  # (n, n, C0)

    # ---- layer 0 ----------------------------------------------------------
    w0, b0 = params["sp"][0]["w"], params["sp"][0]["b"]
    w3_0 = w0[2 * dim:]
    pre0 = tp0.mean(axis=1) @ w3_0 + b0
    sig0 = jax.nn.sigmoid(pre0)
    sp1 = jax.nn.softplus(pre0)
    AW0 = A0 @ w3_0                      # (n, n, dim, S) transient
    sumAW0 = AW0.sum(axis=1)             # (n, dim, S)
    D = sig0[:, None, :] * sumAW0 / n    # diagonal block of Jsp1
    # Laplacian through layer 0: sig0*(mean_j Ltp0 @ w3_0) + sig0'(JfW0^2 sums)
    sq0 = ((sumAW0**2).sum(axis=1) + (AW0**2).sum(axis=(1, 2))) / n**2  # (n, S)
    Lsp1 = sig0 * (Ltp0.mean(axis=1) @ w3_0) + sig0 * (1 - sig0) * sq0

    # ---- pair-local tp layer ---------------------------------------------
    wt, bt = params["tp"][0]["w"], params["tp"][0]["b"]
    pre_tp = tp0 @ wt + bt
    sigt = jax.nn.sigmoid(pre_tp)
    tp1 = jax.nn.softplus(pre_tp)
    AWt = A0 @ wt
    A1 = sigt[..., None, :] * AWt
    Ltp1 = sigt * (Ltp0 @ wt) + sigt * (1 - sigt) * (2.0 * (AWt**2).sum(axis=-2))

    # ---- final sp layer ----------------------------------------------------
    S = sp1.shape[-1]
    w1f, b1f = params["sp"][1]["w"], params["sp"][1]["b"]
    W1, W2, W3 = w1f[:S], w1f[S:2 * S], w1f[2 * S:]
    f1 = _sp_feature(sp1, tp1)
    pre1 = f1 @ w1f + b1f
    sig1 = jax.nn.sigmoid(pre1)
    sp_fin = sp1 + jax.nn.softplus(pre1)

    wf, bf = params["final"]["w"], params["final"]["b"]
    z = x + (sp_fin @ wf + bf)

    # structured blocks of JfW1 (see docstring)
    sumA1 = A1.sum(axis=1)
    T = D @ W1 + (sumA1 @ W3) / n                      # (n, dim, S')
    # U_il = P_il W1 - (1/n) A1_il W3,  P_il = -(1/n) sig0_i ⊙ AW0_il
    U = -((sig0[:, None, None, :] * AW0) @ W1 + A1 @ W3) / n  # (n,n,dim,S')
    SP = -jnp.einsum("klds,ks->lds", AW0, sig0) / n
    G = D + SP
    V = (G @ W2) / n                                   # (n, dim, S')

    Vi = V  # V indexed by l; V_i is the same array at l=i
    sq1 = (((T + Vi) ** 2 - Vi**2).sum(axis=1)         # diagonal l=i part
           + (U**2).sum(axis=(1, 2))                   # pair part
           + 2.0 * jnp.einsum("ilds,lds->is", U, V)    # cross term
           + (V**2).sum(axis=(0, 1))[None, :])         # sum_l V_l^2 (i-indep)
    Lf1 = jnp.concatenate(
        [Lsp1, jnp.broadcast_to(Lsp1.mean(axis=0, keepdims=True), Lsp1.shape),
         Ltp1.mean(axis=1)], axis=-1)
    Lsp_fin = Lsp1 + sig1 * (Lf1 @ w1f) + sig1 * (1 - sig1) * sq1
    lap_z = (Lsp_fin @ wf).reshape(nd)

    # ---- Jacobian assembly (identical to ferminet_apply_and_jac_d2) ------
    M = wf[None] + jnp.einsum("st,it,tb->isb", W1, sig1, wf)
    K = -jnp.einsum("cs,is,isb->icb", w3_0, sig0, M) / n
    N = -jnp.einsum("ct,it,tb->icb", W3, sig1, wf) / n
    R = jnp.einsum("st,it,tb->isb", W2, sig1, wf) / n
    Jblk = (jnp.einsum("ildc,icb->ibld", A0, K)
            + jnp.einsum("ildc,icb->ibld", A1, N)
            + jnp.einsum("lds,isb->ibld", G, R))
    diag = (eye_d[None]
            + jnp.einsum("ids,isb->ibd", D, M)
            - jnp.einsum("idc,icb->ibd", sumA1, N))
    Jblk = Jblk + jnp.einsum("il,ibd->ibld", eye_n, diag)
    return z, Jblk.reshape(nd, nd), lap_z
