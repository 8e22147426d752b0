"""Permutation-equivariant FermiNet-style normalizing flow (backflow), TPU-first.

Maps electron coordinates x -> z in a periodic box of size L through residual
single-particle / two-particle feature streams built from periodic pair
features.  Capability parity with reference src/flow.py:5-55; written as pure
functions over an explicit parameter pytree (no haiku).

The flow is the quantum half of the neural canonical transformation: the
wavefunction is a plane-wave Slater determinant evaluated at z = flow(x) with
a 1/2 log|det dz/dx| Jacobian correction (see wavefunction/logpsi.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = ["FermiNetConfig", "init_ferminet_params", "ferminet_apply"]


@dataclass(frozen=True)
class FermiNetConfig:
    """Static hyperparameters of the flow."""

    depth: int
    spsize: int
    tpsize: int
    L: float
    init_stddev: float = 0.01


def _linear_init(key, d_in, d_out, stddev, dtype):
    return {
        "w": stddev * jax.random.normal(key, (d_in, d_out), dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def init_ferminet_params(key, cfg: FermiNetConfig, dim: int, dtype=jnp.float32):
    """Initialize the flow parameter pytree for spatial dimension ``dim``.

    Layer shapes mirror the stream construction in ``ferminet_apply``:
    the two-particle stream starts at 2*dim+1 features (cos/sin pair
    displacements + periodized distance), the per-layer single-particle
    feature is [sp, mean(sp), mean(tp)].
    """
    keys = jax.random.split(key, 2 * cfg.depth)
    sp0, tp0 = dim, 2 * dim + 1
    sp_layers, tp_layers = [], []
    spsize, tpsize = sp0, tp0
    for i in range(cfg.depth):
        fsize = 2 * spsize + tpsize
        sp_layers.append(_linear_init(keys[2 * i], fsize, cfg.spsize, cfg.init_stddev, dtype))
        spsize = cfg.spsize
        if i < cfg.depth - 1:
            tp_layers.append(
                _linear_init(keys[2 * i + 1], tpsize, cfg.tpsize, cfg.init_stddev, dtype)
            )
            tpsize = cfg.tpsize
    final = _linear_init(keys[-1], cfg.spsize, dim, cfg.init_stddev, dtype)
    return {"sp": sp_layers, "tp": tp_layers, "final": final}


def _pair_features(x, L):
    """Initial two-particle stream: (n, n, 2*dim+1) periodic pair features.

    cos/sin of the pair displacements plus the periodized distance
    |sin(pi r_ij / L)| with the diagonal regularized through an identity
    shift so its derivative stays finite at r_ii = 0
    (reference: src/flow.py:20-26).
    """
    n, _ = x.shape
    rij = x[:, None, :] - x[None, :, :]
    cos_rij = jnp.cos(2 * jnp.pi / L * rij)
    sin_rij = jnp.sin(2 * jnp.pi / L * rij)
    eye = jnp.eye(n, dtype=x.dtype)
    dij = jnp.linalg.norm(jnp.sin(jnp.pi / L * rij) + eye[..., None], axis=-1) * (1.0 - eye)
    return jnp.concatenate([cos_rij, sin_rij, dij[..., None]], axis=-1)


def _sp_feature(sp, tp):
    """Per-layer single-particle feature f = [sp, mean_i(sp), mean_j(tp)]."""
    n = sp.shape[0]
    return jnp.concatenate(
        [sp, jnp.broadcast_to(sp.mean(axis=0, keepdims=True), sp.shape), tp.mean(axis=1)],
        axis=-1,
    )


def ferminet_apply(params, cfg: FermiNetConfig, x):
    """Apply the flow: x (n, dim) -> z (n, dim).

    Equivariances (tested): permutation of particles, continuous translation
    z(x + a) = z(x) + a, and lattice-translation compatibility
    z(x + R*L) = z(x) + R*L.
    """
    L = cfg.L
    sp = jnp.zeros_like(x)
    tp = _pair_features(x, L)

    for i in range(cfg.depth - 1):
        f = _sp_feature(sp, tp)
        sp_new = jax.nn.softplus(f @ params["sp"][i]["w"] + params["sp"][i]["b"])
        tp_new = jax.nn.softplus(tp @ params["tp"][i]["w"] + params["tp"][i]["b"])
        sp = sp_new if i == 0 else sp + sp_new
        tp = tp_new if i == 0 else tp + tp_new

    f = _sp_feature(sp, tp)
    sp = sp + jax.nn.softplus(f @ params["sp"][-1]["w"] + params["sp"][-1]["b"])
    return x + (sp @ params["final"]["w"] + params["final"]["b"])
