"""Reference-checkpoint importer: haiku params -> native pytrees.

Two layers of testing: (a) synthesized haiku-style dicts round-trip into
working native models; (b) when the reference repo + haiku are available,
full differential equivalence — the imported parameters must reproduce the
reference modules' outputs exactly (same math, same weights).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import coulombgas_tpu as cg
from coulombgas_tpu.io.import_reference import (
    convert_reference_flow,
    convert_reference_van,
)

REFERENCE = "/root/reference"


def _synth_haiku_van(key, num_layers, D, H, M, dim, dtype=np.float64):
    rng = np.random.default_rng(0)
    lin = lambda i, o: {"w": rng.normal(0, 0.1, (i, o)), "b": rng.normal(0, 0.1, (o,))}
    p = {
        "transformer/embedding_mlp": lin(dim, D),
        "transformer/output_mlp": lin(D, M),
        "transformer": {"x1hat": rng.normal(0, 0.1, (M,))},
    }
    for i in range(num_layers):
        p[f"transformer/layer{i}_attn/query"] = lin(D, D)
        p[f"transformer/layer{i}_attn/key"] = lin(D, D)
        p[f"transformer/layer{i}_attn/value"] = lin(D, D)
        p[f"transformer/layer{i}_attn/linear"] = lin(D, D)
        p[f"transformer/layer{i}_mlp/linear"] = lin(D, H)
        p[f"transformer/layer{i}_mlp/linear_1"] = lin(H, D)
    return p


def test_synthesized_van_roundtrip():
    num_layers, D, H, M, dim, n = 2, 16, 32, 10, 2, 4
    hk_params = _synth_haiku_van(None, num_layers, D, H, M, dim)
    params = convert_reference_van(hk_params, num_layers, dtype=np.float64)
    cfg = cg.TransformerConfig(M, num_layers, D, 4, H)
    x = jnp.linspace(-1.0, 1.0, n * dim).reshape(n, dim)
    out = cg.transformer_apply(params, cfg, x)
    assert out.shape == (n, M)
    np.testing.assert_allclose(np.asarray(out[0]), hk_params["transformer"]["x1hat"])


needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not available"
)


@needs_reference
def test_van_equivalence_vs_reference():
    haiku = pytest.importorskip("haiku")
    sys.path.insert(0, REFERENCE)
    from src.autoregressive import Transformer

    num_layers, D, nheads, H, M, dim, n = 2, 16, 4, 32, 10, 2, 5
    model = haiku.transform(lambda x: Transformer(M, num_layers, D, nheads, H)(x))
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (n, dim)))
    hk_params = model.init(jax.random.PRNGKey(0), x)
    want = model.apply(hk_params, None, x)

    params = convert_reference_van(hk_params, num_layers, dtype=np.float64)
    cfg = cg.TransformerConfig(M, num_layers, D, nheads, H)
    got = cg.transformer_apply(params, cfg, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


@needs_reference
def test_flow_equivalence_vs_reference():
    haiku = pytest.importorskip("haiku")
    sys.path.insert(0, REFERENCE)
    from src.flow import FermiNet

    depth, spsize, tpsize, L, dim, n = 3, 16, 16, 5.0, 2, 6
    model = haiku.transform(lambda x: FermiNet(depth, spsize, tpsize, L)(x))
    x = jnp.asarray(np.random.default_rng(2).uniform(0, L, (n, dim)))
    hk_params = model.init(jax.random.PRNGKey(0), x)
    want = model.apply(hk_params, None, x)

    params = convert_reference_flow(hk_params, depth, dtype=np.float64)
    cfg = cg.FermiNetConfig(depth, spsize, tpsize, L)
    got = cg.ferminet_apply(params, cfg, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


@needs_reference
def test_checkpoint_file_roundtrip(tmp_path):
    """Full epoch-checkpoint payload through load_reference_checkpoint."""
    haiku = pytest.importorskip("haiku")
    sys.path.insert(0, REFERENCE)
    from src.autoregressive import Transformer
    from src.flow import FermiNet

    import pickle

    num_layers, D, nheads, H, M, dim, n, depth = 2, 16, 4, 32, 12, 2, 5, 2
    van = haiku.transform(lambda x: Transformer(M, num_layers, D, nheads, H)(x))
    flow = haiku.transform(lambda x: FermiNet(depth, 16, 16, 4.0)(x))
    xtok = jnp.zeros((n, dim))
    ckpt = {
        "keys": np.asarray(jax.random.split(jax.random.PRNGKey(1), 8)),
        "x": np.random.default_rng(3).uniform(0, 4, (8, 16, n, dim)),
        "params_van": van.init(jax.random.PRNGKey(0), xtok),
        "params_flow": flow.init(jax.random.PRNGKey(1), xtok),
        "opt_state": None,
    }
    fname = str(tmp_path / "epoch_000100.pkl")
    with open(fname, "wb") as f:
        pickle.dump(ckpt, f)

    from coulombgas_tpu.io.import_reference import load_reference_checkpoint

    out = load_reference_checkpoint(fname, num_layers=num_layers, depth=depth,
                                    dtype=np.float64)
    assert out["x"].shape == (128, n, dim)
    assert out["key"].shape == (2,)
    # imported params drive the native models
    cfg = cg.TransformerConfig(M, num_layers, D, nheads, H)
    logits = cg.transformer_apply(out["params_van"], cfg, xtok)
    assert logits.shape == (n, M)
    fcfg = cg.FermiNetConfig(depth, 16, 16, 4.0)
    z = cg.ferminet_apply(out["params_flow"], fcfg, jnp.asarray(ckpt["x"][0, 0]))
    assert z.shape == (n, dim)


@needs_reference
def test_import_reference_trained_van_reproduces_F():
    """Load the reference's *trained* n=13 VAN and reproduce its converged F.

    The strongest cross-framework parity check available without training:
    the imported network, driven by THIS framework's sampler and log_prob,
    must reproduce the reference's logged F = 24.811018 (BASELINE.md) within
    Monte-Carlo error.
    """
    fname = os.path.join(
        REFERENCE, "data/freefermion/pretraining",
        "n_13_dim_2_Theta_0.15_Emax_25_twist_0.250_0.250",
        "nlayers_2_modelsize_16_nheads_4_nhidden_32_damping_0.00100_maxnorm_0.00100_batch_8192",
        "params_van.pkl",
    )
    if not os.path.isfile(fname):
        pytest.skip("reference pretrained checkpoint not present")

    from coulombgas_tpu.io.import_reference import load_reference_checkpoint

    n, dim, Theta, Emax = 13, 2, 0.15, 25
    params = load_reference_checkpoint(fname, num_layers=2, dtype=np.float64)["params_van"]

    L = float(np.sqrt(np.pi * n))
    beta = 1.0 / (4.0 * Theta)
    sp_indices, _ = cg.sp_orbitals(dim, Emax)
    sp, Es = cg.twist_sort(sp_indices, np.array([0.25, 0.25]))
    sp = np.asarray(sp[::-1].copy(), np.float64)
    Es = (2 * np.pi / L) ** 2 * np.asarray(Es[::-1].copy(), np.float64)
    M = sp.shape[0]

    cfg = cg.TransformerConfig(M, 2, 16, 4, 32)
    sampler, log_prob_novmap = cg.make_autoregressive_sampler(cfg, sp, n, M)
    log_prob = jax.vmap(log_prob_novmap, (None, 0), 0)

    batch = 4096
    si = jax.jit(sampler, static_argnums=2)(params, jax.random.PRNGKey(7), batch)
    logp = log_prob(params, si)
    F = np.asarray(logp / beta + jnp.asarray(Es)[si].sum(-1))
    F_mean, F_err = F.mean(), F.std() / np.sqrt(batch)
    # reference's converged value (data.txt last line): 24.811018 +- 4.1e-5;
    # the dominant uncertainty here is our own batch-4096 MC error
    assert abs(F_mean - 24.811018) < 5 * F_err + 1e-3, (F_mean, F_err)
