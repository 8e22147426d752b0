"""End-to-end training tests on the 8-device virtual mesh.

Covers what the reference never tests (SURVEY.md §4): the sharded sampling /
accumulate / apply path, determinism w.r.t. mesh size, and a short
free-fermion pretraining convergence check against the exact oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from coulombgas_tpu.parallel.mesh import batch_spec, make_mesh, replicate, replicated_spec, shard_batch


def _run_full_step(mesh, parts):
    bspec, rspec = batch_spec(mesh), replicated_spec(mesh)
    params_van = replicate(parts["params_van"], mesh)
    params_flow = replicate(parts["params_flow"], mesh)
    x = shard_batch(parts["x"], mesh)
    key = parts["key"]

    sample_jit = jax.jit(
        parts["sample_step"],
        in_shardings=(rspec, rspec, bspec, None),
        out_shardings=(bspec, bspec, None),
    )
    accumulate_jit = jax.jit(
        parts["accumulate"],
        in_shardings=(rspec, rspec, bspec, bspec, None, rspec),
        out_shardings=rspec,
    )
    apply_jit = jax.jit(parts["apply_update"])

    acc = replicate(parts["init_acc"](), mesh)
    state_indices, x, accept = sample_jit(params_van, params_flow, x, key)
    acc = accumulate_jit(params_van, params_flow, state_indices, x, key, acc)
    pv, pf, opt_state, data = apply_jit(params_van, params_flow, parts["opt_state"], acc)
    return state_indices, x, float(accept), jax.device_get(data), jax.device_get((pv, pf))


def test_full_step_mesh_sizes_agree():
    """The same global program on 1-, 2-, 4- and 8-device meshes is identical.

    Guarantees the sharded path computes global-batch semantics: with the
    partitionable PRNG every mesh size must give bitwise-equal observables.
    """
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"
    results = []
    for ndev in (1, 2, 4, 8):
        parts = ge._build_stack(n=5, dim=2, Emax=4, batch=16, rdtype=jnp.float64,
                                hutchinson=True, sr=True)
        mesh = make_mesh(devices[:ndev])
        s, x, accept, data, params = _run_full_step(mesh, parts)
        results.append((np.asarray(s), np.asarray(x), accept, data, params))

    s0, x0, a0, d0, p0 = results[0]
    for s, x, a, d, p in results[1:]:
        np.testing.assert_array_equal(s, s0)
        np.testing.assert_allclose(x, x0, atol=1e-12)
        np.testing.assert_allclose(a, a0, atol=1e-12)
        for k in d0:
            np.testing.assert_allclose(d[k], d0[k], rtol=1e-9, err_msg=k)
        # atol floors reduction-order noise on near-zero parameter updates:
        # cross-mesh psum ordering perturbs the Fisher/grads at ~1e-16 rel,
        # and the damped solve amplifies by its condition number (~1e3-1e4
        # here) — measured ~3e-12 absolute on the updated params
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10), p, p0)


def test_adam_path_runs():
    parts = ge._build_stack(n=5, dim=2, Emax=4, batch=16, rdtype=jnp.float64,
                            hutchinson=False, sr=False)
    mesh = make_mesh(jax.devices()[:4])
    s, x, accept, data, params = _run_full_step(mesh, parts)
    assert np.isfinite(data["F_mean"]) and np.isfinite(data["E_mean"])
    assert 0.0 <= accept <= 1.0


def test_pretrain_converges_toward_oracle(tmp_path):
    """Short SR pretraining at n=5 closes most of the gap to the exact F."""
    from mpmath import mpf

    from coulombgas_tpu.analytic.canonical import Z_E
    from coulombgas_tpu.models.transformer import TransformerConfig, init_transformer_params
    from coulombgas_tpu.physics.orbitals import sp_orbitals
    from coulombgas_tpu.train.pretrain import pretrain

    n, dim, Theta, Emax = 5, 2, 0.15, 9
    _, Es = sp_orbitals(dim, Emax)
    cfg = TransformerConfig(Es.size, 1, 8, 2, 16)
    key = jax.random.PRNGKey(0)
    params = init_transformer_params(key, cfg, dim, jnp.float64)

    F_exact, E_exact, S_exact = (
        float(v) for v in Z_E(n, dim, mpf(str(Theta)), [mpf(0), mpf(0)], Emax, dps=100)
    )

    params = pretrain(
        cfg, params, n, dim, Theta, Emax, [0.0, 0.0],
        str(tmp_path), key, lr=1e-2, sr=True, damping=1e-3, max_norm=1e-3,
        batch=512, epoch=120, check_analytic=False, log_every=40,
    )
    lines = open(tmp_path / "data.txt").read().splitlines()
    first_F = float(lines[0].split()[1])
    last_F = float(lines[-1].split()[1])
    # the variational gap must shrink substantially
    assert abs(last_F - F_exact) < 0.4 * abs(first_F - F_exact)
    # F is a variational upper bound (within MC noise)
    assert last_F > F_exact - 0.05


def test_pretrain_checkpoint_resume(tmp_path):
    """ckpt_every writes ckpt_van.pkl; resuming from it continues the run.

    Long stage-1 runs (n=49: hours) must survive restarts — the resumed
    segment starts at epoch_finished+1 and appends to the same log.
    """
    import pickle

    from coulombgas_tpu.models.transformer import TransformerConfig, init_transformer_params
    from coulombgas_tpu.physics.orbitals import sp_orbitals
    from coulombgas_tpu.train.pretrain import pretrain

    n, dim, Theta, Emax = 3, 2, 0.15, 4
    _, Es = sp_orbitals(dim, Emax)
    cfg = TransformerConfig(Es.size, 1, 8, 2, 8)
    key = jax.random.PRNGKey(0)
    params0 = init_transformer_params(key, cfg, dim, jnp.float64)

    common = dict(lr=1e-3, sr=True, damping=1e-3, max_norm=1e-3,
                  batch=32, check_analytic=False, log_every=1)
    pretrain(cfg, params0, n, dim, Theta, Emax, [0.0, 0.0],
             str(tmp_path), key, epoch=4, ckpt_every=2, **common)
    ckpt = pickle.load(open(tmp_path / "ckpt_van.pkl", "rb"))
    assert ckpt["epoch"] == 4

    pretrain(cfg, ckpt["params_van"], n, dim, Theta, Emax, [0.0, 0.0],
             str(tmp_path), jax.random.fold_in(key, 4), epoch=6,
             ckpt_every=2, epoch_finished=ckpt["epoch"], **common)
    epochs = [int(line.split()[0])
              for line in open(tmp_path / "data.txt").read().splitlines()]
    assert epochs == [1, 2, 3, 4, 5, 6]  # appended, no restart from 1
    assert pickle.load(open(tmp_path / "ckpt_van.pkl", "rb"))["epoch"] == 6


def test_microbatched_accumulate_matches_full():
    """In-jit chunked accumulation == whole-batch (when clipping inactive)."""
    import coulombgas_tpu as cg
    from coulombgas_tpu.train.loss import make_loss

    parts_full = ge._build_stack(n=5, dim=2, Emax=4, batch=32, rdtype=jnp.float64,
                                 hutchinson=True, sr=True)
    parts_mb = ge._build_stack(n=5, dim=2, Emax=4, batch=32, rdtype=jnp.float64,
                               hutchinson=True, sr=True, microbatch=8)
    key = jax.random.PRNGKey(0)
    s, x, _ = jax.jit(parts_full["sample_step"])(
        parts_full["params_van"], parts_full["params_flow"], parts_full["x"], key
    )

    acc1 = parts_full["accumulate"](
        parts_full["params_van"], parts_full["params_flow"], s, x, key,
        parts_full["init_acc"](),
    )
    acc2 = parts_mb["accumulate"](
        parts_mb["params_van"], parts_mb["params_flow"], s, x, key,
        parts_mb["init_acc"](),
    )
    # Observable means agree exactly (chunk means average to the batch mean);
    # gradients agree up to the per-chunk Hutchinson keys and clip windows —
    # compare the deterministic pieces.
    np.testing.assert_allclose(
        float(acc1["data"]["V_mean"]), float(acc2["data"]["V_mean"]), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(acc1["classical_fisher"]), np.asarray(acc2["classical_fisher"]),
        rtol=1e-9, atol=1e-18,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10),
        acc1["classical_score"], acc2["classical_score"],
    )


def test_score_based_grads_match_jacrev():
    """SR-mode score-contraction gradients == the loss-jacrev gradients.

    The REINFORCE weights are AD-constants inside the loss closures, so
    grad_van = S_c^T Floc_clipped / B and grad_flow =
    2 Re(S_q^T conj(Eloc_clipped)) / B must equal jacrev of the losses
    exactly (f64).  Pins the jacrev-free SR accumulate path
    (train/train.py) against the reference-semantics closures.
    """
    from coulombgas_tpu.train.train import make_accumulate_and_apply

    parts = ge._build_stack(n=5, dim=2, Emax=4, batch=16, rdtype=jnp.float64,
                            hutchinson=True, sr=True)
    pv, pf = parts["params_van"], parts["params_flow"]
    key = jax.random.PRNGKey(3)
    s, x, _ = jax.jit(parts["sample_step"])(pv, pf, parts["x"], key)

    # score path = the production accumulate
    acc_fast = parts["accumulate"](pv, pf, s, x, key, parts["init_acc"]())

    # jacrev oracle: same pieces, scores fn disabled
    accum_slow, _ = make_accumulate_and_apply(
        parts["observable_and_lossfn"], None, acc_steps=1,
        sr_opt=parts["sr_opt"]._replace(scores=None),
    )
    acc_slow = accum_slow(pv, pf, s, x, key, parts["init_acc"]())

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        ),
        acc_fast, acc_slow,
    )
