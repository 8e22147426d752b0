"""Analytic oracle tests: canonical recursion, enumeration cross-check,
thermodynamic limit, and TABC utilities."""

import numpy as np
from mpmath import mp, mpf

from coulombgas_tpu.analytic.canonical import Z_E, box_parameters, z_e
from coulombgas_tpu.analytic.thermo import thermo_quantities
from coulombgas_tpu.physics.orbitals import manybody_orbitals, sp_orbitals


def test_Z_E_against_exhaustive_enumeration():
    """Recursion F/E/S == brute-force sum over all many-body states.

    With a huge Ecut the truncated many-body enumeration is the full Hilbert
    space of the Emax-truncated single-particle basis, so the partition sums
    must agree exactly.
    """
    n, dim, Theta, Emax = 3, 2, 0.5, 4
    L, beta = box_parameters(n, dim, Theta)
    beta_f = float(beta)
    c = float((2 * mp.pi / L) ** 2)

    indices, Es = sp_orbitals(dim, Emax)
    # brute force over all C(M, n) combos
    import itertools

    Es = Es.astype(float)
    Z = 0.0
    EZ = 0.0
    for combo in itertools.combinations(range(Es.size), n):
        E_tot = c * Es[list(combo)].sum()
        w = np.exp(-beta_f * E_tot)
        Z += w
        EZ += E_tot * w
    F_brute = -np.log(Z) / beta_f
    E_brute = EZ / Z

    F, E, S = Z_E(n, dim, mpf(str(Theta)), [mpf(0), mpf(0)], Emax=Emax, dps=60)
    assert abs(float(F) - F_brute) < 1e-10
    assert abs(float(E) - E_brute) < 1e-10
    assert abs(float(S) - beta_f * (E_brute - F_brute)) < 1e-10


def test_z_e_truncated_vs_exact():
    """For a large Emax the truncated single-particle sums reach the exact ones."""
    mp.dps = 40
    L, beta = box_parameters(13, 2, mpf("0.15"))
    z_t, e_t = z_e(2, L, beta, [mpf("0.25"), mpf("0.25")], Emax=400)
    z_x, e_x = z_e(2, L, beta, [mpf("0.25"), mpf("0.25")], Emax=None)
    assert abs(float(z_t - z_x)) < 1e-20
    assert abs(float(e_t - e_x)) < 1e-20


def test_Z_E_baseline_value():
    """Match the reference's published pretraining oracle at n=13, Emax=25."""
    F, E, S = Z_E(13, 2, mpf("0.15"), [mpf("0.25"), mpf("0.25")], Emax=25, dps=200)
    # BASELINE.md: F = 24.811018 +- 4e-5 (converged training); oracle exact.
    assert abs(float(F) - 24.811018) < 2e-4
    assert abs(float(S) - 4.504003) < 2e-2


def test_thermo_limit_consistency():
    """Thermodynamic identity f = e - Theta*eps_F*s and low-T limits."""
    z, f, e, s = thermo_quantities(2, 0.15)
    eps_F = 4.0  # 2D: Gamma(2)^2 * 4 = 4
    assert abs(float(f - (e - mpf("0.15") * eps_F * s))) < 1e-12
    # entropy positive, f below e
    assert float(s) > 0 and float(f) < float(e)
    # T -> 0: e/n -> eps_F/2 (2D), s -> 0
    _, f0, e0, s0 = thermo_quantities(2, 0.005)
    assert abs(float(e0) - 2.0) < 0.05
    assert float(s0) < 0.1


def test_tabc_cli(tmp_path):
    """Random-twist TABC writes an appendable file and returns statistics."""
    from coulombgas_tpu.analytic.tabc import tabc

    out = tabc(3, 2, 0.5, 4, Ntwists=3, folder=str(tmp_path), dps=60)
    F_pbc, E_pbc, S_pbc, F_m, F_s, E_m, E_s, S_m, S_s = out
    assert np.isfinite([F_pbc, F_m, E_m, S_m]).all()
    # resume path: appending more twists reuses the file
    out2 = tabc(3, 2, 0.5, 4, Ntwists=5, Ntwists_finished=3, folder=str(tmp_path), dps=60)
    assert np.isfinite(out2[3])


def test_tabc_specialpoints(tmp_path):
    from coulombgas_tpu.analytic.tabc_specialpoints import tabc_specialpoints

    F_m, E_m, S_m = tabc_specialpoints(3, 2, 0.5, 4, Nk=2, folder=str(tmp_path), dps=60)
    # Nk=2 in 2D is the single (1/4, 1/4) twist with weight 1
    F, E, S = Z_E(3, 2, mpf("0.5"), [mpf("0.25"), mpf("0.25")], Emax=4, dps=60)
    assert abs(F_m - float(F)) < 1e-6
