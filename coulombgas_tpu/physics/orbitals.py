"""Plane-wave single-particle orbital bases and many-body state enumeration.

Host-side (numpy) setup code: this fixes the discrete state space over which
the variational autoregressive network (VAN) operates.  Capability parity with
reference src/orbitals.py (sp_orbitals, twist_sort, manybody_orbitals), built
independently: the many-body enumeration here is a vectorized DFS over the
energy-sorted orbital list rather than the reference's tuple-accumulation.
"""

from __future__ import annotations

import numpy as np

__all__ = ["sp_orbitals", "twist_sort", "manybody_orbitals", "closed_shells"]


def sp_orbitals(dim: int, Emax: int = 60) -> tuple[np.ndarray, np.ndarray]:
    """Enumerate plane-wave orbitals ``(n_1, ..., n_dim)`` with energy <= Emax.

    The energy of an orbital is ``n_1^2 + ... + n_dim^2`` (units of
    ``(2*pi/L)^2``); zero twist is used here since this only sets up the
    momentum grid (reference: src/orbitals.py:22-44).

    Returns:
      indices: (n_orbitals, dim) integer array, sorted by energy ascending.
      Es:      (n_orbitals,) integer energies.
    """
    n_max = int(np.floor(np.sqrt(Emax)))
    rng = np.arange(-n_max, n_max + 1)
    # Ordering must match the reference BIT-FOR-BIT (same meshgrid axis
    # order, same introsort tie-breaking among degenerate shells): the VAN's
    # token embeddings are the (twisted) momentum VECTORS, so any other
    # permutation within a degenerate shell defines a different network for
    # the same checkpoint — reference-trained params would load but sample a
    # different distribution (caught by the n=49 import parity check).
    grids = np.meshgrid(*([rng] * dim))
    indices = np.stack([g.ravel() for g in grids], axis=-1)
    Es = np.sum(indices**2, axis=-1)
    keep = Es <= Emax
    indices, Es = indices[keep], Es[keep]
    order = np.argsort(Es)
    return indices[order], Es[order]


def twist_sort(indices: np.ndarray, twist) -> tuple[np.ndarray, np.ndarray]:
    """Re-sort orbitals by twisted energy ``(n + theta)^2``.

    Twisted boundary conditions shift every momentum by ``2*pi*theta/L``
    (reference: src/orbitals.py:46-55).  Returns the *twisted* (fractional)
    indices ``n + theta`` together with their energies, both sorted ascending.
    """
    twisted = np.asarray(indices, dtype=float) + np.asarray(twist, dtype=float)
    Es = np.sum(twisted**2, axis=-1)
    order = np.argsort(Es)  # default introsort: reference tie-breaking
    return twisted[order], Es[order]


def manybody_orbitals(n: int, dim: int, Ecut: int) -> tuple[np.ndarray, np.ndarray]:
    """Enumerate all n-fermion occupation states within ``E0 + Ecut``.

    ``E0`` is the n-fermion ground-state energy (sum of the n lowest orbital
    energies).  Used for diagnostics and the exhaustive-normalization tests
    (reference: src/orbitals.py:3-20,57-79).

    Returns:
      mb_indices: (n_states, n, dim) plane-wave indices of each state,
      mb_Es:      (n_states,) total energies, sorted ascending.
    """
    indices, Es = sp_orbitals(dim)
    Es = Es.astype(np.int64)
    M = Es.size
    E0 = int(Es[:n].sum())
    Emax_tot = E0 + Ecut

    # Native C++ enumeration when available (coulombgas_tpu/ops/native);
    # the pure-Python DFS below is the fallback and the differential oracle.
    from ..ops.native import enumerate_subsets

    occ_native = enumerate_subsets(Es, n, Emax_tot)
    if occ_native is not None:
        totals = Es[occ_native].sum(axis=1)
        order = np.argsort(totals, kind="stable")
        occ_native, mb_Es = occ_native[order], totals[order]
        return indices[occ_native, :], mb_Es

    # Suffix minima: cheapest way to place k particles strictly above slot i.
    # tail_min[i][k] = sum of the k smallest energies among Es[i:]; since Es is
    # sorted ascending this is just Es[i:i+k].sum().
    cumsum = np.concatenate([[0], np.cumsum(Es)])

    def tail_min(i: int, k: int) -> int:
        return int(cumsum[i + k] - cumsum[i])

    results: list[tuple[int, ...]] = []
    totals: list[int] = []
    stack: list[tuple[tuple[int, ...], int, int]] = [((), 0, 0)]
    while stack:
        chosen, next_i, etot = stack.pop()
        k = len(chosen)
        if k == n:
            results.append(chosen)
            totals.append(etot)
            continue
        remaining = n - k
        for i in range(next_i, M - remaining + 1):
            e_new = etot + int(Es[i])
            # Prune: even the cheapest completion overshoots the cutoff.
            if e_new + tail_min(i + 1, remaining - 1) > Emax_tot:
                # Es sorted ascending => all later i overshoot as well.
                break
            stack.append((chosen + (i,), i + 1, e_new))

    order = np.argsort(totals, kind="stable")
    occ = np.array(results, dtype=np.int64)[order]
    mb_Es = np.array(totals, dtype=np.int64)[order]
    mb_indices = indices[occ, :]
    return mb_indices, mb_Es


def closed_shells(dim: int, Emax: int = 60) -> list[tuple[int, int]]:
    """(n, Ef) pairs at which the Fermi sea is a closed shell (diagnostic)."""
    _, Es = sp_orbitals(dim, Emax)
    out = []
    Ef = Es[0]
    for i in range(Es.size):
        if Es[i] != Ef:
            out.append((i, int(Ef)))
            Ef = Es[i]
    out.append((int(Es.size), int(Es[-1])))
    return out
